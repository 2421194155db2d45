"""docs -> spans_out: the fused per-document extraction stage.

One ``mapInPandas`` stage runs the whole reference per-document dataflow
(OCR-language clean -> boilerplate strip -> paragraph FSM -> multi-format
span emission; see kernel/emit.py) in a single Python-worker pass per
Arrow batch — the Spark analogue of the reference's operator fusion
(whole chain per file in one process, /root/reference/pdf2ocr/converters/pdf.py:663-739).

Skew handling (SURVEY.md §4 / north rule): documents are one row each, so
classic key-salting is moot (no key repeats); the skew is per-row WEIGHT
(page count — a heavy doc is 40x a light one). ``skew_balanced`` does an
explicit weight-striped repartition: docs are bucketed by log2(weight)
class and hash-spread within each class, so every partition receives the
same expected mix of light and heavy docs without any global sort (which
would not survive 10^12 rows). The paragraph FSM is inherently sequential
per document, so a single monster document bounds one task — the page-scope
stages for such docs are handled by the exploded path (see
``operators/exploded.py``).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf2ocr_spark.kernel.emit import ALL_FORMATS, extract_document
from pdf2ocr_spark.schema import SPANS_OUT_SCHEMA


def skew_balanced(docs: DataFrame, num_partitions: int) -> DataFrame:
    """Weight-striped repartition of the docs relation.

    Partition key = hash(doc_id) XOR'd with the document's weight class
    (log2 of span count), modulo ``num_partitions``: heavy docs of each
    class spread uniformly and independently, so the expected work per
    partition is balanced by the law of large numbers — one shuffle, no
    global ordering, scale-invariant.
    """
    wclass = F.floor(F.log2(F.greatest(F.size("spans"), F.lit(1)) + 1))
    key = F.pmod(
        F.xxhash64(F.col("doc_id"), wclass.cast("long")), F.lit(num_partitions)
    ).cast("int")
    return docs.repartition(num_partitions, key)


def extract_spans(
    docs: DataFrame,
    formats: Sequence[str] = ALL_FORMATS,
    lang: str = "eng",
    max_sentences: Optional[int] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Run the extraction kernel over the docs relation.

    Returns the spans_out relation (doc_id, kind, text, media_ref, offset).
    Deterministic: output row SET is independent of partitioning.
    """
    if num_partitions:
        docs = skew_balanced(docs, num_partitions)

    fmts = tuple(formats)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                rows.extend(
                    extract_document(doc_id, spans, fmts, lang, max_sentences)
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "spans").mapInPandas(run, schema=SPANS_OUT_SCHEMA)
