"""Stateful streaming deduplication (applyInPandasWithState).

A continuous ingest pipeline must drop documents whose exact text was
already seen in ANY earlier micro-batch — cross-batch state that
stateless operators cannot express. This operator keys the stream by a
text hash and keeps a per-key GroupState recording the first-seen doc:
the first arrival passes through, every later duplicate is emitted as a
tombstone row pointing at the keeper.

State design for 10^12 docs: the key is the 32-hex md5 of the normalized
text, so state size is bounded by DISTINCT documents (RocksDB state store
on a real cluster); no timeout is set because exact dedup has no
staleness horizon — swap in `GroupStateTimeout.ProcessingTimeTimeout`
and a TTL for windowed dedup.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("is_duplicate", T.BooleanType()),
        T.StructField("keeper_doc_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("keeper_doc_id", T.LongType())])


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_hash,) = key
    keeper = state.get[0] if state.exists else None
    # drain ALL Arrow chunks of the group before choosing the keeper: a
    # per-chunk choice would be chunk-order dependent and could diverge
    # from batch exact_dedup's min(doc_id) when one micro-batch spans
    # multiple chunks
    doc_ids = sorted(
        int(d) for pdf in pdfs for d in pdf["doc_id"]
    )
    out = []
    for doc_id in doc_ids:
        if keeper is None:
            keeper = doc_id
            out.append((text_hash, doc_id, False, doc_id))
        else:
            out.append((text_hash, doc_id, True, keeper))
    state.update((keeper,))
    yield pd.DataFrame(
        out, columns=["text_hash", "doc_id", "is_duplicate", "keeper_doc_id"]
    )


def streaming_exact_dedup(stream: DataFrame) -> DataFrame:
    """documents stream -> dedup decisions (first-seen keeps, later dups
    tombstoned), exactly-once across micro-batches via GroupState."""
    keyed = stream.select(
        F.md5("text").alias("text_hash"), F.col("doc_id").cast("long").alias("doc_id")
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """AvailableNow runner: process all files currently present, then stop."""
    from pdf2ocr_spark.streaming.ingest import DOCUMENTS_SCHEMA

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _dedup_keep_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Pass-through variant for pipeline chaining: the first-seen doc of
    each text-hash group is emitted with ALL its columns; later
    duplicates vanish. Same keeper rule as _dedup_fn (min doc_id within
    the draining batch, first-seen across batches)."""
    (_text_hash,) = key
    keeper = state.get[0] if state.exists else None
    parts = [p for p in pdfs]
    pdf = pd.concat(parts) if parts else pd.DataFrame()
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    if len(pdf) == 0:
        yield pd.DataFrame([], columns=cols)
        return
    pdf = pdf.sort_values("doc_id")
    if keeper is None:
        first = pdf.iloc[[0]]
        state.update((int(first["doc_id"].iloc[0]),))
        yield first[cols]
    else:
        state.update((int(keeper),))
        yield pd.DataFrame([], columns=cols)


def streaming_dedup_keep(stream: DataFrame) -> DataFrame:
    """documents stream -> first-seen documents only (full rows), the
    composable upstream gate of the chained clean pipeline
    (streaming/pipeline_chain.py): dedup state drops cross-batch
    duplicates BEFORE the stateless clean/chunk stages, so a document
    re-ingested in a later file produces no chunks at all."""
    from pdf2ocr_spark.streaming.ingest import DOCUMENTS_SCHEMA

    keyed = stream.withColumn("text_hash", F.md5("text"))
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_keep_fn,
        outputStructType=DOCUMENTS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
