"""Focused tests for the blocked n-gram Jaccard kernel (round-6 rewrite).

The operator moved from an inverted-index self-join + pair aggregation to
a blocked all-pairs intersection kernel; these tests pin its exactness
against a brute-force Python reference on corpora constructed to hit the
block boundaries (pairs within one block, across blocks, both
orientations of global doc order) and the hot-shingle cap path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf2ocr_spark.functions import dedup


def _brute_force(rows, threshold=0.5, max_df=dedup.MAX_SHINGLE_DF):
    """Reference: exact pairwise Jaccard with the operator's spec —
    sizes over ALL distinct shingles, intersection over rare only."""

    def shingles(text):
        toks = text.split(" ")
        if len(toks) >= 3:
            out = []
            seen = set()
            for i in range(len(toks) - 2):
                s = " ".join(toks[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    out.append(s)
            return out
        return [text]

    sets = {d: set(shingles(t)) for d, t in rows}
    df = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    rare = {d: {g for g in s if df[g] <= max_df} for d, s in sets.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(rare[a] & rare[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 4)
            if j >= threshold:
                out[(a, b)] = j
    return out


def _run(spark, rows, blocks, max_df=None, monkeypatch=None):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    if max_df is not None:
        monkeypatch.setattr(dedup, "MAX_SHINGLE_DF", max_df)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, blocks=blocks).collect()
    }
    return got


def test_blocked_kernel_matches_brute_force(spark, monkeypatch):
    # 40 docs in 3 blocks; every 4th doc gets a near-identical twin with
    # a doc_id in a DIFFERENT block (cross-block pairs, both orders);
    # pure-alphabetic words so the mutant regex (^[a-z]+ ) fires
    base = [
        (
            i,
            " ".join(
                "w" + chr(ord("a") + (i * 7 + k) % 19) for k in range(12)
            ),
        )
        for i in range(40)
    ]
    twins = [
        (100 + i, "qq " + t.split(" ", 1)[1]) for i, t in base if i % 4 == 0
    ]
    rows = base + twins
    # near_dup_corpus adds mutants on top; brute-force must see them too
    full = rows + [
        (d + 10_000_000, "zz " + t.split(" ", 1)[1])
        for d, t in rows
        if d % 10 == 0
    ]
    expect = _brute_force(full)
    got = _run(spark, rows, blocks=3)
    assert got == pytest.approx(expect)
    assert len(got) > 0  # the corpus has qualifying pairs by construction


def test_hot_shingle_cap_respected(spark, monkeypatch):
    # one shingle shared by everyone (df > cap) must not count toward the
    # intersection, but still counts toward set sizes
    common = "alpha beta gamma"
    rows = [
        (i, f"{common} tail{i} tip{i} end{i} fin{i}") for i in range(12)
    ] + [(50, f"{common} tail1 tip1 end1 fin1")]
    # replicate with_near_dup_corpus so df (mutants included) matches
    full = rows + [
        (d + 10_000_000, "zz " + t.split(" ", 1)[1])
        for d, t in rows
        if d % 10 == 0
    ]
    expect = _brute_force(full, max_df=5)
    got = _run(spark, rows, blocks=2, max_df=5, monkeypatch=monkeypatch)
    assert got == pytest.approx(expect)


def test_single_block_degenerate(spark):
    rows = [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z q r s")]
    got = _run(spark, rows, blocks=2)
    got = {k: v for k, v in got.items() if k[0] < 1e7 and k[1] < 1e7}
    assert got == {(1, 2): 1.0}


def test_empty_corpus_yields_no_pairs(spark):
    # the collision-witness assert must gate through on an empty input
    # (sum over zero rows is NULL, and assert_true(NULL) throws)
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.ngram_jaccard_pairs(docs, blocks=2).collect() == []


def test_sort_path_matches_bincount_path(spark, monkeypatch):
    """The kernel's two pair-counting paths (dense bincount vs packed-key
    sort, selected by _BINCOUNT_MAX_CELLS) must be interchangeable: force
    the sort path — which production-sized blocks take — and require the
    identical result on a corpus with cross-block near-dup pairs."""
    base = [
        (
            i,
            " ".join(
                "w" + chr(ord("a") + (i * 5 + k) % 17) for k in range(12)
            ),
        )
        for i in range(30)
    ]
    twins = [
        (100 + i, "qq " + t.split(" ", 1)[1]) for i, t in base if i % 3 == 0
    ]
    rows = base + twins
    expect = _run(spark, rows, blocks=3)
    monkeypatch.setattr(dedup, "_BINCOUNT_MAX_CELLS", 0)
    got = _run(spark, rows, blocks=3)
    assert got == pytest.approx(expect)
    assert len(got) > 0
