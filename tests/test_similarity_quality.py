"""ANN quality gates: the exact cosine_topk baseline serves as the recall
oracle for both approximate paths (the VERDICT-recommended use of the
exact query). Runs at sf0.01 (10 queries) — sf0.001 has a single query,
too noisy for a recall floor. Floors are set from measured values
(multi-probe LSH 0.14, IVF 0.20 on this corpus) with slack; random
uniform vectors are the recall worst case — real embedding corpora
cluster, and bucket/cell sizing tracks corpus size in production.
"""

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def recall_inputs(spark):
    from pdf2ocr_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb).toPandas()
    return emb, exact.groupby("query_id")["neighbor_id"].apply(set)


def _mean_recall(approx_pdf, exact_sets):
    ap = approx_pdf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(s & ap.get(q, set())) / len(s) for q, s in exact_sets.items()
    ]
    return sum(recalls) / len(recalls)


def test_multiprobe_lsh_recall(recall_inputs):
    from pdf2ocr_spark.functions.similarity import ann_lsh_topk

    emb, exact_sets = recall_inputs
    r = _mean_recall(ann_lsh_topk(emb).toPandas(), exact_sets)
    assert r >= 0.10, f"multi-probe LSH recall@5 regressed: {r:.3f}"


def test_ivf_recall(recall_inputs):
    from pdf2ocr_spark.functions.similarity import ivf_topk

    emb, exact_sets = recall_inputs
    r = _mean_recall(ivf_topk(emb).toPandas(), exact_sets)
    assert r >= 0.15, f"IVF recall@5 regressed: {r:.3f}"


def test_approx_results_subset_of_corpus(recall_inputs, spark):
    """Structural sanity: every approximate neighbor is a real vec_id and
    never the query itself; ranks are 1..k dense per query."""
    from pdf2ocr_spark.functions.similarity import TOP_K, ann_lsh_topk

    emb, _ = recall_inputs
    pdf = ann_lsh_topk(emb).toPandas()
    ids = {r[0] for r in emb.select("vec_id").collect()}
    assert set(pdf["neighbor_id"]) <= ids
    assert (pdf["neighbor_id"] != pdf["query_id"]).all()
    for _, grp in pdf.groupby("query_id"):
        ranks = sorted(grp["rank"])
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K
