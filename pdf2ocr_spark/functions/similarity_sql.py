"""DuckDB oracles for functions/similarity.py and functions/quality.py.

Dot products are explicit sequential folds over ``range(DIM)`` in double
precision so scores match Spark's ``zip_with``+``aggregate`` fold bit-for-
bit after round(4).
"""

from pdf2ocr_spark.functions.quality import FINGERPRINT_K, LANGS, STOPWORDS
from pdf2ocr_spark.functions.similarity import (
    DIM,
    IVF_K,
    KMEANS_SCALE,
    N_PLANES,
    N_QUERIES,
    NEAR_DUP_MIN_BP,
    NEAR_DUP_SHIFT,
    NEAR_DUP_STRIDE,
    QUERY_STRIDE,
    TOP_K,
)

_BASE = f"""
base AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM base
    WHERE vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * N_QUERIES}
)
"""

SQL_COSINE_TOPK = f"""
WITH {_BASE},
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range({DIM}),
                    i -> q.qe[i + 1] * b.e[i + 1])) / (q.qnrm * b.nrm) AS score
    FROM base b, queries q
    WHERE b.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rank <= {TOP_K}
"""

_PLANES = f"""
planes AS (
    SELECT p, d,
           CASE WHEN CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END AS c
    FROM (SELECT unnest(range({N_PLANES})) AS p),
         (SELECT unnest(range({DIM})) AS d)
),
bucketed AS (
    SELECT b.vec_id, b.e, b.nrm,
           CAST(sum(CASE WHEN pd.dot > 0 THEN CAST(pow(2, pd.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM base b
    JOIN (
        SELECT b2.vec_id, pl.p,
               sum(b2.e[pl.d + 1] * pl.c) AS dot
        FROM base b2 JOIN planes pl ON true
        GROUP BY b2.vec_id, pl.p
    ) pd ON pd.vec_id = b.vec_id
    GROUP BY b.vec_id, b.e, b.nrm
)
"""

_PROBE_MASKS = "[" + ", ".join(["0"] + [str(1 << p) for p in range(N_PLANES)]) + "]"

SQL_ANN_LSH_TOPK = f"""
WITH {_BASE},
{_PLANES.lstrip()},
qb AS (
    SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, bucket AS qbucket
    FROM bucketed
    WHERE vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * N_QUERIES}
),
qprobe AS (
    SELECT query_id, qe, qnrm, xor(qbucket, m.mask) AS pbucket
    FROM qb, (SELECT unnest({_PROBE_MASKS}) AS mask) m
),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range({DIM}),
                    i -> q.qe[i + 1] * b.e[i + 1])) / (q.qnrm * b.nrm) AS score
    FROM bucketed b JOIN qprobe q
      ON b.bucket = q.pbucket AND b.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rank <= {TOP_K}
"""


SQL_IVF_TOPK = f"""
WITH {_BASE.replace('queries AS', 'unused_queries AS')},
cents AS (
    SELECT vec_id AS k, e AS ce FROM base WHERE vec_id < {IVF_K}
),
assigned AS (
    SELECT vec_id, e, nrm, k AS cell FROM (
        SELECT b.vec_id, b.e, b.nrm, c.k,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_sum(list_transform(range({DIM}),
                            i -> b.e[i + 1] * c.ce[i + 1])) DESC, c.k ASC
               ) AS rn
        FROM base b, cents c
    ) WHERE rn = 1
),
qv AS (
    SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, cell AS qcell
    FROM assigned
    WHERE vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * N_QUERIES}
),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range({DIM}),
                    i -> q.qe[i + 1] * b.e[i + 1])) / (q.qnrm * b.nrm) AS score
    FROM assigned b JOIN qv q
      ON b.cell = q.qcell AND b.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rank <= {TOP_K}
"""



def sql_ivf_trained(iters: int, n_cells: int = IVF_K) -> str:
    """The ENTIRE trained-IVF pipeline as one DuckDB statement: the
    Lloyd loop of functions/similarity.kmeans_train UNROLLED into
    ``iters`` CTE rounds (assignment = argmax over a base x centroids
    cross product, update = per-cell integer micro-unit sums, renorm =
    sequential-fold norm — list_sum over DOUBLE lists is a strict left
    fold, verified, and the Python side folds sequentially to match),
    then the same probe/top-k tail as SQL_IVF_TOPK over the round-
    ``iters`` centroids. Every arithmetic step mirrors the engine's
    op-for-op in double precision, so the trained centroids — and hence
    cell assignments, scores, and ranks — are bit-identical."""
    scale = KMEANS_SCALE
    parts = [
        f"""WITH {_BASE},
q AS (
    SELECT vec_id,
           list_transform(e, x -> CAST(round(x / nrm * {scale}) AS BIGINT))
               AS eq
    FROM base
),
cents_0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k,
           list_transform(eq, v -> v / {scale}.0) AS ce
    FROM q ORDER BY vec_id LIMIT {n_cells}
)"""
    ]
    for r in range(1, iters + 1):
        p = r - 1
        parts.append(
            f""",
scored_{r} AS (
    SELECT q.vec_id, q.eq, c.k,
           list_sum(list_transform(range({DIM}),
                    i -> (q.eq[i + 1] / {scale}.0) * c.ce[i + 1])) AS score
    FROM q, cents_{p} c
),
assign_{r} AS (
    SELECT vec_id, eq, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, k ASC) AS rn
        FROM scored_{r}
    ) WHERE rn = 1
),
percell_{r} AS (
    SELECT cell, count(*) AS n FROM assign_{r} GROUP BY cell
),
dimsums_{r} AS (
    SELECT a.cell, dd.d, sum(a.eq[dd.d + 1]) AS s
    FROM assign_{r} a, (SELECT unnest(range({DIM})) AS d) dd
    GROUP BY a.cell, dd.d
),
rawc_{r} AS (
    SELECT ds.cell, ds.d, CAST(ds.s AS DOUBLE) / ({scale} * pc.n) AS v
    FROM dimsums_{r} ds JOIN percell_{r} pc USING (cell)
),
newc_{r} AS (
    SELECT cell, vl,
           sqrt(list_sum(list_transform(vl, x -> x * x))) AS nrm_c
    FROM (SELECT cell, list(v ORDER BY d) AS vl FROM rawc_{r} GROUP BY cell)
),
cents_{r} AS (
    SELECT prev.k,
           CASE WHEN c.cell IS NULL THEN prev.ce
                WHEN c.nrm_c > 0 THEN list_transform(c.vl, x -> x / c.nrm_c)
                ELSE c.vl END AS ce
    FROM cents_{p} prev LEFT JOIN newc_{r} c ON prev.k = c.cell
)"""
        )
    parts.append(
        f""",
fscored AS (
    SELECT b.vec_id, b.e, b.nrm, c.k,
           list_sum(list_transform(range({DIM}),
                    i -> b.e[i + 1] * c.ce[i + 1])) AS score
    FROM base b, cents_{iters} c
),
assigned AS (
    SELECT vec_id, e, nrm, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, k ASC) AS rn
        FROM fscored
    ) WHERE rn = 1
),
qv AS (
    SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, cell AS qcell
    FROM assigned
    WHERE vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * N_QUERIES}
),
probe_scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           list_sum(list_transform(range({DIM}),
                    i -> q.qe[i + 1] * b.e[i + 1])) / (q.qnrm * b.nrm) AS score
    FROM assigned b JOIN qv q
      ON b.cell = q.qcell AND b.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM probe_scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rank <= {TOP_K}"""
    )
    return "".join(parts)


SQL_EMBEDDING_NEAR_DUP = f"""
WITH base0 AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
corpus AS (
    SELECT vec_id, e FROM base0
    UNION ALL
    SELECT vec_id + 10000000 AS vec_id,
           list_transform(e, x -> x + CAST({NEAR_DUP_SHIFT} AS DOUBLE)) AS e
    FROM base0 WHERE vec_id % {NEAR_DUP_STRIDE} = 0
),
planes AS (
    SELECT p, d,
           CASE WHEN CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END AS c
    FROM (SELECT unnest(range({N_PLANES})) AS p),
         (SELECT unnest(range({DIM})) AS d)
),
bucketed AS (
    SELECT c.vec_id, c.e,
           sqrt(list_sum(list_transform(c.e, v -> v * v))) AS nrm,
           CAST(sum(CASE WHEN pd.dot > 0 THEN CAST(pow(2, pd.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM corpus c
    JOIN (
        SELECT c2.vec_id, pl.p,
               sum(c2.e[pl.d + 1] * pl.c) AS dot
        FROM corpus c2 JOIN planes pl ON true
        GROUP BY c2.vec_id, pl.p
    ) pd ON pd.vec_id = c.vec_id
    GROUP BY c.vec_id, c.e
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(floor(list_sum(list_transform(range({DIM}),
                    i -> a.e[i + 1] * b.e[i + 1])) / (a.nrm * b.nrm) * 10000 + 0.5)
                AS BIGINT) AS cos_bp
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_bp FROM pairs WHERE cos_bp >= {NEAR_DUP_MIN_BP}
"""


def _hits(words: tuple) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"
    )


# deterministic 4-decimal fixed point (floor(x*10000+0.5)); see
# functions/quality.py:bp — round()'s tie-breaking differs across engines
def _bp(expr: str) -> str:
    return f"CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT)"


_SCORE_COLS = ",\n       ".join(
    _bp(f"{_hits(STOPWORDS[lang])} / CAST(len(string_split(text, ' ')) AS DOUBLE)")
    + f" AS score_{lang}"
    for lang in LANGS
)

_CASE = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(
        f"score_{lang} >= score_{other}" for other in LANGS if other != lang
    )
    + f" THEN '{lang}'"
    for lang in LANGS
) + " END"

SQL_LANG_ID = f"""
WITH scored AS (
    SELECT doc_id, lang AS lang_actual,
       {_SCORE_COLS}
    FROM documents
)
SELECT *, {_CASE} AS lang_pred FROM scored
"""

SQL_QUALITY_SCORE = f"""
SELECT doc_id,
       {_bp('least(1.0, n_chars / 500.0)')} AS len_score_bp,
       {_bp(_hits(STOPWORDS['en']) + " / CAST(len(string_split(text, ' ')) AS DOUBLE)")} AS stop_ratio_bp,
       {_bp("len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE)")} AS diversity_bp,
       {_bp("0.4 * least(1.0, n_chars / 500.0)"
            + " + 0.3 * (" + _hits(STOPWORDS['en']) + " / CAST(len(string_split(text, ' ')) AS DOUBLE))"
            + " + 0.3 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))")} AS quality_bp
FROM documents
"""

SQL_FINGERPRINT = f"""
SELECT doc_id,
       array_to_string(
           list_transform(
               list_slice(list_sort(list_transform(
                   list_distinct(string_split(text, ' ')),
                   t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))), 1, {FINGERPRINT_K}),
               h -> CAST(h AS VARCHAR)),
           '-') AS fingerprint
FROM documents
"""
