"""DuckDB oracle SQL mirroring functions/dedup.py step-for-step.

Shared primitives (kept textually aligned with the Spark expressions):
    base_hash(s) = CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)
    perm_hash    = ((1103515245*(j+1)) % P * h31 + (12345*(j+7)) % P) % P
"""

from pdf2ocr_spark.functions.dedup import (
    BANDS,
    MAX_SHINGLE_DF,
    MINHASH_PRIME as P,
    N_PERM,
    ROWS_PER_BAND,
    SHINGLE_WORDS as NG,
    SIMHASH_BITS,
    SIMHASH_PREFIX_BITS,
)

# near-dup benchmark corpus: documents + mutated copies of every 10th doc
_SQL_CORPUS = """
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id,
           regexp_replace(text, '^[a-z]+ ', 'zz ') AS text
    FROM documents WHERE doc_id % 10 = 0
)
"""

_SQL_SHINGLES = f"""
shingles AS (
    SELECT doc_id, unnest(
        CASE WHEN len(string_split(text, ' ')) >= {NG}
             THEN list_distinct(list_transform(
                      range(len(string_split(text, ' ')) - {NG} + 1),
                      i -> array_to_string(list_slice(string_split(text, ' '),
                                                      i + 1, i + {NG}), ' ')))
             ELSE [text] END) AS shingle
    FROM corpus
)
"""

SQL_DEDUP_MINHASH = f"""
WITH {_SQL_CORPUS}, {_SQL_SHINGLES},
sh AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {P} AS h31
    FROM shingles
),
perms AS (
    SELECT doc_id, j,
           (((1103515245 * (j + 1)) % {P}) * h31 + ((12345 * (j + 7)) % {P})) % {P} AS ph
    FROM sh, (SELECT unnest(range({N_PERM})) AS j)
),
mins AS (
    SELECT doc_id, j, min(ph) AS mh FROM perms GROUP BY doc_id, j
),
sigs AS (
    SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY doc_id
),
bands AS (
    SELECT doc_id, sig, band,
           md5(array_to_string(list_transform(
                 list_slice(sig, band * {ROWS_PER_BAND} + 1,
                            band * {ROWS_PER_BAND} + {ROWS_PER_BAND}),
                 x -> CAST(x AS VARCHAR)), ',')) AS band_key
    FROM sigs, (SELECT unnest(range({BANDS})) AS band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_filter(range({N_PERM}),
                       i -> a.sig[i + 1] = b.sig[i + 1])) / {N_PERM}.0 AS est_jaccard
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

# minhash pairs -> connected components (min reachable doc_id per node)
# via a recursive transitive-closure CTE: the oracle twin of the Spark
# min-label-propagation loop (functions/dedup.py connected_components) —
# both converge to the unique component-min labeling.
SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_DEDUP_MINHASH}),
edges AS (
    SELECT doc_a AS node, doc_b AS nbr FROM pairs
    UNION
    SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, lab) AS (
    SELECT node, node FROM edges
    UNION
    SELECT e.node, r.lab FROM edges e JOIN reach r ON e.nbr = r.node
),
comp AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
sizes AS (
    SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT comp.node AS doc_id, comp.cluster_id, sizes.cluster_size,
       comp.node = comp.cluster_id AS is_keeper
FROM comp JOIN sizes USING (cluster_id)
"""

SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {_SQL_CORPUS}, {_SQL_SHINGLES},
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {MAX_SHINGLE_DF}
),
shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
    FROM shr x JOIN shr y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
"""

_SQL_SIMHASH_FP = f"""
toks AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
    FROM corpus
),
th AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h1,
           CAST('0x' || substr(md5(tok || '#2'), 1, 8) AS BIGINT) AS h2
    FROM toks
),
bits AS (
    SELECT doc_id, bit,
           CASE WHEN bit < 32 THEN (h1 >> bit) % 2
                ELSE (h2 >> (bit - 32)) % 2 END AS b
    FROM th, (SELECT unnest(range({SIMHASH_BITS})) AS bit)
),
sums AS (
    SELECT doc_id, bit, sum(b * 2 - 1) AS s FROM bits GROUP BY doc_id, bit
),
fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id
)
"""

SQL_DEDUP_SIMHASH = f"""
WITH {_SQL_CORPUS}, {_SQL_SIMHASH_FP},
blocked AS (
    SELECT doc_id, simhash,
           simhash >> {SIMHASH_BITS - SIMHASH_PREFIX_BITS} AS block
    FROM fp
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM blocked a JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""

SQL_DEDUP_EXACT_FULL = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
HAVING count(*) >= 2
"""
