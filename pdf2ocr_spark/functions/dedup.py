"""Deduplication operators (training-data pipeline tier).

All variants share one deterministic hash primitive available identically
in Spark and DuckDB: ``base_hash(s) = int(md5(s)[:8], 16)`` (first 32 bits
of md5 as a non-negative BIGINT), so every query here is oracle-checkable.

Implemented:
- exact dedup          md5(text) hash-groupBy (one shuffle, map-side combine)
- MinHash + LSH        word-shingles -> 16 permutations -> 4 bands ->
                       band-bucket self-join -> candidate pairs + est. Jaccard
- n-gram Jaccard       exact pairwise Jaccard via shingle inverted index
                       (join only docs sharing >=1 shingle — never all-pairs)
- SimHash              63-bit sign-sum fingerprint + Hamming-distance pairs
                       within 16-bit prefix blocks

Scale notes: every pairwise op is blocked (LSH band / shared shingle /
prefix) so the join fan-out is bounded by bucket sizes, not n^2; the
shingle inverted index is the classic web-dedup plan (Broder). The
documents relation at 10^12 rows would bucket the band join by
``bucket(band_hash)`` and rely on AQE skew splitting for hot shingles —
hot-shingle caps are applied below (shingle DF filtered to df < MAX_DF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MINHASH_PRIME = 2147483647  # 2^31 - 1
N_PERM = 16
BANDS = 4
ROWS_PER_BAND = N_PERM // BANDS
SHINGLE_WORDS = 3
MAX_SHINGLE_DF = 1000  # inverted-index hot-shingle cap
SIMHASH_BITS = 63
SIMHASH_PREFIX_BITS = 16


def base_hash(col: Column) -> Column:
    """First 32 bits of md5 as BIGINT — identical to DuckDB's
    CAST('0x'||substr(md5(x),1,8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def perm_hash(h31: Column, j: Column) -> Column:
    """j-th permutation hash: (A_j*h + B_j) mod p with LCG-style constants
    computed inline so both engines evaluate the same integer arithmetic."""
    a = (F.lit(1103515245).cast("long") * (j.cast("long") + 1)) % F.lit(MINHASH_PRIME)
    b = (F.lit(12345).cast("long") * (j.cast("long") + 7)) % F.lit(MINHASH_PRIME)
    return (a * h31 + b) % F.lit(MINHASH_PRIME)


def word_shingles(text: Column, n: int = SHINGLE_WORDS) -> Column:
    """Distinct word n-gram shingles; short texts fall back to one shingle
    (the whole text)."""
    toks = F.split(text, " ")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array(text))
    return grams


def with_near_dup_corpus(documents: DataFrame) -> DataFrame:
    """Benchmark corpus for near-dup detection: union the documents with a
    lightly mutated copy of every 10th doc (first word replaced), so true
    near-duplicates exist by construction. Mutant ids = doc_id + 10^7."""
    mutants = (
        documents.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.regexp_replace("text", "^[a-z]+ ", "zz ").alias("text"),
        )
    )
    return documents.select("doc_id", "text").unionByName(mutants)


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups over md5(text)."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_docs") >= 2)
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>[N_PERM]) — min over shingles per permutation.

    The signature is a pure function of ONE row's shingle array, so it is
    computed entirely per-row with nested higher-order functions (transform
    over permutations x array_min over shingle hashes) — zero shuffle, fully
    fused into the scan stage. Round 1 exploded the shingle relation 16x and
    shuffled it twice (groupBy(doc,j) -> groupBy(doc)); at 10^12 docs that
    was 16x shuffle amplification of the largest intermediate for no reason.
    """
    h31s = F.transform(
        word_shingles(F.col("text")),
        lambda s: base_hash(s) % MINHASH_PRIME,
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_PERM - 1)),
        lambda j: F.array_min(F.transform(h31s, lambda h: perm_hash(h, j))),
    )
    return docs.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(documents: DataFrame) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + minhash-agreement estimate.

    Returns (doc_a, doc_b, est_jaccard) for pairs sharing >=1 band.
    """
    sigs = minhash_signatures(with_near_dup_corpus(documents))
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "sig",
        "band",
        F.md5(
            F.array_join(
                F.transform(
                    F.slice("sig", F.col("band") * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "band_key",
    )
    pairs = (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(N_PERM))
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over the shingle inverted index.

    Join is blocked on shared shingles (docs with no common shingle never
    meet); hot shingles (document frequency > MAX_SHINGLE_DF) are dropped
    from the index, the standard web-scale cap."""
    docs = with_near_dup_corpus(documents)
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")

    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """63-bit SimHash per doc: sign of the per-bit sum of +/-1 token-hash
    bits (distinct tokens, unweighted).

    Computed entirely per-row: hash each distinct token once, then fold the
    token array into a 63-long bit-sum vector with ``aggregate``+``zip_with``
    and pack the signs — zero shuffle, fused into the scan. Round 1 exploded
    tokens x 63 bits and shuffled the bits relation (63x amplification).

    Bit b of a token is extracted as trunc(h / 2^b) % 2: h < 2^32 is exact
    in double and division by a power of two is exact, so this equals
    shiftright(h, b) while letting b be a lambda variable (F.shiftright
    takes only literal shifts).
    """
    docs = with_near_dup_corpus(documents)
    # 63 bits from two 32-bit halves: bits 0..31 from h1, 32..62 from h2
    hs = F.transform(
        F.array_distinct(F.split("text", " ")),
        lambda t: F.struct(
            base_hash(t).alias("h1"),
            base_hash(F.concat(t, F.lit("#2"))).alias("h2"),
        ),
    )

    def token_bits(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda bit: (
                F.when(
                    bit < 32,
                    (s["h1"] / F.pow(F.lit(2.0), bit)).cast("long") % 2,
                ).otherwise(
                    (s["h2"] / F.pow(F.lit(2.0), bit - 32)).cast("long") % 2
                )
                * 2
                - 1
            ),
        )

    sums = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, s: F.zip_with(acc, token_bits(s), lambda a, b: a + b),
    )
    simhash = F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda s, bit: F.when(s > 0, F.pow(F.lit(2.0), bit).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the top
    SIMHASH_PREFIX_BITS prefix (docs in different blocks never compared)."""
    fp = simhash_fingerprints(documents)
    blocked = fp.select(
        "doc_id",
        "simhash",
        F.shiftright("simhash", SIMHASH_BITS - SIMHASH_PREFIX_BITS).alias("block"),
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block"
    )
    return (
        a.join(b, "block")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
