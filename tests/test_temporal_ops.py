"""Unit contracts for the temporal join operators (functions/temporal.py)
beyond what the DuckDB-oracle queries cover: NULL-payload fidelity of the
as-of carry, no-match semantics, and left-row multiplicity. The oracle
corpus has dense non-null payloads, so these edge rules need direct pins.
"""

from pyspark.sql import functions as F

from pdf2ocr_spark.functions.temporal import asof_join, range_count_join


def test_asof_null_field_not_backfilled(spark):
    """A NULL field in the MATCHED (most recent) right row must surface
    as NULL — not fall back to an older right row's value. Per-column
    last(ignorenulls) carries would mix fields across right rows; the
    single-struct carry keeps every asof_* field from one row."""
    right = spark.createDataFrame(
        [("u", 1, 10, "old"), ("u", 5, None, "new")],
        "user_id string, ts long, a int, b string",
    )
    left = spark.createDataFrame(
        [("u", 7)], "user_id string, ts long"
    )
    out = asof_join(
        left, right, on="user_id", ts="ts", right_payload=("a", "b")
    ).collect()
    assert len(out) == 1
    row = out[0]
    # matched row is ts=5: a is genuinely NULL there, b is "new"
    assert row.asof_a is None, "NULL in matched row leaked an older value"
    assert row.asof_b == "new"


def test_asof_no_match_is_all_null(spark):
    right = spark.createDataFrame(
        [("u", 10, 1)], "user_id string, ts long, a int"
    )
    left = spark.createDataFrame(
        [("u", 3), ("v", 99)], "user_id string, ts long"
    )
    out = {
        (r.user_id, r.ts): r.asof_a
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_payload=("a",)
        ).collect()
    }
    assert out == {("u", 3): None, ("v", 99): None}


def test_asof_equal_ts_matches(spark):
    """Right rows sort BEFORE left rows at equal ts: at-or-before."""
    right = spark.createDataFrame(
        [("u", 5, 42)], "user_id string, ts long, a int"
    )
    left = spark.createDataFrame([("u", 5)], "user_id string, ts long")
    [row] = asof_join(
        left, right, on="user_id", ts="ts", right_payload=("a",)
    ).collect()
    assert row.asof_a == 42


def test_range_join_preserves_duplicate_left_rows(spark):
    """Two identical left rows stay two output rows (the transient _rid
    contract)."""
    left = spark.createDataFrame(
        [("u", "2024-01-01 00:10:00"), ("u", "2024-01-01 00:10:00")],
        "user_id string, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:08:00")], "user_id string, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    out = range_count_join(left, right, width="5 minutes").collect()
    assert len(out) == 2
    assert sorted(r.n_in_range for r in out) == [1, 1]


def test_two_phase_sessionize_equals_single_pass(spark, sf_dir):
    """The chunked sessionizer must be ROW-IDENTICAL to the single-pass
    window plan on the driver events table — including sessions that
    span chunk (day) boundaries."""
    from pdf2ocr_spark.plans.queries import (
        q_events_sessionized,
        q_events_sessionized_chunked,
    )

    a = q_events_sessionized(spark, sf_dir).toPandas()
    b = q_events_sessionized_chunked(spark, sf_dir).toPandas()
    key = ["user_id", "session_no"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), "two-phase sessionizer diverged from single-pass"


def test_two_phase_sessionize_fine_chunks(spark, sf_dir):
    """Chunk width much smaller than the gap still merges correctly
    (every session crosses many chunk boundaries)."""
    from pdf2ocr_spark.functions.temporal import sessionize_two_phase
    from pdf2ocr_spark.plans.queries import q_events_sessionized

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = q_events_sessionized(spark, sf_dir).toPandas()
    b = sessionize_two_phase(ev, gap_min=30, chunk="10 minutes").toPandas()
    key = ["user_id", "session_no"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_hierarchical_range_join_equals_banded(spark, sf_dir):
    """range_count_join_hierarchical must be row-identical to the
    banded operator on the driver events table (uniform keys) for
    several split factors."""
    from pdf2ocr_spark.functions.temporal import (
        range_count_join,
        range_count_join_hierarchical,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    base = (
        range_count_join(errors, clicks, width="5 minutes")
        .toPandas()
        .sort_values(["error_id"])
        .reset_index(drop=True)
    )
    for split in (2, 4, 20):
        h = (
            range_count_join_hierarchical(
                errors, clicks, width="5 minutes", split=split
            )
            .toPandas()
            .sort_values(["error_id"])
            .reset_index(drop=True)
        )
        assert base.equals(h), f"split={split} diverged"


def test_hierarchical_range_join_burst_corpus(spark):
    """Exactness where it matters: a burst corpus whose right-side rows
    all land in few sub-bands, including boundary-exact timestamps
    (r_ts == t and r_ts == t - w must count as in / out resp.)."""
    from pdf2ocr_spark.functions.temporal import (
        range_count_join,
        range_count_join_hierarchical,
    )

    rows = []
    # right: one user, events every 10 s across 30 min
    for i in range(180):
        rows.append(("u", f"2024-01-01 00:{i // 6:02d}:{(i % 6) * 10:02d}"))
    right = spark.createDataFrame(rows, "user_id string, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts")
    )
    left = spark.createDataFrame(
        [("u", i, f"2024-01-01 00:{m:02d}:{sec:02d}")
         for i, (m, sec) in enumerate(
             [(0, 0), (5, 0), (10, 0), (12, 34), (29, 50), (35, 0)]
         )],
        "user_id string, lid long, ts_s string",
    ).select("user_id", "lid", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    a = (
        range_count_join(left, right, width="5 minutes")
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    b = (
        range_count_join_hierarchical(left, right, width="5 minutes", split=10)
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    assert a.equals(b)
    # sanity: interior window fully populated -> 30 events per 5 min
    assert a.loc[a.lid == 2, "n_in_range"].iloc[0] == 30


def test_adaptive_range_join_routes_and_matches(spark, sf_dir):
    """The adaptive split must be row-identical to the banded operator
    on a mixed corpus (uniform majority + a synthetic heavy band), and
    with heavy_per_band=0 (everything heavy) it degenerates to the
    hierarchical path while still matching."""
    from pdf2ocr_spark.functions.temporal import (
        range_count_join,
        range_count_join_adaptive,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    # synthetic heavy band: 400 extra clicks by one user inside 5 min
    hot = spark.range(400).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.expr(
            "timestamp_ntz'2024-01-05 00:00:00' "
            "+ make_dt_interval(0, 0, 0, id * 0.5)"
        ).alias("ts"),
    )
    clicks2 = clicks.unionByName(hot)
    probes = spark.range(10).select(
        (F.col("id") + 1_000_000).alias("error_id"),
        F.lit(-1).cast("long").alias("user_id"),
        F.expr(
            "timestamp_ntz'2024-01-05 00:02:00' "
            "+ make_dt_interval(0, 0, 0, id * 30.0)"
        ).alias("ts"),
    )
    errors2 = errors.unionByName(probes)

    base = (
        range_count_join(errors2, clicks2, width="5 minutes")
        .toPandas().sort_values("error_id").reset_index(drop=True)
    )
    for thresh in (256, 0):
        got = (
            range_count_join_adaptive(
                errors2, clicks2, width="5 minutes", split=20,
                heavy_per_band=thresh,
            )
            .toPandas().sort_values("error_id").reset_index(drop=True)
        )
        assert base.equals(got), f"heavy_per_band={thresh} diverged"
    # the synthetic probes really do see the hot band
    assert (base.loc[base.error_id >= 1_000_000, "n_in_range"] > 100).all()


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after; equal ts matches;
    NULL field in the matched row stays NULL (no forward-fill from a
    LATER right row)."""
    right = spark.createDataFrame(
        [("u", 5, None, "near"), ("u", 9, 7, "far")],
        "user_id string, ts long, a int, b string",
    )
    left = spark.createDataFrame(
        [("u", 3), ("u", 5), ("u", 10)], "user_id string, ts long"
    )
    from pdf2ocr_spark.functions.temporal import asof_join

    out = {
        r.ts: (r.asof_a, r.asof_b)
        for r in asof_join(
            left, right, on="user_id", ts="ts",
            right_payload=("a", "b"), direction="forward",
        ).collect()
    }
    assert out[3] == (None, "near"), "matched row's NULL field leaked"
    assert out[5] == (None, "near"), "equal ts must match"
    assert out[10] == (None, None), "no following row -> all null"


def test_adaptive_range_join_rerun_stable(spark, sf_dir):
    """Routing never touches results: the sampled heavy set is
    partition-dependent (Spark's seeded sample draws per partition),
    but BOTH count paths are exact, so two runs over the same input at
    different partitionings must return identical rows — the
    rerun-stability contract of the operator."""
    from pdf2ocr_spark.functions.temporal import range_count_join_adaptive

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    a = (
        range_count_join_adaptive(
            errors, clicks, width="5 minutes", sample_fraction=0.1,
            heavy_per_band=8,
        )
        .toPandas().sort_values("error_id").reset_index(drop=True)
    )
    b = (
        range_count_join_adaptive(
            errors.repartition(7), clicks.repartition(5),
            width="5 minutes", sample_fraction=0.1, heavy_per_band=8,
        )
        .toPandas().sort_values("error_id").reset_index(drop=True)
    )
    assert a.equals(b), "sampled routing changed the result across reruns"
