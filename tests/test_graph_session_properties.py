"""Property tests pinning round-4 operators against INDEPENDENT
reference implementations: connected components vs a pure-Python
union-find on seeded random graphs, and sessionization vs a pure-pandas
reference sessionizer on seeded random event streams. (The DuckDB
oracles prove cross-engine agreement; these prove both engines agree
with the mathematical definition.)"""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from pdf2ocr_spark.functions.dedup import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # path-compress to the component MINIMUM (union by min above keeps
    # roots minimal)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [7, 1234])
def test_connected_components_matches_union_find(spark, seed):
    rng = np.random.RandomState(seed)
    n_nodes, n_edges = 1200, 1800
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    want = _union_find(edges)

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == want


def _reference_sessions(ev: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Straight-line per-user sessionizer (the definition)."""
    rows = []
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts_us", "event_id"])
        no, start, last, n, types, vsum = 0, None, None, 0, set(), 0.0
        for ts, et, v in zip(grp["ts_us"], grp["event_type"], grp["value"]):
            if start is None or ts - last > gap_us:
                if start is not None:
                    rows.append((uid, no, start, last, n, len(types),
                                 int(np.floor(vsum * 10000 + 0.5))))
                no += 1
                start, n, types, vsum = ts, 0, set(), 0.0
            last = ts
            n += 1
            types.add(et)
            vsum += v
        rows.append((uid, no, start, last, n, len(types),
                     int(np.floor(vsum * 10000 + 0.5))))
    return pd.DataFrame(
        rows,
        columns=["user_id", "session_no", "start_us", "end_us",
                 "n_events", "n_event_types", "value_bp"],
    )


def test_sessionization_matches_reference(spark, tmp_path):
    """Seeded random event stream -> q_events_sessionized must equal the
    straight-line per-user reference exactly (boundaries, counts, bp)."""
    from pdf2ocr_spark.plans.queries import SESSION_GAP_MIN, q_events_sessionized

    rng = np.random.RandomState(42)
    n = 4000
    base = pd.Timestamp("2024-03-01")
    # bursty arrivals: mixture of short (in-session) and long (new
    # session) gaps so both branches of the gap rule fire often
    gaps_s = np.where(
        rng.rand(n) < 0.15,
        rng.randint(31 * 60, 5 * 3600, n),  # > 30 min -> new session
        rng.randint(1, 20 * 60, n),  # <= 20 min -> same session
    )
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(np.cumsum(gaps_s), unit="s"),
            "user_id": rng.randint(0, 37, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "error"], n),
            "value": np.round(rng.rand(n) * 50, 2),
            "props": ["{}"] * n,
        }
    )
    # per-user timestamps are the global stream filtered per user —
    # realistic interleaving, and per-user gaps are whatever falls out
    sf = str(tmp_path)
    sdf = spark.createDataFrame(ev)
    sdf = sdf.withColumn("ts", sdf["ts"].cast("timestamp_ntz"))
    sdf.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    got = q_events_sessionized(spark, sf).toPandas()
    got["start_us"] = (
        pd.to_datetime(got["session_start"]).astype("datetime64[us]").astype("int64")
    )
    got["end_us"] = (
        pd.to_datetime(got["session_end"]).astype("datetime64[us]").astype("int64")
    )
    got = got.drop(columns=["session_start", "session_end"])

    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    want = _reference_sessions(ev, SESSION_GAP_MIN * 60 * 1_000_000)

    cols = ["user_id", "session_no", "start_us", "end_us",
            "n_events", "n_event_types", "value_bp"]
    got = got[cols].sort_values(["user_id", "session_no"]).reset_index(drop=True)
    want = want[cols].sort_values(["user_id", "session_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64", errors="ignore"), want.astype("int64", errors="ignore")
    )
    # sessions PARTITION the events: counts add up per user
    per_user = got.groupby("user_id")["n_events"].sum()
    truth = ev.groupby("user_id")["event_id"].count()
    assert per_user.sort_index().equals(truth.sort_index().astype("int64"))


def test_reliable_path_matches_union_find(spark, tmp_path):
    """The reliable-checkpoint mode (persist + eager edge-list
    checkpoint + per-round non-eager pins) computes the same fixpoint
    as union-find on a random graph — covering the production path at
    more than toy size."""
    rng = np.random.RandomState(99)
    a = rng.randint(0, 400, 700)
    b = rng.randint(0, 400, 700)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    want = _union_find(edges)

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert got == want
    ckpt_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(str(tmp_path / "cc"))
        for f in fs
    ]
    assert ckpt_files, "reliable checkpoints must be written"


def test_two_phase_sessionize_property_random_streams(spark, tmp_path):
    """Property over seeded random streams: sessionize_two_phase equals
    the straight-line reference for several chunk widths, including
    widths both far above and far below the gap (every session crossing
    many chunk boundaries) and a stream with equal-timestamp events."""
    from pdf2ocr_spark.functions.temporal import sessionize_two_phase
    from pdf2ocr_spark.plans.queries import SESSION_GAP_MIN

    rng = np.random.RandomState(7)
    n = 3000
    base = pd.Timestamp("2024-03-01")
    gaps_s = np.where(
        rng.rand(n) < 0.12,
        rng.randint(31 * 60, 3 * 3600, n),
        rng.randint(0, 25 * 60, n),  # includes ZERO gaps (equal ts)
    )
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(np.cumsum(gaps_s), unit="s"),
            "user_id": rng.randint(0, 23, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "error"], n),
            "value": np.round(rng.rand(n) * 50, 2),
        }
    )
    sdf = spark.createDataFrame(ev)
    sdf = sdf.withColumn("ts", sdf["ts"].cast("timestamp_ntz"))

    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    want = _reference_sessions(ev, SESSION_GAP_MIN * 60 * 1_000_000)
    cols = ["user_id", "session_no", "start_us", "end_us",
            "n_events", "n_event_types", "value_bp"]
    want = want[cols].sort_values(["user_id", "session_no"]).reset_index(drop=True)

    for chunk in ("3 days", "1 day", "2 hours", "15 minutes"):
        got = sessionize_two_phase(
            sdf, gap_min=SESSION_GAP_MIN, chunk=chunk
        ).toPandas()
        got["start_us"] = (
            pd.to_datetime(got["session_start"])
            .astype("datetime64[us]").astype("int64")
        )
        got["end_us"] = (
            pd.to_datetime(got["session_end"])
            .astype("datetime64[us]").astype("int64")
        )
        got = got[cols].sort_values(
            ["user_id", "session_no"]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64", errors="ignore"),
            want.astype("int64", errors="ignore"),
            obj=f"chunk={chunk}",
        )
