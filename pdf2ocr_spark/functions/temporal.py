"""Temporal join operators Spark lacks natively: AS-OF join and banded
RANGE join — implemented as compositions of built-in DataFrame ops (the
(a)-tier strategy: no Python in the hot path, no nested-loop plans).

Both stay timezone-free end-to-end: the events ``ts`` is TIMESTAMP_NTZ
and every comparison is NTZ-vs-NTZ or NTZ-vs-INTERVAL.

AS-OF join (``asof_join``): for every left row, the single most recent
right row with ``right.ts <= left.ts`` in the same key group. A naive
formulation is an inequality join — Spark plans BroadcastNestedLoop,
O(n*m) per key, unrunnable at 10^12 events. The composition here is the
classic union trick: tag the sides, ``unionByName`` them, sort each key
group once by (ts, side), and carry the right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window —
ONE shuffle + ONE sort total, O((n+m) log(n+m)) per key, and the
window's running state is a single row. Right rows order BEFORE left
rows at equal ts, giving the standard at-or-before (>=) semantics.

RANGE join (``range_count_join``): count right rows within a trailing
interval of each left row, per key. The naive inequality join is again
nested-loop; the scale path BANDS both sides into fixed-width time
buckets (``F.window(ts, width)`` — epoch-aligned, NTZ-safe), equi-joins
on (key, band) with the left side exploded to the two bands a trailing
window of width <= band can touch, then applies the exact range filter
AFTER the equi-join. Catalyst plans a plain shuffled hash join whose
fan-out is bounded by per-band occupancy, not group size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_payload: Sequence[str] = (),
) -> DataFrame:
    """Left rows + the most recent right row at-or-before each left
    row's ``ts`` within the same ``on`` group (LEFT semantics: no match
    -> nulls). Right payload columns come back prefixed ``asof_``.
    Ties inside the right side must be pre-deduplicated by the caller
    if (on, ts) is not unique there."""
    # The whole right payload rides in ONE struct column carried by a
    # single last(ignorenulls=True): per-column carries would let a NULL
    # field in the matched row fall back to an OLDER right row, mixing
    # fields across rows and masking genuine NULLs. The struct is
    # non-null whenever a right row exists, so NULL fields survive.
    rt = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_asof_payload"),
    )
    lt = left.withColumn("_side", F.lit(1))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(f"_asof_payload.{c}").alias(f"asof_{c}")
            for c in right_payload
        ],
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    width: str = "5 minutes",
) -> DataFrame:
    """left + ``n_in_range`` = count of right rows with
    ``right.ts in (left.ts - width, left.ts]`` per key. ``width`` must
    be a fixed-length interval string (band width == range width)."""
    band = lambda c: F.window(c, width)["start"]  # noqa: E731
    iv = F.expr(f"INTERVAL {width}")
    # right-side columns all renamed up front: post-join drop-by-side is
    # resolution-fragile (a left-join no-match row once surfaced the
    # RIGHT key after drop, splitting groups)
    r = right.select(
        F.col(on).alias("_r_key"),
        F.col(ts).alias("_r_ts"),
        band(ts).alias("_band"),
    )
    # transient per-row id: the final regroup keys on the LEFT ROW, not
    # its column values — without it two identical left rows would
    # collapse into one output row (losing multiplicity). The id never
    # leaves this operator, so its run-to-run instability is invisible.
    l = left.withColumn("_rid", F.monotonically_increasing_id()).withColumn(
        "_probe", F.explode(F.array(band(ts), band(ts) - iv))
    )
    joined = l.join(
        r,
        (F.col(on) == F.col("_r_key")) & (F.col("_probe") == F.col("_band")),
        "left",
    )
    in_range = (F.col("_r_ts") > F.col(ts) - iv) & (
        F.col("_r_ts") <= F.col(ts)
    )
    grp = [F.col(c) for c in left.columns]
    return (
        joined.groupBy(F.col("_rid"), *grp)
        .agg(
            F.count(F.when(in_range, True)).alias("n_in_range")
        )
        .drop("_rid")
    )
