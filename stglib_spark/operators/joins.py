"""Join operators: as-of (nearest / backward / forward, with tolerance)
and the atmospheric-correction join built on it.

The reference has four hard-coded join patterns (SURVEY §2.6), all
time-alignment joins of a big fact series against a small companion
series: met pressure (``utils.py:1386-1414``), salinity/temperature
companion (``reindex_like nearest``, ``utils.py:1947-1954``), brange height
file (nearest within tolerance, ``aqdutils.py:551-557``), per-profile met
lookup (``rsk/cdf2nc.py:188-193``).

Spark-first design, two physical strategies:

- **tolerance given (the engine default)** — time-bucketed equi-join:
  the right side is pre-aggregated into per-bucket sorted arrays
  (bucket = floor(time/tolerance)), the left joins buckets b−1/b/b+1 and
  picks the nearest candidate with array expressions. Shuffle is
  equi-join shaped (broadcastable when the companion is small), left
  rows are never windowed globally — this is the 100 TB path.
- **no tolerance** — UNION + ordered window ("last right row at or
  before t"): exact unbounded-lookback semantics, but the window is
  global when ``by`` is empty, so one partition sees the whole series.
  Kept only for unbounded lookups on bounded data; scale callers must
  pass ``by`` series keys or a tolerance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """As-of join: for each left row, attach the right row's values whose
    time is nearest at-or-before (backward), at-or-after (forward), or
    nearest-either-side (nearest), optionally within a tolerance.

    With a tolerance the search window is ±tolerance and buckets are
    sized to it; without one, buckets are sized adaptively from the right
    side's span and a bucket-level carry (computed over the tiny bucket
    summary table) supplies the "nearest match in some earlier/later
    bucket" fallback — no window ever runs over the fact table.
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c != on and c not in by]
    )
    by = list(by)

    if tolerance_seconds is not None:
        return _asof_join_bucketed(
            left, right, on, by, value_cols, direction,
            float(tolerance_seconds), suffix,
        )
    return _asof_join_unbounded(
        left, right, on, by, value_cols, direction, suffix
    )


def _asof_join_unbounded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    direction: str,
    suffix: str,
) -> DataFrame:
    """Unbounded as-of as bucketed join + bucket-level carry.

    1. Bucket both sides on an adaptive width (right-side span / ~8×
       parallelism — one tiny agg job at plan build).
    2. Right side → per (by, bucket) sorted candidate array, plus a
       bucket summary (first/last struct per bucket).
    3. Carry: union the summary bucket keys with the left side's distinct
       bucket keys (small: O(#buckets)), window over THAT table to find
       each bucket's last-preceding / first-following right struct. The
       only unbounded window in the plan runs over this summary table —
       thousands of rows — never over the fact rows.
    4. Left rows equi-join their bucket's array + carry; in-bucket
       candidates win by construction (they're strictly nearer than any
       carried struct on that side).
    """
    stats = right.select(
        F.min(on).alias("t0"), F.max(on).alias("t1"), F.count(F.lit(1)).alias("n")
    ).first()
    result_left = [F.col(c) for c in left.columns]
    if stats["n"] == 0:
        nulls = [
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ]
        return left.select(*result_left, *nulls)
    span = max(
        (stats["t1"] - stats["t0"]).total_seconds()
        if hasattr(stats["t1"] - stats["t0"], "total_seconds")
        else float(stats["t1"] - stats["t0"]),
        0.0,
    )
    parallelism = left.sparkSession.sparkContext.defaultParallelism
    # bucket count scales with BOTH parallelism and right-side density:
    # candidate selection is an interpreted array filter per left row, so
    # the per-bucket array must stay small — targeting ~8 right rows per
    # bucket cut the sf1 as-of query 2× (the parallelism-only width left
    # ~340-element arrays → hundreds of millions of interpreted struct
    # compares). The bucket summary stays O(#buckets), far below fact
    # cardinality, so the carry window is still cheap.
    n_buckets = max(parallelism * 8, int(stats["n"] / 8) or 1)
    width = max(span / n_buckets, 1e-6)

    def bucket(t: Column) -> Column:
        return F.floor(t.cast("double") / F.lit(width)).cast("long")

    rstruct = F.struct(
        F.col(on).alias("__rt"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    rb = (
        right.select(*[F.col(c) for c in by], F.col(on), rstruct.alias("__s"))
        .withColumn("__bk", bucket(F.col(on)))
        .groupBy(*[F.col(c) for c in by], F.col("__bk"))
        .agg(
            F.sort_array(F.collect_list("__s")).alias("__arr"),
            F.min("__s").alias("__first"),
            F.max("__s").alias("__last"),
        )
    )
    arr_type = rb.schema["__arr"].dataType

    # bucket-key universe: every bucket either side touches
    lkeys = (
        left.select(*[F.col(c) for c in by], bucket(F.col(on)).alias("__bk"))
        .distinct()
    )
    keys = lkeys.unionByName(
        rb.select(*[F.col(c) for c in by], F.col("__bk"))
    ).distinct()
    summaries = keys.join(
        rb.select(*[F.col(c) for c in by], "__bk", "__first", "__last"),
        [*by, "__bk"],
        "left",
    )
    w_prev = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy("__bk")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = summaries.select(
        *[F.col(c) for c in by],
        "__bk",
        F.last("__last", ignorenulls=True).over(w_prev).alias("__carry_back"),
        F.first("__first", ignorenulls=True).over(w_next).alias("__carry_fwd"),
    )

    out = (
        left.withColumn("__bk", bucket(F.col(on)))
        .join(rb.select(*[F.col(c) for c in by], "__bk", "__arr"), [*by, "__bk"], "left")
        .join(carry, [*by, "__bk"], "left")
    )
    cand = F.coalesce(F.col("__arr"), F.array().cast(arr_type))
    t = F.col(on).cast("double")
    in_back = F.array_max(F.filter(cand, lambda x: x["__rt"].cast("double") <= t))
    in_fwd = F.array_min(F.filter(cand, lambda x: x["__rt"].cast("double") >= t))
    back = F.coalesce(in_back, F.col("__carry_back"))
    fwd = F.coalesce(in_fwd, F.col("__carry_fwd"))

    if direction == "backward":
        picked = back
    elif direction == "forward":
        picked = fwd
    elif direction == "nearest":
        bdist = t - back["__rt"].cast("double")
        fdist = fwd["__rt"].cast("double") - t
        picked = F.when(
            back.isNotNull() & (fwd.isNull() | (bdist <= fdist)), back
        ).otherwise(fwd)
    else:
        raise ValueError(f"unknown direction {direction!r}")

    return out.select(
        *result_left,
        *[picked[f"__rv_{c}"].alias(f"{c}{suffix}") for c in value_cols],
    )


def _asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    direction: str,
    tol: float,
    suffix: str,
) -> DataFrame:
    """Tolerance-bounded as-of join as a time-bucketed equi-join.

    Right rows are collected into one sorted array per (by, bucket) with
    bucket = floor(t/tol); any candidate within ±tol of a left row lives
    in the left row's bucket or an adjacent one, so three equi-joins
    (b−1, b, b+1) cover the search window. Candidate selection is pure
    array expressions. Per-bucket arrays are bounded by tol × the right
    side's sample rate — the companion series by construction (SURVEY
    §2.6: met/salinity/brange lookups).
    """

    def bucket(t: Column) -> Column:
        return F.floor(t.cast("double") / F.lit(tol)).cast("long")

    rstruct = F.struct(
        F.col(on).alias("__rt"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    rb = (
        right.select(*[F.col(c) for c in by], F.col(on), rstruct.alias("__s"))
        .withColumn("__bk", bucket(F.col(on)))
        .groupBy(*[F.col(c) for c in by], F.col("__bk"))
        .agg(F.sort_array(F.collect_list("__s")).alias("__arr"))
    )
    arr_type = rb.schema["__arr"].dataType

    out = left.withColumn("__bk", bucket(F.col(on)))
    for i, d in enumerate((-1, 0, 1)):
        shifted = rb.select(
            *[F.col(c) for c in by],
            (F.col("__bk") + F.lit(d)).alias("__bk"),
            F.col("__arr").alias(f"__arr_{i}"),
        )
        out = out.join(shifted, [*by, "__bk"], "left")

    empty = F.array().cast(arr_type)
    cand = F.concat(
        *[F.coalesce(F.col(f"__arr_{i}"), empty) for i in range(3)]
    )
    t = F.col(on).cast("double")

    def rt(x: Column) -> Column:
        return x["__rt"].cast("double")

    back = F.array_max(
        F.filter(cand, lambda x: (rt(x) <= t) & (t - rt(x) <= F.lit(tol)))
    )
    fwd = F.array_min(
        F.filter(cand, lambda x: (rt(x) >= t) & (rt(x) - t <= F.lit(tol)))
    )
    if direction == "backward":
        picked = back
    elif direction == "forward":
        picked = fwd
    elif direction == "nearest":
        bdist = t - back["__rt"].cast("double")
        fdist = fwd["__rt"].cast("double") - t
        picked = F.when(
            back.isNotNull() & (fwd.isNull() | (bdist <= fdist)), back
        ).otherwise(fwd)
    else:
        raise ValueError(f"unknown direction {direction!r}")

    result_cols = [F.col(c) for c in left.columns] + [
        picked[f"__rv_{c}"].alias(f"{c}{suffix}") for c in value_cols
    ]
    return out.select(*result_cols)


def atmos_correct(
    df: DataFrame,
    met: DataFrame,
    config: dict | None = None,
    pressure_col: str = "P_1",
    atmpres_col: str = "atmpres",
    time_col: str = "time",
    tolerance_seconds: float | None = 600.0,
    out_col: str = "P_1ac",
) -> DataFrame:
    """``P_1ac = P_1 − atmpres(t) − offset`` with the met series aligned
    by nearest-time within tolerance (utils.py:1386-1414; the legacy
    10-minute reindex tolerance at utils.py:1405-1412).
    """
    offset = float((config or {}).get("atmpres_offset", 0.0))
    joined = asof_join(
        df,
        met.select(time_col, atmpres_col),
        on=time_col,
        direction="nearest",
        tolerance_seconds=tolerance_seconds,
    )
    return joined.withColumn(
        out_col, F.col(pressure_col) - F.col(atmpres_col) - F.lit(offset)
    )
