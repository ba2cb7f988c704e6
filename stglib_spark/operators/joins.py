"""Join operators: as-of (nearest / backward / forward, with tolerance)
and the atmospheric-correction join built on it.

The reference has four hard-coded join patterns (SURVEY §2.6), all
time-alignment joins of a big fact series against a small companion
series: met pressure (``utils.py:1386-1414``), salinity/temperature
companion (``reindex_like nearest``, ``utils.py:1947-1954``), brange height
file (nearest within tolerance, ``aqdutils.py:551-557``), per-profile met
lookup (``rsk/cdf2nc.py:188-193``).

Spark-first design: the as-of join is implemented as a UNION + ordered
window ("last right row at or before t"), which is a single sort-merge
pass per series partition — no O(n·m) range explosion, no driver
collect, and it scales to both sides being large (100 TB fact vs
multi-GB companion). When the right side is small Spark's AQE will
already have broadcast the union input's partitions cheaply.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


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

    Single-pass union + window implementation:
      1. tag sides, union on (by, on, right value cols),
      2. per (by) partition ordered by (on, side) compute
         ``last(value, ignorenulls=True)`` / ``first(...)`` over the
         running frame → backward/forward candidates and their times,
      3. keep only left rows; pick candidate per direction; null out
         candidates beyond tolerance.
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c != on and c not in by]
    )
    by = list(by)

    lhs = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(f"__rv_{c}", F.lit(None).cast(right.schema[c].dataType))
    lhs = lhs.withColumn("__rt", F.lit(None).cast(right.schema[on].dataType))

    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0)).withColumn("__rt", F.col(on))
    for c in left.columns:
        if c not in by and c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort before left rows at identical time → "at or before"
    w_back = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(0, Window.unboundedFollowing)
    )

    out = unioned
    for c in value_cols:
        out = out.withColumn(f"__b_{c}", F.last(f"__rv_{c}", ignorenulls=True).over(w_back))
        out = out.withColumn(f"__f_{c}", F.first(f"__rv_{c}", ignorenulls=True).over(w_fwd))
    out = out.withColumn("__bt", F.last("__rt", ignorenulls=True).over(w_back))
    out = out.withColumn("__ft", F.first("__rt", ignorenulls=True).over(w_fwd))

    out = out.filter(F.col("__side") == 1)

    t = F.col(on).cast("double")
    bdist = t - F.col("__bt").cast("double")
    fdist = F.col("__ft").cast("double") - t

    def within(dist):
        if tolerance_seconds is None:
            return F.lit(True)
        return dist <= F.lit(float(tolerance_seconds))

    result_cols = [F.col(c) for c in left.columns]
    for c in value_cols:
        back_ok = F.col("__bt").isNotNull() & within(bdist)
        fwd_ok = F.col("__ft").isNotNull() & within(fdist)
        if direction == "backward":
            picked = F.when(back_ok, F.col(f"__b_{c}"))
        elif direction == "forward":
            picked = F.when(fwd_ok, F.col(f"__f_{c}"))
        elif direction == "nearest":
            picked = (
                F.when(
                    back_ok & (~fwd_ok | (bdist <= fdist)), F.col(f"__b_{c}")
                ).when(fwd_ok, F.col(f"__f_{c}"))
            )
        else:
            raise ValueError(f"unknown direction {direction!r}")
        result_cols.append(picked.alias(f"{c}{suffix}"))
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
