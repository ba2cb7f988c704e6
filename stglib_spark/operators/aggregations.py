"""Aggregation operators: burst/interval averaging, gated means, circular
means, min/max attrs, boundary detection.

Reference semantics:
- ``average_burst`` — mean over the sample dim (``aqd/aqdutils.py:1717-1740``).
- ``ds_mean_count_minf`` — mean gated on a minimum valid fraction
  (``core/utils.py:2044-2086``): if count(valid) < minf·n → null.
- vector (circular) mean of angles (``utils.py:1907-1923``).
- interval averaging with duration subsetting (``mar.py:259-331``,
  ``sig/cdf2nc.py:320-379``): average only the first D seconds of each
  interval window.
- ``add_min_max`` per-variable min/max (``utils.py:183-235``).
- ``brange`` boundary detection: argmax of amplitude over bins
  (``sig/cdf2nc.py:1728-1777``) → ``max_by``.

All are single groupBy aggregations → map-side partial aggregation +
one shuffle on the group key; at 100 TB this is the minimal-movement plan.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def mean_minf(value: Column, minf: float, n: Column | int) -> Column:
    """Mean gated on minimum valid fraction (utils.py:2044-2086):
    null unless count(valid) >= int(n * minf) — the reference truncates
    the threshold to an integer (min_count, utils.py:2067)."""
    n_col = F.lit(n) if isinstance(n, int) else n
    min_count = F.floor(F.lit(float(minf)) * n_col)
    return F.when(F.count(value) >= min_count, F.avg(value)).otherwise(F.lit(None))


def circular_mean_deg(angle_deg: Column) -> Column:
    """Vector mean of angles in degrees → [0, 360) (utils.py:1907-1923):
    atan2(mean sin, mean cos), wrapped positive."""
    rad = F.radians(angle_deg)
    mean_deg = F.degrees(F.atan2(F.avg(F.sin(rad)), F.avg(F.cos(rad))))
    return (mean_deg + 360.0) % 360.0


def average_burst(
    df: DataFrame,
    burst_cols: Sequence[str],
    value_cols: Sequence[str],
    minf: float | None = None,
    expected_n: int | None = None,
) -> DataFrame:
    """Mean over the sample dim per burst (aqdutils.py:1717-1740), with the
    optional min-valid-fraction gate of utils.py:2044-2086. Integer input
    columns are re-cast to their original type after the mean, matching
    the reference's dtype restore (aqdutils.py:1731-1735)."""
    int_types = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(df.dtypes)
    aggs = []
    for v in value_cols:
        c = F.col(v)
        agg = (
            mean_minf(c, minf, expected_n)
            if minf is not None and expected_n is not None
            else F.avg(c)
        )
        if dtypes.get(v) in int_types:
            agg = agg.cast(dtypes[v])
        aggs.append(agg.alias(v))
    return df.groupBy(*[F.col(c) for c in burst_cols]).agg(*aggs)


def interval_average(
    df: DataFrame,
    time_col: str,
    interval_seconds: int,
    duration_seconds: int | None,
    value_cols: Sequence[str],
    series_cols: Sequence[str] = (),
    minf: float | None = None,
    expected_n: int | None = None,
    origin_epoch_seconds: float | None = None,
    poison: bool = False,
    vector_cols: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-interval average, restricted to the first
    ``duration_seconds`` of each interval (mar.py:259-331,
    sig/cdf2nc.py:320-379). The duration restriction is a filter inside the
    window, not a second pass.

    Reference-fidelity knobs (r14 — the mar/sig variants differ):

    - ``origin_epoch_seconds``: tile windows from the record's first
      timestamp instead of the epoch — mar.py:268-274 builds its
      date_range from ``ds.time[0]``, so a deployment that starts
      mid-interval gets t0-aligned windows, not clock-aligned ones.
    - ``expected_n``: the a-priori samples-per-interval (interval·rate,
      or duration·rate). With ``minf``, the valid-count gate compares
      against ``int(minf · expected_n)`` — sig/cdf2nc.py:341/360 gates
      on the FIXED per-burst sample count (the reference gap-fills
      first so every interval has the full slot count), not on the
      interval's own row count. Without it the legacy
      fraction-of-own-rows gate applies (irregular series).
    - ``poison``: mar.py:279-315 ``avg_cont`` semantics — the record is
      NaN-padded to whole intervals and averaged with plain ``np.mean``
      (not nanmean), so an incomplete final interval or any nulled
      sample inside the averaged slice yields a NULL row (emitted, not
      dropped). Implemented as ``when(count(v) == expected_n, avg(v))``;
      requires ``expected_n``.
    - ``vector_cols``: attitude variables vector-averaged instead
      (utils.py:1907-1923 make_vector_average_vars — xarray skipna
      means of the unit vectors, result in (−180, 180]; sig wraps ONLY
      Hdg_1215 to [0, 360) afterwards, cdf2nc.py:350 — that wrap is
      the caller's).
    """
    if poison and expected_n is None:
        raise ValueError("poison=True requires expected_n")
    start_clause = "0 seconds"
    if origin_epoch_seconds is not None:
        off_ms = int(
            round((float(origin_epoch_seconds) % float(interval_seconds)) * 1000)
        )
        start_clause = f"{off_ms} milliseconds"
    win = F.window(
        F.col(time_col),
        f"{int(interval_seconds)} seconds",
        f"{int(interval_seconds)} seconds",
        start_clause,
    )
    out = df.withColumn("__win", win)
    if duration_seconds is not None:
        in_dur = (
            F.col(time_col).cast("double") - F.col("__win.start").cast("double")
        ) < F.lit(float(duration_seconds))
        out = out.filter(in_dur)
    aggs = []
    for v in value_cols:
        c = F.col(v)
        if v in vector_cols:
            rad = F.radians(c)
            aggs.append(
                F.degrees(
                    F.atan2(F.avg(F.sin(rad)), F.avg(F.cos(rad)))
                ).alias(v)
            )
        elif poison:
            aggs.append(
                F.when(F.count(c) == F.lit(int(expected_n)), F.avg(c)).alias(v)
            )
        elif minf is not None and expected_n is not None:
            aggs.append(
                F.when(
                    F.count(c) >= F.lit(int(float(minf) * int(expected_n))),
                    F.avg(c),
                ).otherwise(F.lit(None)).alias(v)
            )
        elif minf is not None:
            # expected samples unknown a priori in irregular series: gate on
            # fraction of the interval's own row count (null values count
            # against the fraction, matching ds_mean_count_minf)
            aggs.append(
                F.when(
                    F.count(c) >= F.lit(float(minf)) * F.count(F.lit(1)), F.avg(c)
                ).otherwise(F.lit(None)).alias(v)
            )
        else:
            aggs.append(F.avg(c).alias(v))
    return (
        out.groupBy(*[F.col(c) for c in series_cols], F.col("__win"))
        .agg(*aggs)
        .withColumn(time_col, F.col("__win.start"))
        .drop("__win")
    )


def add_min_max(df: DataFrame, value_cols: Sequence[str]) -> dict[str, tuple]:
    """Per-variable (min, max) in one aggregation pass (utils.py:183-235);
    destined for column metadata / sidecar attrs."""
    aggs = []
    for v in value_cols:
        aggs.append(F.min(v).alias(f"{v}__min"))
        aggs.append(F.max(v).alias(f"{v}__max"))
    row = df.agg(*aggs).collect()[0].asDict()
    return {v: (row[f"{v}__min"], row[f"{v}__max"]) for v in value_cols}


def brange_from_profile(
    df: DataFrame,
    time_col: str = "time",
    bindist_col: str = "bindist",
    amp_col: str = "amp",
    blank_dist: float = 0.0,
) -> DataFrame:
    """Distance to boundary = bindist of the max-amplitude bin beyond the
    blanking distance (sig/cdf2nc.py:1728-1777): ``max_by`` per time."""
    return (
        df.filter(F.col(bindist_col) > F.lit(float(blank_dist)))
        .groupBy(time_col)
        .agg(F.max_by(F.col(bindist_col), F.col(amp_col)).alias("brange"))
    )


def linregress_agg(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Closed-form least squares slope/intercept/r (indexvel.py:120-134's
    scipy.linregress as one aggregation): slope = cov/var, r = corr."""
    x, y = F.col(x_col), F.col(y_col)
    return df.agg(
        (F.covar_samp(x, y) / F.var_samp(x)).alias("slope"),
        (F.avg(y) - F.covar_samp(x, y) / F.var_samp(x) * F.avg(x)).alias("intercept"),
        F.corr(x, y).alias("rvalue"),
        F.count(F.lit(1)).alias("n"),
    )


def top_third_mean_threshold(
    df: DataFrame, value_col: str, factor: float = 0.85
) -> float:
    """Data-derived AST quality threshold (sig/cdf2nc.py:1808-1830): mean
    of the top third of values × factor. Two-pass: percentile then
    conditional mean."""
    p67 = df.agg(
        F.percentile_approx(F.col(value_col), 2.0 / 3.0, 10000).alias("p")
    ).collect()[0]["p"]
    m = df.filter(F.col(value_col) >= F.lit(p67)).agg(F.avg(value_col)).collect()[0][0]
    return float(m) * factor
