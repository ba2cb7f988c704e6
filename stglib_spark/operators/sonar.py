"""Imagenex sonar polar→cartesian resampling.

Reference: ``stglib/son/nc2xy.py:60-125`` (``convert_to_xy``) — per time
step the sweep image on its (theta, horizontal-range) polar grid is
re-sampled onto a square x/y grid: build the grid, convert to polar
(compass convention: north up, clockwise), sort theta ascending, drop NaN
ranges, bilinear-interpolate (scipy RegularGridInterpolator,
bounds_error=False → NaN outside the hull).

Spark-first: each time step is independent — ``applyInPandas`` per time
key, exactly the per-burst parallelism pattern of the wave stack. The
interpolator is re-implemented with plain NumPy searchsorted + bilinear
weights (scipy is not a dependency); long-form output (time, x, y, value)
so downstream ops stay relational.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from stglib_spark.session import pin_grouping
from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
    TimestampType,
)


def _interp_regular_2d(
    tg: np.ndarray, rg: np.ndarray, theta: np.ndarray, rng: np.ndarray, img: np.ndarray
) -> np.ndarray:
    """Bilinear interpolation of img[theta, rng] at scattered (tg, rg)
    points; NaN outside the grid hull (RegularGridInterpolator with
    bounds_error=False, fill_value=nan)."""
    out = np.full(tg.shape, np.nan)
    ok = (
        (tg >= theta[0]) & (tg <= theta[-1]) & (rg >= rng[0]) & (rg <= rng[-1])
    )
    if not ok.any():
        return out
    t, r = tg[ok], rg[ok]
    it = np.clip(np.searchsorted(theta, t) - 1, 0, len(theta) - 2)
    ir = np.clip(np.searchsorted(rng, r) - 1, 0, len(rng) - 2)
    wt = (t - theta[it]) / (theta[it + 1] - theta[it])
    wr = (r - rng[ir]) / (rng[ir + 1] - rng[ir])
    v00 = img[it, ir]
    v01 = img[it, ir + 1]
    v10 = img[it + 1, ir]
    v11 = img[it + 1, ir + 1]
    out[ok] = (
        v00 * (1 - wt) * (1 - wr)
        + v01 * (1 - wt) * wr
        + v10 * wt * (1 - wr)
        + v11 * wt * wr
    )
    return out


def polar_to_xy(
    df: DataFrame,
    total_range: float,
    dxy: float,
    time_col: str = "time",
    theta_col: str = "theta_deg",
    range_col: str = "horz_rng",
    value_col: str = "amp",
) -> DataFrame:
    """Long-form polar sweep rows (time, theta_deg, horz_rng, amp) → long
    cartesian image rows (time, x, y, sonar_image).

    Per reference: x = y = arange(−R, R+dxy, dxy); grid theta =
    (−degrees(atan2(y,x)) + 90) mod 360 (compass), rho = hypot; theta
    sorted ascending; NaN ranges dropped; bilinear resample, NaN outside.
    """
    schema = StructType(
        [
            StructField(time_col, TimestampType()),
            StructField("x", DoubleType()),
            StructField("y", DoubleType()),
            StructField("sonar_image", DoubleType()),
        ]
    )
    axis = np.arange(-total_range, total_range + dxy, dxy)
    xg, yg = np.meshgrid(axis, axis)
    theta_grid = (-np.degrees(np.arctan2(yg, xg)) + 90.0) % 360.0
    rho_grid = np.hypot(xg, yg)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = pdf[time_col].iloc[0]
        # pivot long rows → dense (theta, range) image
        piv = pdf.pivot_table(
            index=theta_col, columns=range_col, values=value_col, aggfunc="first"
        ).sort_index()
        theta = piv.index.to_numpy(dtype=float)
        rng = piv.columns.to_numpy(dtype=float)
        img = piv.to_numpy(dtype=float)
        keep = ~np.isnan(rng)
        rng, img = rng[keep], img[:, keep]
        new_img = _interp_regular_2d(theta_grid, rho_grid, theta, rng, img)
        return pd.DataFrame(
            {
                time_col: t0,
                "x": np.broadcast_to(xg.ravel(), new_img.size),
                "y": yg.ravel(),
                "sonar_image": new_img.ravel(),
            }
        )

    slim = df.select(time_col, theta_col, range_col, value_col)
    return (
        pin_grouping(slim, time_col)
        .groupBy(time_col)
        .applyInPandas(apply_fn, schema)
    )
