"""Directional wave spectra operator — DIWASP per burst, distributed.

Reference flow: ``stglib/core/waves.py`` — inputs builder (:15-126),
per-burst wrapper make_diwasp_dict (:309-568), dask Client fan-out with
one future per burst (:263-306 — the reference's ONLY process-parallel
axis), assembler make_diwasp_ds (:135-260), mean wave direction make_mwd
(:912-933), EPIC renames (Hs→wh_4061, Tp→wp_peak, DTp→wvdir, Dp→dwvdir,
Dm→wd_4062).

Spark-first: the dask Client is replaced by a shuffle on the burst key +
``applyInPandas`` — identical embarrassing parallelism, but elastic to
cluster size and with Arrow-batched transfer. Input selection per burst
('optimized': AST when clean else pressure, waves.py:391-453) happens
inside the kernel and is recorded in the ``diwasp_type`` column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from stglib_spark.session import pin_grouping
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from stglib_spark.functions.diwasp import dirspec


def make_mwd(freqs: np.ndarray, dirs_deg: np.ndarray, dspec: np.ndarray) -> float:
    """Mean wave direction Dm (EPIC 4062) from the directional spectrum
    (waves.py:912-933): double-integrated sin/cos with quadrant-corrected
    arctan."""
    dirs = np.radians(dirs_deg)
    sx = np.trapz(np.trapz(dspec * np.sin(dirs)[None, :], dirs, axis=1), freqs)
    cx = np.trapz(np.trapz(dspec * np.cos(dirs)[None, :], dirs, axis=1), freqs)
    if cx == 0:
        # due east / due west depending on the sine term's sign
        return 90.0 if sx >= 0 else 270.0
    dm = np.degrees(np.arctan(np.abs(sx / cx)))
    if sx > 0 and cx < 0:
        dm = 180 - dm
    elif sx < 0 and cx < 0:
        dm = 180 + dm
    elif sx < 0 and cx > 0:
        dm = 360 - dm
    return float(dm)


def diwasp_schema(burst_col: str = "burst_time") -> StructType:
    return StructType(
        [
            StructField(burst_col, TimestampType()),
            StructField("diwasp_frequency", ArrayType(DoubleType())),
            StructField("diwasp_direction", ArrayType(DoubleType())),
            StructField("diwasp_fspec", ArrayType(DoubleType())),
            StructField("diwasp_dspec", ArrayType(ArrayType(DoubleType()))),
            StructField("wh_4061", DoubleType()),
            StructField("wp_peak", DoubleType()),
            StructField("wvdir", DoubleType()),
            StructField("dwvdir", DoubleType()),
            StructField("wd_4062", DoubleType()),
            StructField("diwasp_type", StringType()),
        ]
    )


def make_diwasp_ds(
    df: DataFrame,
    config: dict,
    burst_col: str = "burst_time",
    sample_col: str = "sample",
    pressure_col: str = "P_1ac",
    u_col: str = "u_1205",
    v_col: str = "v_1206",
    ast_col: str | None = None,
) -> DataFrame:
    """Distributed directional wave spectra: one dirspec per burst.

    Config keys mirror the reference's (doc/config.rst:118-137):
    ``diwasp`` data type (puv/suv/pres/elev/optimized), ``diwasp_method``
    (IMLM/DFTM), ``diwasp_nfft``, ``diwasp_iter``, ``diwasp_dres``,
    ``wave_interval``, sensor heights.
    """
    fs = 1.0 / float(config.get("sample_interval", 1.0))
    # is-not-None chains: a sensor height of 0.0 (at the bed) is valid
    zp = config.get("pressure_sensor_height")
    if zp is None:
        zp = config.get("initial_instrument_height")
    zp = float(zp) if zp is not None else 0.0
    zuv = config.get("velocity_sample_volume_height")
    zuv = float(zuv) if zuv is not None else zp
    method = str(config.get("diwasp_method", "IMLM"))
    nfft = config.get("diwasp_nfft")
    miter = int(config.get("diwasp_iter", 50))
    dres = int(config.get("diwasp_dres", 90))
    data_type = str(config.get("diwasp", "puv"))
    nfreqs = int(config.get("diwasp_nfreqs", 32))
    ndirs = int(config.get("diwasp_ndirs", 36))
    # reference default EP['smooth']='ON', overridable via diwasp_smooth
    # (core/waves.py:28,54-55)
    smooth = str(config.get("diwasp_smooth", "ON")).upper() == "ON"

    cols = [burst_col, sample_col, pressure_col, u_col, v_col]
    if ast_col:
        cols.append(ast_col)
    slim = df.select(*cols)
    schema = diwasp_schema(burst_col)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bt, grp in pdf.groupby(burst_col, sort=True):
            grp = grp.sort_values(sample_col)
            p = grp[pressure_col].to_numpy(dtype=float)
            u = grp[u_col].to_numpy(dtype=float)
            v = grp[v_col].to_numpy(dtype=float)
            ast = grp[ast_col].to_numpy(dtype=float) if ast_col else None
            if len(p) < 64:
                continue

            dtype_used = data_type
            if data_type == "optimized":
                dtype_used = (
                    "suv" if ast is not None and not np.isnan(ast).any() else "puv"
                )
            if dtype_used in ("puv", "pres") and np.isnan(p).any():
                idx = np.arange(len(p))
                good = np.isfinite(p)
                if good.mean() < 0.9:
                    continue
                p = np.interp(idx, idx[good], p[good])
            u = np.nan_to_num(u)
            v = np.nan_to_num(v)

            # nanmean: pressure is only gap-filled for the puv/pres data
            # types; an AST-selected burst may still carry NaN pressure
            depth = float(np.nanmean(p)) + zp
            if dtype_used == "puv":
                data = np.column_stack([p, u, v])
                datatypes = ["pres", "velx", "vely"]
                layout = np.array([[0.0, 0, 0], [0.0, 0, 0], [zp, zuv, zuv]])
            elif dtype_used == "suv":
                data = np.column_stack([ast, u, v])
                datatypes = ["elev", "velx", "vely"]
                layout = np.array([[0.0, 0, 0], [0.0, 0, 0], [depth, zuv, zuv]])
            elif dtype_used == "pres":
                data = p[:, None]
                datatypes = ["pres"]
                layout = np.array([[0.0], [0.0], [zp]])
            elif dtype_used == "elev":
                data = ast[:, None]
                datatypes = ["elev"]
                layout = np.array([[0.0], [0.0], [depth]])
            else:
                raise ValueError(f"unknown diwasp data type {dtype_used}")

            nyq = fs / 2.0
            freqs_out = np.linspace(nyq / nfreqs, nyq * 0.95, nfreqs)
            dirs_out = np.arange(0.0, 360.0, 360.0 / ndirs)
            try:
                res = dirspec(
                    data,
                    datatypes,
                    layout,
                    depth,
                    fs,
                    freqs_out,
                    dirs_out,
                    method=method,
                    nfft=int(nfft) if nfft else None,
                    dres=dres,
                    miter=miter,
                    smooth=smooth,
                )
            except Exception:
                continue
            dm = make_mwd(res["freqs"], res["dirs_deg"], res["S"])
            rows.append(
                {
                    burst_col: bt,
                    "diwasp_frequency": res["freqs"].tolist(),
                    "diwasp_direction": res["dirs_deg"].tolist(),
                    "diwasp_fspec": res["fspec"].tolist(),
                    "diwasp_dspec": [row.tolist() for row in res["S"]],
                    "wh_4061": res["hs"],
                    "wp_peak": res["tp"],
                    "wvdir": res["dtp_deg"],
                    "dwvdir": res["dp_deg"],
                    "wd_4062": dm,
                    "diwasp_type": dtype_used,
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                burst_col,
                "diwasp_frequency",
                "diwasp_direction",
                "diwasp_fspec",
                "diwasp_dspec",
                "wh_4061",
                "wp_peak",
                "wvdir",
                "dwvdir",
                "wd_4062",
                "diwasp_type",
            ],
        )

    return pin_grouping(slim, burst_col).groupBy(burst_col).applyInPandas(apply_fn, schema)
