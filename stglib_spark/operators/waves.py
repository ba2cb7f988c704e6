"""Wave statistics — Welch PSD per burst → dispersion → pressure
transfer → elevation spectra → Jones & Monismith cutoff → f⁻⁴ tail →
spectral moments → Hs/Tm/Tp.

Reference semantics: ``stglib/core/waves.py`` — ``make_waves_ds``
(:571-681), ``pressure_spectra`` (:746-770, scipy.welch hann
nperseg=next_pow2(nsamps/nsegs), nsegs default 16), ``elevation_spectra``
(:773-775, Pnn = Pxx/Kp²), ``transfer_function`` (:778-803),
``define_cutoff`` (:806-864, noise floor 12×mean of top-(1−noise) band;
1.1·f_peak; Kp>0.1), ``make_user_cutoff`` (:2117-2152), ``make_tail``
(:867-897), moments/stats (:936-961: m_n = ∫Pnn·fⁿ df trapezoid,
Hs = 4√m0, Tm = √(m0/m2), Tp = 1/f_peak with 0-frequency guarded).

Spark-first design: one ``applyInPandas`` over the burst key computes the
whole per-burst spectral chain batch-vectorized in NumPy (the FFT-class
math that genuinely needs Python — SURVEY §7.1); each Arrow batch carries
MANY bursts so the per-burst loop runs inside one vectorized kernel. This
is exactly the reference's one parallel axis (its dask Client fans out one
future per burst, core/waves.py:263-306) — here Spark's shuffle gives the
same embarrassing parallelism across executors for free, scaling linearly
with cluster size at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
    TimestampType,
)

from stglib_spark.functions.signal import next_power_of_2, welch_psd

G = 9.81


def qkfs_np(omega: np.ndarray, h: float) -> np.ndarray:
    """Dispersion ω,h → k (Wiberg & Sherwood 2009; core/waves.py:988-1007):
    3 Newton iterations from kh₀ = √x (x<1) else x."""
    with np.errstate(invalid="ignore", divide="ignore"):
        x = omega**2 * h / G
        y = np.sqrt(x) * (x < 1) + x * (x >= 1)
        for _ in range(3):
            t = np.tanh(y)
            y = y - ((y * t - x) / (t + y * (1 - t**2)))
        return y / h


def define_cutoff_np(
    f: np.ndarray, pxx: np.ndarray, kp: np.ndarray, noise: float = 0.9
) -> float:
    """Jones & Monismith (2007) tail index (core/waves.py:806-864).
    Returns NaN when no valid cutoff exists (burst becomes all-NaN
    spectra, matching make_tail's NaN branch)."""
    noisecut = 12.0 * np.mean(pxx[f >= noise * f[-1]])
    above = np.where(pxx > noisecut)[0]
    noisecutind = above[-1] if len(above) else 0
    fpeakcut = 1.1 * f[np.argmax(pxx)]
    fpeakcutind = int(np.searchsorted(f, fpeakcut))
    kp_ok = np.nonzero(kp > 0.1)[0]
    kpcutind = (kp_ok[-1] + 1) if len(kp_ok) else 0
    if noisecutind > fpeakcutind and noisecutind <= kpcutind:
        return float(noisecutind)
    elif noisecutind > fpeakcutind and noisecutind > kpcutind:
        return float(kpcutind)
    return float("nan")


def make_user_cutoff_np(
    f: np.ndarray, kp: np.ndarray, fcut: float | None = None, kpmin: float | None = None
) -> float:
    """User cutoff override (core/waves.py:2117-2152): index of wave_fcut
    in f, or last index with Kp >= kpmin (kpmin validated into [0.1, 0.6])."""
    if fcut is not None:
        return float(np.searchsorted(f, fcut))
    kpmin = min(max(float(kpmin), 0.1), 0.6)
    ok = np.nonzero(kp >= kpmin)[0]
    return float(ok[-1] + 1) if len(ok) else float("nan")


def make_tail_np(f: np.ndarray, pnn: np.ndarray, tailind: float) -> np.ndarray:
    """Splice an f⁻⁴ tail above tailind (core/waves.py:867-897)."""
    if np.isnan(tailind):
        return np.full_like(f, np.nan)
    ti = int(tailind)
    out = pnn.copy()
    if ti < len(f):
        with np.errstate(divide="ignore", invalid="ignore"):
            out[ti:] = pnn[ti] * (f[ti:] / f[ti]) ** -4
        if f[ti] == 0:
            out[ti:] = np.nan
    return out


def burst_wave_stats_kernel(
    pdf: pd.DataFrame,
    sample_rate: float,
    sensor_height: float,
    nsegs: int = 16,
    noise: float = 0.9,
    fcut: float | None = None,
    kpmin: float | None = None,
    burst_col: str = "burst_time",
    pressure_col: str = "P_1ac",
    sample_col: str = "sample",
) -> pd.DataFrame:
    """Per-burst spectral chain on a pandas batch (possibly many bursts)."""
    rows = []
    for bt, grp in pdf.groupby(burst_col, sort=True):
        grp = grp.sort_values(sample_col)
        p = grp[pressure_col].to_numpy(dtype=float)
        if len(p) < 8 or np.isnan(p).all():
            continue
        # NaN pre-fill within burst (waves.py:1992-2034 nearest fill):
        if np.isnan(p).any():
            idx = np.arange(len(p))
            good = np.isfinite(p)
            if good.mean() < 0.9:  # >10% NaN → reject burst (reference gate)
                continue
            p = np.interp(idx, idx[good], p[good])
        nsamps = len(p)
        nfft = max(next_power_of_2(int(nsamps / nsegs)), 8)
        f, pxx = welch_psd(p, fs=sample_rate, nperseg=nfft)
        h = float(np.mean(p)) + sensor_height  # depth = mean pressure + z
        k = qkfs_np(2 * np.pi * f, h)
        with np.errstate(invalid="ignore", over="ignore"):
            kp = np.cosh(k * sensor_height) / np.cosh(k * h)
        kp[np.isnan(k)] = 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            pnn = pxx / kp**2
        if fcut is not None or kpmin is not None:
            tailind = make_user_cutoff_np(f, kp, fcut, kpmin)
        else:
            tailind = define_cutoff_np(f, pxx, kp, noise)
        pspec = make_tail_np(f, pnn, tailind)
        m0 = float(np.trapz(pspec, f)) if np.isfinite(pspec).any() else float("nan")
        m2 = (
            float(np.trapz(pspec * f**2, f)) if np.isfinite(pspec).any() else float("nan")
        )
        wh = 4.0 * np.sqrt(m0)
        wp_mean = np.sqrt(m0 / m2) if m2 and np.isfinite(m2) else float("nan")
        ps = np.nan_to_num(pspec, nan=0.0)
        fp = f[int(np.argmax(ps))]
        wp_peak = 1.0 / fp if fp > 0 else float("nan")
        rows.append(
            {
                burst_col: bt,
                "frequency": f.tolist(),
                "pspec": pspec.tolist(),
                "m0": m0,
                "m2": m2,
                "wh_4061": wh,
                "wp_4060": wp_mean,
                "wp_peak": wp_peak,
                "water_depth": h,
            }
        )
    cols = [
        burst_col,
        "frequency",
        "pspec",
        "m0",
        "m2",
        "wh_4061",
        "wp_4060",
        "wp_peak",
        "water_depth",
    ]
    return pd.DataFrame(rows, columns=cols)


def wave_stats_schema(burst_col: str = "burst_time") -> StructType:
    return StructType(
        [
            StructField(burst_col, TimestampType()),
            StructField("frequency", ArrayType(DoubleType())),
            StructField("pspec", ArrayType(DoubleType())),
            StructField("m0", DoubleType()),
            StructField("m2", DoubleType()),
            StructField("wh_4061", DoubleType()),
            StructField("wp_4060", DoubleType()),
            StructField("wp_peak", DoubleType()),
            StructField("water_depth", DoubleType()),
        ]
    )


def make_waves_ds(
    df: DataFrame,
    config: dict,
    burst_col: str = "burst_time",
    pressure_col: str = "P_1ac",
    sample_col: str = "sample",
) -> DataFrame:
    """Distributed make_waves_ds (core/waves.py:571-681): shuffle on the
    burst key, spectral chain per burst inside Arrow batches. Only the
    (burst, sample, pressure) columns cross into Python — project before
    grouping so the Arrow transfer is minimal."""
    sample_rate = 1.0 / float(config.get("sample_interval", 1.0))
    z = float(
        config.get("pressure_sensor_height")
        or config.get("initial_instrument_height")
        or 0.0
    )
    nsegs = int(config.get("spec_nsegs", 16))
    noise = float(config.get("wave_fractional_noise", 0.9))
    fcut = config.get("wave_fcut")
    kpmin = config.get("wave_Kpmin")

    slim = df.select(burst_col, sample_col, pressure_col)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return burst_wave_stats_kernel(
            pdf,
            sample_rate=sample_rate,
            sensor_height=z,
            nsegs=nsegs,
            noise=noise,
            fcut=fcut,
            kpmin=kpmin,
            burst_col=burst_col,
            pressure_col=pressure_col,
            sample_col=sample_col,
        )

    return slim.groupBy(burst_col).applyInPandas(apply_fn, wave_stats_schema(burst_col))
