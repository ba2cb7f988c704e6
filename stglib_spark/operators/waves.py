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

from stglib_spark.session import pin_grouping
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


def make_dspec_tail_np(
    f: np.ndarray, dspec: np.ndarray, tailind: float
) -> np.ndarray:
    """f⁻⁴ tail spliced into every direction column of a directional
    spectrum (core/waves.py:900-909 make_dspec_tail — the reference
    loops make_tail per direction; vectorized here as one outer
    product). ``dspec`` is (n_freq, n_dir); rows at index ≥ tailind are
    replaced by dspec[tailind, :] scaled by (f/f_tail)⁻⁴, so the tailed
    directional spectrum still integrates (over direction) to the
    tailed 1-D spectrum when the base row does."""
    if np.isnan(tailind):
        return np.full_like(dspec, np.nan)
    ti = int(tailind)
    out = dspec.copy()
    if ti < dspec.shape[0]:
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = (f[ti:] / f[ti]) ** -4
        out[ti:, :] = dspec[ti, :][None, :] * ratio[:, None]
        if f[ti] == 0:
            out[ti:, :] = np.nan
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


def burst_wave_stats_elev_kernel(
    pdf: pd.DataFrame,
    sample_rate: float,
    nsegs: int = 16,
    burst_col: str = "burst_time",
    elev_col: str = "elev",
    sample_col: str = "sample",
) -> pd.DataFrame:
    """Per-burst wave statistics from direct sea-surface elevation
    (core/waves.py:684-743 ``make_waves_ds_elev``): Welch PSD of the
    elevation series, band-limited to [1/(burst_duration/32),
    min(2 Hz, Nyquist)], Pnn = Pxx directly — no Kp transfer, no noise
    cutoff, no f⁻⁴ tail — then the same m0/m2 → Hs/Tm/Tp stats."""
    rows = []
    for bt, grp in pdf.groupby(burst_col, sort=True):
        grp = grp.sort_values(sample_col)
        e = grp[elev_col].to_numpy(dtype=float)
        if len(e) < 8 or np.isnan(e).all():
            continue
        if np.isnan(e).any():
            idx = np.arange(len(e))
            good = np.isfinite(e)
            if good.mean() < 0.9:
                continue
            e = np.interp(idx, idx[good], e[good])
        nsamps = len(e)
        nfft = max(next_power_of_2(int(nsamps / nsegs)), 8)
        f, pxx = welch_psd(e, fs=sample_rate, nperseg=nfft)
        # frequency band (waves.py:709-722): ≥32 whole periods per burst,
        # ≤ lesser of 2 Hz and Nyquist
        flo = np.round(1.0 / (nsamps / sample_rate / 32.0), 3)
        fhi = min(2.0, sample_rate / 2.0)
        ind = (f >= flo) & (f <= fhi)
        f, pnn = f[ind], pxx[ind]
        if not len(f):
            continue
        m0 = float(np.trapz(pnn, f))
        m2 = float(np.trapz(pnn * f**2, f))
        wh = 4.0 * np.sqrt(m0)
        wp_mean = np.sqrt(m0 / m2) if m2 and np.isfinite(m2) else float("nan")
        fp = f[int(np.argmax(np.nan_to_num(pnn, nan=0.0)))]
        rows.append(
            {
                burst_col: bt,
                "frequency": f.tolist(),
                "pspec": pnn.tolist(),
                "m0": m0,
                "m2": m2,
                "wh_4061": wh,
                "wp_4060": wp_mean,
                "wp_peak": 1.0 / fp if fp > 0 else float("nan"),
                "water_depth": float("nan"),
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


def make_waves_ds_elev(
    df: DataFrame,
    config: dict,
    burst_col: str = "burst_time",
    elev_col: str = "elev",
    sample_col: str = "sample",
) -> DataFrame:
    """Distributed make_waves_ds_elev (core/waves.py:684-743): wave
    statistics from a direct surface-elevation measurement (Geolux radar
    ``elev``, Signature ``brangeAST``, ABSS ``brange``). Same shuffle
    shape as the pressure chain — one Arrow batch per burst."""
    sample_rate = 1.0 / float(config.get("sample_interval", 1.0))
    nsegs = int(config.get("spec_nsegs", 16))
    slim = df.select(burst_col, sample_col, elev_col)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return burst_wave_stats_elev_kernel(
            pdf,
            sample_rate=sample_rate,
            nsegs=nsegs,
            burst_col=burst_col,
            elev_col=elev_col,
            sample_col=sample_col,
        )

    return pin_grouping(slim, burst_col).groupBy(burst_col).applyInPandas(apply_fn, wave_stats_schema(burst_col))


def puv_quick_np(
    p: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    depth: float,
    height_of_pressure: float,
    height_of_velocity: float,
    fs: float,
    fft_length: int = 512,
    rho: float = 1025.0,
    first_frequency_cutoff: float = 1 / 50,
    infra_gravity_cutoff: float = 0.05,
    last_frequency_cutoff: float = 1 / 5,
) -> dict:
    """PUV directional wave parameters for ONE burst (Madsen 1994 /
    Thornton & Guza), replicating ``core/waves.py:1024-1351``
    (puv_quick_vectorized) step-for-step: linear detrend → Welch of
    ρg·p, u, v → k(ω, depth) → transfer functions Hp = ρg·cosh(kzp)/cosh(kh),
    Huv = ω·cosh(kzuv)/sinh(kh) → band-limited Snp/Snu → Hrms = 2√(2ΣS df),
    ubr/omegar/Tr, peak periods, direction φr from sign(corr(u,v)) and the
    Gvv/Guu band integrals, azimuth = 90 − φr·180/π, band-split
    ublo/ubig/ubhi, f⁻⁴-tail variants via the J&M cutoff."""
    from stglib_spark.functions.signal import detrend_linear

    g = 9.81
    p = detrend_linear(np.asarray(p, dtype=float))
    u = detrend_linear(np.asarray(u, dtype=float))
    v = detrend_linear(np.asarray(v, dtype=float))
    fft_length = int(min(fft_length, len(p)))

    f, gpp = welch_psd(rho * g * p, fs=fs, nperseg=fft_length)
    _, guu = welch_psd(u, fs=fs, nperseg=fft_length)
    _, gvv = welch_psd(v, fs=fs, nperseg=fft_length)
    df = f[2] - f[1]
    omega = 2 * np.pi * f
    k = qkfs_np(omega, float(depth))

    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        kh = k * depth
        hp = rho * g * (np.cosh(k * height_of_pressure) / np.cosh(kh))
        huv = omega * (np.cosh(k * height_of_velocity) / np.sinh(kh))
    if np.isnan(omega[0]) or omega[0] <= 0:
        hp[0] = 1.0
        huv[0] = 1.0
    if np.isnan(k[0]):
        hp[0] = 1.0
        huv[0] = 1.0

    guv = guu + gvv
    ff = int(np.argmax(f > first_frequency_cutoff)) - 1
    lf = int(np.argmax(f > last_frequency_cutoff))
    if lf == 0:
        lf = len(f)
    ff = max(ff, 1)

    with np.errstate(divide="ignore", invalid="ignore"):
        snp = gpp[ff:lf] / hp[ff:lf] ** 2
        snu = guv[ff:lf] / huv[ff:lf] ** 2
    fclip = f[ff:lf]

    # tails (J&M cutoff on the untransformed spectra)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        kp = np.cosh(k * height_of_pressure) / np.cosh(kh)
        kp[np.isnan(k)] = 1.0
        tailind = define_cutoff_np(f, gpp, kp)
        snp_tail = make_tail_np(f, gpp / hp**2, tailind)
        kp_u = np.cosh(k * height_of_velocity) / np.cosh(kh)
        kp_u[np.isnan(k)] = 1.0
        tailind_u = define_cutoff_np(f, guv, kp_u)
        snu_tail = make_tail_np(f, guv / huv**2, tailind_u)
    snp_tail[0] = np.nan
    snu_tail[0] = np.nan

    hrmsu = 2 * np.sqrt(2 * np.sum(snu * df))
    hrmsp = 2 * np.sqrt(2 * np.sum(snp * df))
    hrmsu_tail = 2 * np.sqrt(2 * np.nansum(snu_tail[1:] * df))
    hrmsp_tail = 2 * np.sqrt(2 * np.nansum(snp_tail[1:] * df))

    ubr = np.sqrt(2 * np.sum(guv[ff:lf] * df))
    denom = np.sum(guv[ff:lf] * df)
    omegar = (
        np.sum(omega[ff:lf] * guv[ff:lf] * df) / denom if denom > 0 else np.nan
    )
    tr = 2 * np.pi / omegar if omegar and np.isfinite(omegar) else np.nan

    tpp = 1.0 / fclip[int(np.argmax(snp))] if len(snp) else np.nan
    tpu = 1.0 / fclip[int(np.argmax(snu))] if len(snu) else np.nan

    su, sv = np.std(u), np.std(v)
    rr = float(np.corrcoef(u, v)[0, 1]) if su > 0 and sv > 0 else 0.0
    ortest = np.sign(rr) if rr != 0 else 1.0
    phir = np.arctan2(ortest * np.sum(gvv[ff:lf] * df), np.sum(guu[ff:lf] * df))
    phir_tail = np.arctan2(ortest * np.sum(gvv * df), np.sum(guu * df))
    azr = 90.0 - np.degrees(phir)
    azr_tail = 90.0 - np.degrees(phir_tail)

    ig_idx = np.where(f <= infra_gravity_cutoff)[0]
    ig = int(ig_idx.max()) if len(ig_idx) else 0
    ublo = np.sqrt(2 * np.sum(guv[1:ff] * df)) if ff > 1 else 0.0
    ubig = np.sqrt(2 * np.sum(guv[ff:ig] * df)) if ig > ff else 0.0
    ubhi = np.sqrt(2 * np.sum(guv[lf:] * df)) if lf < len(f) else 0.0

    return {
        "Hrmsp": float(hrmsp),
        "Hrmsu": float(hrmsu),
        "ubr": float(ubr),
        "omegar": float(omegar),
        "Tr": float(tr),
        "Tpp": float(tpp),
        "Tpu": float(tpu),
        "phir": float(phir),
        "azr": float(azr),
        "ublo": float(ublo),
        "ubig": float(ubig),
        "ubhi": float(ubhi),
        "Hrmsp_tail": float(hrmsp_tail),
        "Hrmsu_tail": float(hrmsu_tail),
        "phir_tail": float(phir_tail),
        "azr_tail": float(azr_tail),
    }


_PUV_FIELDS = [
    "Hrmsp",
    "Hrmsu",
    "ubr",
    "omegar",
    "Tr",
    "Tpp",
    "Tpu",
    "phir",
    "azr",
    "ublo",
    "ubig",
    "ubhi",
    "Hrmsp_tail",
    "Hrmsu_tail",
    "phir_tail",
    "azr_tail",
]


def puv_schema(burst_col: str = "burst_time") -> StructType:
    return StructType(
        [StructField(burst_col, TimestampType())]
        + [StructField(name, DoubleType()) for name in _PUV_FIELDS]
    )


def make_puv_ds(
    df: DataFrame,
    config: dict,
    burst_col: str = "burst_time",
    pressure_col: str = "P_1ac",
    u_col: str = "u_1205",
    v_col: str = "v_1206",
    sample_col: str = "sample",
) -> DataFrame:
    """Distributed PUV (wrapper semantics of waves.py:1847-1989 /
    sig/nc2waves.py:550-599): shuffle on burst key, puv_quick per burst in
    Arrow batches. Depth per burst = mean pressure + sensor height."""
    fs = 1.0 / float(config.get("sample_interval", 1.0))
    # is-not-None chains: a sensor height of 0.0 (at the bed) is valid
    zp = config.get("pressure_sensor_height")
    if zp is None:
        zp = config.get("initial_instrument_height")
    zp = float(zp) if zp is not None else 0.0
    _zuv = config.get("velocity_sample_volume_height")
    zuv = float(_zuv) if _zuv is not None else zp
    fft_length = int(config.get("puv_fft_length", 512))

    slim = df.select(burst_col, sample_col, pressure_col, u_col, v_col)
    schema = puv_schema(burst_col)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bt, grp in pdf.groupby(burst_col, sort=True):
            grp = grp.sort_values(sample_col)
            p = grp[pressure_col].to_numpy(dtype=float)
            u = grp[u_col].to_numpy(dtype=float)
            v = grp[v_col].to_numpy(dtype=float)
            if len(p) < 32 or np.isnan(p).all():
                continue
            depth = float(np.nanmean(p)) + zp
            out = puv_quick_np(
                np.nan_to_num(p, nan=float(np.nanmean(p))),
                np.nan_to_num(u),
                np.nan_to_num(v),
                depth,
                zp,
                zuv,
                fs,
                fft_length=fft_length,
            )
            out[burst_col] = bt
            rows.append(out)
        return pd.DataFrame(rows, columns=[burst_col] + _PUV_FIELDS)

    return pin_grouping(slim, burst_col).groupBy(burst_col).applyInPandas(apply_fn, schema)


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
    # is-not-None chain: a sensor height of 0.0 (at the bed) is valid
    z = config.get("pressure_sensor_height")
    if z is None:
        z = config.get("initial_instrument_height")
    z = float(z) if z is not None else 0.0
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

    return pin_grouping(slim, burst_col).groupBy(burst_col).applyInPandas(apply_fn, wave_stats_schema(burst_col))
