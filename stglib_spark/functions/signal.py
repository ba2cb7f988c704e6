"""Pure-NumPy signal-processing kernels.

These replicate the scipy primitives the reference relies on
(``scipy.signal.welch``, ``butter``+``sosfiltfilt``, ``medfilt``) from
their published definitions, because scipy is not available in this
environment. Each function documents the scipy behavior it matches; the
test suite cross-checks known analytic cases (sine-wave PSD peak, filter
DC gain, variance preservation).

Used ONLY inside Arrow-batched Pandas UDFs (the reference's FFT-class math
is the one place Python is genuinely required — SURVEY §7.1 "UDF fence").
"""

from __future__ import annotations

import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window, matching scipy.signal.get_window('hann', n)
    (fftbins=True): 0.5·(1 − cos(2πk/n))."""
    k = np.arange(n)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))


def next_power_of_2(x: int) -> int:
    """Smallest power of two >= x (reference core/waves.py next_power_of_2)."""
    return 1 if x <= 0 else 2 ** int(np.ceil(np.log2(x)))


def welch_psd(
    x: np.ndarray, fs: float = 1.0, nperseg: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Welch power spectral density, matching scipy.signal.welch defaults:
    hann window, 50% overlap, constant detrend per segment, one-sided
    density scaling (2/(fs·Σw²), no doubling at DC/Nyquist), mean over
    segments.

    x may be 1-D (series) or 2-D (bursts × samples; PSD per row).
    """
    x = np.asarray(x, dtype=float)
    one_d = x.ndim == 1
    if one_d:
        x = x[None, :]
    n = x.shape[-1]
    # floor of 4: a 1-point Hann window is identically zero (scale blows
    # up) and a <4-point PSD is meaningless
    nperseg = int(min(max(nperseg, 4), n))
    noverlap = nperseg // 2
    step = nperseg - noverlap
    nseg = max((n - noverlap) // step, 1)

    w = hann_periodic(nperseg)
    scale = 1.0 / (fs * (w * w).sum())

    # frame into overlapping segments: (bursts, nseg, nperseg)
    idx = np.arange(nperseg)[None, :] + step * np.arange(nseg)[:, None]
    segs = x[:, idx]  # (b, nseg, nperseg)
    segs = segs - segs.mean(axis=-1, keepdims=True)  # detrend='constant'
    spec = np.fft.rfft(segs * w, n=nperseg, axis=-1)
    psd = (spec.real**2 + spec.imag**2) * scale
    # one-sided doubling except DC and (if nperseg even) Nyquist
    if nperseg % 2 == 0:
        psd[..., 1:-1] *= 2.0
    else:
        psd[..., 1:] *= 2.0
    pxx = psd.mean(axis=1)
    f = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    if one_d:
        pxx = pxx[0]
    return f, pxx


def _butter_analog_poles(order: int) -> np.ndarray:
    """Analog Butterworth prototype poles on the unit circle (Re<0)."""
    k = np.arange(1, order + 1)
    return np.exp(1j * np.pi * (2 * k + order - 1) / (2 * order))


def butter_ba(
    order: int, wn: float | tuple[float, float], btype: str = "lowpass"
) -> tuple[np.ndarray, np.ndarray]:
    """Butterworth digital filter design via bilinear transform, matching
    scipy.signal.butter(order, wn, btype) with fs=2 normalization (wn in
    half-cycles/sample, i.e. critical frequency / Nyquist)."""
    if btype in ("lowpass", "highpass"):
        warped = 4.0 * np.tan(np.pi * float(wn) / 2.0)  # prewarped ωc at fs=2
        poles = _butter_analog_poles(order)
        if btype == "lowpass":
            p = warped * poles
            z = np.array([])
            kgain = warped**order
        else:
            p = warped / poles
            z = np.zeros(order)
            kgain = 1.0
        # bilinear transform with fs=2: s = 4*(z-1)/(z+1)
        fs2 = 4.0
        pd = (fs2 + p) / (fs2 - p)
        zd = (fs2 + z) / (fs2 - z) if len(z) else np.array([])
        zd = np.concatenate([zd, -np.ones(order - len(z))])
        # gain: K * prod(fs2 - z) / prod(fs2 - p)
        num = np.prod(fs2 - z) if len(z) else 1.0
        kd = (kgain * num / np.prod(fs2 - p)).real
        b = kd * np.poly(zd)
        a = np.poly(pd)
        return b.real, a.real
    elif btype == "bandpass":
        lo, hi = (float(w) for w in wn)
        w1 = 4.0 * np.tan(np.pi * lo / 2.0)
        w2 = 4.0 * np.tan(np.pi * hi / 2.0)
        bw = w2 - w1
        w0 = np.sqrt(w1 * w2)
        poles = _butter_analog_poles(order)
        # lp→bp transform: each pole p → p*bw/2 ± sqrt((p*bw/2)² − w0²)
        pb = poles * bw / 2.0
        p = np.concatenate([pb + np.sqrt(pb**2 - w0**2), pb - np.sqrt(pb**2 - w0**2)])
        z = np.zeros(order)
        kgain = bw**order
        fs2 = 4.0
        pd = (fs2 + p) / (fs2 - p)
        zd = np.concatenate([(fs2 + z) / (fs2 - z), -np.ones(order)])
        kd = (kgain * np.prod(fs2 - z) / np.prod(fs2 - p)).real
        b = kd * np.poly(zd)
        a = np.poly(pd)
        return b.real, a.real
    raise ValueError(f"unknown btype {btype!r}")


def lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Direct-form II transposed IIR filter (scipy.signal.lfilter)."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    n = max(len(a), len(b))
    bb = np.zeros(n)
    aa = np.zeros(n)
    bb[: len(b)] = b
    aa[: len(a)] = a
    z = np.zeros(n - 1)
    y = np.empty_like(np.asarray(x, dtype=float))
    for i, xi in enumerate(x):
        yi = bb[0] * xi + z[0]
        for j in range(n - 2):
            z[j] = bb[j + 1] * xi + z[j + 1] - aa[j + 1] * yi
        z[n - 2] = bb[n - 1] * xi - aa[n - 1] * yi
        y[i] = yi
    return y


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with odd-reflection padding,
    matching scipy.signal.filtfilt's default method (padtype='odd',
    padlen=3*max(len(a),len(b))). The reference uses the SOS form
    (sosfiltfilt, core/filter.py); transfer function form is numerically
    adequate for order ≤ 4."""
    x = np.asarray(x, dtype=float)
    padlen = 3 * max(len(a), len(b))
    if x.shape[0] <= padlen:
        padlen = max(x.shape[0] - 1, 0)
    if padlen > 0:
        front = 2 * x[0] - x[padlen:0:-1]
        back = 2 * x[-1] - x[-2 : -padlen - 2 : -1]
        ext = np.concatenate([front, x, back])
    else:
        ext = x
    # state initialization matching lfilter_zi: steady state for a step of
    # the first sample value
    y = _lfilter_zi_applied(b, a, ext)
    y = _lfilter_zi_applied(b, a, y[::-1])[::-1]
    if padlen > 0:
        y = y[padlen:-padlen]
    return y


def _lfilter_zi_applied(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """lfilter with initial conditions set so a constant input x[0] gives a
    constant output (scipy's lfilter_zi construction)."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    n = max(len(a), len(b))
    bb = np.zeros(n)
    aa = np.zeros(n)
    bb[: len(b)] = b
    aa[: len(a)] = a
    # direct construction (scipy lfilter_zi): solve (I - Aᵀ) zi = B where A
    # is the DF2T state-transition companion matrix
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -aa[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = bb[1:] - aa[1:] * bb[0]
    zi = np.linalg.solve(np.eye(n - 1) - A, B)
    # run DF2T with scaled initial state
    z = zi * x[0]
    y = np.empty_like(x)
    for i, xi in enumerate(x):
        yi = bb[0] * xi + z[0]
        for j in range(n - 2):
            z[j] = bb[j + 1] * xi + z[j + 1] - aa[j + 1] * yi
        z[n - 2] = bb[n - 1] * xi - aa[n - 1] * yi
        y[i] = yi
    return y


def medfilt(x: np.ndarray, kernel: int) -> np.ndarray:
    """k-point sliding median with zero-padded edges, matching
    scipy.signal.medfilt (used by the reference's med_diff rules and
    med_filt smoother)."""
    x = np.asarray(x, dtype=float)
    half = kernel // 2
    padded = np.concatenate([np.zeros(half), x, np.zeros(half)])
    windows = np.lib.stride_tricks.sliding_window_view(padded, kernel)
    return np.median(windows, axis=-1)


def detrend_linear(x: np.ndarray) -> np.ndarray:
    """Remove least-squares linear trend (scipy.signal.detrend type='linear'),
    NaN-tolerant like the reference's detrend_nan (core/waves.py:1010+)."""
    x = np.asarray(x, dtype=float)
    t = np.arange(len(x), dtype=float)
    good = np.isfinite(x)
    if good.sum() < 2:
        return x - np.nanmean(x)
    p = np.polyfit(t[good], x[good], 1)
    return x - np.polyval(p, t)
