"""PUV kernel invariants (reference: tests/test_puv_quick.py, variance
preservation core/waves.py:1772-1828) on a physically consistent linear
wave."""

from __future__ import annotations

import numpy as np
import pytest

from stglib_spark.operators.waves import puv_quick_np, qkfs_np


def _linear_wave(a=0.4, T=8.0, h=10.0, zp=0.5, zuv=1.0, fs=4.0, n=4096, theta=30.0):
    t = np.arange(n) / fs
    om = 2 * np.pi / T
    k = qkfs_np(np.array([om]), h)[0]
    kp = np.cosh(k * zp) / np.cosh(k * h)
    eta = a * np.cos(om * t)
    p = 10.0 + eta * kp  # dbar ≈ m head, as the reference assumes
    uamp = a * om * np.cosh(k * zuv) / np.sinh(k * h)
    u = uamp * np.cos(om * t) * np.cos(np.radians(theta))
    v = uamp * np.cos(om * t) * np.sin(np.radians(theta))
    return p, u, v, h


def test_puv_hrms_parity_and_peak():
    p, u, v, h = _linear_wave()
    out = puv_quick_np(p, u, v, h, 0.5, 1.0, 4.0, fft_length=1024)
    # Hrms = 2a for a monochromatic wave of amplitude a
    assert out["Hrmsp"] == pytest.approx(0.8, rel=0.05)
    assert out["Hrmsu"] == pytest.approx(0.8, rel=0.05)
    # pressure- and velocity-derived heights agree (the method's core claim)
    assert out["Hrmsp"] == pytest.approx(out["Hrmsu"], rel=0.03)
    assert out["Tpp"] == pytest.approx(8.0, rel=0.1)
    assert out["Tpu"] == pytest.approx(8.0, rel=0.1)
    assert out["Tr"] == pytest.approx(8.0, rel=0.1)
    # representative orbital velocity ubr = sqrt(2·var(u)+2·var(v)) for a
    # narrow-band wave = amplitude of the combined orbital motion
    uv_var = np.var(u) + np.var(v)
    assert out["ubr"] == pytest.approx(np.sqrt(2 * uv_var), rel=0.05)


def test_puv_direction_energy_ratio():
    # the PUV direction uses energy ratios: phir = atan2(±∫Gvv, ∫Guu)
    # = atan(tan²θ) for a unidirectional wave at angle θ
    theta = 30.0
    p, u, v, h = _linear_wave(theta=theta)
    out = puv_quick_np(p, u, v, h, 0.5, 1.0, 4.0, fft_length=1024)
    expected_phir = np.arctan(np.tan(np.radians(theta)) ** 2)
    assert out["phir"] == pytest.approx(expected_phir, abs=0.05)
    assert out["azr"] == pytest.approx(90 - np.degrees(expected_phir), abs=3.0)


def test_puv_variance_preservation():
    # random-sea variance check (test_puv_quick.py:24-45 spirit):
    # Hrmsp from the band-limited spectrum stays below the total-variance
    # bound and above half of it for a band-centered sea
    rng = np.random.RandomState(11)
    n, fs = 8192, 4.0
    t = np.arange(n) / fs
    # band-limited random sea in 0.08..0.18 Hz
    eta = np.zeros(n)
    for f0 in np.linspace(0.08, 0.18, 12):
        eta += rng.rand() * 0.1 * np.cos(2 * np.pi * f0 * t + rng.rand() * 6.28)
    h, zp, zuv = 10.0, 0.5, 1.0
    k0 = qkfs_np(np.array([2 * np.pi * 0.13]), h)[0]
    kp0 = np.cosh(k0 * zp) / np.cosh(k0 * h)
    p = 10.0 + eta * kp0
    u = np.gradient(eta, 1 / fs) * 0.5
    v = 0.5 * u
    out = puv_quick_np(p, u, v, h, zp, zuv, fs, fft_length=1024)
    hrms_expected = 2 * np.sqrt(2 * np.var(eta))
    assert out["Hrmsp"] == pytest.approx(hrms_expected, rel=0.15)
