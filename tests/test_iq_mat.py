"""SonTek-IQ .mat ingest: fixture mirrors the IQ software export layout
(flat FlowData_* variables + Data_Units struct); expectations mirror
iq.py:172-446 — epoch-2000 µs time, VelXYZ channel naming, per-beam
spread, '/s' unit normalization, FlowSubData/Profile exclusion."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from stglib_spark.functions.mat5 import savemat
from stglib_spark.sources.iq_mat import parse_iq, read_iq_mat

NT = 5


def _fixture(path: str):
    t0 = dt.datetime(2023, 7, 1, 6, 0, 0)
    micros = np.array(
        [(t0 - dt.datetime(2000, 1, 1)).total_seconds() * 1e6 + i * 600e6
         for i in range(NT)]
    )
    rng = np.random.RandomState(11)
    variables = {
        "FlowData_SampleTime": micros,
        "FlowData_Depth": 1.0 + rng.rand(NT),
        "FlowData_Flow": rng.randn(NT) * 0.5,
        "FlowData_Vel": rng.randn(NT, 4) * 0.3,
        "FlowData_VelXYZ": rng.randn(NT, 4) * 0.2,
        "FlowData_SNR": rng.rand(NT, 4) * 30,
        "FlowData_NoiseLevel": rng.rand(NT, 5) * 10,
        # one burst longer than time (iq.py:216-218 comment) — truncated
        "FlowSubData_Stage": rng.rand(NT + 1),
        "Profile_0_Vel": rng.randn(NT + 1, 10),
        "Data_Units": {
            "FlowData_Depth": "m",
            "FlowData_Flow": "m^3/s",
            "FlowData_Vel": "m/s",
            "FlowData_VelXYZ": "m/s",
            "FlowData_SNR": "dB",
        },
        "System_IqSetup": {
            "advancedSetup": {"recordSubSampleProfiles": np.array([0.0])},
        },
    }
    savemat(path, variables, compress=True)
    return variables


def test_parse_iq_time_and_mapping(tmp_path):
    p = str(tmp_path / "iq.mat")
    v = _fixture(p)
    parsed = parse_iq(p)
    assert parsed["time"][0] == dt.datetime(2023, 7, 1, 6, 0, 0)
    assert parsed["time"][1] - parsed["time"][0] == dt.timedelta(minutes=10)
    cols = parsed["columns"]
    # VelXYZ split into named channels (iq.py:238-252)
    assert {"Vel_X_Center", "Vel_Z_Center", "Vel_X_Left", "Vel_X_Right"} <= set(cols)
    np.testing.assert_allclose(cols["Vel_X_Center"], v["FlowData_VelXYZ"][:, 0])
    np.testing.assert_allclose(cols["Vel_X_Right"], v["FlowData_VelXYZ"][:, 3])
    # per-beam spreads
    np.testing.assert_allclose(cols["vel2"], v["FlowData_Vel"][:, 1])
    np.testing.assert_allclose(cols["snr4"], v["FlowData_SNR"][:, 3])
    np.testing.assert_allclose(cols["noise5"], v["FlowData_NoiseLevel"][:, 4])
    # scalars
    np.testing.assert_allclose(cols["FlowData_Depth"], v["FlowData_Depth"])
    # FlowSubData / Profile excluded
    assert not any("FlowSubData" in c or "Profile" in c for c in cols)
    # '/s' normalized (iq.py:228)
    assert parsed["units"]["FlowData_Flow"] == "m^3 s-1"
    assert parsed["units"]["vel1"] == "m s-1"
    assert parsed["units"]["snr1"] == "dB"


def test_read_iq_mat_dataframe(spark, tmp_path):
    p = str(tmp_path / "iq.mat")
    v = _fixture(p)
    df = read_iq_mat(spark, p)
    rows = df.orderBy("time").collect()
    assert len(rows) == NT
    assert rows[0]["FlowData_Depth"] == pytest.approx(v["FlowData_Depth"][0])
    assert rows[2]["vel3"] == pytest.approx(v["FlowData_Vel"][2, 2])
    meta = {f.name: dict(f.metadata) for f in df.schema.fields if f.metadata}
    assert meta["FlowData_Flow"]["units"] == "m^3 s-1"


def test_iq_adapter_registered(spark, tmp_path):
    from stglib_spark.sources import ingest, resolve_instrument

    assert resolve_instrument("iq") == "iq"
    p = str(tmp_path / "iq.mat")
    _fixture(p)
    assert ingest(spark, "iq", p, {}).count() == NT


def test_parse_iq_rejects_non_iq(tmp_path):
    p = str(tmp_path / "other.mat")
    savemat(p, {"SomethingElse": np.arange(3.0)})
    with pytest.raises(ValueError, match="FlowData_SampleTime"):
        parse_iq(p)
