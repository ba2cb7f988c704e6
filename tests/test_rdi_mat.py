"""TRDI WinRiver .mat export ingest: fixture mirrors the WinRiver trio
(.mat with info/sens/wt structs, .log sidecar, .txt pressure CSV);
expectations mirror rdi/mat2cdf.py:12-227 — epoch-seconds time, bindist
from cell geometry, E/N/U1/U2 component split, EPIC sensor names."""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pytest

from stglib_spark.functions.mat5 import savemat
from stglib_spark.sources.rdi_mat import (
    parse_rdi_mat,
    read_rdi_log,
    read_rdi_mat,
    read_rdi_sens,
)

NT, NC = 4, 3


def _fixture(path: str, t0: dt.datetime = dt.datetime(2023, 9, 1)):
    rng = np.random.RandomState(9)
    epoch0 = (t0 - dt.datetime(1970, 1, 1)).total_seconds()
    variables = {
        "info": {
            "cell": 0.5, "blank": 0.2, "cell1": 0.9,
            "ncells": float(NC), "angle": 20.0,
        },
        "sens": {
            "time": epoch0 + np.arange(NT) * 600.0,
            "h": rng.rand(NT) * 360,
            "p": rng.randn(NT),
            "r": rng.randn(NT),
            "t": 15 + rng.rand(NT),
            "pd": 5 + rng.rand(NT),
            "sos": 1500 + rng.rand(NT),
            "s": 30 + rng.rand(NT),
            "o": np.ones(NT),
            "v": 12 + rng.rand(NT),
        },
        "wt": {
            "vel": rng.randn(NT, NC, 4) * 0.4,
            "int": rng.rand(NT, NC, 4) * 200,
            "corr": rng.rand(NT, NC, 4) * 128,
            "pg": rng.rand(NT, NC, 4) * 100,
        },
    }
    savemat(path, variables, compress=True)
    return variables


def test_parse_rdi_mat(tmp_path):
    p = str(tmp_path / "seg.000.mat")
    v = _fixture(p)
    g = parse_rdi_mat(p)
    assert g["time"][0] == dt.datetime(2023, 9, 1)
    assert g["time"][1] - g["time"][0] == dt.timedelta(minutes=10)
    np.testing.assert_allclose(g["bindist"], [0.9, 1.4, 1.9])
    np.testing.assert_allclose(g["vel"], v["wt"]["vel"])
    assert "Hdg_1215" in g["sens"] and "P_1" in g["sens"]
    assert g["info"]["angle"] == 20.0


def test_read_rdi_mat_long_form(spark, tmp_path):
    p = str(tmp_path / "seg.000.mat")
    v = _fixture(p)
    df = read_rdi_mat(spark, p)
    rows = df.orderBy("time", "bin").collect()
    assert len(rows) == NT * NC
    r = rows[1]
    assert r["bin"] == 1 and r["bindist"] == pytest.approx(1.4)
    assert r["vel_e"] == pytest.approx(v["wt"]["vel"][0, 1, 0])
    assert r["vel_u2"] == pytest.approx(v["wt"]["vel"][0, 1, 3])
    assert r["corr3"] == pytest.approx(v["wt"]["corr"][0, 1, 2])
    assert r["Hdg_1215"] == pytest.approx(v["sens"]["h"][0])
    assert r["P_1"] == pytest.approx(v["sens"]["pd"][0])
    # EPIC attrs ride automatically for recognized names
    meta = {f.name: dict(f.metadata) for f in df.schema.fields if f.metadata}
    assert meta["Hdg_1215"]["epic_code"] == 1215


def test_read_rdi_log(tmp_path):
    p = str(tmp_path / "seg.log")
    with open(p, "w") as f:
        f.write("File size\t123456 bytes\n")
        f.write("Serial number\t9928\n")
        f.write("Cell size\t50 cm\n")
        f.write("Irrelevant line without tab\n")
    attrs = read_rdi_log(p)
    assert attrs["RDIFileSize"] == "123456 bytes"
    assert attrs["RDISerialNumber"] == "9928"
    assert attrs["RDICellSize"] == "50 cm"


def test_read_rdi_sens(spark, tmp_path):
    p = str(tmp_path / "seg.txt")
    with open(p, "w") as f:
        f.write("Year,Month,Day,Hour,Min,Sec,Pressure\n")
        f.write("2023,9,1,0,0,0,10.5\n")
        f.write("2023,9,1,0,10,0,10.7\n")
    df = read_rdi_sens(spark, p)
    rows = df.orderBy("time").collect()
    assert rows[0]["time"] == dt.datetime(2023, 9, 1)
    assert rows[1]["time"] == dt.datetime(2023, 9, 1, 0, 10)
    assert rows[1]["Pressure"] == pytest.approx(10.7)


def test_rdi_adapter_and_multifile(spark, tmp_path):
    from stglib_spark.sources import ingest, resolve_instrument

    assert resolve_instrument("rdi") == "rdi"
    _fixture(str(tmp_path / "a.000.mat"), dt.datetime(2023, 9, 1))
    _fixture(str(tmp_path / "b.000.mat"), dt.datetime(2023, 9, 2))
    df = ingest(spark, "rdi", str(tmp_path / "*.mat"), {})
    assert df.count() == 2 * NT * NC


def test_multifile_sens_schema_from_first_segment(spark, tmp_path):
    """Sensor columns are ordered by the FIRST segment's channel set; a
    later segment missing a channel null-fills it and an extra channel is
    dropped (no misalignment from per-segment sort order)."""
    pa, pb = str(tmp_path / "a.000.mat"), str(tmp_path / "b.000.mat")
    _fixture(pa, dt.datetime(2023, 9, 1))
    vb = _fixture(pb, dt.datetime(2023, 9, 2))
    del vb["sens"]["h"]  # drop heading from segment 2
    vb["sens"]["bt"] = np.zeros(NT)  # extra channel the schema won't know
    savemat(pb, vb, compress=True)

    df = read_rdi_mat(spark, str(tmp_path / "*.mat"))
    assert df.count() == 2 * NT * NC
    rows = df.selectExpr("date(time) AS d", "Hdg_1215", "Tx_1211").collect()
    d1 = [r for r in rows if str(r["d"]) == "2023-09-01"]
    d2 = [r for r in rows if str(r["d"]) == "2023-09-02"]
    assert all(r["Hdg_1215"] is not None for r in d1)
    assert all(r["Hdg_1215"] is None for r in d2)
    # neighbouring channels stay aligned (temperature still 15..16)
    assert all(15.0 <= r["Tx_1211"] <= 16.0 for r in d2)
