"""Round-trip tests for the TRDI PD0 binary reader."""

import datetime as dt

import pytest

from stglib_spark.sources.pd0 import parse_ensembles, read_pd0, write_pd0


def _mk_ensembles(n=3, ncells=4):
    out = []
    for i in range(n):
        out.append(
            {
                "ensemble": i + 1,
                "time": dt.datetime(2024, 3, 1, 12, 0, i),
                "heading": 123.45,
                "pitch": -1.5,
                "roll": 0.25,
                "temperature": 18.73,
                "pressure": 25.5,
                "sound_speed": 1502,
                "salinity": 35,
                "xducer_depth": 24.3,
                "vel": [
                    [100 + c, -200 - c, 300 + c, -32768] for c in range(ncells)
                ],
            }
        )
    return out


def test_pd0_roundtrip(tmp_path, spark):
    p = str(tmp_path / "deploy.000")
    write_pd0(p, _mk_ensembles(), ncells=4)
    df = read_pd0(spark, p)
    rows = df.orderBy("ensemble", "cell").collect()
    assert len(rows) == 3 * 4
    r = rows[0]
    assert r["ensemble"] == 1
    assert r["time"] == dt.datetime(2024, 3, 1, 12, 0, 0)
    assert r["heading"] == pytest.approx(123.45)
    assert r["pitch"] == pytest.approx(-1.5)
    assert r["temperature"] == pytest.approx(18.73)
    assert r["pressure"] == pytest.approx(25.5)
    assert r["xducer_depth"] == pytest.approx(24.3)
    assert r["bindist"] == pytest.approx(1.5)  # bin1 150 cm
    assert rows[1]["bindist"] == pytest.approx(2.5)  # + cell_len 100 cm
    # velocity scaling mm/s → m/s, vendor bad value → null
    assert r["vel1"] == pytest.approx(0.100)
    assert r["vel2"] == pytest.approx(-0.200)
    assert r["vel4"] is None
    assert r["pg1"] == 100 and r["cor1"] == 101 and r["echo1"] == 61


def test_pd0_resync_and_checksum(tmp_path):
    p = str(tmp_path / "noisy.000")
    write_pd0(p, _mk_ensembles(2, ncells=2), ncells=2)
    blob = open(p, "rb").read()
    # prepend garbage, corrupt one byte inside the FIRST ensemble body
    first_end = blob.index(b"\x7f\x7f", 2)
    corrupted = bytearray(b"\x00GARBAGE" + blob)
    corrupted[12] ^= 0xFF  # inside first ensemble → checksum fails
    rows = list(parse_ensembles(bytes(corrupted), "noisy"))
    # first ensemble dropped (bad checksum), second recovered via resync
    assert {r.ensemble for r in rows} == {2}
    assert len(rows) == 2  # 2 cells
