"""Round-trip tests for the TRDI PD0 binary reader."""

import datetime as dt

import pytest

from stglib_spark.sources.pd0 import (
    parse_bt_ensembles,
    parse_ensembles,
    read_pd0,
    read_pd0_bt,
    write_pd0,
)


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


def test_pd0_bottom_track_roundtrip(tmp_path, spark):
    """0x0600 bottom-track block (rdiadcpy.py:1844-1944 field map): per-
    beam range (LSB+MSB<<16 cm → m), velocity (mm/s → m/s, -32768 → null),
    correlation/amp/%good/RSSI, max depth (dm → m), gain, mode."""
    ens = _mk_ensembles(3, ncells=2)
    # BT on ensembles 1 and 3 only; ensemble 2 has no BT block
    ens[0]["bt"] = {
        # beam 2 exercises the 0x8000-0xFFFF LSB band (signed-read trap),
        # beam 3 the MSB path, beam 4 the no-detection sentinel (0)
        "range_cm": [2510, 40000, 70000, 0],
        "vel_mm": [120, -340, 15, -32768],
        "cor": [110, 120, 130, 140],
        "amp": [70, 71, 72, 73],
        "pg": [95, 96, 97, 98],
        "rssi": [50, 51, 52, 53],
        "max_depth_dm": 300,
        "gain": 2,
        "mode": 5,
        "pings": 45,
    }
    ens[2]["bt"] = {"range_cm": [100, 100, 100, 100], "vel_mm": [1, 2, 3, 4]}
    p = str(tmp_path / "bt.000")
    write_pd0(p, ens, ncells=2)

    # profile rows unaffected by the extra block
    assert read_pd0(spark, p).count() == 3 * 2

    bt = read_pd0_bt(spark, p).orderBy("ensemble").collect()
    assert [r["ensemble"] for r in bt] == [1, 3]
    r = bt[0]
    assert r["bt_range1"] == pytest.approx(25.10)
    assert r["bt_range2"] == pytest.approx(400.00)  # LSB >= 0x8000: unsigned
    assert r["bt_range3"] == pytest.approx(700.00)  # MSB path
    assert r["bt_range4"] is None  # 0 = no bottom detection
    assert r["bt_vel1"] == pytest.approx(0.120)
    assert r["bt_vel2"] == pytest.approx(-0.340)
    assert r["bt_vel4"] is None  # vendor bad value
    assert r["bt_cor2"] == 120 and r["bt_amp4"] == 73 and r["bt_pg3"] == 97
    assert r["bt_rssi1"] == 50
    assert r["bt_max_depth"] == pytest.approx(30.0)
    assert r["bt_gain"] == 2 and r["bt_mode"] == 5
    assert r["bt_pings_per_ensemble"] == 45
    # join key grain: (source_file, ensemble) is unique
    assert len({(x["source_file"], x["ensemble"]) for x in bt}) == 2


def test_pd0_bt_parse_skips_truncated_block():
    import struct

    from stglib_spark.sources.pd0 import BOTTOM_TRACK_ID

    # a BT block cut off mid-way must be skipped, not crash
    ens = _mk_ensembles(1, ncells=2)
    ens[0]["bt"] = {"range_cm": [10, 10, 10, 10], "vel_mm": [0, 0, 0, 0]}
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.000")
        write_pd0(p, ens, ncells=2)
        blob = bytearray(open(p, "rb").read())
        # truncate: shrink the declared BT block by rewriting ensemble size
        # is fiddly — instead verify the guard directly on a synthetic call
        from stglib_spark.sources.pd0 import _parse_bottom_track

        assert _parse_bottom_track(b"\x00" * 40, 0, 4) is None
        rows = list(parse_bt_ensembles(bytes(blob), "t"))
        assert len(rows) == 1


def test_pd0_attitude_and_xform(tmp_path, spark):
    """Variable-leader attitude std-devs + ADC channels
    (rdiadcpy.py:1270-1294) and the 0x3200 instrument transformation
    matrix (rdiadcpy.py:1497-1523, axis-major int16 / 10000)."""
    ens = _mk_ensembles(2, ncells=2)
    # axis-major: 3 rows (X, Y, Z) x 4 beam columns
    mat = [
        [1.4619, -1.4619, 0.0, 0.0],
        [0.0, 0.0, -1.4619, 1.4619],
        [0.2661, 0.2661, 0.2661, 0.2661],
    ]
    for e in ens:
        e.update(heading_std=2.0, pitch_std=0.3, roll_std=0.5,
                 xmit_voltage=155, attitude_temp=88, xform=mat)
    p = str(tmp_path / "att.000")
    write_pd0(p, ens, ncells=2)

    r = read_pd0(spark, p).orderBy("ensemble", "cell").collect()[0]
    assert r["heading_std"] == pytest.approx(2.0)
    assert r["pitch_std"] == pytest.approx(0.3)
    assert r["roll_std"] == pytest.approx(0.5)
    assert r["xmit_voltage"] == 155 and r["attitude_temp"] == 88

    from stglib_spark.sources.pd0 import pd0_transform_matrix

    got = pd0_transform_matrix(p)
    assert len(got) == 3 and len(got[0]) == 4  # axis rows x beam cols
    for a in range(3):
        for b in range(4):
            assert got[a][b] == pytest.approx(mat[a][b], abs=1e-4)


def test_pd0_vertical_beam_roundtrip(tmp_path, spark):
    """Sentinel V vertical-beam family (leader 0x0F01 + vel/cor/amp/pg
    0x0A00-0x0D00): own cell geometry, mm/s scaling, bad-value nulls."""
    from stglib_spark.sources.pd0 import read_pd0_vbeam

    ens = _mk_ensembles(2, ncells=2)
    ens[0]["vbeam"] = {
        "vel_mm": [50, -75, -32768],
        "cor": [100, 101, 102],
        "amp": [60, 61, 62],
        "pg": [99, 98, 97],
        "cell_cm": 200,
        "first_cm": 100,
    }
    # ensemble 2 has no vertical beam
    p = str(tmp_path / "vb.000")
    write_pd0(p, ens, ncells=2)

    assert read_pd0(spark, p).count() == 2 * 2  # slant profiles unaffected
    vb = read_pd0_vbeam(spark, p).orderBy("ensemble", "cell").collect()
    assert [r["ensemble"] for r in vb] == [1, 1, 1]
    assert [r["vbindist"] for r in vb] == pytest.approx([1.0, 3.0, 5.0])
    assert vb[0]["vb_vel"] == pytest.approx(0.050)
    assert vb[1]["vb_vel"] == pytest.approx(-0.075)
    assert vb[2]["vb_vel"] is None  # vendor bad value
    assert vb[0]["vb_cor"] == 100 and vb[2]["vb_amp"] == 62 and vb[1]["vb_pg"] == 98


def test_pd0_wavesmon_roundtrip(tmp_path, spark):
    """Wavesmon 4 on-board wave statistics (0x000B + 0x000C): mm→m
    heights, seconds periods, degree directions, sea/swell partition."""
    from stglib_spark.sources.pd0 import read_pd0_waves

    ens = _mk_ensembles(2, ncells=2)
    ens[0]["waves"] = {
        "hs": 1.25, "tp": 8, "dp": 270, "dm": 265,
        "h_max": 2.1, "h_13": 1.3, "t_01": 7, "t_z": 6,
        "hs_sea": 0.9, "hs_swell": 0.7, "tp_sea": 5, "tp_swell": 11,
        "dp_sea": 250, "dp_swell": 280,
    }
    p = str(tmp_path / "wv.000")
    write_pd0(p, ens, ncells=2)

    rows = read_pd0_waves(spark, p).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ensemble"] == 1
    assert r["hs"] == pytest.approx(1.25)
    assert r["tp"] == 8.0 and r["dp"] == 270.0 and r["dm"] == 265.0
    assert r["h_max"] == pytest.approx(2.1) and r["h_13"] == pytest.approx(1.3)
    assert r["t_01"] == 7.0 and r["t_z"] == 6.0
    assert r["hs_sea"] == pytest.approx(0.9)
    assert r["hs_swell"] == pytest.approx(0.7)
    assert r["tp_swell"] == 11.0 and r["dp_sea"] == 250.0


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
