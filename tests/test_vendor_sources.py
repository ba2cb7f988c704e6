"""Round-trip tests for the Seagauge .wb/.hex and RBR .rsk readers."""

import datetime as dt
import sqlite3

import pytest

from stglib_spark.sources.rsk import read_rsk, rsk_sampling_attrs
from stglib_spark.sources.sg import parse_wb, read_sg_hex_meta, read_sg_wb


def _write_wb(path, bursts):
    """bursts: list of (burst_no, epoch2000_s, samples list)."""
    with open(path, "w") as f:
        f.write("SBE 26plus\n")
        for no, t, samples in bursts:
            f.write(f"* {no} {t} x {len(samples)} y\n")
            for i in range(0, len(samples), 4):
                f.write(" ".join(f"{v:.3f}" for v in samples[i : i + 4]) + "\n")


def test_sg_wb_roundtrip(tmp_path, spark):
    p = str(tmp_path / "dep.wb")
    _write_wb(
        p,
        [
            (0, 0, [10.0, 10.1, 10.2, 10.3, 10.4, 10.5, 10.6, 10.7]),
            (1, 3600, [11.0, 11.1, 11.2, 11.3]),
        ],
    )
    df = read_sg_wb(spark, p).orderBy("burst_number", "sample")
    rows = df.collect()
    assert len(rows) == 12
    assert rows[0]["time"] == dt.datetime(2000, 1, 1)
    assert rows[0]["sample"] == 1 and rows[0]["P_1"] == pytest.approx(10.0)
    assert rows[8]["time"] == dt.datetime(2000, 1, 1, 1)
    assert rows[8]["burst_number"] == 1


def test_sg_hex_meta(tmp_path):
    p = str(tmp_path / "dep.hex")
    with open(p, "w") as f:
        f.write(
            "Software Version 1.2\n"
            "tide measurement: interval = 10.0 minutes, duration = 60 seconds\n"
            "*1024 wave samples/burst at 4.00 scans/sec, duration = 256 seconds\n"
            "U0 = 5.821459e+00\n"
            "TA0 = 2.3e-04\n"
            "S>DD\n"
            "ignored binary tail\n"
        )
    meta = read_sg_hex_meta(p)
    assert meta["SGSoftwareVersion"] == "1.2"
    assert meta["SGTideInterval"] == "10.0"
    assert meta["SGWaveSamples"] == "1024"
    assert meta["SGSample_rate"] == "4.00"
    assert meta["SGCalibrationU0"] == pytest.approx(5.821459)
    assert meta["SGCalibrationTA0"] == pytest.approx(2.3e-4)


def test_parse_wb_ignores_trailing_garbage():
    txt = "SBE header\n* 7 100 x 3 y\n1.0 2.0 3.0 4.0\n"
    rows = list(parse_wb(txt, "f"))
    # only 3 samples declared — 4th token ignored
    assert [r.P_1 for r in rows] == [1.0, 2.0, 3.0]
    assert rows[0].time == dt.datetime(2000, 1, 1, 0, 1, 40)


def _write_rsk(path, burst=False):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE instruments (serialID TEXT)")
    con.execute("INSERT INTO instruments VALUES ('123456')")
    con.execute(
        "CREATE TABLE schedules (samplingcount INT, samplingperiod INT,"
        " repetitionperiod INT)"
    )
    con.execute("INSERT INTO schedules VALUES (4, 250, 3600000)")
    table = "burstdata" if burst else "data"
    con.execute(f"CREATE TABLE {table} (tstamp INT, channel01 REAL, channel02 REAL)")
    t0 = 1704067200000  # 2024-01-01 epoch ms
    for i in range(8):
        con.execute(
            f"INSERT INTO {table} VALUES (?, ?, ?)",
            (t0 + i * 250, 10.0 + i * 0.1, 20.0 + i),
        )
    con.commit()
    con.close()


def test_rsk_reader_continuous(tmp_path, spark):
    p = str(tmp_path / "dep.rsk")
    _write_rsk(p)
    attrs = rsk_sampling_attrs(p)
    assert attrs["samples_per_burst"] == 4
    assert attrs["sample_interval"] == pytest.approx(0.25)
    assert attrs["burst_interval"] == pytest.approx(3600.0)
    assert attrs["serial_number"] == "123456"

    df = read_rsk(spark, p, {"channel01": "P_1", "channel02": "T_28"})
    rows = df.orderBy("time").collect()
    assert len(rows) == 8
    assert rows[0]["time"] == dt.datetime(2024, 1, 1)
    assert rows[0]["P_1"] == pytest.approx(10.0)
    assert rows[0]["T_28"] == pytest.approx(20.0)


def test_rsk_reader_burst_keys(tmp_path, spark):
    p = str(tmp_path / "depb.rsk")
    _write_rsk(p, burst=True)
    df = read_rsk(spark, p, {"channel01": "P_1"}, table="burstdata")
    rows = df.orderBy("time").collect()
    assert [r["sample"] for r in rows] == [0, 1, 2, 3, 0, 1, 2, 3]
    assert [r["burst"] for r in rows] == [0, 0, 0, 0, 1, 1, 1, 1]
