"""Fixture round-trip for the Aquadopp text-file adapter."""

import datetime as dt

import pytest

from stglib_spark.sources.aqd import (
    read_aqd_hdr_meta,
    read_aqd_sen,
    read_aquadopp,
)


def _write_deployment(base):
    # .sen: M D Y H M S err stat batt sspd heading pitch roll pres temp a1 a2
    with open(base + ".sen", "w") as f:
        for i in range(3):
            f.write(
                f"3 15 2024 10 {i} 0.0000 0 0 12.5 1500.0 "
                f"{100.0 + i} 1.5 -0.5 {20.0 + i} 18.5 32768 16384\n"
            )
    for n in (1, 2, 3):
        with open(f"{base}.a{n}", "w") as f:
            for i in range(3):
                f.write(" ".join(str(100 + n * 10 + i + b) for b in range(4)) + "\n")
        with open(f"{base}.v{n}", "w") as f:
            for i in range(3):
                f.write(
                    " ".join(f"{(n + i + b) / 100:.3f}" for b in range(4)) + "\n"
                )


def test_aqd_sen(tmp_path, spark):
    base = str(tmp_path / "AQD123")
    _write_deployment(base)
    sen = read_aqd_sen(spark, base + ".sen").orderBy("row_idx").collect()
    assert len(sen) == 3
    assert sen[0]["time"] == dt.datetime(2024, 3, 15, 10, 0)
    assert sen[1]["time"] == dt.datetime(2024, 3, 15, 10, 1)
    assert sen[0]["Heading"] == pytest.approx(100.0)
    assert sen[0]["Pressure"] == pytest.approx(20.0)
    assert sen[0]["AnalogInput1"] == pytest.approx(32768 * 5 / 65535)


def test_aquadopp_join(tmp_path, spark):
    base = str(tmp_path / "AQD123")
    _write_deployment(base)
    cfg = {
        "AQDCoordinateSystem": "ENU",
        "AQDBlankingDistance": 0.4,
        "AQDCellSize_m": 0.5,
    }
    df = read_aquadopp(spark, base, cfg)
    rows = df.orderBy("row_idx", "bin").collect()
    assert len(rows) == 3 * 4
    r = rows[0]
    assert {"U", "V", "W", "AMP1", "AMP2", "AMP3"} <= set(df.columns)
    assert r["U"] == pytest.approx(0.01)  # n=1, i=0, b=0
    assert r["AMP1"] == 110
    assert r["bindist"] == pytest.approx(0.4 + 0.25)
    assert rows[1]["bindist"] == pytest.approx(0.4 + 0.25 + 0.5)
    # sensor columns rode along the row_idx join
    assert r["Heading"] == pytest.approx(100.0)


def test_aqd_hdr_meta(tmp_path):
    p = str(tmp_path / "AQD123.hdr")
    with open(p, "w") as f:
        f.write(
            "Measurement/Burst interval            60 sec\n"
            "Cell size                             50 cm\n"
            "Number of cells                       20\n"
            "Blanking distance                     0.40 m\n"
            "Coordinate system                     ENU\n"
            "Serial number                         AQD 8964\n"
            "Number of measurements                14400\n"
        )
    meta = read_aqd_hdr_meta(p)
    assert meta["AQDMeasurementBurstInterval"] == 60
    assert meta["AQDCellSize"] == 50
    assert meta["AQDNumberOfCells"] == 20
    assert meta["AQDBlankingDistance"] == pytest.approx(0.4)
    assert meta["AQDCoordinateSystem"] == "ENU"
    assert meta["AQDNumberOfMeasurements"] == 14400


def test_vector_dat(tmp_path, spark):
    import datetime as dt

    from stglib_spark.sources.aqd import read_vector

    base = str(tmp_path / "VEC01")
    with open(base + ".vhd", "w") as f:
        # M D Y H M S Burst nsamp noise...
        f.write("3 15 2024 12 0 0 1 4 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0\n")
        f.write("3 15 2024 13 0 0 2 4 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0\n")
    with open(base + ".dat", "w") as f:
        for burst in (1, 2):
            for ens in range(1, 5):
                f.write(
                    f"{burst} {ens} 0.1 0.2 0.3 80 81 82 20 21 22 95 96 97 "
                    f"10.5 0 0 0\n"
                )
    df = read_vector(spark, base, {"VECSamplingRate": 2})
    rows = df.orderBy("Burst", "sample").collect()
    assert len(rows) == 8
    assert rows[0]["time"] == dt.datetime(2024, 3, 15, 12, 0, 0)
    assert rows[1]["time"] == dt.datetime(2024, 3, 15, 12, 0, 0, 500000)
    assert rows[4]["time"] == dt.datetime(2024, 3, 15, 13, 0, 0)
    assert rows[0]["VEL1"] == 0.1 and rows[0]["Pressure"] == 10.5
