"""Fixture round-trip for the Aquadopp text-file adapter."""

import datetime as dt

import pytest

from stglib_spark.sources.aqd import (
    read_aqd_whd,
    read_aquadopp_waves,
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


def _write_wave_deployment(base, nburst=2, nsamps=4, partial=2):
    """.whd burst headers + .wad burst-major samples with a partial tail."""
    with open(base + ".hdr", "w") as f:
        f.write("Wave measurements                     ENABLED\n")
        f.write("Wave - Number of samples              %d\n" % nsamps)
        f.write("Wave - Sampling rate                  2 Hz\n")
        f.write("Coordinate system                     BEAM\n")
    with open(base + ".whd", "w") as f:
        for b in range(nburst + 1):  # header rows may outnumber full bursts
            f.write(
                f"3 15 2024 {10 + b} 0 0.0000 {b + 1} {nsamps} 0.41 12.5 1500.0 "
                f"{100.0 + b} 1.5 -0.5 10.0 0 {18.5 + b} 0.5 120 121 122\n"
            )
    with open(base + ".wad", "w") as f:
        rows = nburst * nsamps + partial  # trailing partial burst
        for i in range(rows):
            f.write(
                f"{i // nsamps + 1} {i % nsamps + 1} {10.0 + i / 10:.2f} 0 0 "
                f"{0.01 * i:.3f} {0.02 * i:.3f} {0.03 * i:.3f} 0 "
                f"{140 + i} {141 + i} {142 + i}\n"
            )


def test_aqd_whd(tmp_path, spark):
    base = str(tmp_path / "WVS01")
    _write_wave_deployment(base)
    whd = read_aqd_whd(spark, base + ".whd").orderBy("row_idx").collect()
    assert len(whd) == 3
    assert whd[0]["time"] == dt.datetime(2024, 3, 15, 10, 0)
    assert whd[1]["burst"] == 2
    assert whd[0]["cellpos"] == pytest.approx(0.41)
    assert whd[2]["Temperature"] == pytest.approx(20.5)
    assert whd[0]["avgamp3"] == pytest.approx(122.0)


def test_aqd_wad_burst_keys_and_truncation(tmp_path, spark):
    base = str(tmp_path / "WVS01")
    _write_wave_deployment(base, nburst=2, nsamps=4, partial=2)
    cfg = {"basefile": base}
    df = read_aquadopp_waves(spark, base, cfg)
    rows = df.orderBy("burst", "sample").collect()
    # 2 full bursts of 4 samples; the 2-sample tail is truncated
    assert len(rows) == 8
    assert {"Pressure", "VEL1", "VEL2", "VEL3", "AMP1"} <= set(df.columns)
    assert rows[0]["sample"] == 0 and rows[3]["sample"] == 3
    assert rows[4]["burst"] == 2  # second burst header joined
    assert rows[4]["time"] == dt.datetime(2024, 3, 15, 11, 0)
    assert rows[0]["VEL1"] == pytest.approx(0.0)
    assert rows[5]["Pressure"] == pytest.approx(10.5)
    assert rows[0]["sample_interval"] == pytest.approx(0.5)


def test_aqd_wad_num_wave_bursts_override(tmp_path, spark):
    base = str(tmp_path / "WVS01")
    _write_wave_deployment(base, nburst=2, nsamps=4, partial=2)
    df = read_aquadopp_waves(spark, base, {"num_wave_bursts": 1})
    assert df.count() == 4


def _write_hr_deployment(base, nburst=2, spb=4, ncells=5, partial=2, cor=True):
    """HR fixture: .hdr with HR markers + distance table, HR-layout .sen
    (per-sample rows incl. a trailing partial burst), .a/.v/.c matrices
    with leading burst+ensemble counters."""
    with open(base + ".hdr", "w") as f:
        f.write(
            "Measurement/Burst interval            600 sec\n"
            "Cell size                             30 mm\n"
            f"Number of cells                       {ncells}\n"
            "Blanking distance                     0.096 m\n"
            "Extended velocity range               OFF\n"
            f"Samples per burst                     {spb}\n"
            "Sampling rate                         8 Hz\n"
            "Coordinate system                     BEAM\n"
            "Serial number                         AQD 9999\n"
        )
        f.write("Beam    Vertical\nDistances (m)\n---------\n")
        for b in range(ncells):
            f.write(f"{b + 1}\t{0.106 + 0.03 * b:.3f}\t{0.100 + 0.028 * b:.3f}\n")
        f.write("Data file format\n")
    nrows = nburst * spb + partial
    with open(base + ".sen", "w") as f:
        for i in range(nrows):
            burst, samp = i // spb + 1, i % spb
            # M D Y H M S burst ens err stat batt sspd hdg pitch roll pres temp a1 a2
            f.write(
                f"3 15 2024 10 {burst} {samp}.0000 {burst} {samp + 1} 0 0 "
                f"12.5 1500.0 {100.0 + i} 1.5 -0.5 {20.0 + i} 18.5 32768 16384\n"
            )
    for n in (1, 2, 3):
        for ext, fmt in (("a", "{v}"), ("v", "{v}"), ("c", "{v}")):
            if ext == "c" and not cor:
                continue
            with open(f"{base}.{ext}{n}", "w") as f:
                for i in range(nrows):
                    burst, samp = i // spb + 1, i % spb
                    vals = " ".join(
                        str(n * 1000 + i * 10 + b) for b in range(ncells)
                    )
                    f.write(f"{burst} {samp + 1} {vals}\n")


def test_aqd_hr_hdr_meta(tmp_path):
    base = str(tmp_path / "HR01")
    _write_hr_deployment(base)
    meta = read_aqd_hdr_meta(base + ".hdr")
    assert meta["AQDHR"] is True
    assert meta["AQDHRSamplesPerBurst"] == 4
    assert meta["AQDHRCellSize"] == 30
    assert meta["AQDHRCellSize_m"] == pytest.approx(0.03)
    assert meta["AQDHRBlankingDistance"] == pytest.approx(0.096)
    assert meta["AQDHRCoordinateSystem"] == "BEAM"
    # vertical column is the operative CCD for HR; beam kept alongside
    assert meta["AQDCCD"][0] == pytest.approx(0.100)
    assert meta["AQDCCDBEAM"][0] == pytest.approx(0.106)
    assert len(meta["AQDCCD"]) == 5


def test_aqd_hr_full_with_correlation(tmp_path, spark):
    from stglib_spark.sources.aqd import read_aquadopp_hr

    base = str(tmp_path / "HR01")
    _write_hr_deployment(base, nburst=2, spb=4, ncells=5, partial=2)
    df = read_aquadopp_hr(spark, base, {})
    rows = df.orderBy("row_idx", "bin").collect()
    # partial trailing burst truncated: 2 bursts * 4 samples * 5 cells
    assert len(rows) == 2 * 4 * 5
    r = rows[0]
    assert {"VEL1", "VEL2", "VEL3", "AMP1", "COR1", "COR2", "COR3",
            "burst", "sample", "burst_time", "Soundspeed"} <= set(df.columns)
    assert r["AMP1"] == 1000.0 and r["COR1"] == 1000.0
    assert r["VEL2"] == 2000.0
    # bindist from the hdr's VERTICAL distance column
    assert r["bindist"] == pytest.approx(0.100)
    assert rows[1]["bindist"] == pytest.approx(0.128)
    # burst/sample keys + burst_time = first sample's timestamp
    assert r["burst"] == 0 and r["sample"] == 0
    last = rows[-1]
    assert last["burst"] == 1 and last["sample"] == 3
    assert last["burst_time"] == dt.datetime(2024, 3, 15, 10, 2, 0)
    assert r["burst_time"] == dt.datetime(2024, 3, 15, 10, 1, 0)


def test_aqd_hr_missing_correlation_null_fills(tmp_path, spark):
    from stglib_spark.sources import ingest, resolve_instrument
    from stglib_spark.sources.aqd import read_aquadopp_hr

    assert resolve_instrument("aqdhr") == "aqdhr"
    base = str(tmp_path / "HR02")
    _write_hr_deployment(base, cor=False)
    df = ingest(spark, "aqdhr", base, {})
    rows = df.orderBy("row_idx", "bin").collect()
    assert len(rows) == 2 * 4 * 5
    assert all(r["COR1"] is None and r["COR3"] is None for r in rows)
    assert rows[0]["VEL1"] == 1000.0


def test_aqd_hr_correlation_feeds_cor_gate(spark):
    """The reason HR loads .cN files: the average-correlation QA gate
    (aqdutils.py:1668-1714). HR ingest → cor_avg → fill_cor nulls
    velocities where the burst's mean correlation fails the threshold."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from stglib_spark.operators.velocity import fill_cor
    from stglib_spark.sources.aqd import read_aquadopp_hr

    d = tempfile.mkdtemp()
    base = os.path.join(d, "HR03")
    _write_hr_deployment(base, nburst=2, spb=4, ncells=5, partial=0)
    df = read_aquadopp_hr(spark, base, {})
    # per-row average beam correlation, then EPIC velocity naming
    enu = df.select(
        "row_idx", "bin",
        F.col("VEL1").alias("u_1205"),
        F.col("VEL2").alias("v_1206"),
        F.col("VEL3").alias("w_1204"),
        ((F.col("COR1") + F.col("COR2") + F.col("COR3")) / 3).alias("cor_avg"),
    )
    thr = float(
        enu.agg(F.expr("percentile_approx(cor_avg, 0.5)")).collect()[0][0]
    )
    gated = fill_cor(enu, {"velocity_cor_min": thr})
    rows = gated.collect()
    kept = [r for r in rows if r["u_1205"] is not None]
    dropped = [r for r in rows if r["u_1205"] is None]
    assert kept and dropped  # threshold actually bites
    assert all(r["cor_avg"] > thr for r in kept)
    assert all(r["cor_avg"] <= thr for r in dropped)
