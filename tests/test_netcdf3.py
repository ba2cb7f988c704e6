"""Classic netCDF-3 codec + export edge: pure-Python write/read round
trip, CF attr carriage, profile pivot to (time, bindist), and the
post-write CF lint — the reference's netCDF output contract
(core/utils.py:352-749, rsk/cdf2nc.py:127-148) un-gated in a container
without xarray/netCDF4."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from stglib_spark.functions.netcdf3 import read_nc3, write_nc3


def test_nc3_roundtrip_numeric_and_char(tmp_path):
    p = str(tmp_path / "t.nc")
    rng = np.random.RandomState(0)
    temp = rng.randn(5).astype(np.float64)
    counts = np.arange(5, dtype=np.int32)
    write_nc3(
        p,
        dims={"time": 5},
        variables={
            "temperature": {
                "dims": ("time",),
                "data": temp,
                "attrs": {"units": "degree_C", "long_name": "sea temperature",
                          "valid_range": [-5.0, 40.0]},
            },
            "n": {"dims": ("time",), "data": counts, "attrs": {"units": "1"}},
            "station": {
                "dims": ("time",),
                "data": np.array(["A1", "B22", "C", "D4", "E5"]),
                "attrs": {"long_name": "station id"},
            },
        },
        global_attrs={"Conventions": "CF-1.11", "title": "t", "history": "h",
                      "institution": "i", "magnetic_variation": 12.5},
    )
    nc = read_nc3(p)
    assert nc["attrs"]["Conventions"] == "CF-1.11"
    assert nc["attrs"]["magnetic_variation"] == pytest.approx(12.5)
    np.testing.assert_allclose(nc["variables"]["temperature"]["data"], temp)
    assert nc["variables"]["temperature"]["attrs"]["units"] == "degree_C"
    assert nc["variables"]["temperature"]["attrs"]["valid_range"] == [-5.0, 40.0]
    np.testing.assert_array_equal(nc["variables"]["n"]["data"], counts)
    assert list(nc["variables"]["station"]["data"]) == ["A1", "B22", "C", "D4", "E5"]


def test_nc3_2d_variable(tmp_path):
    p = str(tmp_path / "p.nc")
    mat = np.arange(12, dtype=np.float64).reshape(4, 3)
    write_nc3(
        p,
        dims={"time": 4, "bindist": 3},
        variables={
            "vel": {"dims": ("time", "bindist"), "data": mat,
                    "attrs": {"units": "m s-1"}},
        },
        global_attrs={"title": "2d"},
    )
    nc = read_nc3(p)
    np.testing.assert_allclose(nc["variables"]["vel"]["data"], mat)
    assert nc["variables"]["vel"]["dims"] == ("time", "bindist")


def test_nc3_record_variables_read(tmp_path):
    """Files with an unlimited (record) time dimension — what
    xarray/netCDF4 write with unlimited_dims=['time'] — interleave one
    slab per record variable per record; the reader must reassemble
    them (a fixed-size-only reader silently returns empty data)."""
    import struct

    def name(s):
        raw = s.encode()
        pad = (4 - len(raw) % 4) % 4
        return struct.pack(">I", len(raw)) + raw + b"\x00" * pad

    numrecs = 3
    t = np.array([0.0, 3600.0, 7200.0])
    temp = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])  # (time, bindist)
    header = b"CDF\x01" + struct.pack(">I", numrecs)
    # dims: time (record, size 0), bindist (2)
    header += struct.pack(">II", 0x0A, 2)
    header += name("time") + struct.pack(">I", 0)
    header += name("bindist") + struct.pack(">I", 2)
    header += struct.pack(">II", 0, 0)  # no global attrs

    # two record vars: time (8 B/rec) and temp (16 B/rec) → recsize 24
    var_hdr = struct.pack(">II", 0x0B, 2)

    def var(nm, dimids, vsize, begin):
        b = name(nm) + struct.pack(">I", len(dimids))
        for d in dimids:
            b += struct.pack(">I", d)
        b += struct.pack(">II", 0, 0)  # no attrs
        b += struct.pack(">III", 6, vsize, begin)  # NC_DOUBLE
        return b

    v_time = var("time", (0,), 8, 0)
    v_temp = var("temp", (0, 1), 16, 0)
    base = len(header) + len(var_hdr) + len(v_time) + len(v_temp)
    v_time = var("time", (0,), 8, base)
    v_temp = var("temp", (0, 1), 16, base + 8)
    body = b""
    for r in range(numrecs):
        body += np.array([t[r]]).astype(">f8").tobytes()
        body += temp[r].astype(">f8").tobytes()
    p = str(tmp_path / "rec.nc")
    with open(p, "wb") as f:
        f.write(header + var_hdr + v_time + v_temp + body)

    nc = read_nc3(p)
    assert nc["dims"] == {"time": 3, "bindist": 2}
    np.testing.assert_allclose(nc["variables"]["time"]["data"], t)
    np.testing.assert_allclose(nc["variables"]["temp"]["data"], temp)
    assert nc["variables"]["temp"]["dims"] == ("time", "bindist")


def test_nc3_cdf2_64bit_offset_read(tmp_path):
    """CDF-2 (version byte 2) files carry u64 variable offsets — build one
    by hand and read it back."""
    import struct

    def name(s):
        raw = s.encode()
        pad = (4 - len(raw) % 4) % 4
        return struct.pack(">I", len(raw)) + raw + b"\x00" * pad

    vals = np.array([1.5, -2.5, 42.0])
    header = b"CDF\x02" + struct.pack(">I", 0)
    header += struct.pack(">II", 0x0A, 1) + name("time") + struct.pack(">I", 3)
    header += struct.pack(">II", 0, 0)  # no global attrs
    var_hdr = struct.pack(">II", 0x0B, 1)
    var_body = name("x") + struct.pack(">I", 1) + struct.pack(">I", 0)
    var_body += struct.pack(">II", 0, 0)  # no var attrs
    # nc_type DOUBLE=6, vsize 24, begin as u64
    prefix_len = len(header) + len(var_hdr) + len(var_body) + 4 + 4 + 8
    var_body += struct.pack(">II", 6, 24) + struct.pack(">Q", prefix_len)
    p = str(tmp_path / "v2.nc")
    with open(p, "wb") as f:
        f.write(header + var_hdr + var_body + vals.astype(">f8").tobytes())
    nc = read_nc3(p)
    np.testing.assert_allclose(nc["variables"]["x"]["data"], vals)
    assert nc["variables"]["x"]["dims"] == ("time",)


def test_nc3_shape_mismatch_raises(tmp_path):
    with pytest.raises(ValueError, match="shape"):
        write_nc3(
            str(tmp_path / "bad.nc"),
            dims={"time": 3},
            variables={"x": {"dims": ("time",), "data": np.zeros(4)}},
        )


GLOBALS = {
    "Conventions": "CF-1.11",
    "title": "test deployment",
    "history": "generated by tests",
    "institution": "test",
}


def _ts_df(spark):
    from pyspark.sql import functions as F

    from stglib_spark.attrs import apply_var_attrs

    t0 = dt.datetime(2023, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=i), 20.0 + 0.1 * i, 10.0 + 0.01 * i)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "time timestamp, T_28 double, P_1 double")
    return apply_var_attrs(df)


def test_write_netcdf_timeseries_roundtrip(spark, tmp_path):
    from stglib_spark.sources.netcdf import read_netcdf, write_netcdf

    p = str(tmp_path / "ts.nc")
    df = _ts_df(spark)
    write_netcdf(df, p, attrs=GLOBALS)

    nc = read_nc3(p)
    assert nc["attrs"]["Conventions"] == "CF-1.11"
    assert nc["variables"]["time"]["attrs"]["units"].startswith("seconds since 1970")
    # engine attr table carried: T_28/P_1 are EPIC names with units
    assert "units" in nc["variables"]["T_28"]["attrs"]
    np.testing.assert_allclose(
        nc["variables"]["T_28"]["data"], [20.0 + 0.1 * i for i in range(6)]
    )
    # CF lint is clean (report written next to the file)
    from stglib_spark.cf import check_netcdf

    assert check_netcdf(p) == []

    # import edge reads it back
    back = read_netcdf(spark, p, {}).orderBy("time").collect()
    assert len(back) == 6
    assert back[0]["time"] == dt.datetime(2023, 1, 1)
    assert back[0]["T_28"] == pytest.approx(20.0)


def test_write_netcdf_profile_pivots_to_2d(spark, tmp_path):
    from pyspark.sql import functions as F

    from stglib_spark.attrs import apply_var_attrs
    from stglib_spark.sources.netcdf import write_netcdf

    t0 = dt.datetime(2023, 1, 1)
    rows = []
    for i in range(4):
        for b in range(3):
            rows.append(
                (t0 + dt.timedelta(hours=i), b, 0.5 + b * 1.0,
                 float(i * 10 + b), 25.0 + i)
            )
    df = spark.createDataFrame(
        rows, "time timestamp, bin int, bindist double, u_1205 double, P_1 double"
    )
    df = apply_var_attrs(df)
    p = str(tmp_path / "prof.nc")
    write_netcdf(df, p, attrs=GLOBALS)

    nc = read_nc3(p)
    assert nc["dims"] == {"time": 4, "bindist": 3}
    assert nc["variables"]["u_1205"]["dims"] == ("time", "bindist")
    np.testing.assert_allclose(
        nc["variables"]["u_1205"]["data"],
        [[i * 10 + b for b in range(3)] for i in range(4)],
    )
    # per-time scalar stays 1-D
    assert nc["variables"]["P_1"]["dims"] == ("time",)
    np.testing.assert_allclose(nc["variables"]["P_1"]["data"], [25.0, 26, 27, 28])
    np.testing.assert_allclose(nc["variables"]["bindist"]["data"], [0.5, 1.5, 2.5])


def test_read_netcdf_profile_long_form(spark, tmp_path):
    """Import edge for 2-D (time, bindist) files: explodes back to the
    engine's long form with bin/bindist columns."""
    from stglib_spark.sources.netcdf import read_netcdf

    p = str(tmp_path / "prof2.nc")
    vel = np.arange(8, dtype=np.float64).reshape(4, 2)
    write_nc3(
        p,
        dims={"time": 4, "bindist": 2},
        variables={
            "time": {"dims": ("time",),
                     "data": np.array([0, 3600, 7200, 10800], dtype=np.float64),
                     "attrs": {"units": "seconds since 1970-01-01"}},
            "bindist": {"dims": ("bindist",), "data": np.array([0.5, 1.5]),
                        "attrs": {"units": "m"}},
            "u_1205": {"dims": ("time", "bindist"), "data": vel,
                       "attrs": {"units": "m s-1"}},
            "P_1": {"dims": ("time",),
                    "data": np.array([10.0, 11, 12, 13]),
                    "attrs": {"units": "dbar"}},
        },
        global_attrs=GLOBALS,
    )
    df = read_netcdf(spark, p, {})
    rows = df.orderBy("time", "bin").collect()
    assert len(rows) == 8
    assert rows[0]["time"] == dt.datetime(1970, 1, 1)
    assert rows[0]["bindist"] == pytest.approx(0.5)
    assert rows[1]["bindist"] == pytest.approx(1.5)
    assert rows[1]["u_1205"] == pytest.approx(1.0)
    assert rows[2]["u_1205"] == pytest.approx(2.0)  # second timestamp, bin 0
    assert rows[0]["P_1"] == pytest.approx(10.0) == rows[1]["P_1"]


def test_check_netcdf_flags_missing_attrs(tmp_path):
    from stglib_spark.cf import check_netcdf

    p = str(tmp_path / "bad.nc")
    write_nc3(
        p,
        dims={"time": 2},
        variables={
            "time": {"dims": ("time",), "data": np.array([0.0, 3600.0]),
                     "attrs": {"units": "seconds since 1970-01-01"}},
            "mystery": {"dims": ("time",), "data": np.array([1.0, 2.0])},
        },
        global_attrs={"title": "x"},
    )
    problems = check_netcdf(p)
    assert any("mystery" in p_ and "units" in p_ for p_ in problems)
    assert any("history" in p_ for p_ in problems)


def test_nc3_integer_range_promotion(tmp_path):
    """Out-of-range integers must PROMOTE, never wrap modulo 2^n
    (a large ensemble counter would otherwise export corrupted)."""
    import numpy as np

    from stglib_spark.functions.netcdf3 import read_nc3, write_nc3

    p = str(tmp_path / "wide.nc")
    big = np.array([0, 2**40, 7], dtype=np.int64)  # > int32
    u16 = np.array([40000, 1], dtype=np.uint16)  # > int16
    u8 = np.array([200, 3], dtype=np.uint8)  # > int8
    small = np.array([1, 2, 3], dtype=np.int64)  # fits int32
    write_nc3(
        p,
        {"n3": 3, "n2": 2},
        {
            "big": {"dims": ("n3",), "data": big},
            "u16": {"dims": ("n2",), "data": u16},
            "u8": {"dims": ("n2",), "data": u8},
            "small": {"dims": ("n3",), "data": small},
        },
        {"counter": np.uint16(40000), "tiny": np.int64(5)},
    )
    out = read_nc3(p)
    np.testing.assert_array_equal(out["variables"]["big"]["data"], big)
    np.testing.assert_array_equal(out["variables"]["u16"]["data"], u16)
    np.testing.assert_array_equal(out["variables"]["u8"]["data"], u8)
    assert out["variables"]["small"]["data"].dtype == np.dtype(">i4")
    assert int(np.ravel(out["attrs"]["counter"])[0]) == 40000
    assert int(np.ravel(out["attrs"]["tiny"])[0]) == 5


def test_writer_skips_nonnumeric_and_null_arrays(tmp_path, spark):
    """2-D array export only engages for complete numeric equal-length
    arrays; string-array and null-array columns stay parquet-only (the
    pre-r13 skip behavior) instead of crashing the writer."""
    from pyspark.sql import functions as F

    from stglib_spark.attrs import apply_var_attrs
    from stglib_spark.functions.netcdf3 import read_nc3
    from stglib_spark.sources.netcdf import write_netcdf

    df = apply_var_attrs(
        spark.range(3).select(
            F.timestamp_seconds(F.lit(1622505600) + F.col("id")).alias(
                "time"
            ),
            F.col("id").cast("double").alias("P_1"),
            F.array(F.lit("a"), F.lit("b")).alias("tags"),
            F.when(
                F.col("id") == 1, F.array(F.lit(1.0), F.lit(2.0))
            ).alias("maybe_arr"),
        )
    )
    path = str(tmp_path / "mixed.nc")
    write_netcdf(df, path, attrs={"title": "t"})
    nc = read_nc3(path)
    assert "P_1" in nc["variables"]
    assert "tags" not in nc["variables"]
    assert "maybe_arr" not in nc["variables"]


def test_diwasp_zone_exports_without_nested_arrays(tmp_path, spark):
    """Exporting a diwasp zone (nested array<array> dspec) writes the
    1-D stats and the (time, frequency) fspec, skips the 3-D dspec, and
    uses the reference's s_diwasp-a.nc suffix."""
    import os

    from pyspark.sql import functions as F

    from stglib_spark import pipeline
    from stglib_spark.functions.netcdf3 import read_nc3

    d = str(tmp_path)
    zone = spark.range(2).select(
        F.timestamp_seconds(F.lit(1622505600) + F.col("id") * 3600).alias(
            "burst_time"
        ),
        F.expr(
            "transform(sequence(0, 3),"
            " k -> CAST(k + 1 AS DOUBLE) / CAST(8 AS DOUBLE))"
        ).alias("diwasp_frequency"),
        F.expr(
            "transform(sequence(0, 3), k -> transform(sequence(0, 5),"
            " d -> CAST(k + d + id AS DOUBLE)))"
        ).alias("diwasp_dspec"),
        (F.col("id").cast("double") + 0.5).alias("wh_4061"),
    )
    zone.write.mode("overwrite").parquet(os.path.join(d, "dep_diwasp"))
    out = pipeline.run_export_nc(
        spark,
        {"output_dir": d, "filename": "dep", "title": "t",
         "institution": "i", "Conventions": "CF-1.11"},
        zone="diwasp",
    )
    assert out.endswith("deps_diwasp-a.nc")
    nc = read_nc3(out)
    assert "wh_4061" in nc["variables"]
    assert nc["variables"]["diwasp_frequency"]["dims"] == (
        "diwasp_frequency",
    )
    assert "diwasp_dspec" not in nc["variables"]  # 3-D: parquet-only
