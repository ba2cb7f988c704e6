"""CF compliance lint (reference: core/utils.py:44-70 compliance check)."""

import datetime

from stglib_spark.attrs import apply_var_attrs
from stglib_spark.cf import check_dataframe, write_report

GOOD_GLOBALS = {
    "Conventions": "CF-1.11",
    "title": "test deployment",
    "history": "processed",
    "institution": "USGS",
}


def _df(spark):
    rows = [(datetime.datetime(2024, 1, 1, 0, 0, i), 10.0, 5.0) for i in range(3)]
    return spark.createDataFrame(rows, ["time", "P_1", "mystery_var"])


def test_clean_dataframe_passes(spark):
    df = apply_var_attrs(_df(spark).drop("mystery_var"))
    assert check_dataframe(df, GOOD_GLOBALS) == []


def test_missing_attrs_flagged(spark):
    df = apply_var_attrs(_df(spark))  # mystery_var has no attrs table entry
    problems = check_dataframe(df, GOOD_GLOBALS)
    assert any("mystery_var" in p and "units" in p for p in problems)


def test_missing_time_and_globals(spark):
    df = spark.createDataFrame([(1.0,)], ["P_1"])
    problems = check_dataframe(apply_var_attrs(df), {"Conventions": "ACDD-1.3"})
    assert any("missing 'time'" in p for p in problems)
    assert any("'title'" in p for p in problems)
    assert any("does not name a CF version" in p for p in problems)


def test_wrong_time_type(spark):
    df = spark.createDataFrame([(1, 2.0)], ["time", "P_1"])
    problems = check_dataframe(apply_var_attrs(df), GOOD_GLOBALS)
    assert any("must be TIMESTAMP" in p for p in problems)


def test_write_report(tmp_path, spark):
    out = str(tmp_path / "x.cfcheck.txt")
    write_report([], out)
    assert "OK" in open(out).read()
    write_report(["bad thing"], out)
    assert "bad thing" in open(out).read()


def test_check_globalatts_required_keys():
    """Reference pre-flight gate (utils.py:1572-1577): WATER_DEPTH /
    latitude / longitude / MOORING must be defined; strict mode
    reproduces the reference's raise, non-strict returns the list."""
    import pytest

    from stglib_spark.config import check_globalatts

    full = {"WATER_DEPTH": 10.0, "latitude": 40.0, "longitude": -70.0,
            "MOORING": "1234"}
    assert check_globalatts(full) == []
    partial = {"latitude": 40.0}
    assert check_globalatts(partial) == [
        "WATER_DEPTH", "longitude", "MOORING"
    ]
    with pytest.raises(KeyError, match="WATER_DEPTH must be defined"):
        check_globalatts(partial, strict=True)


def test_time_encoding_prefers_int32(tmp_path, spark):
    """Reference check_time_encoding (utils.py:1556-1569): whole-second
    in-range times export as i4; sub-second stays double."""
    import numpy as np
    from pyspark.sql import functions as F

    from stglib_spark.attrs import apply_var_attrs
    from stglib_spark.functions.netcdf3 import read_nc3
    from stglib_spark.sources.netcdf import write_netcdf

    whole = apply_var_attrs(
        spark.range(4).select(
            F.timestamp_seconds(F.lit(1622505600) + F.col("id")).alias("time"),
            F.col("id").cast("double").alias("P_1"),
        )
    )
    p1 = str(tmp_path / "whole.nc")
    write_netcdf(whole, p1, attrs={"title": "t"})
    nc = read_nc3(p1)
    assert nc["variables"]["time"]["data"].dtype == np.dtype(">i4")

    frac = apply_var_attrs(
        spark.range(4).select(
            F.timestamp_seconds(
                F.lit(1622505600) + F.col("id") * F.lit(0.5)
            ).alias("time"),
            F.col("id").cast("double").alias("P_1"),
        )
    )
    p2 = str(tmp_path / "frac.nc")
    write_netcdf(frac, p2, attrs={"title": "t"})
    nc2 = read_nc3(p2)
    assert nc2["variables"]["time"]["data"].dtype == np.dtype(">f8")
