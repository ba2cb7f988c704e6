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
