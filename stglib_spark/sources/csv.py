"""Delimited-text ingest adapters (RBR / EXO / HOBO / generic CSV family).

Reference semantics: RBR CSV (``rsk/csv2cdf.py:11-268``: pyarrow CSV,
burst reshape, EPIC renames), EXO (``exo.py:9-137``: skiprows + header
sniff), HOBO (``hobo.py:11-434``), generic whitespace files
(``aqd/hdr2cdf.py:8-116``). Spark-first: ``spark.read.csv`` with options;
only the header sniff touches the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from stglib_spark.sources import register_adapter

# vendor → EPIC variable renames (rsk/csv2cdf.py:295-327, utils.py:1759-1789)
EPIC_RENAMES = {
    "Pressure": "P_1",
    "pressure": "P_1",
    "Temperature": "T_28",
    "temperature": "T_28",
    "Salinity": "S_41",
    "salinity": "S_41",
    "Conductivity": "C_51",
    "conductivity": "C_51",
    "Turbidity": "Turb",
    "turbidity": "Turb",
    "Depth": "D_3",
}


def apply_epic_renames(df: DataFrame) -> DataFrame:
    mapping = {c: EPIC_RENAMES[c] for c in df.columns if c in EPIC_RENAMES}
    return df.withColumnsRenamed(mapping) if mapping else df


@register_adapter("rbr_csv")
def read_rbr_csv(spark: SparkSession, path: str, config: dict[str, Any]) -> DataFrame:
    """RBR Ruskin CSV export: header row, ISO timestamps in `Time` column
    (rsk/csv2cdf.py:19-30). Burst/wave deployments get (burst, sample)
    keys derived from samples_per_burst (rsk/csv2cdf.py:55-102) — pure
    column math, no reshape."""
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
        .csv(path)
    )
    if "Time" in df.columns:
        df = df.withColumnRenamed("Time", "time")
    df = df.withColumn("time", F.col("time").cast("timestamp"))
    df = apply_epic_renames(df)

    spb = config.get("samples_per_burst")
    if spb:
        from pyspark.sql import Window

        w = Window.orderBy("time")
        rn = F.row_number().over(w) - 1
        df = (
            df.withColumn("__rn", rn)
            .withColumn("burst", (F.col("__rn") / int(spb)).cast("long"))
            .withColumn("sample", (F.col("__rn") % int(spb)).cast("int"))
            .drop("__rn")
        )
    if str(config.get("featureType", "")).lower() == "profile":
        df = assign_profiles(spark, df, config)
    return df


def assign_profiles(
    spark: SparkSession, df: DataFrame, config: dict[str, Any]
) -> DataFrame:
    """CTD-cast segmentation from the Ruskin events file
    (rsk/csv2cdf.py:117-215, ``featureType: 'profile'``): "started" /
    "paused" event pairs delimit casts; each observation inside a cast
    window gets its ``profile`` id (rows between casts keep null). The
    events file is config-scale and parsed at the driver; the window
    table broadcasts into a range join — no shuffle of the observations.
    Per-profile latitude/longitude lists from the config ride along."""
    import pandas as pd

    events_path = config.get(
        "events_path", str(config.get("basefile", "")) + "_events.txt"
    )
    ev = pd.read_csv(events_path)
    ev = ev.rename(columns={"Time": "time"})
    ev["time"] = pd.to_datetime(ev["time"])
    starts = ev[ev["Type"].str.contains("started")]["time"].tolist()
    ends = ev[ev["Type"].str.contains("paused")]["time"].tolist()
    # initial setup can emit a leading "paused" before the first start
    if starts and ends and starts[0] > ends[0]:
        ends = ends[1:]
    if len(starts) != len(ends):
        raise ValueError(
            f"length of start events does not equal length of pause events "
            f"in {events_path}"
        )
    lats = config.get("latitude")
    lons = config.get("longitude")
    if isinstance(lats, (list, tuple)) and len(lats) != len(starts):
        raise ValueError(
            f"size of latitude ({len(lats)}) does not match number of "
            f"profiles ({len(starts)})"
        )
    rows = []
    for i, (s, e) in enumerate(zip(starts, ends)):
        rows.append(
            (
                i,
                s.to_pydatetime(),
                e.to_pydatetime(),
                float(lats[i]) if isinstance(lats, (list, tuple)) else None,
                float(lons[i]) if isinstance(lons, (list, tuple)) else None,
            )
        )
    windows = spark.createDataFrame(
        rows,
        "profile int, __ps timestamp, __pe timestamp, "
        "latitude double, longitude double",
    )
    return df.join(
        F.broadcast(windows),
        (F.col("time") >= F.col("__ps")) & (F.col("time") <= F.col("__pe")),
        "left",
    ).drop("__ps", "__pe")


@register_adapter("exo_csv")
def read_exo_csv(spark: SparkSession, path: str, config: dict[str, Any]) -> DataFrame:
    """YSI EXO KOR export: metadata preamble lines before the header row
    (exo.py:9-137 sniffs skiprows). The preamble length comes from config
    (``exo_skiprows``) or a driver-side sniff of the first KB."""
    skip = config.get("exo_skiprows")
    if skip is None:
        # driver-side sniff: first line starting with 'Date' is the header
        sc_file = open(path.replace("file:", ""), encoding="utf-8", errors="ignore")
        for i, line in enumerate(sc_file):
            if line.split(",")[0].strip().lower() in ("date", "date (mm/dd/yyyy)"):
                skip = i
                break
            if i > 100:
                skip = 0
                break
        sc_file.close()
    raw = spark.read.text(path)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = raw.withColumn("__ln", F.row_number().over(w) - 1)
    data = numbered.filter(F.col("__ln") >= int(skip or 0)).drop("__ln")
    header_line = data.limit(1).collect()[0][0]
    header = header_line.split(",")
    body = data.filter(F.col("value") != header_line)
    parts = F.split(F.col("value"), ",")
    cols = [
        F.trim(parts.getItem(i)).alias(name.strip() or f"col{i}")
        for i, name in enumerate(header)
    ]
    df = body.select(*cols)
    # time from the KOR Date + Time columns (exo.py:24-33); numerics cast
    # via try_cast so sentinel strings drop to null under ANSI mode
    date_col = next((c for c in df.columns if c.lower().startswith("date")), None)
    clock_col = next((c for c in df.columns if c.lower().startswith("time")), None)
    if date_col and clock_col:
        df = df.withColumn(
            "time",
            F.coalesce(
                F.try_to_timestamp(F.concat_ws(" ", date_col, clock_col)),
                F.try_to_timestamp(
                    F.concat_ws(" ", date_col, clock_col),
                    F.lit("MM/dd/yyyy HH:mm:ss"),
                ),
            ),
        ).drop(date_col, clock_col)
        df = df.filter(F.col("time").isNotNull())
    textual = ("site", "name", "sn", "serial", "unit", "fault")
    for c, t in df.dtypes:
        if (
            c != "time"
            and t == "string"
            and not any(k in c.lower() for k in textual)
        ):
            df = df.withColumn(c, F.expr(f"try_cast(`{c}` as double)"))
    return apply_epic_renames(df)


@register_adapter("generic_csv")
def read_generic_csv(
    spark: SparkSession, path: str, config: dict[str, Any]
) -> DataFrame:
    """Generic delimited reader covering the HOBO/TCM/troll/met/eco/mc
    family (SURVEY §2.1 row 'EXO/HOBO/TCM/...'): delimiter, skiprows,
    time column name/format from config."""
    reader = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("sep", str(config.get("csv_sep", ",")))
    )
    if config.get("csv_comment"):
        reader = reader.option("comment", str(config["csv_comment"]))
    if config.get("csv_skiprows"):
        # OSS Spark CSV has no skip-rows option (an unknown option is
        # silently ignored) — strip the preamble per file via binaryFile,
        # then parse the remaining lines as CSV from an RDD of strings.
        # One record per file: preamble-bearing CSVs are config-scale.
        skip = int(config["csv_skiprows"])
        binary = spark.read.format("binaryFile").load(path)

        def strip_preamble(rows):
            for r in rows:
                text = bytes(r.content).decode("utf-8", errors="replace")
                for line in text.splitlines()[skip:]:
                    yield line

        lines = binary.select("content").rdd.mapPartitions(strip_preamble)
        df = reader.csv(lines)
    else:
        df = reader.csv(path)
    tcol = config.get("time_col", "time")
    if tcol in df.columns and tcol != "time":
        df = df.withColumnRenamed(tcol, "time")
    if "time" in df.columns:
        fmt = config.get("time_format")
        df = df.withColumn(
            "time",
            F.to_timestamp(F.col("time"), fmt) if fmt else F.col("time").cast("timestamp"),
        )
    return apply_epic_renames(df)
