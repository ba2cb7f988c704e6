"""RBR Ruskin ``.rsk`` (SQLite) ingest.

Reference: ``stglib/rsk/rsk2cdf.py:11-307`` (``SELECT tstamp, channelXX
FROM data|burstdata``, serial from ``instruments``) and the sampling-rate
probes ``stglib/core/utils.py:1417-1491`` (``samplingcount`` /
``samplingperiod`` / ``repetitionperiod`` from ``schedules`` | ``wave`` |
``continuous``).

The .rsk is an instrument logger database — O(10-100 MB) per deployment,
config-scale, so it is read at the driver with stdlib sqlite3 and handed
to Spark via ``createDataFrame`` in Arrow batches. tstamp is epoch
milliseconds; burst mode derives (burst, sample) keys from samplingcount —
the same derived-key arithmetic as the CSV adapter (no reshape).
"""

from __future__ import annotations

import sqlite3
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


def rsk_sampling_attrs(path: str) -> dict[str, Any]:
    """Sampling metadata probe (core/utils.py:1417-1491): try schedules,
    fall back to wave / continuous tables; periods are milliseconds."""
    out: dict[str, Any] = {}
    con = sqlite3.connect(path)
    try:
        def probe(col: str, tables: tuple[str, ...]) -> Any:
            for t in tables:
                try:
                    row = con.execute(f"select {col} from {t}").fetchone()
                    if row is not None:
                        return row[0]
                except sqlite3.Error:
                    continue
            return None

        out["samples_per_burst"] = probe("samplingcount", ("schedules", "wave"))
        sp = probe("samplingperiod", ("schedules", "wave", "continuous"))
        if sp:
            out["sample_interval"] = float(sp) / 1000.0
        rp = probe("repetitionperiod", ("schedules", "wave"))
        if rp:
            out["burst_interval"] = float(rp) / 1000.0
        serial = probe("serialID", ("instruments",))
        if serial is not None:
            out["serial_number"] = serial
    finally:
        con.close()
    return out


def read_rsk(
    spark: SparkSession,
    path: str,
    channels: dict[str, str] | None = None,
    table: str = "data",
) -> DataFrame:
    """Read channel columns from the .rsk ``data``/``burstdata`` table →
    long-form DataFrame (time + EPIC-named value columns).

    ``channels`` maps sqlite column → output name, default
    ``{"channel01": "P_1"}`` (pressure-only instruments,
    rsk2cdf.py:218-228). Burst tables are spelled either ``burstdata`` or
    ``burstData`` depending on Ruskin version — both are tried
    (rsk2cdf.py:193-196).
    """
    channels = channels or {"channel01": "P_1"}
    cols = ", ".join(channels)
    con = sqlite3.connect(path)
    try:
        tables = (table, "burstData") if table == "burstdata" else (table,)
        rows = None
        for t in tables:
            try:
                rows = con.execute(f"SELECT tstamp, {cols} FROM {t}").fetchall()
                break
            except sqlite3.Error:
                continue
        if rows is None:
            raise ValueError(f"no readable table {table!r} in {path}")
    finally:
        con.close()

    schema = "tstamp LONG, " + ", ".join(f"{c} DOUBLE" for c in channels)
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        F.timestamp_micros(F.col("tstamp") * 1000).alias("time"),
        *[F.col(c).alias(name) for c, name in channels.items()],
    )
    attrs = rsk_sampling_attrs(path)
    spb = attrs.get("samples_per_burst")
    if spb and table.lower().startswith("burst"):
        from pyspark.sql import Window

        w = Window.orderBy("time")
        idx = F.row_number().over(w) - 1
        out = out.withColumn("sample", (idx % int(spb)).cast("int")).withColumn(
            "burst", (idx / int(spb)).cast("long")
        )
    return out
