"""TRDI WinRiver ``.mat`` velocity-export ingest (+ ``.log`` metadata and
``.txt`` pressure companion).

Reference semantics: ``stglib/rdi/mat2cdf.py:12-227`` — each export is a
trio of files per segment:

- ``<seg>.mat``: ``info`` struct (cell/blank/cell1/ncells/angle),
  ``sens`` struct (``time`` = seconds since 1970, heading/pitch/roll/
  temperature/pressure-depth/sound-speed/salinity/orientation/voltage),
  ``wt`` struct with 3-D ``vel`` (time × cell × [E,N,U1,U2]) and
  ``int``/``corr``/``pg`` (time × cell × beam);
- ``<seg>.log``: tab-separated key/value lines → ``RDI``-prefixed attrs
  (``read_log_file``, mat2cdf.py:180-210);
- ``<seg>.txt``: CSV pressure series with Y/M/D/H/Min/Sec columns
  (``read_sens_file``, mat2cdf.py:213-227).

Spark shape: long form — one row per (time, bin) with the four velocity
components/beam statistics as columns, bindist from cell geometry, and
the per-time sensor scalars repeated per bin (EPIC names, same renames
as mat2cdf.py:66-127). Multi-segment exports parse one file per task.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

# sens field → EPIC name (mat2cdf.py:66-76 sensnames + ds_rename)
_SENS_EPIC = {
    "h": "Hdg_1215",
    "p": "Ptch_1216",
    "r": "Roll_1217",
    "t": "Tx_1211",
    "pd": "P_1",
    "sos": "SV_80",
    "s": "S_40",
    "o": "Orient",
    "v": "Bat_106",
}

_COMPONENTS = ("vel_e", "vel_n", "vel_u1", "vel_u2")


def parse_rdi_mat(path: str) -> dict[str, Any]:
    """One WinRiver .mat segment → numpy payloads. Pure (executor-safe)."""
    from stglib_spark.functions.mat5 import loadmat

    mat = loadmat(path)
    for req in ("info", "sens", "wt"):
        if req not in mat or not isinstance(mat[req], dict):
            raise ValueError(f"{path}: missing {req} struct — not a WinRiver export")
    info = mat["info"]
    sens = mat["sens"]
    wt = mat["wt"]

    def scalar(d, k):
        v = d.get(k)
        return float(np.ravel(np.asarray(v)).item(0)) if v is not None else None

    epoch = np.ravel(np.asarray(sens["time"], dtype=np.float64))
    time = [dt.datetime(1970, 1, 1) + dt.timedelta(seconds=float(s)) for s in epoch]
    ncells = int(scalar(info, "ncells"))
    cell = scalar(info, "cell")
    cell1 = scalar(info, "cell1")
    bindist = cell1 + cell * np.arange(ncells)

    def cube(key):
        v = wt.get(key)
        if not isinstance(v, np.ndarray) or v.ndim != 3:
            return None
        return np.asarray(v, dtype=np.float64)

    sens_cols = {
        epic: np.ravel(np.asarray(sens[k], dtype=np.float64))
        for k, epic in _SENS_EPIC.items()
        if k in sens
    }
    return {
        "time": time,
        "bindist": bindist,
        "vel": cube("vel"),
        "int": cube("int"),
        "corr": cube("corr"),
        "pg": cube("pg"),
        "sens": sens_cols,
        "info": {
            k: (float(np.ravel(np.asarray(v)).item(0))
                if isinstance(v, np.ndarray) else v)
            for k, v in info.items()
        },
    }


def _schema(parsed: dict[str, Any]) -> StructType:
    fields = [
        StructField("time", TimestampType(), False),
        StructField("bin", IntegerType(), False),
        StructField("bindist", DoubleType(), True),
    ]
    for c in _COMPONENTS:
        fields.append(StructField(c, DoubleType(), True))
    for fam in ("int", "corr", "pg"):
        for b in range(4):
            fields.append(StructField(f"{fam}{b + 1}", DoubleType(), True))
    for name in sorted(parsed["sens"]):
        fields.append(StructField(name, DoubleType(), True))
    return StructType(fields)


def _rows(parsed: dict[str, Any], sens_names: list[str] | None = None) -> list[tuple]:
    """``sens_names`` is the schema's sensor-column order (derived from the
    FIRST segment). Later segments missing a channel null-fill it, and
    channels the schema doesn't know are dropped — per-segment sort order
    alone would misalign values when segments disagree."""
    time = parsed["time"]
    bindist = parsed["bindist"]
    vel, inten, corr, pg = (
        parsed["vel"], parsed["int"], parsed["corr"], parsed["pg"]
    )
    if sens_names is None:
        sens_names = sorted(parsed["sens"])
    sens = parsed["sens"]
    nt, nb = len(time), len(bindist)
    out = []
    for i in range(nt):
        sens_vals = [
            float(sens[n][i]) if n in sens and i < len(sens[n]) else None
            for n in sens_names
        ]
        for b in range(nb):
            rec = [time[i], b, float(bindist[b])]
            rec += [
                float(vel[i, b, c]) if vel is not None and not np.isnan(vel[i, b, c])
                else None
                for c in range(4)
            ]
            for fam in (inten, corr, pg):
                rec += [
                    float(fam[i, b, c]) if fam is not None else None
                    for c in range(4)
                ]
            out.append(tuple(rec + sens_vals))
    return out


def read_rdi_mat(
    spark: SparkSession, path: str, config: dict[str, Any] | None = None
) -> DataFrame:
    """WinRiver export(s) → long (time, bin) frame. ``path`` is one .mat,
    a glob, or a directory of segments; one executor task per segment."""
    from stglib_spark.attrs import apply_var_attrs
    from stglib_spark.session import ensure_package_shipped

    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.mat")))
    else:
        paths = sorted(glob.glob(path)) or [path]
    first = parse_rdi_mat(paths[0])
    schema = _schema(first)
    sens_names = sorted(first["sens"])
    if len(paths) == 1:
        df = spark.createDataFrame(_rows(first, sens_names), schema)
    else:
        ensure_package_shipped(spark)
        rdd = spark.sparkContext.parallelize(paths, len(paths)).flatMap(
            lambda p, _sn=sens_names: _rows(parse_rdi_mat(p), _sn)
        )
        df = spark.createDataFrame(rdd, schema)
    return apply_var_attrs(df)


def read_rdi_log(path: str) -> dict[str, str]:
    """WinRiver .log sidecar → RDI-prefixed attrs (mat2cdf.py:180-210)."""
    keys = [
        "File size", "Valid data", "Invalid data", "Record size",
        "First record number", "First record time", "Last record number",
        "Last record time", "Total records", "Missing records",
        "Bad BIT records", "Software version", "Firmware version",
        "System type", "Serial number", "Frequency", "Number of cells",
        "Cell size", "Blank", "Water mode", "Water pings",
    ]
    attrs: dict[str, str] = {}
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            for m in keys:
                if m in line[:20] and "\t" in line:
                    name = "".join(m.title().split())
                    attrs[f"RDI{name}"] = line.split("\t")[1].strip()
    return attrs


def read_rdi_sens(spark: SparkSession, path: str) -> DataFrame:
    """WinRiver .txt pressure companion → (time, pressure columns); the
    Y/M/D/H/Min/Sec columns combine into the timestamp
    (mat2cdf.py:213-227). Native spark.read.csv, scales with files."""
    from pyspark.sql import functions as F

    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )
    renames = {"Min": "Minute", "Sec": "Second"}
    for old, new in renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    df = df.withColumn(
        "time",
        F.make_timestamp(
            F.col("Year"), F.col("Month"), F.col("Day"),
            F.col("Hour"), F.col("Minute"), F.col("Second").cast("int"),
        ),
    )
    return df.drop("Year", "Month", "Day", "Hour", "Minute", "Second")
