"""QRev discharge-measurement XML ingest (index-velocity rating input).

Reference: ``stglib/indexvel.py:19-117`` (xmltodict over
``Channel/Transect`` entries → per-transect discharge, area, width,
edge distances; transect time = midpoint of start/end).

Implemented with stdlib ``xml.etree`` at the driver — QRev files are a
handful of transects (config-scale); the resulting table broadcasts into
the index-velocity regression (``agg_linregress``)."""

from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_FIELDS = [
    # (output column, xpath within Transect, cast)
    ("q", "Discharge/Total", float),
    ("qTop", "Discharge/Top", float),
    ("qMiddle", "Discharge/Middle", float),
    ("qBottom", "Discharge/Bottom", float),
    ("qLeft", "Discharge/Left", float),
    ("qRight", "Discharge/Right", float),
    ("AreaQrev", "Other/Area", float),
    ("Width", "Other/Width", float),
    ("QoverA", "Other/QoverA", float),
    ("LeftDistance", "Edge/LeftDistance", float),
    ("RightDistance", "Edge/RightDistance", float),
    ("filename", "Filename", str),
]


def _ts(s: str) -> dt.datetime:
    for fmt in ("%m/%d/%Y %H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S"):
        try:
            return dt.datetime.strptime(s.strip(), fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable QRev datetime {s!r}")


def read_qrev_xml(
    spark: SparkSession, path: str, negateq: bool | list[bool] = False
) -> DataFrame:
    """QRev XML → one row per transect; ``negateq`` flips the sign of q
    and QoverA (upstream/downstream convention, indexvel.py:87-90) for
    all transects (bool) or per transect (list of bools)."""
    root = ET.parse(path).getroot()
    channel = root if root.tag == "Channel" else root.find(".//Channel")
    transects = channel.findall("Transect")
    flags = (
        [bool(negateq)] * len(transects)
        if isinstance(negateq, bool)
        else list(negateq)
    )
    if len(flags) != len(transects):
        raise ValueError(
            f"negateq has {len(flags)} entries for {len(transects)} "
            "transects — zip truncation would silently drop transects"
        )

    rows = []
    for t, neg in zip(transects, flags):
        start = _ts(t.findtext("StartDateTime"))
        end = _ts(t.findtext("EndDateTime"))
        rec: dict = {
            "starttime": start,
            "endtime": end,
            "time": start + (end - start) / 2,
            "qnegated": neg,
        }
        for col, xp, cast in _FIELDS:
            txt = t.findtext(xp)
            rec[col] = cast(txt) if txt is not None else None
        if neg:
            for v in ("q", "QoverA"):
                if rec[v] is not None:
                    rec[v] = -rec[v]
        rows.append(rec)

    schema = (
        "time TIMESTAMP, starttime TIMESTAMP, endtime TIMESTAMP, "
        "qnegated BOOLEAN, q DOUBLE, qTop DOUBLE, qMiddle DOUBLE, "
        "qBottom DOUBLE, qLeft DOUBLE, qRight DOUBLE, AreaQrev DOUBLE, "
        "Width DOUBLE, QoverA DOUBLE, LeftDistance DOUBLE, "
        "RightDistance DOUBLE, filename STRING"
    )
    return spark.createDataFrame(rows, schema)


def read_areacomp(spark: SparkSession, path: str) -> DataFrame:
    """AreaComp stage–area rating table (indexvel.py:7-16:
    ``pd.read_csv(filename, skiprows=4)``). The file is a small rating
    table — a 4-line preamble then a CSV header; parsed driver-side with
    stdlib csv and returned as a DataFrame (broadcasts into the stage–
    area–discharge chain alongside the QRev transects)."""
    import csv as _csv

    with open(path, encoding="utf-8", errors="replace") as f:
        lines = f.read().splitlines()
    rows = list(_csv.reader(lines[4:]))
    if not rows:
        raise ValueError(f"{path}: no rows after the 4-line AreaComp preamble")
    header = [h.strip() for h in rows[0]]

    def conv(x: str):
        x = x.strip()
        if x == "":
            return None
        try:
            return float(x)
        except ValueError:
            return x

    data = [tuple(conv(v) for v in r) for r in rows[1:] if any(c.strip() for c in r)]
    # uniform column types: a column is DOUBLE when every non-null is float
    cols = []
    for i, h in enumerate(header):
        vals = [r[i] for r in data if i < len(r) and r[i] is not None]
        ok = vals and all(isinstance(v, float) for v in vals)
        cols.append(f"`{h}` {'DOUBLE' if ok else 'STRING'}")
        if not ok:
            data = [
                tuple(
                    (str(v) if j == i and v is not None else v)
                    for j, v in enumerate(r)
                )
                for r in data
            ]
    return spark.createDataFrame(data, ", ".join(cols))
