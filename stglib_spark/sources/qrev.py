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
