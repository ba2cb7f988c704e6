"""EofE ECHOLOGGER EA400 ``.log`` ingest (point + profile echo data).

Reference: ``stglib/eofe.py:157-285`` — ``read_ea_instmet`` (``#Key value``
header scan up to ``##DataStart``), ``load_ea_point`` (per-ping ``#``
attribute lines), ``load_ea_profile`` (bare echo-count rows between
``##DataStart``/``##DataEnd``, reshaped (time, sample, bins)).

Spark shape: one ``.log`` file per task via ``binaryFile →
mapPartitions``; pings group into series of ``EAPulses_in_series_num``
samples (series time = first ping's UTC time, matching the reference's
reshape) and echo counts emit long-form (series, sample, bin, count) so
the brange/boundary-elevation operators run as plain aggregations."""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_META_KEYS = {
    "#NSamples": ("EABin_count", int, 1),
    "#Resolution,m": ("EABin_size_m", float, 1),
    "#SoundSpeed,mps": ("EASoundSpeed_mps", float, 1),
    "#Tx_Frequency,Hz": ("EATx_Frequency_Hz", float, 1),
    "#Range,m": ("EARange_m", float, 1),
    "#Pulse period,sec": ("EAPulse_period_sec", float, 2),
    "#Pulses in series,num": ("EAPulses_in_series_num", int, 3),
    "#Interval between series,sec": ("EAInterval_between_series_sec", float, 3),
    "#Threshold,%": ("EAThreshold_percent", int, 1),
    "#Offset,m": ("EAOffset_m", float, 1),
    "#Deadzone,m": ("EADeadzone_m", float, 1),
    "#PulseLength,uks": ("EAPulseLength_microsec", float, 1),
    "#TVG_Gain,dB": ("EATVG_Gain_dB", float, 1),
    "#TVG_Slope,dB/km": ("EATVG_Slope_dBkm", float, 1),
}


def read_ea_instmeta(path: str) -> dict[str, Any]:
    """Driver-side header scan (eofe.py:157-202)."""
    meta: dict[str, Any] = {}
    with open(path, errors="replace") as f:
        for row in f:
            row = row.rstrip()
            if "##DataStart" in row:
                break
            dat = row.split()
            if "#DeviceID" in row and len(dat) > 1:
                meta["EADeviceID"] = row[10:]
                meta["serial_number"] = dat[1]
                continue
            for needle, (key, typ, idx) in _META_KEYS.items():
                if needle in row and len(dat) > idx:
                    meta[key] = typ(dat[idx])
    return meta


EA_POINT_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("time", TimestampType()),  # series start (first ping UTC)
        StructField("sample", IntegerType()),  # ping index within series
        StructField("ping", LongType()),
        StructField("Altitude_m", DoubleType()),
        StructField("Temperature_C", DoubleType()),
        StructField("Pitch_deg", DoubleType()),
        StructField("Roll_deg", DoubleType()),
    ]
)

EA_PROFILE_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("time", TimestampType()),
        StructField("sample", IntegerType()),
        StructField("bins", IntegerType()),
        StructField("Counts", DoubleType()),
    ]
)


def _parse_log(content: str, meta: dict[str, Any]):
    """Single pass over a .log body → (point rows, profile count rows)."""
    samples = int(meta["EAPulses_in_series_num"])
    nbins = int(meta["EABin_count"])

    pings: list[dict[str, Any]] = []
    counts: list[float] = []
    cur: dict[str, Any] = {}
    in_data = False
    for row in content.splitlines():
        r = row.rstrip()
        if r == "##DataStart":
            in_data = True
            continue
        if r == "##DataEnd":
            in_data = False
            continue
        if in_data:
            try:
                counts.append(float(r))
            except ValueError:
                pass
            continue
        dat = r.split()
        if "#TimeUTC" in r and len(dat) >= 3:
            if cur:
                pings.append(cur)
            cur = {"t": dat[1] + " " + dat[2]}
        elif "#Ping  " in r and len(dat) > 1:
            cur["ping"] = int(float(dat[1]))
        elif "#Altitude,m" in r and len(dat) > 1:
            cur["alt"] = float(dat[1])
        elif "#Temperature" in r and len(dat) > 1:
            cur["temp"] = float(dat[1])
        elif "#Pitch,deg" in r and len(dat) > 1:
            cur["pitch"] = float(dat[1])
        elif "#Roll,deg" in r and len(dat) > 1:
            cur["roll"] = float(dat[1])
    if cur:
        pings.append(cur)

    def ts(s: str) -> dt.datetime | None:
        for fmt in ("%d.%m.%Y %H:%M:%S.%f", "%d.%m.%Y %H:%M:%S", "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
            try:
                return dt.datetime.strptime(s, fmt)
            except ValueError:
                continue
        return None

    # series time = first ping's time in each group of `samples`
    series_t: list[dt.datetime | None] = []
    for i, p in enumerate(pings):
        if i % samples == 0:
            series_t.append(ts(p["t"]))
        p["series_time"] = series_t[-1]
        p["sample"] = i % samples
    return pings, counts, samples, nbins


def read_ea_point(spark: SparkSession, path: str, meta: dict[str, Any]) -> DataFrame:
    """Per-ping point data in burst long form (eofe.py:204-262)."""

    def parse_partition(rows) -> Iterator[Row]:
        for r in rows:
            text = bytes(r.content).decode("utf-8", errors="replace")
            pings, _, _, _ = _parse_log(text, meta)
            for p in pings:
                yield Row(
                    source_file=r.path,
                    time=p.get("series_time"),
                    sample=p["sample"],
                    ping=p.get("ping"),
                    Altitude_m=p.get("alt"),
                    Temperature_C=p.get("temp"),
                    Pitch_deg=p.get("pitch"),
                    Roll_deg=p.get("roll"),
                )

    binary = spark.read.format("binaryFile").load(path)
    return binary.select("path", "content").rdd.mapPartitions(
        parse_partition
    ).toDF(EA_POINT_SCHEMA)


def read_ea_profile(spark: SparkSession, path: str, meta: dict[str, Any]) -> DataFrame:
    """Echo-count profiles in long form (eofe.py:264-285): count index k →
    (series k // (samples·nbins), sample (k // nbins) % samples,
    bin k % nbins)."""

    def parse_partition(rows) -> Iterator[Row]:
        for r in rows:
            text = bytes(r.content).decode("utf-8", errors="replace")
            pings, counts, samples, nbins = _parse_log(text, meta)
            series_times = [
                p["series_time"] for p in pings if p["sample"] == 0
            ]
            for k, c in enumerate(counts):
                s_idx = k // (samples * nbins)
                yield Row(
                    source_file=r.path,
                    time=series_times[s_idx] if s_idx < len(series_times) else None,
                    sample=(k // nbins) % samples,
                    bins=k % nbins,
                    Counts=c,
                )

    binary = spark.read.format("binaryFile").load(path)
    return binary.select("path", "content").rdd.mapPartitions(
        parse_partition
    ).toDF(EA_PROFILE_SCHEMA)
