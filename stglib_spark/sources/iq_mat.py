"""SonTek-IQ ``.mat`` export ingest.

Reference semantics: ``stglib/iq.py:172-446`` (``read_iq``) — the IQ
software exports a flat MAT file whose variables are mapped by name
pattern:

- ``FlowData_SampleTime`` is **microseconds since 2000-01-01** (per
  SonTek; ``iq.py:190-199``) → the ``time`` axis;
- every 1-D variable whose length matches time becomes a per-sample
  variable, with units looked up in the ``Data_Units`` struct and
  ``/s`` normalized to `` s-1`` (``iq.py:224-229``);
- ``FlowData_SNR`` / ``FlowData_Vel*`` (time × 4) spread across the four
  velocity beams; ``FlowData_NoiseLevel`` (time × 5) across the five
  acoustic beams (``iq.py:230-259``);
- ``FlowData_VelXYZ`` (time × 4) splits into the four named center/left/
  right channel velocities (``iq.py:238-252``);
- ``FlowSubData_*`` / ``Profile_*`` sub-sample profile matrices are only
  recorded when ``System_IqSetup.advancedSetup.recordSubSampleProfiles``
  is set (``iq.py:261+``) — skipped here like the common IQ deployment
  (flow data only); the burst matrices route through the generic
  ``matfile.read_mat`` if needed.

Spark shape: one row per sample time, beams spread to numbered columns
(vel1..4, snr1..4, noise1..5) so the QA/QC rule engine and velocity
gates apply directly; units ride as column metadata.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_EPOCH_2000 = dt.datetime(2000, 1, 1)

_VELXYZ_NAMES = ["Vel_X_Center", "Vel_Z_Center", "Vel_X_Left", "Vel_X_Right"]


def _units_of(data_units: dict, key: str) -> str | None:
    v = data_units.get(key)
    if isinstance(v, np.ndarray):
        v = ", ".join(map(str, v.ravel()))
    if isinstance(v, str) and v:
        return v.replace("/s", " s-1")
    return None


def parse_iq(path: str) -> dict[str, Any]:
    """IQ MAT file → {"time": [datetime...], "columns": {name: 1-D array},
    "units": {name: str}}. Pure (executor-safe)."""
    from stglib_spark.functions.mat5 import loadmat

    mat = loadmat(path)
    if "FlowData_SampleTime" not in mat:
        raise ValueError(f"{path}: no FlowData_SampleTime — not an IQ export")
    data_units = mat.get("Data_Units") or {}
    st = np.ravel(np.asarray(mat["FlowData_SampleTime"], dtype=np.float64))
    time = [_EPOCH_2000 + dt.timedelta(microseconds=float(x)) for x in st]
    timelen = len(time)

    columns: dict[str, np.ndarray] = {}
    units: dict[str, str] = {}

    def add(name: str, values: np.ndarray, ukey: str | None):
        columns[name] = np.asarray(values, dtype=np.float64).ravel()[:timelen]
        u = _units_of(data_units, ukey) if ukey else None
        if u:
            units[name] = u

    for k, v in mat.items():
        if (
            "__" in k
            or "FlowSubData" in k
            or "Profile" in k
            or not isinstance(v, np.ndarray)
        ):
            continue
        flat = np.ravel(v)
        if k == "FlowData_SampleTime":
            continue
        if len(flat) == timelen:
            add(k, flat, k)
        elif v.ndim == 2 and v.shape[0] >= timelen:
            # EXACT key matches: the reference's substring tests
            # (iq.py:235 `"FlowData_Vel" in k`) let a sibling variable
            # like FlowData_VelStd silently overwrite vel1..4
            if k == "FlowData_VelXYZ":
                for i, name in enumerate(_VELXYZ_NAMES):
                    add(name, v[:timelen, i], k)
            elif k == "FlowData_SNR":
                for b in range(min(4, v.shape[1])):
                    add(f"snr{b + 1}", v[:timelen, b], k)
            elif k == "FlowData_Vel":
                for b in range(min(4, v.shape[1])):
                    add(f"vel{b + 1}", v[:timelen, b], k)
            elif k == "FlowData_NoiseLevel":
                for b in range(min(5, v.shape[1])):
                    add(f"noise{b + 1}", v[:timelen, b], k)
            else:
                # any other per-beam matrix: numbered columns from its
                # own name, never colliding with the canonical sets
                for b in range(v.shape[1]):
                    add(f"{k}_{b + 1}", v[:timelen, b], k)
    return {"time": time, "columns": columns, "units": units}


def read_iq_mat(
    spark: SparkSession, path: str, config: dict[str, Any] | None = None
) -> DataFrame:
    """IQ export → one row per sample: time + flow/stage/velocity/SNR
    columns with units as column metadata."""
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    from stglib_spark.attrs import apply_var_attrs

    parsed = parse_iq(path)
    names = sorted(parsed["columns"])
    schema = StructType(
        [StructField("time", TimestampType(), False)]
        + [StructField(n, DoubleType(), True) for n in names]
    )
    cols = parsed["columns"]
    rows = [
        tuple([t] + [float(cols[n][i]) if i < len(cols[n]) else None for n in names])
        for i, t in enumerate(parsed["time"])
    ]
    df = spark.createDataFrame(rows, schema)
    extra = {n: {"units": u} for n, u in parsed["units"].items()}
    return apply_var_attrs(df, extra)
