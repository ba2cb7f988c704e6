"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, then compare row count, schema shape, and order-insensitive
values (columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # lists (array columns) → tuples for sortability
            if df[c].map(lambda x: isinstance(x, (list, np.ndarray))).any():
                df[c] = df[c].map(
                    lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x
                )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _tz_aware_cols(df: pd.DataFrame) -> set[str]:
    return {
        c
        for c in df.columns
        if isinstance(df[c].dtype, pd.DatetimeTZDtype)
    }


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    problems: list[str] = []
    s_raw = spark_df.toPandas()
    # The driver grades FORMATTED values, so TIMESTAMPTZ ("…+00:00") vs
    # plain TIMESTAMP fails schema+hash even when the instants agree.
    # _normalize strips tz for value comparison — check awareness FIRST
    # (this exact blind spot masked ts_sg_tide_average's to_timestamp
    # oracle for a full round).
    s_tz, d_tz = _tz_aware_cols(s_raw), _tz_aware_cols(duck_df)
    for c in sorted(s_tz ^ d_tz):
        side = "spark" if c in s_tz else "oracle"
        problems.append(
            f"{name}: column {c} is tz-aware on the {side} side only — "
            f"the driver's formatted-value hash would differ "
            f"('…+00:00' suffix); use make_timestamp(epoch_us) in the "
            f"oracle, not to_timestamp()"
        )
    if problems:
        return problems
    s = _normalize(s_raw)
    d = _normalize(duck_df)
    if len(s) != len(d):
        problems.append(f"{name}: row count {len(s)} vs oracle {len(d)}")
        return problems
    if list(s.columns) != list(d.columns):
        problems.append(f"{name}: columns {list(s.columns)} vs {list(d.columns)}")
        return problems
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            # Dtype divergence is a REAL driver mismatch even when the
            # numeric values agree: the driver hashes FORMATTED values,
            # so int 123 vs float 123.0 reads "123" vs "123.0" and every
            # row differs. DuckDB's sum(BIGINT)→HUGEINT degrades to
            # float64 under pandas export — exactly this trap kept
            # ts_sessionize/corpus_datacard driver-red for two rounds
            # while this harness (which used to promote both sides to
            # float) called them bit-exact. Only NaN-forced promotion of
            # a nullable int column is exempt (both sides promote alike).
            s_f = np.issubdtype(sv.dtype, np.floating)
            d_f = np.issubdtype(dv.dtype, np.floating)
            if s_f != d_f:
                intlike = sv if not s_f else dv
                fl = dv if not s_f else sv
                if np.issubdtype(intlike.dtype, np.integer) and not np.isnan(
                    fl.astype(float)
                ).any():
                    problems.append(
                        f"{name}: column {c} dtype mismatch "
                        f"({sv.dtype} spark vs {dv.dtype} oracle) — the "
                        f"driver's formatted-value hash would differ "
                        f"(int '123' vs float '123.0'); CAST the oracle "
                        f"column (DuckDB HUGEINT exports as float64)"
                    )
                    continue
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = np.isnan(sv) & np.isnan(dv)
            # Bitwise equality (signbit-sensitive): the driver hashes the
            # formatted values, so -0.0 vs +0.0 is a real mismatch even
            # though `==` calls them equal.
            eq = ((sv == dv) & (np.signbit(sv) == np.signbit(dv))) | both_nan
        else:
            eq = np.asarray(
                pd.Series(sv).fillna("__null__").values
                == pd.Series(dv).fillna("__null__").values
            )
        if not eq.all():
            bad = int((~eq).sum())
            i = int(np.argmax(~eq))
            problems.append(
                f"{name}: column {c} mismatches {bad}/{len(eq)} "
                f"(first at row {i}: {sv[i]!r} vs {dv[i]!r})"
            )
    return problems
