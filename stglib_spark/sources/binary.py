"""Binary ensemble ingest — the PD0-style fixed-record parser skeleton.

Reference semantics: TRDI PD0 (``rdi/rdiadcpy.py:43-405`` ensemble loop,
field parsers :449-1944), Imagenex sonar ``.81R`` (``son/raw2cdf.py:13-139``),
Seagauge hex (``sg/sgutils.py:13-176``). Those formats need the real
vendor spec; the SCAFFOLD here is the scalable Spark shape every such
parser shares:

    spark.read.format("binaryFile") → mapPartitions(struct-unpack) → rows

Each input file is one partition work-unit; the parser walks records with
``struct.unpack`` and yields one row per ensemble — so a 100 TB drop of
raw instrument files parallelizes per file with zero driver involvement.

A deterministic demo format ("SGB1": little-endian records of
``magic u32 | seq u32 | t_us i64 | nvals u16 | f64 × nvals``) exercises
the full path in tests; a real PD0 adapter drops in by replacing
``parse_records``.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, Row, SparkSession

from stglib_spark.sources import register_adapter

MAGIC = 0x53474231  # "SGB1"
_HEADER = struct.Struct("<IIqH")


def write_demo_file(path: str, ensembles: list[tuple[int, list[float]]]) -> None:
    """Write the demo binary format (test fixture generator)."""
    with open(path, "wb") as f:
        for seq, (t_us, vals) in enumerate(ensembles):
            f.write(_HEADER.pack(MAGIC, seq, t_us, len(vals)))
            f.write(struct.pack(f"<{len(vals)}d", *vals))


def parse_records(content: bytes) -> Iterator[dict]:
    """Walk fixed-header records; skip garbage until a magic match —
    the same resync strategy rdiadcpy's ensemble loop uses for PD0."""
    off = 0
    n = len(content)
    while off + _HEADER.size <= n:
        magic, seq, t_us, nvals = _HEADER.unpack_from(content, off)
        if magic != MAGIC:
            off += 1  # resync scan
            continue
        off += _HEADER.size
        if off + 8 * nvals > n:
            break  # truncated trailing record
        vals = struct.unpack_from(f"<{nvals}d", content, off)
        off += 8 * nvals
        yield {"seq": seq, "t_us": t_us, "vals": list(vals)}


@register_adapter("binary_ensemble")
def read_binary_ensembles(
    spark: SparkSession, path: str, config: dict[str, Any]
) -> DataFrame:
    """binaryFile scan → per-file record parse → one row per ensemble."""
    files = spark.read.format("binaryFile").load(path)

    def parse_partition(rows) -> Iterator[Row]:
        for r in rows:
            for rec in parse_records(bytes(r.content)):
                yield Row(
                    path=r.path,
                    seq=rec["seq"],
                    t_us=rec["t_us"],
                    vals=rec["vals"],
                )

    parsed = files.select("path", "content").rdd.mapPartitions(parse_partition)
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("seq", LongType()),
            StructField("t_us", LongType()),
            StructField("vals", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(parsed, schema)
    return df.withColumn("time", F.timestamp_micros(F.col("t_us"))).drop("t_us")
