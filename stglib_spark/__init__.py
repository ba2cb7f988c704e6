"""stglib_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of USGS-CMG/stglib (oceanographic time-series
ETL + spectral analysis), rebuilt Spark-first.

Reference semantics: /root/reference (stglib). This is NOT a port — the
reference's xarray/NumPy single-node substrate is replaced by DataFrame/SQL
plans that Catalyst optimizes; only the *semantics* of each operator are
preserved (see SURVEY.md).

Layers
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, partitions).
- ``config``     — the declarative config surface (gatts + YAML merge) that
                   drives every pipeline, mirroring stglib's attrs-as-IR.
- ``operators``  — clip/QA-QC/time/join/agg/transform/physics/waves +
                   large-scale dedup/similarity/text operators.
- ``sources``    — parquet/CSV ingest adapters (raw zone).
- ``streaming``  — Structured Streaming analogues (tumbling bursts,
                   watermark dedup).
"""

from stglib_spark.session import get_spark, load_table, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "load_tables", "__version__"]
