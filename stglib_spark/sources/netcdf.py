"""netCDF edge adapters — import/export at the boundary only.

The reference's inter-stage format is netCDF (``-raw.cdf`` / ``b.nc``);
this engine's inter-stage format is Parquet (SURVEY §7.1 three-zone
design), with netCDF only at the edges for interop with existing stglib
consumers. The xarray/netCDF4 libraries are not present in this container,
so both directions are gated behind an import-try and raise with a clear
message; the Parquet path is always available.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from stglib_spark.sources import register_adapter


def _require_xarray():
    try:
        import xarray  # noqa: F401

        return xarray
    except ImportError as exc:  # pragma: no cover - env without xarray
        raise NotImplementedError(
            "netCDF edge adapter requires xarray+netCDF4, which are not "
            "installed in this environment; use the Parquet zones instead "
            "(stglib_spark writes/reads Parquet between stages)"
        ) from exc


@register_adapter("netcdf")
def read_netcdf(spark: SparkSession, path: str, config: dict[str, Any]) -> DataFrame:
    """netCDF → DataFrame via a driver-side xarray load (edge-only; fine
    for the reference's single-deployment file sizes)."""
    xr = _require_xarray()
    ds = xr.open_dataset(path)
    pdf = ds.to_dataframe().reset_index()
    return spark.createDataFrame(pdf)


def write_netcdf(df: DataFrame, path: str, attrs: dict[str, Any] | None = None) -> None:
    """DataFrame → netCDF with attrs (export edge; collect-to-driver is
    acceptable only for final per-deployment products, mirroring the
    reference's one-file-per-deployment outputs). Column metadata attached
    by ``stglib_spark.attrs.apply_var_attrs`` becomes per-variable netCDF
    attributes, so exports carry the reference's CF-1.11 units/
    standard_name/epic_code layer (stglib/core/attrs.py)."""
    xr = _require_xarray()
    from stglib_spark.attrs import collect_var_attrs

    var_attrs = collect_var_attrs(df)
    pdf = df.toPandas()
    ds = xr.Dataset.from_dataframe(pdf.set_index("time"))
    ds.attrs.update(attrs or {})
    for var, meta in var_attrs.items():
        if var in ds:
            ds[var].attrs.update(meta)
        elif var in ds.coords:
            ds[var].attrs.update(meta)
    ds.to_netcdf(path, unlimited_dims=["time"])
    # post-write CF check, like the reference's check_compliance call
    # after every nc write (rsk/cdf2nc.py:148); non-fatal by design
    from stglib_spark.cf import check_netcdf

    check_netcdf(path)
