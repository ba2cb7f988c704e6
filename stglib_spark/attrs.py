"""CF-1.11 / EPIC variable-attribute layer.

The reference attaches units/long_name/standard_name/epic_code to every
output variable (central table ``stglib/core/attrs.py``; wave attrs
``core/utils.py:406-749``) so the written netCDF is CF-compliant. Spark's
equivalent carrier is ``StructField.metadata``: ``apply_var_attrs``
attaches the same attribute dictionaries to DataFrame columns via
``withMetadata``, they survive Parquet round-trips, and the netCDF edge
adapter (``sources/netcdf.py``) copies them back onto xarray variables at
export.

Attribute VALUES follow the CF standard-name table and the reference's
published choices — this is compliance data, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# canonical EPIC/CF attributes per variable (stglib/core/attrs.py;
# wave vars core/utils.py:438-467)
VAR_ATTRS: dict[str, dict[str, object]] = {
    "time": {"standard_name": "time", "axis": "T", "long_name": "time (UTC)"},
    "P_1": {
        "units": "dbar",
        "long_name": "Uncorrected pressure",
        "standard_name": "sea_water_pressure",
        "epic_code": 1,
    },
    "P_1ac": {
        "units": "dbar",
        "long_name": "Corrected pressure",
        "standard_name": "sea_water_pressure_due_to_sea_water",
        "epic_code": 1,
    },
    "T_28": {
        "units": "degree_C",
        "units_metadata": "temperature: on_scale",
        "long_name": "Temperature",
        "standard_name": "sea_water_temperature",
        "epic_code": 28,
    },
    "S_41": {
        "units": "1",
        "long_name": "Salinity, PSU",
        "comment": "Practical salinity units (PSU)",
        "standard_name": "sea_water_practical_salinity",
        "epic_code": 41,
    },
    "C_51": {
        "units": "S m-1",
        "long_name": "Conductivity",
        "standard_name": "sea_water_electrical_conductivity",
        "epic_code": 51,
    },
    "SpC_48": {
        "units": "S m-1",
        "long_name": "Specific Conductivity",
        "comment": "Temperature compensated to 25 °C",
        "standard_name": "sea_water_electrical_conductivity_at_reference_temperature",
        "epic_code": 48,
    },
    "Turb": {
        "units": "1",
        "long_name": "Turbidity, NTU",
        "comment": "Nephelometric turbidity units (NTU)",
        "standard_name": "sea_water_turbidity",
    },
    "D_3": {"units": "m", "long_name": "Depth", "epic_code": 3},
    "u_1205": {
        "units": "m s-1",
        "long_name": "Eastward Velocity",
        "standard_name": "eastward_sea_water_velocity",
        "epic_code": 1205,
    },
    "v_1206": {
        "units": "m s-1",
        "long_name": "Northward Velocity",
        "standard_name": "northward_sea_water_velocity",
        "epic_code": 1206,
    },
    "w_1204": {
        "units": "m s-1",
        "long_name": "Vertical Velocity",
        "standard_name": "upward_sea_water_velocity",
        "epic_code": 1204,
    },
    "CS_300": {
        "units": "m s-1",
        "long_name": "Current Speed",
        "standard_name": "sea_water_speed",
        "epic_code": 300,
    },
    "CD_310": {
        "units": "degree",
        "long_name": "Current Direction (True)",
        "standard_name": "sea_water_velocity_to_direction",
        "epic_code": 310,
    },
    "Hdg_1215": {
        "units": "degree",
        "long_name": "Instrument Heading",
        "standard_name": "platform_orientation",
        "epic_code": 1215,
    },
    "Ptch_1216": {
        "units": "degree",
        "long_name": "Instrument Pitch",
        "standard_name": "platform_pitch",
        "epic_code": 1216,
    },
    "Roll_1217": {
        "units": "degree",
        "long_name": "Instrument Roll",
        "standard_name": "platform_roll",
        "epic_code": 1217,
    },
    "AGC_1202": {
        "units": "counts",
        "long_name": "Average Echo Intensity",
        "epic_code": 1202,
    },
    "Bat_106": {"units": "V", "long_name": "Battery voltage", "epic_code": 106},
    # PD0 bottom-track / vertical-beam / Wavesmon families
    # (sources/pd0.py; reference rdi/rdiadcpy.py field tables)
    "bt_range1": {"units": "m", "long_name": "Bottom track range, beam 1"},
    "bt_range2": {"units": "m", "long_name": "Bottom track range, beam 2"},
    "bt_range3": {"units": "m", "long_name": "Bottom track range, beam 3"},
    "bt_range4": {"units": "m", "long_name": "Bottom track range, beam 4"},
    "bt_vel1": {"units": "m s-1", "long_name": "Bottom track velocity, beam 1"},
    "bt_vel2": {"units": "m s-1", "long_name": "Bottom track velocity, beam 2"},
    "bt_vel3": {"units": "m s-1", "long_name": "Bottom track velocity, beam 3"},
    "bt_vel4": {"units": "m s-1", "long_name": "Bottom track velocity, beam 4"},
    "bt_max_depth": {"units": "m", "long_name": "Bottom track maximum depth"},
    "vb_vel": {"units": "m s-1", "long_name": "Vertical beam velocity"},
    "vb_cor": {"units": "counts", "long_name": "Vertical beam correlation"},
    "vb_amp": {"units": "counts", "long_name": "Vertical beam amplitude"},
    "vb_pg": {"units": "percent", "long_name": "Vertical beam percent good"},
    "vbindist": {
        "units": "m",
        "long_name": "Vertical beam distance from transducer",
    },
    "heading_std": {
        "units": "degree",
        "long_name": "Heading standard deviation",
    },
    "pitch_std": {"units": "degree", "long_name": "Pitch standard deviation"},
    "roll_std": {"units": "degree", "long_name": "Roll standard deviation"},
    "hs": {
        "units": "m",
        "long_name": "Significant wave height",
        "standard_name": "sea_surface_wave_significant_height",
    },
    "tp": {
        "units": "s",
        "long_name": "Peak wave period",
        "standard_name": "sea_surface_wave_period_at_variance_spectral_density_maximum",
    },
    "dp": {
        "units": "degree",
        "long_name": "Peak wave direction",
        "standard_name": "sea_surface_wave_from_direction_at_variance_spectral_density_maximum",
    },
    "dm": {
        "units": "degree",
        "long_name": "Mean wave direction",
        "standard_name": "sea_surface_wave_from_direction",
    },
    "Tx_1211": {
        "units": "degree_C",
        "units_metadata": "temperature: on_scale",
        "long_name": "Instrument Internal Temperature",
        "epic_code": 1211,
    },
    "BPR_915": {
        "units": "mbar",
        "standard_name": "air_pressure",
        "epic_code": 915,
    },
    "DO": {
        "units": "mg L-1",
        "long_name": "Dissolved oxygen",
        "standard_name": "mass_concentration_of_oxygen_in_sea_water",
    },
    "OST_62": {
        "units": "percent",
        "long_name": "Oxygen percent saturation",
        "standard_name": "fractional_saturation_of_oxygen_in_sea_water",
        "epic_code": 62,
    },
    "Fch_906": {
        "units": "ug L-1",
        "long_name": "Chlorophyll A",
        "standard_name": "mass_concentration_of_chlorophyll_in_sea_water",
        "epic_code": 906,
    },
    "fDOMQSU": {
        "units": "1e-9",
        "long_name": "Fluorescent dissolved organic matter, QSU",
        "comment": "Quinine sulfate units (QSU)",
    },
    "PAR_905": {
        "units": "umol m-2 s-1",
        "long_name": "Photosynthetically active radiation",
        "epic_code": 905,
    },
    "pH_159": {
        "units": "1",
        "standard_name": "sea_water_ph_reported_on_total_scale",
        "epic_code": 159,
    },
    "bindist": {"units": "m", "long_name": "distance from transducer head"},
    "bin_depth": {"units": "m", "long_name": "bin depth"},
    "brange": {"units": "m", "long_name": "sensor range to boundary"},
    # wave statistics (core/utils.py:438-467)
    "wh_4061": {
        "units": "m",
        "long_name": "Significant wave height",
        "standard_name": "sea_surface_wave_significant_height",
        "epic_code": 4061,
    },
    "wp_4060": {
        "units": "s",
        "long_name": "Average wave period",
        "standard_name": (
            "sea_surface_wave_mean_period_from_variance_spectral_density"
            "_second_frequency_moment"
        ),
        "epic_code": 4060,
    },
    "wp_peak": {
        "units": "s",
        "long_name": "Dominant (peak) wave period",
        "standard_name": (
            "sea_surface_wave_period_at_variance_spectral_density_maximum"
        ),
        "epic_code": 4063,
    },
    "wvdir": {
        "units": "degree",
        "long_name": "Direction of peak period",
        "standard_name": (
            "sea_surface_wave_from_direction_at_variance_spectral_density_maximum"
        ),
    },
    "pspec": {
        "units": "m^2/Hz",
        "long_name": "Pressure-derived non-directional wave energy spectrum",
        "note": "Use caution: all spectra are provisional",
        "standard_name": "sea_surface_wave_variance_spectral_density",
    },
    "frequency": {
        "units": "Hz",
        "long_name": "Frequency",
        "standard_name": "sea_surface_wave_frequency",
    },
    "water_depth": {
        "units": "m",
        "long_name": "Total water depth",
        "standard_name": "sea_floor_depth_below_sea_surface",
    },
    "burst_time": {
        "standard_name": "time",
        "axis": "T",
        "long_name": "burst start time (UTC)",
    },
    "m0": {
        "units": "m^2",
        "long_name": "Zeroth moment of the wave elevation spectrum",
    },
    "m2": {
        "units": "m^2 s-2",
        "long_name": "Second moment of the wave elevation spectrum",
    },
    "dwvdir": {
        "units": "degree",
        "long_name": "Dominant wave direction",
        "note": (
            "Compass direction from which waves are propagating as "
            "defined by the direction band with greatest total energy "
            "summed over all frequencies"
        ),
    },
    "wd_4062": {
        "units": "degree",
        "long_name": "Mean wave direction",
        "standard_name": "sea_surface_wave_from_direction",
        "epic_code": 4062,
    },
    # pyDIWASP product variables (core/utils.py:577-700 ds_add_wave_attrs)
    "diwasp_frequency": {
        "standard_name": "sea_surface_wave_frequency",
        "long_name": "Frequency",
        "units": "Hz",
    },
    "diwasp_direction": {
        "long_name": "Direction (from, relative to true north)",
        "units": "degrees",
    },
    "diwasp_fspec": {
        "long_name": (
            "Frequency (non-directional) wave energy spectrum from pyDIWASP"
        ),
        "units": "m^2/Hz",
        "note": "Use caution: all spectra are provisional",
        "standard_name": "sea_surface_wave_variance_spectral_density",
    },
    "diwasp_dspec": {
        "long_name": "Directional wave energy spectrum from pyDIWASP",
        "units": "m^2/Hz/degree",
        "note": "Use caution: all spectra are provisional",
        "standard_name": (
            "sea_surface_wave_directional_variance_spectral_density"
        ),
    },
    "diwasp_type": {
        "long_name": "pyDIWASP input data type used in optimized method",
    },
    "water_level": {
        "units": "m",
        "long_name": "Water level NAVD88",
        "standard_name": "sea_surface_height_above_geopotential_datum",
    },
}

# common alias → canonical EPIC name (rsk/csv2cdf.py:295-327 renames)
ALIASES = {
    "Pressure": "P_1",
    "Temperature": "T_28",
    "Salinity": "S_41",
    "Conductivity": "C_51",
    "Depth": "D_3",
}

# Aquadopp/Vector-family vendor names → EPIC codes, applied at the CLEAN
# stage exactly where the reference renames them (aqd/aqdutils.py:10-58
# ``ds_rename``). Temperature maps to the transducer code Tx_1211 here —
# not the water-temperature T_28 the generic CSV families use.
AQD_EPIC_RENAMES = {
    "Pressure": "P_1",
    "pressure": "P_1",
    "Pressure_ac": "P_1ac",
    "Temperature": "Tx_1211",
    "Heading": "Hdg_1215",
    "heading": "Hdg_1215",
    "Pitch": "Ptch_1216",
    "pitch": "Ptch_1216",
    "Roll": "Roll_1217",
    "roll": "Roll_1217",
    "Battery": "Bat_106",
    "batt": "Bat_106",
    "Soundspeed": "SV_80",
    "Burst": "burst",
    "U": "u_1205",
    "V": "v_1206",
    "W": "w_1204",
    "AGC": "AGC_1202",
    "VEL1": "vel1_1277",
    "VEL2": "vel2_1278",
    "VEL3": "vel3_1279",
    "AMP1": "AGC1_1221",
    "AMP2": "AGC2_1222",
    "AMP3": "AGC3_1223",
    "COR1": "cor1_1285",
    "COR2": "cor2_1286",
    "COR3": "cor3_1287",
    "COR": "cor_avg",
}


def attrs_for(column: str) -> dict[str, object] | None:
    """Attribute dict for a column name, following aliases."""
    name = ALIASES.get(column, column)
    return VAR_ATTRS.get(name)


def apply_var_attrs(
    df: DataFrame, extra: dict[str, dict[str, object]] | None = None
) -> DataFrame:
    """Attach CF/EPIC attributes to every recognized column as Spark
    column metadata. ``extra`` merges per-column overrides (e.g. the
    min/max attrs computed by ``aggregations.add_min_max`` or a QA
    ``note`` with its affected count, utils.py:1361-1373)."""
    out = df
    for c in df.columns:
        meta = dict(attrs_for(c) or {})
        if extra and c in extra:
            meta.update(extra[c])
        if meta:
            out = out.withMetadata(c, meta)
    return out


def collect_var_attrs(df: DataFrame) -> dict[str, dict[str, object]]:
    """Read back per-column attribute metadata (for the netCDF edge
    adapter and for tests)."""
    return {
        f.name: dict(f.metadata) for f in df.schema.fields if f.metadata
    }
