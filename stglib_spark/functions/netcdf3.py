"""Classic netCDF-3 container codec, pure Python (no xarray/netCDF4).

The reference's output contract is CF netCDF (`stglib/core/utils.py:352-749`
attribute layer; write+check `rsk/cdf2nc.py:127-148`). This container has
no netCDF libraries, so exports were gated off; this module implements the
classic file format itself — the public "NetCDF Classic Format
Specification" (CDF-1, and CDF-2 64-bit offsets) — enough to write and
read back every product this engine exports: fixed-shape numeric
variables, char variables, per-variable and global attributes.

Layout (big-endian throughout):
  'CDF' + version byte | numrecs | dim_list | gatt_list | var_list | data
  *_list = tag u32 (0x0A dims / 0x0C attrs / 0x0B vars) + count u32
  name = len u32 + bytes padded to 4
  attr = name + nc_type + nelems + padded values
  var  = name + ndims + dimids + vatt_list + nc_type + vsize + begin

Driver-side by design: the export edge writes one file per deployment
(the reference's own one-file-per-deployment contract), not a data path.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C

_NP_TO_NC = {
    np.dtype("int8"): NC_BYTE,
    np.dtype("S1"): NC_CHAR,
    np.dtype("int16"): NC_SHORT,
    np.dtype("int32"): NC_INT,
    np.dtype("float32"): NC_FLOAT,
    np.dtype("float64"): NC_DOUBLE,
}
_NC_TO_NP = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _attr_values(value: Any) -> tuple[int, int, bytes]:
    """attr value → (nc_type, nelems, payload)."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return NC_CHAR, len(raw), _pad4(raw)
    if isinstance(value, bytes):
        return NC_CHAR, len(value), _pad4(value)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind in "ui":
        # pick the narrowest classic type the VALUES fit — blind
        # astype() narrowing wraps modulo 2^n (e.g. a uint16 attr of
        # 40000 would export as -25536)
        if _int_fits(arr, -(2 ** 15), 2 ** 15 - 1):
            return NC_SHORT, arr.size, _pad4(arr.astype(">i2").tobytes())
        if _int_fits(arr, -(2 ** 31), 2 ** 31 - 1):
            return NC_INT, arr.size, _pad4(arr.astype(">i4").tobytes())
        return NC_DOUBLE, arr.size, _pad4(arr.astype(">f8").tobytes())
    if arr.dtype == np.float32:
        return NC_FLOAT, arr.size, _pad4(arr.astype(">f4").tobytes())
    arr = arr.astype(">f8")
    return NC_DOUBLE, arr.size, _pad4(arr.tobytes())


def _attr_list(attrs: dict[str, Any]) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)  # ABSENT
    out = struct.pack(">II", _TAG_ATT, len(attrs))
    for k, v in attrs.items():
        ty, n, payload = _attr_values(v)
        out += _name(k) + struct.pack(">II", ty, n) + payload
    return out


def _int_fits(arr: np.ndarray, lo: int, hi: int) -> bool:
    """True when every value of an integer array lies in [lo, hi].
    Compared in int64/uint64 space so the check itself can't wrap."""
    if arr.size == 0:
        return True
    mn, mx = int(arr.min()), int(arr.max())
    return lo <= mn and mx <= hi


def _coerce(arr: np.ndarray) -> tuple[np.ndarray, int]:
    """numpy array → (storage array, nc_type); integers store as the
    narrowest classic type their VALUES fit (classic netCDF-3 has no
    64-bit integer type), promoting to NC_DOUBLE when they exceed int32
    — silent modulo-2^n wrapping would corrupt e.g. ensemble counters."""
    if arr.dtype.kind == "U" or arr.dtype.kind == "S":
        # char matrix: strings become a (n, strlen) S1 array
        as_b = np.char.encode(arr.astype("U"), "utf-8") if arr.dtype.kind == "U" else arr
        maxlen = max((len(x) for x in as_b.ravel()), default=1) or 1
        mat = np.zeros(arr.shape + (maxlen,), dtype="S1")
        flat = mat.reshape(-1, maxlen)
        for i, s in enumerate(as_b.ravel()):
            b = s[:maxlen]
            flat[i, : len(b)] = np.frombuffer(b, dtype="S1")
        return mat, NC_CHAR
    if arr.dtype.kind in "ui":
        if arr.dtype.itemsize == 1 and _int_fits(arr, -(2 ** 7), 2 ** 7 - 1):
            return arr.astype("int8"), NC_BYTE
        if arr.dtype.itemsize <= 2 and _int_fits(arr, -(2 ** 15), 2 ** 15 - 1):
            return arr.astype("int16"), NC_SHORT
        if _int_fits(arr, -(2 ** 31), 2 ** 31 - 1):
            return arr.astype("int32"), NC_INT
        return arr.astype("float64"), NC_DOUBLE
    if arr.dtype == np.float32:
        return arr.astype("float32"), NC_FLOAT
    return arr.astype("float64"), NC_DOUBLE


def write_nc3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, dict[str, Any]],
    global_attrs: dict[str, Any] | None = None,
) -> None:
    """Write a classic netCDF-3 (CDF-1) file.

    ``variables[name] = {"dims": (dim names...), "data": ndarray,
    "attrs": {...}}``. All variables are fixed-size (numrecs=0); shapes
    must match the named dims (char variables get an implicit trailing
    string-length dim added automatically).
    """
    dims = dict(dims)
    var_entries = []
    for vname, spec in variables.items():
        data, nc_type = _coerce(np.asarray(spec["data"]))
        vdims = list(spec.get("dims") or ())
        if nc_type == NC_CHAR and data.ndim == len(vdims) + 1:
            sl_dim = f"{vname}_strlen"
            dims[sl_dim] = data.shape[-1]
            vdims.append(sl_dim)
        shape = tuple(dims[d] for d in vdims)
        if data.shape != shape:
            raise ValueError(
                f"variable {vname!r}: data shape {data.shape} != dims {shape}"
            )
        var_entries.append((vname, vdims, data, nc_type, spec.get("attrs") or {}))

    dim_names = list(dims)
    dim_index = {d: i for i, d in enumerate(dim_names)}

    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs = 0
    if dims:
        header += struct.pack(">II", _TAG_DIM, len(dims))
        for d in dim_names:
            header += _name(d) + struct.pack(">I", dims[d])
    else:
        header += struct.pack(">II", 0, 0)
    header += _attr_list(global_attrs or {})

    # first pass: compute header size with placeholder offsets
    def var_header(begin_by_name: dict[str, int]) -> bytes:
        out = struct.pack(">II", _TAG_VAR, len(var_entries)) if var_entries else struct.pack(">II", 0, 0)
        for vname, vdims, data, nc_type, attrs in var_entries:
            vsize = data.size * _NC_SIZE[nc_type]
            vsize += (4 - vsize % 4) % 4
            out += _name(vname)
            out += struct.pack(">I", len(vdims))
            for d in vdims:
                out += struct.pack(">I", dim_index[d])
            out += _attr_list(attrs)
            out += struct.pack(">III", nc_type, vsize, begin_by_name.get(vname, 0))
        return out

    base_len = len(header) + len(var_header({}))
    begins: dict[str, int] = {}
    off = base_len
    for vname, _vdims, data, nc_type, _attrs in var_entries:
        begins[vname] = off
        vsize = data.size * _NC_SIZE[nc_type]
        off += vsize + (4 - vsize % 4) % 4

    body = b""
    for vname, _vdims, data, nc_type, _attrs in var_entries:
        if nc_type == NC_CHAR:
            raw = data.tobytes()
        else:
            raw = data.astype(_NC_TO_NP[nc_type]).tobytes()
        body += _pad4(raw)

    with open(path, "wb") as f:
        f.write(header + var_header(begins) + body)


def _read_name(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">I", buf, off)
    off += 4
    s = buf[off : off + n].decode("utf-8")
    off += n + ((4 - n % 4) % 4)
    return s, off


def _read_attrs(buf: bytes, off: int) -> tuple[dict[str, Any], int]:
    tag, count = struct.unpack_from(">II", buf, off)
    off += 8
    attrs: dict[str, Any] = {}
    if tag != _TAG_ATT:
        return attrs, off
    for _ in range(count):
        name, off = _read_name(buf, off)
        ty, n = struct.unpack_from(">II", buf, off)
        off += 8
        nbytes = n * _NC_SIZE[ty]
        raw = buf[off : off + nbytes]
        off += nbytes + ((4 - nbytes % 4) % 4)
        if ty == NC_CHAR:
            attrs[name] = raw.decode("utf-8", errors="replace")
        else:
            vals = np.frombuffer(raw, _NC_TO_NP[ty])
            attrs[name] = vals[0].item() if n == 1 else vals.tolist()
    return attrs, off


def read_nc3(path: str) -> dict[str, Any]:
    """Read a classic netCDF-3 file (CDF-1/CDF-2, fixed-size variables) →
    {"dims": {...}, "attrs": {...}, "variables": {name: {"dims": (...),
    "data": ndarray, "attrs": {...}}}}. Char variables with a trailing
    ``*_strlen`` dim decode back to string arrays."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic netCDF-3 file")
    large = buf[3] == 2
    (numrecs,) = struct.unpack_from(">I", buf, 4)  # 0xFFFFFFFF = STREAMING
    off = 8  # magic + numrecs
    # dims
    tag, count = struct.unpack_from(">II", buf, off)
    off += 8
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    if tag == _TAG_DIM:
        for _ in range(count):
            nm, off = _read_name(buf, off)
            (sz,) = struct.unpack_from(">I", buf, off)
            off += 4
            dim_names.append(nm)
            dim_sizes.append(sz)
    rec_dim = dim_sizes.index(0) if 0 in dim_sizes else None
    gattrs, off = _read_attrs(buf, off)
    tag, count = struct.unpack_from(">II", buf, off)
    off += 8
    # first pass: var headers
    var_heads: list[dict[str, Any]] = []
    if tag == _TAG_VAR:
        for _ in range(count):
            nm, off = _read_name(buf, off)
            (nd,) = struct.unpack_from(">I", buf, off)
            off += 4
            dimids = struct.unpack_from(f">{nd}I", buf, off) if nd else ()
            off += 4 * nd
            vattrs, off = _read_attrs(buf, off)
            if large:
                ty, vsize = struct.unpack_from(">II", buf, off)
                (begin,) = struct.unpack_from(">Q", buf, off + 8)
                off += 16
            else:
                ty, vsize, begin = struct.unpack_from(">III", buf, off)
                off += 12
            var_heads.append(
                dict(name=nm, dimids=dimids, attrs=vattrs, ty=ty,
                     vsize=vsize, begin=begin,
                     is_rec=bool(dimids) and dimids[0] == rec_dim)
            )

    # record geometry: each record interleaves one slab per record var
    # (spec: the single-record-var case is packed without per-record pad)
    rec_vars = [h for h in var_heads if h["is_rec"]]
    recsize = sum(h["vsize"] for h in rec_vars)
    if len(rec_vars) == 1:
        h = rec_vars[0]
        n_slice = int(
            np.prod([dim_sizes[i] for i in h["dimids"][1:]]) if len(h["dimids"]) > 1 else 1
        )
        recsize = n_slice * _NC_SIZE[h["ty"]]
    if rec_vars and numrecs == 0xFFFFFFFF:  # STREAMING: derive from size
        first = min(h["begin"] for h in rec_vars)
        numrecs = max(0, (len(buf) - first) // recsize) if recsize else 0

    variables: dict[str, Any] = {}
    for h in var_heads:
        ty, begin, dimids = h["ty"], h["begin"], h["dimids"]
        if h["is_rec"]:
            slice_shape = tuple(dim_sizes[i] for i in dimids[1:])
            n_slice = int(np.prod(slice_shape)) if slice_shape else 1
            nbytes = n_slice * _NC_SIZE[ty]
            parts = [
                buf[begin + r * recsize : begin + r * recsize + nbytes]
                for r in range(numrecs)
            ]
            raw = b"".join(parts)
            shape = (numrecs,) + slice_shape
        else:
            shape = tuple(dim_sizes[i] for i in dimids)
            n = int(np.prod(shape)) if shape else 1
            raw = buf[begin : begin + n * _NC_SIZE[ty]]
        data = np.frombuffer(raw, _NC_TO_NP[ty]).reshape(shape)
        vdims = tuple(dim_names[i] for i in dimids)
        if ty == NC_CHAR and vdims and vdims[-1].endswith("_strlen"):
            flat = data.reshape(-1, shape[-1])
            strs = np.array(
                [b"".join(row).decode("utf-8", "replace").rstrip("\x00")
                 for row in flat]
            ).reshape(shape[:-1])
            data = strs
            vdims = vdims[:-1]
        variables[h["name"]] = {"dims": vdims, "data": data, "attrs": h["attrs"]}

    dims_out = dict(zip(dim_names, dim_sizes))
    if rec_dim is not None:
        dims_out[dim_names[rec_dim]] = int(numrecs)
    return {"dims": dims_out, "attrs": gattrs, "variables": variables}
