"""Minimal MAT-file v5 reader/writer (scipy-free).

The reference ingests several vendor formats via ``scipy.io.loadmat``
(``stglib/core/utils.py:1612-1647`` loadmat + struct flattening;
``sig/mat2cdf.py``, ``rdi/mat2cdf.py``, ``iq.py:172-446``, ``abss.py``).
scipy is not available in this environment, so this module implements the
subset of the public MAT v5 container format those files actually use:
numeric 2-D matrices (double/single/int8-64), char arrays, struct arrays
(1×1), cell arrays, and zlib-compressed elements.

Format per MathWorks "MAT-File Format" (public PDF): 128-byte header
(116 text + 8 subsys + version u16 + endian 'IM'), then tagged data
elements — tag = (u32 type, u32 nbytes), with the 4-byte "small data
element" packing when nbytes ≤ 4. miMATRIX payloads hold array flags,
dimensions, name, then class-specific sub-elements, each 8-byte aligned.

Driver-side by design: vendor .mat files are config-scale (O(100 MB));
rows reach Spark via ``spark.createDataFrame`` on the flattened dict.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

miINT8, miUINT8, miINT16, miUINT16, miINT32, miUINT32 = 1, 2, 3, 4, 5, 6
miSINGLE, miDOUBLE, miINT64, miUINT64 = 7, 9, 12, 13
miMATRIX, miCOMPRESSED, miUTF8 = 14, 15, 16

mxCELL, mxSTRUCT, mxCHAR = 1, 2, 4
mxDOUBLE, mxSINGLE = 6, 7
mxINT8, mxUINT8, mxINT16, mxUINT16, mxINT32, mxUINT32 = 8, 9, 10, 11, 12, 13
mxINT64, mxUINT64 = 14, 15

_MI_DTYPE = {
    miINT8: np.int8, miUINT8: np.uint8, miINT16: np.int16, miUINT16: np.uint16,
    miINT32: np.int32, miUINT32: np.uint32, miSINGLE: np.float32,
    miDOUBLE: np.float64, miINT64: np.int64, miUINT64: np.uint64,
}
_MX_TO_NP = {
    mxDOUBLE: np.float64, mxSINGLE: np.float32, mxINT8: np.int8,
    mxUINT8: np.uint8, mxINT16: np.int16, mxUINT16: np.uint16,
    mxINT32: np.int32, mxUINT32: np.uint32, mxINT64: np.int64,
    mxUINT64: np.uint64,
}


def _read_element(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """One tagged element → (mi type, payload bytes, next offset)."""
    ty = struct.unpack_from("<I", buf, off)[0]
    if ty >> 16:  # small data element: length in the upper half-word
        nbytes = ty >> 16
        ty &= 0xFFFF
        return ty, buf[off + 4 : off + 4 + nbytes], off + 8
    nbytes = struct.unpack_from("<I", buf, off + 4)[0]
    data = buf[off + 8 : off + 8 + nbytes]
    end = off + 8 + nbytes
    end += (8 - end % 8) % 8  # 8-byte alignment padding
    return ty, data, end


def _parse_matrix(payload: bytes) -> tuple[str, Any]:
    """miMATRIX payload → (name, value)."""
    off = 0
    ty, flags, off = _read_element(payload, off)
    klass = flags[0]
    ty, dims_b, off = _read_element(payload, off)
    dims = np.frombuffer(dims_b, np.int32).tolist()
    ty, name_b, off = _read_element(payload, off)
    raw_name = name_b.tobytes() if hasattr(name_b, "tobytes") else bytes(name_b)
    # names are ASCII per the MAT5 spec, but roundtrip our own UTF-8
    # writer losslessly; latin-1 salvages non-UTF8 vendor bytes
    try:
        name = raw_name.decode("utf-8")
    except UnicodeDecodeError:
        name = raw_name.decode("latin-1")

    if klass == mxCHAR:
        ty, data, off = _read_element(payload, off)
        if ty == miUTF8:
            return name, data.decode("utf-8", errors="replace")
        return name, bytes(data[::2]).decode("ascii", errors="replace")

    if klass == mxSTRUCT:
        _, fl_b, off = _read_element(payload, off)  # field name length
        flen = struct.unpack("<i", fl_b[:4])[0]
        _, names_b, off = _read_element(payload, off)
        nfields = len(names_b) // flen
        fields = [
            bytes(names_b[i * flen : (i + 1) * flen]).split(b"\x00")[0].decode()
            for i in range(nfields)
        ]
        out = {}
        for fname in fields:
            ty, sub, off = _read_element(payload, off)
            _, val = _parse_matrix(sub)
            out[fname] = val
        return name, out

    if klass == mxCELL:
        n = int(np.prod(dims))
        cells = []
        for _ in range(n):
            ty, sub, off = _read_element(payload, off)
            _, val = _parse_matrix(sub)
            cells.append(val)
        return name, cells

    np_t = _MX_TO_NP.get(klass)
    if np_t is None:
        return name, None
    ty, data, off = _read_element(payload, off)
    raw = np.frombuffer(bytes(data), _MI_DTYPE[ty]).astype(np_t)
    if len(dims) == 2:
        arr = raw.reshape(dims[1], dims[0]).T  # column-major storage
    else:
        arr = raw.reshape(dims[::-1]).T
    return name, arr


def loadmat(path: str) -> dict[str, Any]:
    """Read a MAT v5 file → {variable name: ndarray | str | dict | list}."""
    with open(path, "rb") as f:
        buf = f.read()
    endian = buf[126:128]
    if endian not in (b"IM",):
        raise ValueError("only little-endian MAT v5 files are supported")
    out: dict[str, Any] = {}
    off = 128
    while off + 8 <= len(buf):
        ty, payload, off = _read_element(buf, off)
        if ty == miCOMPRESSED:
            sub = zlib.decompress(bytes(payload))
            sty, spayload, _ = _read_element(sub, 0)
            if sty == miMATRIX:
                name, val = _parse_matrix(spayload)
                out[name] = val
        elif ty == miMATRIX:
            name, val = _parse_matrix(payload)
            out[name] = val
    return out


# ---------------------------------------------------------------------------
# Writer (fixture generation; numeric/char/struct subset)
# ---------------------------------------------------------------------------


def _element(ty: int, data: bytes) -> bytes:
    pad = (8 - len(data) % 8) % 8
    return struct.pack("<II", ty, len(data)) + data + b"\x00" * pad


def _matrix_numeric(name: str, arr: np.ndarray) -> bytes:
    arr = np.atleast_2d(np.asarray(arr, dtype=np.float64))
    flags = _element(miUINT32, struct.pack("<II", mxDOUBLE, 0))
    dims = _element(miINT32, struct.pack(f"<{arr.ndim}i", *arr.shape))
    nm = _element(miINT8, name.encode())
    data = _element(miDOUBLE, arr.tobytes(order="F"))  # column-major
    return _element(miMATRIX, flags + dims + nm + data)


def _matrix_char(name: str, s: str) -> bytes:
    flags = _element(miUINT32, struct.pack("<II", mxCHAR, 0))
    dims = _element(miINT32, struct.pack("<ii", 1, len(s)))
    nm = _element(miINT8, name.encode())
    data = _element(miUTF8, s.encode("utf-8"))
    return _element(miMATRIX, flags + dims + nm + data)


def _matrix_struct(name: str, d: dict[str, Any]) -> bytes:
    flags = _element(miUINT32, struct.pack("<II", mxSTRUCT, 0))
    dims = _element(miINT32, struct.pack("<ii", 1, 1))
    nm = _element(miINT8, name.encode())
    flen = 32
    fnames = b"".join(k.encode().ljust(flen, b"\x00") for k in d)
    body = _element(miINT32, struct.pack("<i", flen)) + _element(miINT8, fnames)
    for v in d.values():
        if isinstance(v, str):
            body += _matrix_char("", v)
        elif isinstance(v, dict):
            body += _matrix_struct("", v)  # nested struct
        else:
            body += _matrix_numeric("", v)
    return _element(miMATRIX, flags + dims + nm + body)


def _matrix_cell(name: str, items: list[Any]) -> bytes:
    flags = _element(miUINT32, struct.pack("<II", mxCELL, 0))
    dims = _element(miINT32, struct.pack("<ii", 1, len(items)))
    nm = _element(miINT8, name.encode())
    body = b""
    for v in items:
        if isinstance(v, str):
            body += _matrix_char("", v)
        elif isinstance(v, dict):
            body += _matrix_struct("", v)
        else:
            body += _matrix_numeric("", v)
    return _element(miMATRIX, flags + dims + nm + body)


def savemat(path: str, variables: dict[str, Any], compress: bool = False) -> None:
    """Write a MAT v5 file (doubles, strings, flat/nested structs, cells
    of those)."""
    header = b"MATLAB 5.0 MAT-file, stglib_spark mat5 writer".ljust(116)
    header += b"\x00" * 8 + struct.pack("<H", 0x0100) + b"IM"
    body = b""
    for name, v in variables.items():
        if isinstance(v, str):
            el = _matrix_char(name, v)
        elif isinstance(v, dict):
            el = _matrix_struct(name, v)
        elif isinstance(v, list) and any(isinstance(x, (str, dict)) for x in v):
            el = _matrix_cell(name, v)
        else:
            el = _matrix_numeric(name, v)
        if compress:
            el = _element(miCOMPRESSED, zlib.compress(el))
        body += el
    with open(path, "wb") as f:
        f.write(header + body)
