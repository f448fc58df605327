"""Canonical key encoding — any column → a consistent binary/string key.

The reference takes opaque ``&[u8]`` keys and demands only a *consistent*
representation per type (README.md:12: "the binary representation doesn't
matter be, le, ne" as long as it is consistent). We mirror that: each Arrow
type gets ONE canonical encoding, and the documented 1 MB max key size
(README.md:14-15 — documented but unenforced in the reference WAL reader,
filter.rs:507-510; we adopt the documented cap as a validation rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_KEY_BYTES = 1 << 20  # 1 MB, README.md:14-15


def key_bytes(col) -> pa.Array:
    """Canonical binary encoding of a column, suitable for sketch keys.

    - string/large_string → UTF-8 bytes (cast to binary)
    - binary → as-is
    - integers → little-endian 8-byte two's complement
    - floats → little-endian IEEE-754 8-byte (after cast to float64)
    - timestamps → int64 epoch-us little-endian
    - everything else → UTF-8 of its canonical string form
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        out = col
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        out = col.cast(pa.binary())
    elif pa.types.is_integer(t) or pa.types.is_temporal(t):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype("<i8")
        out = _fixed8(vals)
    elif pa.types.is_floating(t):
        vals = col.cast(pa.float64()).to_numpy(zero_copy_only=False).astype("<f8")
        out = _fixed8(vals)
    else:
        out = pc.cast(col, pa.string()).cast(pa.binary())
    _validate_key_sizes(out)
    return out


def _fixed8(vals: np.ndarray) -> pa.Array:
    """Zero-copy-ish 8-byte-per-row binary array from a numpy buffer."""
    buf = pa.py_buffer(vals.tobytes())
    fsb = pa.FixedSizeBinaryArray.from_buffers(pa.binary(8), len(vals), [None, buf])
    return fsb.cast(pa.binary())


def _validate_key_sizes(arr: pa.Array) -> None:
    lens = pc.binary_length(arr)
    mx = pc.max(lens).as_py()
    if mx is not None and mx > MAX_KEY_BYTES:
        raise ValueError(f"key exceeds the 1 MB max key size (README.md:14): {mx} bytes")
