"""Zero-interpreter-loop extraction of UTF-8 byte buffers from Arrow
arrays and pandas Series.

The sketch folds and minhash/simhash kernels hash variable-length
strings; materializing ``list[bytes]`` per batch was the last
per-element Python work on those hot paths (r2 advice).  These helpers
hand the kernels the Arrow wire layout directly — a flat uint8 data
buffer plus an (n+1) offsets vector — which `mmh2_64_buffer` consumes
without touching a Python object per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def string_buffer(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, offsets int64) of a string/large_string/binary
    Arrow array, honoring slice offsets.  Nulls are treated as empty
    strings (callers drop nulls first when semantics require it)."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    else:
        raise TypeError(f"not a string/binary array: {t}")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, offsets


def series_utf8_buffer(series: pd.Series, drop_null: bool = True):
    """(data, offsets) for a pandas Series of strings or integers —
    UTF-8 conversion happens inside Arrow (C), matching
    ``str(v).encode("utf-8")`` for those dtypes.  Returns None for
    dtypes whose str() rendering Arrow does not reproduce exactly
    (floats, binary — ``str(b'x')`` is ``"b'x'"``) — callers fall back
    to the interpreter loop there.

    ``drop_null=False`` keeps row alignment by rendering nulls as the
    string ``"None"`` (what ``str(v).encode()`` produced) instead of
    dropping them — required by point-query paths that zip results back
    against the input rows."""
    arr = pa.Array.from_pandas(series)
    t = arr.type
    if pa.types.is_null(t):
        if drop_null or len(arr) == 0:
            return np.empty(0, np.uint8), np.zeros(1, np.int64)
        arr = pa.array(["None"] * len(arr), pa.string())
    elif pa.types.is_integer(t):
        arr = pc.cast(arr, pa.string())
    elif not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return None
    if arr.null_count:
        arr = arr.drop_null() if drop_null else pc.fill_null(arr, "None")
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    return string_buffer(arr)


def utf8_values(series: pd.Series, drop_null: bool = True):
    """The shared 'Arrow fast path or interpreter fallback' used by
    every sketch fold: returns either an Arrow-layout (data, offsets)
    tuple or a list[bytes], both accepted by the hash kernels.  One
    definition so null handling cannot drift between call sites."""
    buf = series_utf8_buffer(series, drop_null=drop_null)
    if buf is not None:
        return buf
    if drop_null:
        return [str(v).encode("utf-8") for v in series if v is not None]
    return [str(v).encode("utf-8") for v in series]


def list_string_runs(col: pa.Array):
    """From an Arrow list<string> column: per-row token counts plus the
    flat token byte buffer.

    Returns (counts int64 (n,), data uint8, offsets int64 (total+1,)).
    Null rows count as 0 tokens (they contribute nothing to the flat
    values, matching the count).  Null TOKENS inside a list are hashed
    as empty strings — enforced here with an explicit fill_null rather
    than assumed from the offsets layout (the Arrow spec only
    guarantees monotonic offsets for null slots, not zero-width ones,
    so slicing a buffer with un-filled nulls could hash garbage)."""
    counts = (
        pc.fill_null(pc.list_value_length(col), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = col.flatten()
    if flat.null_count:
        flat = pc.fill_null(flat, "")
    data, offsets = string_buffer(flat)
    return counts, data, offsets


def list_float_matrix(arr: pa.Array) -> np.ndarray:
    """(n, dim) matrix view of an Arrow list<float>/list<double>/
    fixed_size_list column whose rows all have the same length — the
    embedding-column fast path (one contiguous values buffer, zero
    Python objects per row; the r3 advice's mapInArrow upgrade of the
    `map(np.asarray)` batch loop).

    Raises on ragged rows or null rows/values: an embedding table with
    missing vectors should fail loudly, not hash garbage."""
    t = arr.type
    if arr.null_count:
        raise ValueError("list_float_matrix: null rows in embedding column")
    if pa.types.is_fixed_size_list(t):
        dim = t.list_size
    else:
        if pa.types.is_list(t):
            off_dtype = np.int32
        elif pa.types.is_large_list(t):
            off_dtype = np.int64
        else:
            raise TypeError(f"not a list array: {t}")
        offsets = np.frombuffer(arr.buffers()[1], off_dtype)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        widths = np.diff(offsets)
        if len(widths) == 0:
            return np.empty((0, 0), np.float64)
        if (widths != widths[0]).any():
            raise ValueError("list_float_matrix: ragged embedding lengths")
        dim = int(widths[0])
    flat = arr.flatten()  # honors slice offsets (ListArray.flatten contract)
    if flat.null_count:
        raise ValueError("list_float_matrix: null values inside embeddings")
    vals = flat.to_numpy(zero_copy_only=True)
    return vals.reshape(len(arr), dim)
