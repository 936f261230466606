"""Packed little-endian bit vectors: set / test / pack / unpack / reduce.

Format spec (fixed, hardware-independent): bit r of a filter lives in
byte r>>3 at bit position r&7 — the little-endian bit order the
reference uses (/root/reference/metaprofi/lib/bloomfilter_cython.pyx:47-59,
np.unpackbits(..., bitorder='little') at build_index_zarr.py:458-463).
"""

from __future__ import annotations

import numpy as np


def set_bits(buf: np.ndarray, positions: np.ndarray) -> None:
    """OR bits at ``positions`` into a uint8 buffer, in place.

    Idempotent (Bloom insert is an OR, bloomfilter_cython.pyx:109-113).
    """
    pos = positions.reshape(-1).astype(np.uint64, copy=False)
    np.bitwise_or.at(
        buf, (pos >> np.uint64(3)).astype(np.int64),
        (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
    )


def check_bits(buf: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Boolean array: is bit set at each position."""
    pos = positions.astype(np.uint64, copy=False)
    byte = (pos >> np.uint64(3)).astype(np.int64)
    bit = (pos & np.uint64(7)).astype(np.uint8)
    return (buf[byte] >> bit) & np.uint8(1) != 0


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """0/1 (or bool) vector -> packed uint8, little-endian bit order."""
    return np.packbits(bits.astype(np.uint8, copy=False), bitorder="little")


def unpack_bits(packed: np.ndarray | bytes, n_bits: int) -> np.ndarray:
    """Packed uint8 -> 0/1 uint8 vector of length n_bits."""
    arr = np.frombuffer(packed, dtype=np.uint8) if isinstance(packed, (bytes, bytearray)) else packed
    return np.unpackbits(arr, count=n_bits, bitorder="little")


_SWAR = (
    (np.uint64(7), np.uint64(0x00AA00AA00AA00AA)),
    (np.uint64(14), np.uint64(0x0000CCCC0000CCCC)),
    (np.uint64(28), np.uint64(0x00000000F0F0F0F0)),
)


def bit_matrix_transpose(mats: np.ndarray, out_width_bytes: int | None = None) -> np.ndarray:
    """Transpose a packed bit matrix WITHOUT unpacking.

    mats: (n_rows, W) uint8, little-endian bit order (bit b of column
    byte c = logical column 8c+b).  Returns (W*8, ceil(n_rows/8)) uint8
    where row s holds the bits of original column s across all rows —
    the bit-slice extraction at the heart of the index build
    (/root/reference/metaprofi/lib/build_index_zarr.py:433-463, done
    there with unpackbits in shared memory).

    Implementation: pack each (8-row x 8-bit) block into one uint64 and
    apply the classic SWAR 8x8 bit-transpose (3 masked swap passes) to
    every block at once — ~2x faster than unpackbits/packbits and never
    materializes the n*W*8 unpacked intermediate.
    """
    n, W = mats.shape
    pad = (-n) % 8
    if pad:
        mats = np.vstack([mats, np.zeros((pad, W), dtype=np.uint8)])
        n += pad
    g = n // 8
    # (g, 8 rows, W) -> (g, W, 8) so each block's 8 row-bytes are the 8
    # bytes of one uint64 (row u = byte u, little-endian)
    x = (
        np.ascontiguousarray(mats.reshape(g, 8, W).transpose(0, 2, 1))
        .reshape(g, W * 8)
        .view("<u8")
    )
    for s, m in _SWAR:
        t = (x ^ (x >> s)) & m
        x = x ^ t ^ (t << s)
    # byte t of block (g, c) = output row 8c+t, column-group g
    out = (
        np.ascontiguousarray(x.view(np.uint8).reshape(g, W, 8).transpose(1, 2, 0))
        .reshape(W * 8, g)
    )
    if out_width_bytes is not None and out_width_bytes != g:
        full = np.zeros((W * 8, out_width_bytes), dtype=np.uint8)
        full[:, : min(g, out_width_bytes)] = out[:, :out_width_bytes]
        return full
    return out


def _stack(blobs, nbytes: int) -> np.ndarray:
    out = np.zeros((len(blobs), nbytes), dtype=np.uint8)
    for i, b in enumerate(blobs):
        if b is not None and len(b):
            a = np.frombuffer(b, dtype=np.uint8)
            out[i, : len(a)] = a
    return out


def or_reduce(blobs, nbytes: int) -> bytes:
    """Bitwise-OR of packed buffers — the associative/commutative Bloom
    merge (the UDAF combine step).  Short buffers are zero-extended."""
    if not len(blobs):
        return bytes(nbytes)
    return np.bitwise_or.reduce(_stack(blobs, nbytes), axis=0).tobytes()


def apply_column_mask(blob: bytes, mask: np.ndarray) -> bytes:
    """AND a per-slice sample-column mask across a packed slab.

    A slab is k slices x len(mask) bytes (one bit per sample of the
    bucket, little-endian); tiling the mask down the slice axis clears
    the tombstoned samples' bit COLUMNS — the physical-reclaim step of
    tombstone-aware compaction (Iceberg rewrite-data-files analog).
    Zeroed columns then compress to almost nothing under zstd."""
    a = np.frombuffer(blob, dtype=np.uint8)
    w = mask.shape[0]
    return (a.reshape(-1, w) & mask[None, :]).tobytes()


def and_reduce(blobs, nbytes: int) -> bytes:
    """Bitwise-AND of packed buffers (query combine,
    /root/reference/metaprofi/lib/utilities.py:584-595)."""
    if not len(blobs):
        return bytes(nbytes)
    return np.bitwise_and.reduce(_stack(blobs, nbytes), axis=0).tobytes()
