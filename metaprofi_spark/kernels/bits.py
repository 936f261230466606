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


def and_reduce(blobs, nbytes: int) -> bytes:
    """Bitwise-AND of packed buffers (query combine,
    /root/reference/metaprofi/lib/utilities.py:584-595)."""
    if not len(blobs):
        return bytes(nbytes)
    return np.bitwise_and.reduce(_stack(blobs, nbytes), axis=0).tobytes()
