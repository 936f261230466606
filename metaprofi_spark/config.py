"""Sketch configuration — the frozen contract every artifact is built and
queried against.

Analog of the reference's YAML config + validation
(/root/reference/metaprofi/lib/utilities.py:215-382) and the
config-equality guards that refuse to query or update a store built with
different parameters (/root/reference/metaprofi/lib/search_index.py:77-97,
build_index_zarr.py:262-283).  Unlike the reference we fix the bit order
to little-endian in the format spec itself, so artifacts are portable
across hardware (the reference instead records and enforces hardware
endianness, zarrstore.py:59-70).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class SketchConfig:
    """Parameters of a Bloom sketch store.

    Attributes:
        k: k-gram length in BYTES over the UTF-8 text (the reference
           shingles the UTF-8 byte buffer, bloomfilter_cython.pyx:101-106).
        h: number of hash functions; seeds are 0..h-1
           (bloomfilter_cython.pyx:93-94).
        m: Bloom filter size in bits (padded up to a byte multiple,
           utilities.py:257-265).
        slice_buckets: number of partitions of the bit-sliced index
           (analog of calculate_index_chunksize, utilities.py:182-211).
        normalize: "lower" to casefold k-grams before hashing (the
           webtext default); "none" = identity (the aminoacid path,
           pyx:114-129); "canonical" = reference nucleotide mode —
           hash min(kmer, revcomp(kmer)) per window
           (bloomfilter_cython.pyx:272-306).
        sequence_type: "text" | "nucleotide" | "aminoacid" — recorded
           in the store manifest so search() can decide whether a
           nucleotide query against an aminoacid store needs six-frame
           translation (search_index.py:107-141).
        slice_range_size: consecutive bit-slices stored per index row
           (a "slab") — the analog of the reference's index_chunk_rows
           (utilities.py:182-211).  At m=4e10 per-slice rows would be
           40e9 rows; slabs keep row count = m / slice_range_size.
        chunk_bits: width of one Bloom-filter chunk in bits.  A filter
           with huge m (the reference runs m=4e10 ⇒ 5 GB packed) is
           stored as ceil(m/chunk_bits) independent chunks so no single
           task ever materializes the whole filter — the Spark analog of
           calculate_chunksize's memory-budgeted row chunking
           (utilities.py:131-179).
    """

    k: int = 12
    h: int = 2
    m: int = 1 << 20
    slice_buckets: int = 64
    normalize: str = "lower"
    chunk_bits: int = 1 << 20
    slice_range_size: int = 256
    sequence_type: str = "text"

    def __post_init__(self) -> None:
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.h < 1:
            raise ValueError("h must be >= 1")
        if self.m < 8:
            raise ValueError("m must be >= 8")
        if self.m % 8 != 0:
            # the kernels mod by m_padded; the reference mods by UNPADDED
            # m and pads only the packed bytes (utilities.py:257-265).
            # Rejecting non-byte-multiple m removes the ambiguity rather
            # than silently diverging from reference bit positions.
            raise ValueError("m must be a multiple of 8 (position = hash % m)")
        if self.normalize not in ("lower", "none", "canonical"):
            raise ValueError("normalize must be 'lower', 'none' or 'canonical'")
        if self.sequence_type not in ("text", "nucleotide", "aminoacid"):
            raise ValueError("sequence_type must be 'text', 'nucleotide' or 'aminoacid'")
        if self.chunk_bits % 8 != 0:
            raise ValueError("chunk_bits must be a byte multiple")
        if self.slice_buckets < 1:
            raise ValueError("slice_buckets must be >= 1")
        if self.slice_range_size < 1:
            raise ValueError("slice_range_size must be >= 1")
        if self.chunk_bits % self.slice_range_size != 0:
            raise ValueError("chunk_bits must be a multiple of slice_range_size")

    # -- derived geometry ------------------------------------------------
    @property
    def m_padded(self) -> int:
        """m rounded up to a byte multiple (pad rule, utilities.py:257-265)."""
        return (self.m + 7) // 8 * 8

    @property
    def packed_bytes(self) -> int:
        return self.m_padded // 8

    @property
    def n_chunks(self) -> int:
        return (self.m_padded + self.chunk_bits - 1) // self.chunk_bits

    @property
    def chunk_bytes(self) -> int:
        return self.chunk_bits // 8

    @property
    def seeds(self) -> tuple[int, ...]:
        return tuple(range(self.h))

    def fpr(self, n_items: int) -> float:
        """Expected false-positive rate for n inserted items:
        (1 - e^(-h*n/m))^h  (documented in the reference README.md:274-316)."""
        return (1.0 - math.exp(-self.h * n_items / self.m)) ** self.h

    # -- persistence (the config travels with the store; F8 guard) -------
    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SketchConfig":
        return cls(**json.loads(s))

    def require_compatible(self, other: "SketchConfig") -> None:
        """Refuse to mix artifacts built under different parameters —
        analog of search_index.py:77-97 / build_index_zarr.py:262-283."""
        if self != other:
            raise ValueError(
                f"sketch config mismatch: store={other.to_json()} "
                f"requested={self.to_json()}"
            )
