"""Pure-numpy kernels — no Spark imports here.

These are the vectorized batch kernels that run inside Arrow/pandas UDFs.
Everything operates on whole numpy arrays (no per-row Python), which is
the engine's substitute for the reference's fused Cython loops
(/root/reference/metaprofi/lib/bloomfilter_cython.pyx).
"""

from metaprofi_spark.kernels.mmh2 import mmh2_64_scalar, mmh2_64_windows
from metaprofi_spark.kernels.shingle import shingle_positions, shingle_windows
from metaprofi_spark.kernels.bits import (
    and_reduce,
    or_reduce,
    pack_bits,
    set_bits,
    check_bits,
    unpack_bits,
)

__all__ = [
    "mmh2_64_scalar",
    "mmh2_64_windows",
    "shingle_positions",
    "shingle_windows",
    "and_reduce",
    "or_reduce",
    "pack_bits",
    "set_bits",
    "check_bits",
    "unpack_bits",
]
