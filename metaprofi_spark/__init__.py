"""metaprofi_spark — a PySpark-native distributed sketch library.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of kalininalab/metaprofi: partitioned Bloom-filter indexes
over shingled k-grams with exact (zero-false-negative) and thresholded
membership search, plus sibling mergeable sketches (HLL, count-min,
KLL) — all built as Arrow-vectorized ``applyInPandas`` /
``mapInPandas`` aggregations over Spark DataFrames.

Reference semantics preserved (citations are file:line into
/root/reference/):
  * multi-seed MurmurHash2_x64_64, seeds 0..h-1
    (metaprofi/lib/bloomfilter_cython.pyx:93-94, :488-597)
  * bit position = hash % m, little-endian bit order within a byte
    (bloomfilter_cython.pyx:107-113)
  * byte-padded packed filters (metaprofi/lib/utilities.py:257-265)
  * bit-sliced index = row-major transpose of the filter matrix
    (metaprofi/lib/build_index_zarr.py:433-484)
  * exact search = AND over all query k-grams
    (metaprofi/lib/search_index.py:556-575)
  * threshold search = per-sample k-gram hit count >= ceil(n*t/100)
    (metaprofi/lib/search_index.py:518-553)
"""

from metaprofi_spark.config import SketchConfig

__all__ = ["SketchConfig"]
__version__ = "0.1.0"
