from metaprofi_spark.operators.bloom_build import (
    build_matrix,
    build_matrix_grouped,
    matrix_summary,
)
from metaprofi_spark.operators.bloom_index import (
    build_index,
    load_index,
    persist_index,
    plan_index_geometry,
)
from metaprofi_spark.operators.bloom_search import hash_queries, search

__all__ = [
    "build_matrix",
    "build_matrix_grouped",
    "matrix_summary",
    "build_index",
    "persist_index",
    "load_index",
    "plan_index_geometry",
    "hash_queries",
    "search",
]
