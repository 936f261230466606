from metaprofi_spark.operators.bloom_build import (
    build_matrix,
    build_matrix_grouped,
    densify_samples,
    load_matrix,
    matrix_summary,
    persist_matrix,
    or_merge_tree,
)
from metaprofi_spark.operators.bloom_index import (
    build_index,
    build_index_fused,
    load_index,
    persist_index,
    plan_index_geometry,
    store_summary,
)
from metaprofi_spark.operators.bloom_search import (
    format_results,
    hash_queries,
    hash_queries_df,
    parse_results,
    search,
    search_df,
)
from metaprofi_spark.operators.bloom_update import update_index, update_store

__all__ = [
    "build_matrix",
    "densify_samples",
    "or_merge_tree",
    "persist_matrix",
    "load_matrix",
    "store_summary",
    "format_results",
    "parse_results",
    "update_index",
    "update_store",
    "build_matrix_grouped",
    "matrix_summary",
    "build_index",
    "build_index_fused",
    "persist_index",
    "load_index",
    "plan_index_geometry",
    "hash_queries",
    "hash_queries_df",
    "search",
    "search_df",
]
