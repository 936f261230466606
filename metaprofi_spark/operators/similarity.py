"""Similarity search over embedding columns (array<float>).

* ``knn_topk_quantized`` — brute-force top-k by dot product over
  QUANTIZED embeddings (round(x*1000) as long).  Integer arithmetic
  makes the ranking bit-identical across engines, so this is the
  SQL-checkable baseline.
* ``knn_topk_cosine`` — float cosine variant (JVM-side zip_with /
  aggregate expressions, no Python).
* ``ann_lsh_topk`` — random-hyperplane LSH: sign-pattern buckets from
  fixed seeded hyperplanes; candidates share a bucket in >= 1 table;
  exact re-rank inside candidates.  The scale path: bucket join is
  linear-ish vs the brute-force cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _quantize(col):
    # EXPLICIT double before the multiply: a float32 component like
    # 0.3195f is 319.49999928 in double (rounds to 319) but its f32
    # product 0.3195f*1000f is exactly 319.5 (rounds to 320) — engines
    # that multiply in FLOAT diverge on such boundaries (found by the
    # r4 sf0.1 sweep, vec 1879 comp 17).  The SQL oracles carry the
    # same CAST(x AS DOUBLE) so both sides round identical doubles.
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _dot_long(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _dot_double(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def knn_topk_quantized(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, dot) — top-k by quantized dot product,
    self excluded, ties broken by neighbor_id."""
    from pyspark.sql.window import Window

    q = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv")
        )
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot_long(F.col("qv"), F.col("cv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dot")
    )


def knn_quantized_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH qv AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id IN ({ids})
), cv AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS c
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         CAST(list_dot_product(q, c) AS BIGINT) AS dot
  FROM qv, cv WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, dot FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def knn_topk_cosine(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Float cosine top-k (JVM expressions; for parity-free use)."""
    from pyspark.sql.window import Window

    norm = lambda v: F.sqrt(_dot_double(v, v))  # noqa: E731
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot_double(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    min_dot_q: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a < id_b) whose QUANTIZED dot
    product (round(x*1000) as long) >= min_dot_q.  Integer arithmetic =>
    bit-exact vs the SQL oracle.  Brute-force; the LSH path
    (ann_lsh_topk) is the scale variant."""
    q = df.select(F.col(id_col).alias("id_a"), _quantize(F.col(vec_col)).alias("va"))
    c = df.select(F.col(id_col).alias("id_b"), _quantize(F.col(vec_col)).alias("vb"))
    return (
        q.join(c, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _dot_long(F.col("va"), F.col("vb")).alias("dot_q"))
        .filter(F.col("dot_q") >= min_dot_q)
    )


def embedding_near_dup_sql(min_dot_q: int) -> str:
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE CAST(list_dot_product(a.v, b.v) AS BIGINT) >= {min_dot_q}
"""


def _hyperplanes(dim: int, n_bits: int, table: int) -> np.ndarray:
    """Fixed seeded random hyperplanes (deterministic across runs)."""
    rng = np.random.default_rng(1234 + table)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_id, bucket) — sign-pattern LSH buckets per table.

    mapInArrow: the embedding column is read as one contiguous Arrow
    values buffer (kernels/arrowbuf.list_float_matrix) and all tables'
    projections run as ONE (n, dim) @ (dim, T*n_bits) matmul — zero
    Python objects per row (the r3 advice item on the
    `map(np.asarray)` batch loop)."""
    import pyarrow as pa

    from metaprofi_spark.kernels.arrowbuf import list_float_matrix

    planes = np.stack([_hyperplanes(dim, n_bits, t) for t in range(n_tables)])
    flat_planes = planes.reshape(-1, dim)  # (T*n_bits, dim)
    weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)

    def bucketize(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = list_float_matrix(rb.column(1)).astype(np.float64)
            signs = (mat @ flat_planes.T) > 0  # (n, T*n_bits)
            buckets = (
                signs.reshape(n, n_tables, n_bits).astype(np.int64) * weights
            ).sum(axis=2)  # (n, T)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_tables), pa.int64()),
                    pa.array(
                        np.tile(np.arange(n_tables, dtype=np.int32), n),
                        pa.int32(),
                    ),
                    pa.array(buckets.reshape(-1), pa.int64()),
                ],
                ["id", "table_id", "bucket"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        bucketize, "id long, table_id int, bucket long"
    )


def _score_topk(joined: DataFrame, k: int, quantized: bool) -> DataFrame:
    """Shared scoring + top-k over a (query_id, neighbor_id, qv, cv)
    frame: quantized integer dot (the bit-identity contract with
    knn_topk_quantized) or float cosine, row_number window with the
    (desc score, asc neighbor_id) tie-break.  ONE definition so the
    in-memory re-rank and the IVF store path can never drift (r4
    review)."""
    from pyspark.sql.window import Window

    if quantized:
        score = _dot_long(_quantize(F.col("qv")), _quantize(F.col("cv"))).alias("dot")
        out_col = "dot"
    else:
        norm = lambda v: F.sqrt(_dot_double(v, v))  # noqa: E731
        score = (
            _dot_double(F.col("qv"), F.col("cv"))
            / (norm(F.col("qv")) * norm(F.col("cv")))
        ).alias("cosine")
        out_col = "cosine"
    scored = joined.select("query_id", "neighbor_id", score)
    w = Window.partitionBy("query_id").orderBy(F.desc(out_col), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", out_col)
    )


def _rerank_candidates(
    cand: DataFrame,
    df: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    quantized: bool = False,
    query_ids: list[int] | None = None,
) -> DataFrame:
    """Exact re-rank of (query_id, neighbor_id) candidate pairs (shared
    by the LSH and IVF paths).  ``quantized=True`` ranks by the integer
    quantized dot product (round(x*1000) as long) — the same scoring as
    :func:`knn_topk_quantized`, so an ANN result whose candidate set
    covers the true top-k is BIT-IDENTICAL to the brute-force baseline
    (the verified-gate tier).

    The broadcast query-vector side is FILTERED to the query ids before
    the broadcast hint (the r3 verdict's one scale-killer: broadcasting
    `qv` built from the unfiltered corpus ships ALL vectors to every
    executor — an OOM at 10^9 rows even though the join discards the
    non-candidates).  Callers pass ``query_ids`` (bounded by the query
    set, becomes a pushed parquet filter); without it the filter is a
    semi-join against the candidate pairs' distinct query ids."""
    vecs = df.select(F.col(id_col), F.col(vec_col))
    if query_ids is not None:
        vecs_q = vecs.filter(F.col(id_col).isin(query_ids))
    else:
        vecs_q = vecs.join(
            cand.select(F.col("query_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
    qv = vecs_q.withColumnsRenamed({id_col: "query_id", vec_col: "qv"})
    cv = vecs.withColumnsRenamed({id_col: "neighbor_id", vec_col: "cv"})
    joined = cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    return _score_topk(joined, k, quantized)


def ann_lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 10,
    n_bits: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k: LSH bucket join -> exact re-rank within
    candidates.  Recall measured against brute force in tests.
    ``quantized=True`` re-ranks with the integer dot product so the
    result is comparable bit-for-bit to :func:`knn_topk_quantized`
    whenever the buckets cover the true top-k (the verified gate)."""
    buckets = lsh_bucket_ids(df, dim, n_bits, n_tables, id_col, vec_col)
    qb = buckets.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), "table_id", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    return _rerank_candidates(
        cand, df, k, id_col, vec_col, quantized=quantized, query_ids=query_ids
    )


def embedding_near_dup_components(
    df: DataFrame,
    dim: int,
    n_bits: int = 10,
    n_tables: int = 8,
    max_iter: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components of the LSH bucket-collision graph over
    EMBEDDINGS: (id, component) — the embedding-modality sibling of the
    text dedup scale path (dedup.near_dup_components).

    Same linear-size recipe: per (table, bucket) emit star edges
    (id -> bucket min), never pairs, then min-label propagation —
    a 1M-vector boilerplate cluster costs 1M edges instead of 5*10^11
    pairs.  Components equal the transitive closure of the
    bucket-sharing pair graph (pinned by test)."""
    from pyspark.sql.window import Window

    from metaprofi_spark.operators.dedup import min_label_propagation

    b = lsh_bucket_ids(df, dim, n_bits, n_tables, id_col, vec_col)
    w = Window.partitionBy("table_id", "bucket")
    edges = (
        b.withColumn("rep", F.min("id").over(w))
        .filter(F.col("id") != F.col("rep"))
        .select("id", "rep")
        .distinct()
    )
    return min_label_propagation(
        edges, b.select("id").distinct(), max_iter, reliable_checkpoint
    )


def embedding_verified_components(
    df: DataFrame,
    min_dot_q: int,
    max_iter: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Connected components of the VERIFIED embedding near-dup graph:
    (id, comp), comp = min id reachable through quantized-dot >=
    min_dot_q edges.

    Edges are :func:`embedding_near_dup_pairs` — integer arithmetic,
    hash-exact vs the SQL pair oracle — so the components are exactly
    the transitive closure of the SQL-expressible pair graph
    (dedup.min_label_chain_sql builds the oracle).  The verified twin
    of :func:`embedding_near_dup_components`: that one runs the linear
    LSH star-edge plan for 100-TB corpora; this one pins the shared
    min-label propagation under the hash gate on the brute-force edge
    set.  Isolated vectors are their own component.
    """
    from metaprofi_spark.operators.dedup import min_label_propagation

    pairs = embedding_near_dup_pairs(df, min_dot_q, id_col, vec_col)
    edges = pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("rep"))
    nodes = df.select(F.col(id_col).alias("id")).distinct()
    return min_label_propagation(edges, nodes, max_iter)


def drop_embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    n_bits: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keep one representative (the min id) per embedding near-dup
    component — the embedding twin of dedup.drop_near_duplicates.
    Rows absent from the bucket graph (none possible here: every vector
    gets buckets) keep themselves; composition semantics pinned by
    test."""
    labels = embedding_near_dup_components(
        df, dim, n_bits, n_tables, id_col=id_col, vec_col=vec_col
    )
    reps = labels.filter(F.col("id") == F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(reps, id_col, "left_semi")


# ---------------------------------------------------------------------------
# IVF — coarse-quantizer ANN (the inverted-file scale path)
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 64,
    n_iter: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int | None = None,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a BOUNDED sample
    (n_centroids*256 vectors by default, deterministic id order) — the
    standard IVF recipe: training is driver-side on a fixed-size sample
    regardless of corpus size; assignment is distributed."""
    sample_size = sample_size or n_centroids * 256
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    X = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(n_iter):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — distributed nearest-centroid assignment (one matmul
    per Arrow batch against the broadcast centroid matrix; embedding
    values come straight off the Arrow buffer, no per-row Python)."""
    import pyarrow as pa

    from metaprofi_spark.kernels.arrowbuf import list_float_matrix

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.ascontiguousarray(centroids, dtype=np.float64))

    def fn(batches):
        C = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = list_float_matrix(rb.column(1)).astype(np.float64)
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            cell = (mat @ C.T).argmax(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(cell.astype(np.int32), pa.int32()),
                ],
                ["id", "cell"],
            )

    return df.select(id_col, vec_col).mapInArrow(fn, "id long, cell int")


def ann_ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    quantized: bool = False,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid, each
    query probes its ``nprobe`` closest cells, exact cosine re-rank
    inside the probed cells.  Scan fraction ~= nprobe/n_centroids — the
    inverted-file scale path next to ann_lsh_topk.  Recall vs brute
    force is measured in tests.

    ``quantized=True`` re-ranks with the integer quantized dot product
    (same scoring as :func:`knn_topk_quantized`); with
    ``nprobe == n_centroids`` every cell is probed, the candidate set
    is the full corpus, and the result is BIT-IDENTICAL to brute force
    — the verified gate tier (reference analog: exact-verify search,
    search_index.py:518-575)."""
    spark = df.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids, id_col=id_col, vec_col=vec_col
        )
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    # probe cells for each query (bounded: len(query_ids) x dim driver math)
    qrows = df.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    if not qrows:
        # empty query list / ids absent from the corpus: an empty result
        # like the candidate-join path, not an np.stack ValueError
        out_col = "dot long" if quantized else "cosine double"
        return spark.createDataFrame(
            [], f"query_id long, neighbor_id long, {out_col}"
        )
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Q = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-12)
    sims = Q @ centroids.T
    probes = np.argsort(-sims, axis=1)[:, :nprobe]
    probe_rows = [
        (int(r[0]), int(c)) for r, cells in zip(qrows, probes) for c in cells
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cell int")
    cand = (
        assigned.join(F.broadcast(probe_df), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    return _rerank_candidates(
        cand, df, k, id_col, vec_col, quantized=quantized, query_ids=query_ids
    )


# ---------------------------------------------------------------------------
# IVF store — persisted ANN index (cell-partitioned parquet)
# ---------------------------------------------------------------------------

def persist_ivf(
    df: DataFrame,
    path: str,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Persist an IVF index: vectors CLUSTERED BY CELL on disk.

    Layout: ``cells/cell=N/*.parquet`` rows (id, vec) partitioned by
    nearest-centroid cell, plus ``ivf_manifest.json`` carrying the
    centroid matrix (n_centroids × dim doubles — KBs, driver-side by
    design, like every IVF implementation).  A query probing ``nprobe``
    cells then reads EXACTLY those partitions (parquet partition
    pruning — pinned by plan test), the scan-fraction law
    nprobe/n_centroids made physical.  Returns the centroids."""
    import os

    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids, id_col=id_col, vec_col=vec_col
        )
    # ONE pass: the assignment kernel already holds ids, vectors, and
    # cells in the same Arrow batch — emit all three instead of
    # re-scanning the corpus and shuffle-joining cells back on (the r4
    # review's extra-scan + corpus-sized-shuffle finding)
    _assign_cells(df, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(path, "cells"))
    dim = int(centroids.shape[1])
    manifest = {
        "n_centroids": int(centroids.shape[0]),
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        "segments": ["cells"],
        "update_count": 0,
        "centroids": [[float(x) for x in row] for row in centroids],
    }
    _write_ivf_manifest(path, manifest)
    return centroids


def _write_ivf_manifest(path: str, manifest: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, "ivf_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "ivf_manifest.json"))


def _assign_cells(df: DataFrame, centroids: np.ndarray,
                  id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell) via one Arrow pass against broadcast centroids."""
    import pyarrow as pa

    from metaprofi_spark.kernels.arrowbuf import list_float_matrix

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.ascontiguousarray(centroids, dtype=np.float64))
    src = df.select(id_col, vec_col)
    id_ddl = src.schema[id_col].dataType.simpleString()
    vec_ddl = src.schema[vec_col].dataType.simpleString()

    def fn(batches):
        C = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mat = list_float_matrix(rb.column(1)).astype(np.float64)
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            cell = (mat @ C.T).argmax(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    rb.column(1),
                    pa.array(cell.astype(np.int32), pa.int32()),
                ],
                [id_col, vec_col, "cell"],
            )

    return src.mapInArrow(
        fn, f"{id_col} {id_ddl}, {vec_col} {vec_ddl}, cell int"
    )


def update_ivf(
    df: DataFrame,
    path: str,
    segment_name: str | None = None,
) -> dict:
    """Append NEW vectors to a persisted IVF store — the ANN serving
    store's analog of the Bloom store's ``update_store`` (incremental
    growth without a rebuild).

    Vectors are assigned to the store's EXISTING centroids (the
    standard IVF contract: the coarse quantizer is immutable under
    appends, so prior cell assignments and probe routing stay valid)
    and land cell-partitioned in a fresh ``cells_u{K}/`` segment; the
    commit is the atomic manifest rename listing the segment, so a
    crash between data write and commit leaves an invisible orphan and
    readers on the previous state.  ``segment_name`` makes the append
    idempotent by name (a replayed micro-batch is a no-op), the
    update_store contract.  Runs under :func:`store_lock` (the Bloom
    store's single-writer lease): without it two concurrent appends
    would race the same auto-named segment dir and the manifest
    read-modify-write would lose one of them.  Corpus drift (recall
    dropping on appended data far from every centroid) is the signal
    to re-train via ``persist_ivf`` — the re-cluster/rebuild trade
    every IVF system has."""
    import os

    from metaprofi_spark.operators.bloom_update import store_lock

    spark = df.sparkSession
    with store_lock(path):
        _cells, centroids, manifest = load_ivf(spark, path)
        segs = list(manifest.get("segments") or ["cells"])
        seg = (
            segment_name
            or f"cells_u{int(manifest.get('update_count', 0)) + 1}"
        )
        if seg in segs:
            return manifest  # already committed: exactly-once no-op
        id_col, vec_col = manifest["id_col"], manifest["vec_col"]
        dim = int(manifest["dim"])
        ext = df.select(
            F.min(F.size(vec_col)).alias("mn"),
            F.max(F.size(vec_col)).alias("mx"),
        ).first()
        if ext["mn"] is not None and (ext["mn"] != dim or ext["mx"] != dim):
            raise ValueError(
                f"update_ivf: vector dim {ext['mn']}..{ext['mx']} != store "
                f"dim {dim}; appending would corrupt cell scoring"
            )
        _assign_cells(df, centroids, id_col, vec_col).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(os.path.join(path, seg))
        manifest["segments"] = segs + [seg]
        manifest["update_count"] = int(manifest.get("update_count", 0)) + 1
        _write_ivf_manifest(path, manifest)
        return manifest


def load_ivf(spark, path: str):
    """(cells_df, centroids, manifest) of a persisted IVF store.

    ``cells_df`` unions the base ``cells/`` layout with every committed
    ``cells_u{K}`` update segment (manifest-listed only — orphans from
    crashed appends are invisible); each segment is cell-partitioned,
    so partition pruning applies per segment."""
    import json
    import os

    with open(os.path.join(path, "ivf_manifest.json")) as f:
        manifest = json.load(f)
    centroids = np.asarray(manifest["centroids"], dtype=np.float64)
    segs = list(manifest.get("segments") or ["cells"])
    cells = spark.read.parquet(os.path.join(path, segs[0]))
    for s in segs[1:]:
        cells = cells.unionByName(spark.read.parquet(os.path.join(path, s)))
    return cells, centroids, manifest


def ann_ivf_search_store(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 8,
    quantized: bool = False,
) -> DataFrame:
    """Search a persisted IVF store with EXTERNAL query vectors
    (queries need not be corpus members — the serving shape: index
    built once, arbitrary queries after).

    Per query: nearest ``nprobe`` centroids driver-side (bounded:
    len(queries) × n_centroids dot products), then ONE scan of exactly
    the probed cell partitions (parquet partition pruning), re-ranked
    by cosine or the quantized integer dot product.  No self-exclusion:
    a query vector equal to a stored vector legitimately retrieves it."""
    cells, centroids, manifest = load_ivf(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    if not queries:
        out = "dot long" if quantized else "cosine double"
        return spark.createDataFrame([], f"query_id long, neighbor_id long, {out}")
    Q = np.asarray([v for _, v in queries], dtype=np.float64)
    Qn = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-12)
    probes = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(qid), int(c))
        for (qid, _), cs in zip(queries, probes)
        for c in cs
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cell int")
    qv = spark.createDataFrame(
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        f"query_id long, qv array<double>",
    )
    probe_cells = sorted({c for _, c in probe_rows})
    scan = cells.filter(F.col("cell").isin(probe_cells))  # partition pruned
    # every neighbor lives in exactly ONE cell and probe cells are
    # distinct per query, so (query, neighbor) pairs are already unique
    joined = (
        scan.join(F.broadcast(probe_df), "cell")
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"))
        .join(F.broadcast(qv), "query_id")
    )
    return _score_topk(joined, k, quantized)
