"""Membership search over the bit-sliced index — A5/A6/A7 + J1/J2 of
SURVEY.md §2.

Reference semantics (/root/reference/metaprofi/lib/search_index.py):
  * each query text is shingled into k-grams; each k-gram needs its h
    slices ANDed (:420-423) — a sample contains the k-gram iff all h of
    its bits are set (zero false negatives by construction);
  * exact search (threshold=100): a sample matches iff EVERY k-gram
    hits (:556-575);
  * threshold search: count per sample how many k-gram occurrences hit,
    keep counts >= ceil(n_kgrams * t / 100) (:518-553, cut at :532).

Spark-first plan (replaces the reference's LMDB scratch store + process
fan-out, search_index.py:312-391):

  query texts --driver/numpy--> distinct (kgram, slice_id) rows
      -> broadcast hash join against index(slice_id)     [J1]
         (slice_bucket filter first => partition pruning: only the
          parquet partitions holding query positions are read)
      -> groupBy(query, kgram, sample_bucket) AND-reduce  [A5]
      -> groupBy(query, sample_bucket) weighted bit-count [A6/A7]
      -> threshold filter + broadcast join to samples dim [J2]

Missing (slice_id, sample_bucket) cells are all-zero vectors (the index
is sparse), so an AND group with fewer than n_slices rows yields no
matches — handled by construction, never materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.kernels import and_reduce, mmh2_64_windows, shingle_windows
from metaprofi_spark.operators.bloom_index import plan_index_geometry, slice_bucket_size

HASH_SCHEMA = "query_id string, kgram_idx int, weight int, n_slices int, slice_id long"
RESULT_SCHEMA = "query_id string, sample_idx long, kgram_hits long, n_kgrams long, pct double"


def format_results(rows, threshold: int) -> str:
    """S9 results sink: the reference's report layout
    (search_index.py:614-660) — one block per query, exact matches as a
    bare sample list, thresholded matches annotated with counts."""
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"] if isinstance(r, dict) else r.query_id, []).append(r)
    out = []
    for qid in sorted(by_q):
        out.append(f"Query: {qid}")
        for r in sorted(by_q[qid], key=lambda x: x.sample_idx):
            if threshold == 100:
                out.append(f"\t{r.sample_idx}")
            else:
                out.append(
                    f"\t{r.sample_idx}, Number of kmers found: "
                    f"{r.kgram_hits} ({r.pct:.2f}%)"
                )
    return "\n".join(out) + ("\n" if out else "")


def parse_results(text: str) -> dict[str, list[dict]]:
    """S10 results parser (utilities.py:655-733): report -> dict."""
    out: dict[str, list[dict]] = {}
    current = None
    for line in text.splitlines():
        if line.startswith("Query: "):
            current = line[len("Query: "):]
            out[current] = []
        elif line.startswith("\t") and current is not None:
            body = line.strip()
            if ", Number of kmers found: " in body:
                sid, rest = body.split(", Number of kmers found: ")
                hits, pct = rest.rstrip(")").split(" (")
                out[current].append(
                    {"sample": int(sid), "hits": int(hits), "pct": float(pct.rstrip('%'))}
                )
            else:
                out[current].append({"sample": int(body)})
    return out


def hash_queries(
    queries: list[tuple[str, str]], cfg: SketchConfig
) -> tuple[pd.DataFrame, dict[str, int]]:
    """Shingle+hash query texts on the driver (numpy kernel, T8 analog).

    Identical k-grams within a query are deduplicated with a ``weight``
    (the reference counts every occurrence, search_index.py:535 — the
    weight preserves that); duplicate positions within one k-gram's h
    hashes collapse into ``n_slices`` so the AND stage knows how many
    index rows constitute a full hit.

    Returns (hash rows pdf, {query_id: total k-gram occurrences}).
    """
    rows_qid: list[str] = []
    rows_kg: list[int] = []
    rows_w: list[int] = []
    rows_ns: list[int] = []
    rows_slice: list[int] = []
    n_kgrams: dict[str, int] = {}
    for qid, text in queries:
        _, windows = shingle_windows([text], cfg.k, cfg.normalize)
        n_kgrams[qid] = len(windows)
        if len(windows) == 0:
            continue
        uniq, counts = np.unique(windows, axis=0, return_counts=True)
        pos = mmh2_64_windows(uniq, np.asarray(cfg.seeds, dtype=np.uint64)) % np.uint64(
            cfg.m_padded
        )
        for i in range(len(uniq)):
            distinct = np.unique(pos[i])
            for sl in distinct:
                rows_qid.append(qid)
                rows_kg.append(i)
                rows_w.append(int(counts[i]))
                rows_ns.append(len(distinct))
                rows_slice.append(int(sl))
    pdf = pd.DataFrame(
        {
            "query_id": pd.array(rows_qid, dtype="string"),
            "kgram_idx": pd.array(rows_kg, dtype="int32"),
            "weight": pd.array(rows_w, dtype="int32"),
            "n_slices": pd.array(rows_ns, dtype="int32"),
            "slice_id": pd.array(rows_slice, dtype="int64"),
        }
    )
    return pdf, n_kgrams


def search(
    spark: SparkSession,
    index_df: DataFrame,
    queries: list[tuple[str, str]],
    cfg: SketchConfig,
    threshold: int = 100,
    sample_bucket_size: int | None = None,
) -> DataFrame:
    """Run exact (t=100) or thresholded membership search.

    Returns DataFrame(query_id, sample_idx, kgram_hits, n_kgrams, pct).
    ``kgram_hits`` counts k-gram OCCURRENCES whose h bits are all set —
    Bloom semantics: no false negatives; false positives bounded by
    (1-e^(-hn/m))^h.
    """
    if not 0 < threshold <= 100:
        raise ValueError("threshold must be in (0, 100]")  # metaprofi_main.py:251-253
    bucket = plan_index_geometry(cfg, sample_bucket_size=sample_bucket_size)
    sb_size = slice_bucket_size(cfg)

    qpdf, n_kgrams = hash_queries(queries, cfg)
    empty = spark.createDataFrame([], RESULT_SCHEMA)
    if len(qpdf) == 0:
        return empty

    rsize = cfg.slice_range_size
    width_bytes = (bucket + 7) // 8
    qpdf = qpdf.assign(range_id=(qpdf["slice_id"] // rsize).astype("int64"))
    hashes_df = spark.createDataFrame(qpdf)
    # partition pruning: touch only the slice_buckets the query needs
    # (the binning optimization, search_index.py:578-592, for free via
    # parquet partition filters)
    buckets = sorted({int(s) // sb_size for s in qpdf["slice_id"]})
    pruned = index_df.filter(F.col("slice_bucket").isin(buckets))

    # J1: each needed slab is fetched once per (query k-gram) use; the
    # hash side is tiny => broadcast hash join, no shuffle of the index
    joined = pruned.join(F.broadcast(hashes_df), "range_id")

    and_schema = "query_id string, kgram_idx int, sample_bucket int, weight int, bits binary"

    def and_slices(key, pdf):
        n_slices = int(pdf["n_slices"].iat[0])
        if len(pdf) < n_slices:  # some slab missing => all-zero => no hit
            return pd.DataFrame(
                columns=["query_id", "kgram_idx", "sample_bucket", "weight", "bits"]
            )
        # extract each required slice row from its slab
        rows = []
        for slab, sid in zip(pdf["bits"], pdf["slice_id"]):
            off = int(sid) % rsize
            rows.append(slab[off * width_bytes : (off + 1) * width_bytes])
        blob = and_reduce(rows, width_bytes)
        return pd.DataFrame(
            {
                "query_id": [key[0]],
                "kgram_idx": pd.array([key[1]], dtype="int32"),
                "sample_bucket": pd.array([key[2]], dtype="int32"),
                "weight": pd.array([int(pdf["weight"].iat[0])], dtype="int32"),
                "bits": [blob],
            }
        )

    anded = joined.groupBy("query_id", "kgram_idx", "sample_bucket").applyInPandas(
        and_slices, and_schema
    )

    count_schema = "query_id string, sample_idx long, kgram_hits long"

    def count_hits(key, pdf):
        sbucket = int(key[1])
        mat = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in pdf["bits"]]
        )
        bits = np.unpackbits(mat, axis=1, bitorder="little")
        weights = pdf["weight"].to_numpy().astype(np.int64)
        counts = (bits.astype(np.int64) * weights[:, None]).sum(axis=0)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame(
            {
                "query_id": [key[0]] * len(nz),
                "sample_idx": sbucket * bucket + nz.astype(np.int64),
                "kgram_hits": counts[nz],
            }
        )

    counted = anded.groupBy("query_id", "sample_bucket").applyInPandas(
        count_hits, count_schema
    )

    totals = spark.createDataFrame(
        [(q, int(n)) for q, n in n_kgrams.items() if n > 0],
        "query_id string, n_kgrams long",
    )
    t = int(threshold)
    return (
        counted.join(F.broadcast(totals), "query_id")
        # ceil(n*t/100) in exact integer math (search_index.py:532)
        .filter(
            F.col("kgram_hits")
            >= F.floor((F.col("n_kgrams") * F.lit(t) + F.lit(99)) / F.lit(100))
        )
        .withColumn(
            "pct", F.col("kgram_hits") * F.lit(100.0) / F.col("n_kgrams")
        )
        .select("query_id", "sample_idx", "kgram_hits", "n_kgrams", "pct")
    )
