"""Deduplication operators for web-scale corpora.

Four tiers, cheapest first — the standard training-data pipeline stack:

* exact: hash-groupBy on a normalized-text fingerprint (md5).  Pure
  DataFrame ops; at 100 TB this is one shuffle on a 16-byte key.
* n-gram Jaccard (exact): token-set self-join — the SQL-checkable
  ground truth the probabilistic tiers are measured against.  Cost is
  quadratic in docs-per-token, so it is the ORACLE, not the scale path.
* MinHash + LSH: per-doc signatures (numpy kernel over mmh2-64, no
  per-row Python), banded into buckets; candidate pairs come from a
  self-join on (band_id, band_hash) — linear-ish in corpus size; the
  scale path for near-dup detection.
* SimHash: 64-bit weighted fingerprint, Hamming-banded (4x16-bit
  blocks); pairs sharing a block are candidates (guaranteed to cover
  all pairs with Hamming distance <= 3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from metaprofi_spark.functions.text import fingerprint
from metaprofi_spark.kernels.mmh2 import mmh2_64_bytes


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All fingerprint groups: (fp, n_docs, min_doc_id).  Groups with
    n_docs > 1 are exact duplicates after normalization."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def drop_exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of every fingerprint group."""
    keep = exact_duplicate_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# exact n-gram (token-set) Jaccard — the oracle tier
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    tau_pct: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs (a, b, shared, size_a, size_b) with token-set Jaccard
    >= tau_pct/100, a < b.  Integer comparison only:
        shared * 100 >= tau * (size_a + size_b - shared).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""))).alias("token"),
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    shared = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    # NO broadcast hints: the size tables are one row PER DOCUMENT —
    # broadcasting them is a guaranteed driver/executor OOM at corpus
    # scale.  A plain shuffle join on the id keys is the right plan
    # (and this is the oracle tier anyway).
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.col("shared") * 100
            >= F.lit(tau_pct) * (F.col("size_a") + F.col("size_b") - F.col("shared"))
        )
        .select("id_a", "id_b", "shared", "size_a", "size_b")
    )


def ngram_jaccard_sql(tau_pct: int = 80) -> str:
    """DuckDB oracle for ngram_jaccard_pairs on the documents view."""
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS token
  FROM documents
), toks2 AS (SELECT * FROM toks WHERE token <> ''),
sizes AS (SELECT id, count(*) AS sz FROM toks2 GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM toks2 a JOIN toks2 b ON a.token = b.token AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b, s.shared, sa.sz AS size_a, sb.sz AS size_b
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
WHERE s.shared * 100 >= {tau_pct} * (sa.sz + sb.sz - s.shared)
"""


# ---------------------------------------------------------------------------
# MinHash + LSH — the scale tier
# ---------------------------------------------------------------------------

def minhash_bands(
    df: DataFrame,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc banded MinHash: (id, band_id, band_hash).

    Signature = min over the doc's distinct tokens of mmh2-64 with
    seeds 0..n_perm-1 (the Bloom seed convention).  Band hash = mmh2 of
    the band's rows-per-band signature slice.
    """
    if n_perm % bands:
        raise ValueError("bands must divide n_perm")
    rows_per_band = n_perm // bands
    seeds = list(range(n_perm))

    def sig(batches):
        for pdf in batches:
            ids, band_ids, band_hashes = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = sorted({t for t in (text or "").lower().split() if t})
                if not toks:
                    continue
                h = mmh2_64_bytes([t.encode() for t in toks], seeds)  # (n,64)
                signature = h.min(axis=0)  # (n_perm,)
                for b in range(bands):
                    chunk = signature[b * rows_per_band : (b + 1) * rows_per_band]
                    bh = mmh2_64_bytes([chunk.tobytes()], [b])[0, 0]
                    ids.append(did)
                    band_ids.append(b)
                    band_hashes.append(int(bh & np.uint64(0x7FFFFFFFFFFFFFFF)))
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "band_id": pd.array(band_ids, dtype="int32"),
                    "band_hash": pd.array(band_hashes, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        sig, "id long, band_id int, band_hash long"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH bucket.

    A pair with true Jaccard j collides in >= 1 of b bands with
    probability 1-(1-j^r)^b (r = n_perm/bands) — the published S-curve.
    """
    bandsdf = minhash_bands(df, n_perm, bands, id_col, text_col)
    a = bandsdf.alias("a")
    b = bandsdf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash — Hamming-banded near-dup tier
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token hash bits weighted by
    token frequency.  Returns (id, simhash long)."""

    def sig(batches):
        for pdf in batches:
            ids, sims = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                if not toks:
                    continue
                uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                h = mmh2_64_bytes([t.encode() for t in uniq], [0])[:, 0]
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                sim = np.uint64(0)
                for j in np.nonzero(votes > 0)[0]:
                    sim |= np.uint64(1) << np.uint64(j)
                ids.append(did)
                sims.append(int(sim.astype(np.int64)))
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"), "simhash": pd.array(sims, dtype="int64")}
            )

    return df.select(id_col, text_col).mapInPandas(sig, "id long, simhash long")


def simhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", blocks: int = 4
) -> DataFrame:
    """Pairs sharing >= 1 of ``blocks`` equal 16-bit simhash blocks —
    covers every pair at Hamming distance <= blocks-1 (pigeonhole)."""
    sigs = simhash_signatures(df, id_col, text_col)
    width = 64 // blocks
    block_rows = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_id"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("block_val"),
                )
                for i in range(blocks)
            ])
        ).alias("blk"),
    ).select("id", "simhash", "blk.block_id", "blk.block_val")
    a = block_rows.alias("a")
    b = block_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming"))
