"""Registry of driver-checkable queries.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable paired (where
SQL-expressible) with an ANSI-SQL oracle that DuckDB runs on the same
parquet tables.  Column names are aligned between both sides — the
driver compares row count + schema + order-insensitive value hash.

Queries whose Spark answer is a SKETCH ESTIMATE (HLL/CMS/KLL) have no
SQL oracle (the driver records a rows-only check); their error bounds
are asserted in tests/ against exact answers instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators import build_index, build_matrix, search

# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

QUERY_CFG = SketchConfig(k=8, h=2, m=1 << 18, chunk_bits=1 << 15, slice_buckets=16)
_BUCKET = 4096

# literal probe strings, >= k bytes each; mixed expected-positive
# (corpus vocabulary) and expected-negative (decoy) probes
PROBES = [
    "table part",
    "spark order",
    "window spark",
    "zz@@ absent-from-corpus @@zz",
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# one registry run touches the same corpus index from several queries
# (substring, threshold, lang-scoped...).  A real deployment builds the
# index ONCE and persists it (api.build); the per-process memo below is
# that reuse inside the gate harness: first query builds + caches the
# slab DataFrame, the rest search it.  Keyed per session so a fresh
# SparkSession (fresh driver run) rebuilds from scratch.
_INDEX_MEMO: dict = {}


def _memo_index(spark: SparkSession, sf_dir: str, cfg: SketchConfig,
                bucket: int, tag: str, docs_fn) -> DataFrame:
    # applicationId, not id(spark): a stopped session's address can be
    # reused by CPython, which would hand back a cached DataFrame bound
    # to a dead SparkContext (r3 review)
    key = (spark.sparkContext.applicationId, sf_dir, cfg.to_json(), bucket, tag)
    idx = _INDEX_MEMO.get(key)
    if idx is None:
        docs = docs_fn()
        bf = build_matrix(docs, cfg, id_col="doc_id", text_col=docs.columns[1])
        idx = build_index(bf, cfg, sample_bucket_size=bucket).cache()
        idx.count()
        _INDEX_MEMO[key] = idx
    return idx


def _probes_sql_values() -> str:
    return ", ".join("('" + p.replace("'", "''") + "')" for p in PROBES)


# ---------------------------------------------------------------------------
# Bloom membership (A1+A3+A5+A6+J1+J2): index prefilter + exact verify
# ---------------------------------------------------------------------------

def bloom_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring search accelerated by the Bloom bit-sliced index.

    The index pass (threshold=100 membership) returns candidate docs with
    ZERO false negatives; an exact `contains` verification join removes
    Bloom false positives, so the final answer is exact and SQL-checkable.
    This is the scale architecture: the index prunes the corpus, the
    verify join touches only candidates.
    """
    docs = _docs(spark, sf_dir)
    idx = _memo_index(spark, sf_dir, QUERY_CFG, _BUCKET, "text",
                      lambda: docs.select("doc_id", "text"))
    cand = search(
        spark, idx, [(p, p) for p in PROBES], QUERY_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
    )
    verified = (
        cand.withColumnRenamed("query_id", "probe")
        .join(docs, cand.sample_idx == docs.doc_id)
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select(F.col("probe"), F.col("doc_id"))
    )
    return verified


BLOOM_SUBSTRING_SQL = f"""
SELECT q.probe AS probe, d.doc_id AS doc_id
FROM (VALUES {_probes_sql_values()}) q(probe)
JOIN documents d ON instr(lower(d.text), lower(q.probe)) > 0
"""


DELETE_IDS = [26, 58]  # match 'spark order' at sf0.01 (58) and sf0.1 (26, 58)
# so the tombstone anti-join provably REMOVES rows at both gate scales
_DELETE_STORE_MEMO: dict = {}


def bloom_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletes under the hash gate: build a PERSISTED store,
    api.delete two samples (logical tombstones — the takedown/opt-out
    op; no reference analog), then the same exact substring search as
    bloom_substring_search through api.query, which anti-joins the
    committed tombstones automatically.  Oracle = the substring SQL
    minus the deleted ids, so the gate proves deleted samples vanish
    from results while every other row is untouched."""
    from metaprofi_spark import api

    import json
    import os
    import shutil

    docs = _docs(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _DELETE_STORE_MEMO.get(key)
    if path is None:
        safe = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/metaprofi_gate_delstore_{safe}_v1"

        def _complete(p: str) -> bool:
            # complete = manifest committed WITH the tombstones — a
            # concurrent harness must never observe the build-but-not-
            # yet-deleted window (r4 review; same concurrency rule as
            # the fasta fixture)
            try:
                with open(os.path.join(p, "manifest.json")) as f:
                    return bool(json.load(f).get("tombstones"))
            except (OSError, ValueError):
                return False

        if not _complete(path):
            tmp = f"{path}.{os.getpid()}.tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            api.build(spark, docs.select("doc_id", "text"), QUERY_CFG, tmp,
                      sample_bucket_size=_BUCKET)
            api.delete(spark, tmp, sample_ids=DELETE_IDS)
            try:
                os.rename(tmp, path)  # atomic publish of the FULL store
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
                if not _complete(path):  # not a concurrent winner: real error
                    raise
        _DELETE_STORE_MEMO[key] = path
    cand = api.query(spark, path, [(p, p) for p in PROBES], threshold=100)
    return (
        cand.withColumnRenamed("query_id", "probe")
        .join(docs, cand.sample_idx == docs.doc_id)
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select(F.col("probe"), F.col("doc_id"))
    )


BLOOM_DELETE_SQL = f"""
SELECT q.probe AS probe, d.doc_id AS doc_id
FROM (VALUES {_probes_sql_values()}) q(probe)
JOIN documents d ON instr(lower(d.text), lower(q.probe)) > 0
WHERE d.doc_id NOT IN ({", ".join(str(i) for i in DELETE_IDS)})
"""


# ---------------------------------------------------------------------------
# Bloom threshold search (A7): candidates verified by exact k-gram counting
# ---------------------------------------------------------------------------

THRESHOLD_PROBE = "query lineitem batch window spark order"
THRESHOLD_T = 40


def bloom_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded membership: docs containing >= t% of the probe's
    k-gram occurrences.  Index gives a superset (counts can only be
    inflated by false positives); exact per-candidate recount trims it.
    """
    docs = _docs(spark, sf_dir)
    cfg = QUERY_CFG
    idx = _memo_index(spark, sf_dir, cfg, _BUCKET, "text",
                      lambda: docs.select("doc_id", "text"))
    cand = search(
        spark, idx, [("t", THRESHOLD_PROBE)], cfg,
        threshold=THRESHOLD_T, sample_bucket_size=_BUCKET,
    )
    # exact verify: recount which probe k-grams truly occur in each
    # candidate doc (JVM-side: sequence/substring, no python)
    probe = THRESHOLD_PROBE.lower()
    n = len(probe.encode()) - cfg.k + 1
    kgrams = [probe[i : i + cfg.k] for i in range(n)]
    kg_df = spark.createDataFrame([(g,) for g in kgrams], "kgram string")
    hits = (
        cand.join(docs, cand.sample_idx == docs.doc_id)
        .crossJoin(F.broadcast(kg_df))
        .filter(F.instr(F.lower(F.col("text")), F.col("kgram")) > 0)
        .groupBy("doc_id")
        .agg(F.count("*").alias("true_hits"))
        .filter(F.col("true_hits") * 100 >= F.lit(THRESHOLD_T) * F.lit(n))
        .select("doc_id", "true_hits")
    )
    return hits


def _threshold_sql() -> str:
    probe = THRESHOLD_PROBE.lower()
    k = QUERY_CFG.k
    n = len(probe.encode()) - k + 1
    vals = ", ".join(
        "('" + probe[i : i + k].replace("'", "''") + "')" for i in range(n)
    )
    return f"""
SELECT d.doc_id AS doc_id, count(*) AS true_hits
FROM documents d JOIN (VALUES {vals}) g(kgram)
  ON instr(lower(d.text), g.kgram) > 0
GROUP BY d.doc_id
HAVING count(*) * 100 >= {THRESHOLD_T} * {n}
"""


LANG_PROBES = [("table part", "en"), ("spark order", "de"), ("window spark", "zh")]


def bloom_lang_scoped_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star query: does k-gram X appear in documents matching
    lang=Y?  Index candidates (zero false negatives) are scoped by a
    broadcast join against the lang dimension, then exact-verified.
    The lang filter prunes before the verify join, mirroring the
    reference's sample-id scoping (search_index.py:549-553).
    """
    docs = _docs(spark, sf_dir)
    idx = _memo_index(spark, sf_dir, QUERY_CFG, _BUCKET, "text",
                      lambda: docs.select("doc_id", "text"))
    cand = search(
        spark, idx, [(f"{p}||{lang}", p) for p, lang in LANG_PROBES],
        QUERY_CFG, threshold=100, sample_bucket_size=_BUCKET,
    )
    parts = F.split(F.col("query_id"), "[|][|]")
    cand2 = cand.select(
        parts.getItem(0).alias("probe"),
        parts.getItem(1).alias("want_lang"),
        "sample_idx",
    )
    return (
        cand2.join(docs, cand2.sample_idx == docs.doc_id)
        .filter(F.col("lang") == F.col("want_lang"))
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select("probe", F.col("want_lang").alias("lang"), "doc_id")
    )


def _lang_probes_sql() -> str:
    vals = ", ".join(
        "('" + p.replace("'", "''") + "', '" + lang + "')" for p, lang in LANG_PROBES
    )
    return f"""
SELECT q.probe AS probe, q.lang AS lang, d.doc_id AS doc_id
FROM (VALUES {vals}) q(probe, lang)
JOIN documents d
  ON d.lang = q.lang AND instr(lower(d.text), lower(q.probe)) > 0
"""


# ---------------------------------------------------------------------------
# bio modes (T2 canonical k-mers, T4 six-frame translation) over a
# DETERMINISTIC synthetic sequence column: md5(doc_id) hex mapped to the
# ACGT / amino alphabets with translate() — identical in Spark and
# DuckDB, so the bio search paths get hash-exact gate rows without any
# external data (VERDICT r2 item 3).
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
_DNA_MAP = "ACGTACGTACGTACGT"
_AA_MAP = "ACDEFGHIKLMNPQRS"  # 16 of the 20 amino letters


def _dna_py(doc_id: int) -> str:
    import hashlib

    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    return hx.translate(str.maketrans(_HEX, _DNA_MAP))


def _aa_py(doc_id: int) -> str:
    import hashlib

    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    return hx.translate(str.maketrans(_HEX, _AA_MAP))


def _dna_col():
    return F.translate(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), _HEX, _DNA_MAP
    )


def _aa_col():
    return F.translate(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), _HEX, _AA_MAP
    )


def _revcomp_py(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


BIO_CFG = SketchConfig(
    k=8, h=2, m=1 << 16, chunk_bits=1 << 13, slice_buckets=8,
    normalize="canonical", sequence_type="nucleotide",
)
# length-k probes: doc 0's first k-mer, the REVERSE COMPLEMENT of doc
# 7's k-mer at offset 5 (strand invariance inside the gate), a decoy
CANONICAL_PROBES = [
    _dna_py(0)[:8],
    _revcomp_py(_dna_py(7)[5:13]),
    "ACACACAC",
]


def bloom_canonical_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 gate: canonical k-mer index over the synthetic DNA column —
    a probe matches a doc iff the probe k-mer OR its reverse complement
    occurs in the doc's sequence (reference canonicalization,
    bloomfilter_cython.pyx:272-306).  Index candidates (zero false
    negatives under canonical hashing) are exact-verified with a
    strand-aware instr, so the result is hash-exact vs SQL."""
    docs = _docs(spark, sf_dir).select("doc_id", _dna_col().alias("dna"))
    idx = _memo_index(spark, sf_dir, BIO_CFG, _BUCKET, "dna", lambda: docs)
    cand = search(
        spark, idx, [(p, p) for p in CANONICAL_PROBES], BIO_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
    )
    rc = F.reverse(F.translate(F.col("probe"), "ACGT", "TGCA"))
    return (
        cand.withColumnRenamed("query_id", "probe")
        .join(docs, cand.sample_idx == docs.doc_id)
        .filter((F.instr("dna", F.col("probe")) > 0) | (F.instr("dna", rc) > 0))
        .select("probe", "doc_id")
    )


def _canonical_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in CANONICAL_PROBES)
    return f"""
WITH d AS (
  SELECT doc_id,
         translate(md5(CAST(doc_id AS VARCHAR)), '{_HEX}', '{_DNA_MAP}') AS dna
  FROM documents
)
SELECT q.probe AS probe, d.doc_id AS doc_id
FROM (VALUES {vals}) q(probe)
JOIN d ON instr(d.dna, q.probe) > 0
       OR instr(d.dna, reverse(translate(q.probe, 'ACGT', 'TGCA'))) > 0
"""


AA_CFG = SketchConfig(
    k=4, h=2, m=1 << 16, chunk_bits=1 << 13, slice_buckets=8,
    normalize="none", sequence_type="aminoacid",
)


# one codon per amino acid used in _AA_MAP (standard table)
_CODON_OF = {
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
    "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
    "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
    "S": "TCT",
}


def _sixframe_probes() -> list[tuple[str, str]]:
    """Deterministic nucleotide probes: q1's FORWARD frame 0
    reverse-translates doc 0's protein[3:9]; q2 is the reverse
    complement of doc 3's protein[2:8] codons, so its REVERSE frame 0
    hits — both strands of the six-frame path are exercised."""
    fwd = "".join(_CODON_OF[a] for a in _aa_py(0)[3:9])
    rev = _revcomp_py("".join(_CODON_OF[a] for a in _aa_py(3)[2:8]))
    return [("q1", fwd), ("q2", rev)]


SIXFRAME_PROBES = _sixframe_probes()


def _sixframe_frames_all() -> dict[str, str]:
    from metaprofi_spark.kernels.bio import six_frame_frames

    out: dict[str, str] = {}
    for qid, nt in SIXFRAME_PROBES:
        out.update(six_frame_frames(nt, qid, AA_CFG.k))
    return out


def bloom_sixframe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 gate: nucleotide query against an aminoacid store — the query
    is six-frame translated (search_index.py:107-141); every frame >= k
    is searched independently and exact-verified by instr against the
    synthetic protein column.  The frame strings are deterministic
    constants, so the oracle enumerates them in SQL."""
    docs = _docs(spark, sf_dir).select("doc_id", _aa_col().alias("protein"))
    idx = _memo_index(spark, sf_dir, AA_CFG, _BUCKET, "protein", lambda: docs)
    cand = search(
        spark, idx, SIXFRAME_PROBES, AA_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
        seq_type="nucleotide",
    )
    frames_df = spark.createDataFrame(
        list(_sixframe_frames_all().items()), "frame_id string, frame string"
    )
    return (
        cand.withColumnRenamed("query_id", "frame_id")
        .join(F.broadcast(frames_df), "frame_id")
        .join(docs, cand.sample_idx == docs.doc_id)
        .filter(F.instr("protein", F.col("frame")) > 0)
        .select("frame_id", "doc_id")
    )


def _sixframe_sql() -> str:
    frames = _sixframe_frames_all()
    vals = ", ".join(f"('{fid}', '{f}')" for fid, f in sorted(frames.items()))
    return f"""
WITH d AS (
  SELECT doc_id,
         translate(md5(CAST(doc_id AS VARCHAR)), '{_HEX}', '{_AA_MAP}') AS protein
  FROM documents
)
SELECT q.frame_id AS frame_id, d.doc_id AS doc_id
FROM (VALUES {vals}) q(frame_id, frame)
JOIN d ON instr(d.protein, q.frame) > 0
"""


def bloom_update_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/J3/T11 gate: build the index on the first half of the corpus,
    update_index-append the second half, search the combined index —
    exact-verified results must equal the full-corpus substring truth
    (reference update semantics, build_index_zarr.py:217-430).  An
    update that corrupted or dropped slabs would surface as missing
    candidates (false negatives the verify join cannot restore)."""
    from metaprofi_spark.operators import update_index
    from metaprofi_spark.operators.bloom_update import next_sample_base

    docs = _docs(spark, sf_dir)
    n = docs.count()
    half = n // 2
    first = docs.filter(F.col("doc_id") < half)
    second = docs.filter(F.col("doc_id") >= half).withColumn(
        "new_id", F.col("doc_id") - F.lit(half)
    )
    bf = build_matrix(first, QUERY_CFG, id_col="doc_id", text_col="text")
    idx = build_index(bf, QUERY_CFG, sample_bucket_size=_BUCKET)
    combined, _dim, _total = update_index(
        idx, second.select(F.col("new_id"), F.col("text")), QUERY_CFG,
        old_n_samples=half, sample_bucket_size=_BUCKET, id_col="new_id",
    )
    cand = search(
        spark, combined, [(p, p) for p in PROBES], QUERY_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
    )
    # sample_idx -> doc_id: first half is the identity; the update batch
    # starts at the bucket-aligned base (T11 append geometry)
    base = next_sample_base(half, _BUCKET)
    mapped = cand.withColumn(
        "doc_id",
        F.when(F.col("sample_idx") < half, F.col("sample_idx")).otherwise(
            F.col("sample_idx") - F.lit(base) + F.lit(half)
        ),
    )
    return (
        mapped.withColumnRenamed("query_id", "probe")
        .join(docs, "doc_id")
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select("probe", "doc_id")
    )


def bloom_grouped_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-build gate (A1 grouped + densify_samples + J2 dim): one
    sample per LANGUAGE (the reference's file-level build,
    metaprofi_main.py:148-181), searched and exact-verified.

    A lang matches a probe iff ANY of its documents contains it, so
    the result is SQL-checkable — and the sample_idx -> lang mapping
    runs through densify_samples, putting the r3 determinism fix under
    the driver's hash gate."""
    from metaprofi_spark.operators import build_index, build_matrix_grouped, densify_samples

    docs = _docs(spark, sf_dir)
    # eager localCheckpoint: the grouped build (the expensive stage) is
    # consumed by BOTH the dim derivation and the index join — without
    # it the whole aggregation would execute twice (r3 review); blocks
    # are GC-cleaned, nothing outlives the query
    bf = build_matrix_grouped(
        docs, QUERY_CFG, group_col="lang", text_col="text"
    ).localCheckpoint(eager=True)
    dim = densify_samples(bf.select("group_key").distinct(), "group_key").select(
        "group_key", "sample_idx"
    )
    bfi = bf.join(dim, "group_key").select("sample_idx", "chunk_id", "bf")
    idx = build_index(bfi, QUERY_CFG, sample_bucket_size=_BUCKET)
    cand = search(
        spark, idx, [(p, p) for p in PROBES], QUERY_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
    )
    return (
        cand.withColumnRenamed("query_id", "probe")
        .join(F.broadcast(dim), cand.sample_idx == dim.sample_idx)
        .join(docs, F.col("group_key") == docs.lang)
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select("probe", F.col("group_key").alias("lang"))
        .distinct()
    )


BLOOM_GROUPED_SQL = f"""
SELECT DISTINCT q.probe AS probe, d.lang AS lang
FROM (VALUES {_probes_sql_values()}) q(probe)
JOIN documents d ON instr(lower(d.text), lower(q.probe)) > 0
"""


def fasta_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 gate: the FASTA reader under the driver's hash check.  Writes
    a deterministic FASTA of the synthetic DNA column (one record per
    doc, 60-char wrapped lines — the reference's multi-line record
    shape), reads it back with sources.fasta.read_fasta, and returns
    (doc_id, seq) — the oracle recomputes the same DNA in SQL."""
    import os
    import shutil

    from metaprofi_spark.sources.fasta import read_fasta

    # DISTRIBUTED fixture write (r3 verdict: the old driver-side collect
    # was fine at sf0.01 but would not be at sf1): each doc renders its
    # whole FASTA record as one text row — ">id synthetic" + the DNA
    # wrapped at 60 chars (regexp inserts \n after every 60-char run;
    # a possible trailing blank line is ignored by the reader).
    record = F.concat(
        F.lit(">"),
        F.col("doc_id").cast("string"),
        F.lit(" synthetic\n"),
        F.regexp_replace(_dna_col(), "(.{60})", "$1\n"),
    )
    # deterministic dir per sf_dir + generation version (content is a
    # pure function of doc_id, pinned by golden checksums — bump the
    # version only with an intentional generation change).  Build once,
    # publish atomically: writers land in a pid-unique tmp dir and
    # os.rename into place; exactly one concurrent harness wins, losers
    # clean up (content identical either way), readers never see a
    # half-written dir (the _SUCCESS check gates reuse).
    safe = sf_dir.strip("/").replace("/", "_")
    path = os.path.join("/tmp", f"metaprofi_gate_{safe}_fa_v1")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.{os.getpid()}.tmp"
        _docs(spark, sf_dir).select(record.alias("value")).write.mode(
            "overwrite"
        ).text(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                # not a concurrent winner — surface the real rename
                # failure instead of an opaque read error (r4 review)
                raise
    return read_fasta(spark, path).select(
        F.split(F.col("name"), " ").getItem(0).cast("long").alias("doc_id"),
        F.col("seq"),
    )


FASTA_ROUNDTRIP_SQL = f"""
SELECT doc_id,
       translate(md5(CAST(doc_id AS VARCHAR)), '{_HEX}', '{_DNA_MAP}') AS seq
FROM documents
"""


# ---------------------------------------------------------------------------
# sketch aggregations (A1 siblings) + their exact SQL-checkable twins
# ---------------------------------------------------------------------------

def distinct_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (the SQL-checkable twin of hll_distinct_per_lang)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_distinct"))
        .select("lang", "n_distinct")
    )


DISTINCT_DOCS_SQL = "SELECT lang, COUNT(DISTINCT doc_id) AS n_distinct FROM documents GROUP BY lang"


def hll_distinct_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL UDAF estimate per lang (sketch estimate — no SQL oracle;
    error bound asserted in tests/test_sketches.py)."""
    from metaprofi_spark.functions.sketch_agg import hll_agg

    return (
        hll_agg(_docs(spark, sf_dir), ["lang"], "doc_id", p=12)
        .select("lang", "n_distinct_est")
    )


def token_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token frequency top-100 (twin of cms_token_freq)."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


TOKEN_FREQ_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 100
"""


def cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min estimates for the corpus' tokens (overestimate-only,
    <= true + eps*N — bound asserted in tests).

    Scale shape: the ONLY driver materialization is the single merged
    sketch row (a fixed-size blob); the distinct-token set stays
    distributed and is estimated inside ``mapInPandas`` against the
    broadcast blob."""
    from metaprofi_spark.functions.sketch_agg import cms_agg, cms_estimate_df

    tokens = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    blob = cms_agg(tokens.withColumn("g", F.lit(1)), ["g"], "token", 4, 8192).first()[
        "sketch"
    ]
    return cms_estimate_df(tokens.distinct(), "token", blob, out_col="est")


QUANTILE_PCTS = [10, 50, 90, 99]


def doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-based quantiles of n_chars (twin of kll_doclen_quantiles).

    rank = floor((n-1) * q_pct / 100) + 1 over (n_chars, doc_id) order —
    integer math only, so Spark and DuckDB agree bit-for-bit.  The value
    at a global rank depends only on the n_chars MULTISET (doc_id is
    just a tiebreak), so the plan sorts the per-value HISTOGRAM, not the
    corpus: groupBy(n_chars) count, cumulative count over the (small,
    value-domain-bounded) histogram, then min value whose cumcount
    covers each target rank.  No corpus-wide single-partition exchange.
    """
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    n = docs.count()
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    pcts = spark.createDataFrame([(p,) for p in QUANTILE_PCTS], "q_pct int")
    ranks = pcts.withColumn(
        "rank", F.floor((F.lit(n) - 1) * F.col("q_pct") / 100) + 1
    )
    return (
        cum.crossJoin(F.broadcast(ranks))
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q_pct")
        .agg(F.min("n_chars").alias("value"))
    )


DOCLEN_QUANTILES_SQL = f"""
SELECT q_pct, n_chars AS value
FROM (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER () AS n
  FROM documents
) r
JOIN (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)}) q(q_pct)
  ON r.rn = (r.n - 1) * q.q_pct // 100 + 1
"""


def kll_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL sketch quantiles of n_chars (sketch estimate — rank-error
    bound asserted in tests/test_sketches.py)."""
    from metaprofi_spark.functions.sketch_agg import kll_quantiles

    docs = _docs(spark, sf_dir).withColumn("g", F.lit(1))
    return kll_quantiles(docs, ["g"], "n_chars", [p / 100 for p in QUANTILE_PCTS]).select(
        "qp", "value"
    )


def docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-profiling sweep over the documents table (nulls, exact
    distincts, min/max as strings) — the pre-ingest QA pass, one wide
    aggregation + stack pivot, fully SQL-checkable."""
    from metaprofi_spark.functions.profile import profile_table

    return profile_table(_docs(spark, sf_dir), ["doc_id", "lang", "n_chars"])


DOCS_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'doc_id' AS column, count(*) AS n_rows,
         CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         count(DISTINCT doc_id) AS n_distinct,
         CAST(min(doc_id) AS VARCHAR) AS min_s, CAST(max(doc_id) AS VARCHAR) AS max_s
  FROM documents
  UNION ALL
  SELECT 'lang', count(*),
         CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'n_chars', count(*),
         CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
  FROM documents
)
"""


def tdigest_doclen_centiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest sketch of n_chars.  The digest's total weight n is EXACT
    (every value folds with weight 1), so the projection is
    SQL-checkable; quantile accuracy bounds are asserted in
    tests/test_sketches.py."""
    from metaprofi_spark.functions.sketch_agg import tdigest_agg

    docs = _docs(spark, sf_dir).withColumn("g", F.lit(1))
    return tdigest_agg(docs, ["g"], "n_chars").select("g", "n")


TDIGEST_DOCLEN_SQL = "SELECT 1 AS g, count(*) AS n FROM documents"


def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 summary analog: corpus-level stats, fully SQL-checkable."""
    return _docs(spark, sf_dir).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


CORPUS_SUMMARY_SQL = """
SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# training-data pipeline ops: text analysis, dedup, similarity, multimodal
# ---------------------------------------------------------------------------

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token count, punctuation chars, stopword hits, language-ID
    heuristic — all integer/string outputs (bit-exact vs the oracle)."""
    from metaprofi_spark.functions.text import (
        bpe_token_count,
        lang_id,
        lang_scores,
        token_count,
    )

    docs = _docs(spark, sf_dir)
    scores = lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        bpe_token_count(F.col("text")).alias("n_bpe"),
        F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")).alias("n_punct"),
        scores["en"].alias("s_en"),
        scores["de"].alias("s_de"),
        lang_id(F.col("text")).alias("pred_lang"),
    )


TEXT_STATS_SQL = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS dtoks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tok,
       len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')) AS n_bpe,
       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
       len(list_intersect(dtoks, ['the','and','of','to','a','in','is','that','it','for'])) AS s_en,
       len(list_intersect(dtoks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) AS s_de,
       CASE
         WHEN len(list_intersect(dtoks, ['the','and','of','to','a','in','is','that','it','for'])) >= len(list_intersect(dtoks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu']))
          AND len(list_intersect(dtoks, ['the','and','of','to','a','in','is','that','it','for'])) >= len(list_intersect(dtoks, ['el','la','de','que','y','en','un','por','con','para']))
          AND len(list_intersect(dtoks, ['the','and','of','to','a','in','is','that','it','for'])) >= len(list_intersect(dtoks, ['le','la','et','les','des','un','une','du','est','pour']))
         THEN 'en'
         WHEN len(list_intersect(dtoks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) >= len(list_intersect(dtoks, ['el','la','de','que','y','en','un','por','con','para']))
          AND len(list_intersect(dtoks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) >= len(list_intersect(dtoks, ['le','la','et','les','des','un','une','du','est','pour']))
         THEN 'de'
         WHEN len(list_intersect(dtoks, ['el','la','de','que','y','en','un','por','con','para'])) >= len(list_intersect(dtoks, ['le','la','et','les','des','un','une','du','est','pour']))
         THEN 'es'
         ELSE 'fr'
       END AS pred_lang
FROM t
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic quantized to integer micro-units
    (round(score*1e6) as long) so the gate can hash-compare it exactly
    — the pricing_summary/repetition_stats trick (r4 verdict item 3).
    Both engines evaluate the identical f64 expression tree
    (left-assoc sums, same literals), so the doubles are bit-identical
    and round() ties (HALF_UP vs ties-away) agree for positives."""
    from metaprofi_spark.functions.text import quality_score

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.round(quality_score(F.col("text")).cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("q_micro"),
    )


# mirrors quality_score(text) term by term: len_score = least(nt/100,1);
# punct_pen = 1 - least(5*punct_ratio,1); stop_score = least(4*stop_ratio,1);
# quality = ((ls + pp) + ss)/3 — same association order as Spark
def _quality_micro_sql(source: str = "documents") -> str:
    """Standalone (doc_id, q_micro) quality SQL over ``source`` — the
    quality_scores oracle, reusable inside composed oracles (the
    verified clean-corpus chain filters survivors on it)."""
    return QUALITY_SCORES_SQL.replace("FROM documents", f"FROM {source}", 1)


QUALITY_SCORES_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ltoks
  FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(ltoks) AS DOUBLE) AS nt,
         CAST(length(text) AS DOUBLE) AS l,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS np,
         CAST(len(list_filter(ltoks,
              x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x)))
              AS DOUBLE) AS sh
  FROM t
)
SELECT doc_id,
       CAST(round((
           least(nt / 100.0, 1.0)
           + (1.0 - least((CASE WHEN l > 0 THEN np / l ELSE 0.0 END) * 5.0, 1.0))
           + least((CASE WHEN nt > 0 THEN sh / nt ELSE 0.0 END) * 4.0, 1.0)
       ) / 3.0 * 1000000.0) AS BIGINT) AS q_micro
FROM c
"""


def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals, all-integer (dup-token mass,
    top token / adjacent-bigram occurrence counts) — the repeated-ngram
    quality filter family from LLM data-cleaning recipes, hash-exact vs
    the SQL oracle."""
    from metaprofi_spark.functions.text import repetition_stats

    r = repetition_stats(_docs(spark, sf_dir))
    return r.select(
        "doc_id",
        *[F.col(c).cast("long").alias(c)
          for c in ("n_tokens", "dup_tokens", "top_token_count",
                    "top_bigram_count")],
    )


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), flat AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM t
), tok_top AS (
  SELECT doc_id, MAX(c) AS top_token_count
  FROM (SELECT doc_id, tok, count(*) AS c FROM flat GROUP BY doc_id, tok)
  GROUP BY doc_id
), big_top AS (
  SELECT doc_id, MAX(c) AS top_bigram_count FROM (
    SELECT doc_id, bg, count(*) AS c FROM (
      SELECT doc_id,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
      FROM flat
    ) WHERE bg IS NOT NULL GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT t.doc_id AS doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(tok_top.top_token_count, 0) AS BIGINT) AS top_token_count,
       CAST(COALESCE(big_top.top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM t
LEFT JOIN tok_top USING (doc_id)
LEFT JOIN big_top USING (doc_id)
"""


def fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup groups: md5 fingerprint of normalized text."""
    from metaprofi_spark.operators.dedup import exact_duplicate_groups

    return exact_duplicate_groups(_docs(spark, sf_dir))


def stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gate row (r4 verdict item 5): the documents table is
    replayed as a multi-micro-batch file stream (maxFilesPerTrigger=1
    over 3 source files) and deduped with Structured Streaming state.

    Two streams run under this row:

    1. ``stream_drop_exact_duplicates`` (dropDuplicates state) — its
       contract is asserted IN-QUERY so a violation errors the gate
       row: the run must span >=2 non-empty micro-batches, keep at most
       one survivor per fingerprint group, and the surviving
       fingerprint set must equal the corpus's (arrival order decides
       WHICH member survives, so that part is pytest-pinned, not
       hashed).
    2. a complete-mode streaming groupBy(fp) aggregation whose FINAL
       result is deterministic — returned and hash-compared against the
       same batch SQL oracle as ``fingerprint_groups``.
    """
    import os
    import tempfile
    import uuid

    from metaprofi_spark.functions.text import fingerprint
    from metaprofi_spark.streaming.dedup import stream_drop_exact_duplicates

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_dedup_gate_")
    src = os.path.join(tmp, "src")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def file_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    name_a = f"sdd_kept_{uuid.uuid4().hex[:8]}"
    qa = (
        stream_drop_exact_duplicates(file_stream())
        .writeStream.format("memory")
        .queryName(name_a)
        .option("checkpointLocation", os.path.join(tmp, "ck_a"))
        .outputMode("append")
        .start()
    )
    qa.processAllAvailable()
    n_batches = sum(1 for p in qa.recentProgress if p["numInputRows"] > 0)
    qa.stop()
    if n_batches < 2:
        raise AssertionError(f"expected a multi-batch stream, got {n_batches}")
    kept = spark.table(name_a).withColumn("fp", fingerprint(F.col("text")))
    dup_fps = kept.groupBy("fp").count().filter(F.col("count") > 1).count()
    if dup_fps:
        raise AssertionError(
            f"dropDuplicates kept >1 survivor for {dup_fps} fingerprint groups"
        )
    all_fps = docs.select(fingerprint(F.col("text")).alias("fp")).distinct()
    missing = all_fps.join(kept.select("fp"), "fp", "left_anti").count()
    extra = kept.select("fp").join(all_fps, "fp", "left_anti").count()
    if missing or extra:
        raise AssertionError(
            f"survivor fingerprint set mismatch: missing={missing} extra={extra}"
        )

    name_b = f"sdd_groups_{uuid.uuid4().hex[:8]}"
    agg = (
        file_stream()
        .withColumn("fp", fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )
    qb = (
        agg.writeStream.format("memory")
        .queryName(name_b)
        .option("checkpointLocation", os.path.join(tmp, "ck_b"))
        .outputMode("complete")
        .start()
    )
    qb.processAllAvailable()
    qb.stop()
    return spark.table(name_b)


def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second streaming gate row: the TIME-WINDOWED rollup under the
    hash gate.  The events table is replayed as a >=3-micro-batch file
    stream and aggregated with the real streaming window operator
    (tumbling 1-hour ``F.window`` in complete mode — windowed agg
    state folds across micro-batches; the multi-batch invariant is
    asserted in-query so a single-batch degenerate run errors the row
    instead of passing vacuously).

    Complete mode because the stream is finite: append mode only emits
    windows the watermark has passed, so trailing windows would be
    dropped on a bounded replay (the watermarked append path is
    hourly_event_rollup, pinned by its batch-twin test).  countDistinct
    is unsupported on streams — n_users stays the batch/HLL rows'
    business; this row hashes (hour, event_type, n_events,
    sum_value_e6) exactly like the events_hourly quantization.

    ``w.start`` comes back TIMESTAMP (window() needs event-time, not
    NTZ); cast to timestamp_ntz to match the batch row's dtype — the
    box/session runs UTC so the roundtrip is value-identity."""
    import os
    import tempfile
    import uuid

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="stream_events_gate_")
    src = os.path.join(tmp, "src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    agg = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_e6",
        )
    )
    name = f"seh_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, "ck"))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    q.stop()
    if n_batches < 2:
        raise AssertionError(f"expected a multi-batch stream, got {n_batches}")
    return spark.table(name)


STREAM_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2
"""


FINGERPRINT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


JACCARD_TAU = 80


def jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (the dedup ground truth)."""
    from metaprofi_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), JACCARD_TAU)


def minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (probabilistic — recall property
    asserted in tests/test_pipeline_ops.py; no SQL oracle)."""
    from metaprofi_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(spark, sf_dir), 64, 16)


def minhash_verified_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates exact-verified by token-set Jaccard — runs the
    LINEAR candidate plan but is hash-exact vs the quadratic SQL truth
    (zero false negatives of the banded signature on this corpus; the
    per-pair verify removes all false positives).

    n_perm=128 / bands=32 (r=4): signatures are seed-fixed, so coverage
    is deterministic per (corpus, params) — the r4 sf0.1 sweep caught
    (64, 16) missing 26 of 2.97M true pairs (per-pair miss <= 2.1e-4 at
    tau=0.8); at b=32 the bound is 4.4e-8, verified exact at sf0.01 AND
    sf0.1."""
    from metaprofi_spark.operators.dedup import minhash_verified_pairs

    return minhash_verified_pairs(_docs(spark, sf_dir), JACCARD_TAU, 128, 32)


def simhash_verified_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-0 candidates exact-verified by fingerprint
    equality — provably set-equal to the SQL fingerprint self-join
    (identical normalized text => identical simhash => always a
    candidate), pinning the whole simhash path hash-exactly.

    The corpus carries no exact duplicates at gate scale, so the query
    PLANTS deterministic ones (every 7th doc mirrored at doc_id+10000
    — the same union the oracle SQL performs) to make the gate
    non-vacuous."""
    from metaprofi_spark.operators.dedup import simhash_verified_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(10000)).alias("doc_id"), "text"
    )
    return simhash_verified_pairs(docs.unionByName(planted))


SIMHASH_VERIFIED_SQL = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
), f AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS ntok
  FROM docs2
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
WHERE a.ntok > 0 AND b.ntok > 0
"""


def ann_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-LSH with QUANTIZED exact re-rank — when the bucket union
    covers the true top-k (recall pinned in tests, and exact on this
    corpus) the result is bit-identical to brute force, so the ANN path
    gets a hash-exact gate row against the same SQL as knn_quantized.

    n_tables=48: hyperplanes are seed-fixed, so coverage is a
    DETERMINISTIC fact per (corpus, params) — the r4 sf0.1 sweep caught
    24 tables missing 2 true neighbors at 5000 vectors (p_table ~= 0.14
    at cosine 0.34 -> 3% miss at 24 tables, 0.08% at 48); 48 tables are
    verified exact at sf0.01 AND sf0.1."""
    from metaprofi_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(
        emb, KNN_QUERY_IDS, dim=64, k=KNN_K, n_bits=4, n_tables=48,
        quantized=True,
    )


def near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the LSH collision graph — the dedup
    SCALE path (linear star edges + min-label propagation; candidate
    pair listing is quadratic in cluster size and stays the oracle
    tier).  Deterministic; equality with the pair graph's transitive
    closure is pinned in tests/test_pipeline_ops.py."""
    from metaprofi_spark.operators.dedup import near_dup_components

    return near_dup_components(_docs(spark, sf_dir), 64, 16)


def near_dup_groups_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over VERIFIED (exact-Jaccard) edges — runs
    the LSH-candidates→verify→min-label-propagation plan but, coverage
    holding (pinned at both scales for (128, 32) at tau=0.8), equals
    the transitive closure of the SQL-expressible true pair graph: the
    hash-exact twin of near_dup_groups, pinning min_label_propagation
    itself under the driver's gate via the unrolled DuckDB label chain
    (dedup.min_label_chain_sql)."""
    from metaprofi_spark.operators.dedup import verified_near_dup_components

    labels = verified_near_dup_components(_docs(spark, sf_dir), JACCARD_TAU, 128, 32)
    return labels.select(F.col("id").alias("doc_id"), F.col("comp"))


def _near_dup_groups_verified_sql(rounds: int = 12) -> str:
    from metaprofi_spark.operators.dedup import min_label_chain_sql, ngram_jaccard_sql

    return f"""
WITH pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({ngram_jaccard_sql(JACCARD_TAU)})),
e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents),
{min_label_chain_sql(rounds)}
SELECT CAST(id AS BIGINT) AS doc_id, CAST(lbl AS BIGINT) AS comp FROM l{rounds}
UNION ALL
SELECT -1 AS doc_id, -1 AS comp FROM moved WHERE n > 0
"""


def embedding_components_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup components over VERIFIED (quantized-dot)
    edges — integer arithmetic end to end, so the components equal the
    closure of the hash-exact pair oracle: the verified twin of
    embedding_components (which runs the linear LSH star-edge plan)."""
    from metaprofi_spark.operators.similarity import embedding_verified_components

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = embedding_verified_components(emb, NEAR_DUP_MIN_DOT)
    return labels.select(F.col("id").alias("vec_id"), F.col("comp"))


def _embedding_components_verified_sql(rounds: int = 12) -> str:
    from metaprofi_spark.operators.dedup import min_label_chain_sql
    from metaprofi_spark.operators.similarity import embedding_near_dup_sql

    return f"""
WITH pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({embedding_near_dup_sql(NEAR_DUP_MIN_DOT)})),
e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
l0 AS MATERIALIZED (SELECT vec_id AS id, vec_id AS lbl FROM embeddings),
{min_label_chain_sql(rounds)}
SELECT CAST(id AS BIGINT) AS vec_id, CAST(lbl AS BIGINT) AS comp FROM l{rounds}
UNION ALL
SELECT -1 AS vec_id, -1 AS comp FROM moved WHERE n > 0
"""


def _verified_clean_survivors(spark: SparkSession, docs: DataFrame,
                              prefix: str) -> DataFrame:
    """The verified composed-sweep stage chain SHARED by
    clean_corpus_verified_ids and curated_sample_ids (one source of
    truth — a fix to any stage reaches both gate twins): plant exact
    duplicates (every 7th doc mirrored at doc_id+10000) → exact dedup,
    parquet-materialized (the Spark 4.1 DeduplicateRelations
    workaround documented below) → verified near-dup components, keep
    each component's min-id rep → integer-micro-unit quality floor
    (>= 300000).  Carries every input column; ``docs`` must have
    doc_id + text."""
    import tempfile

    from metaprofi_spark.functions.text import quality_score
    from metaprofi_spark.operators.dedup import (
        drop_exact_duplicates,
        verified_near_dup_components,
    )

    extra = [c for c in docs.columns if c != "doc_id"]
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(10000)).alias("doc_id"), *extra
    )
    d1_path = tempfile.mkdtemp(prefix=prefix) + "/d1.parquet"
    drop_exact_duplicates(docs.unionByName(planted)).write.mode(
        "overwrite"
    ).parquet(d1_path)
    d1 = spark.read.parquet(d1_path)
    labels = verified_near_dup_components(d1, JACCARD_TAU, 128, 32)
    reps = labels.filter(F.col("id") == F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    survivors = d1.join(reps, "doc_id", "left_semi")
    q_micro = (
        F.round(quality_score(F.col("text")).cast("double") * F.lit(1000000.0))
        .cast("long")
    )
    return survivors.filter(q_micro >= 300000)


def _verified_chain_prefix(corpus_sql: str, cols: list[str],
                           rounds: int = 12) -> str:
    """The matching DuckDB CTE prefix (corpus → d0 planted → keep1/d1
    exact dedup → pairs/e/l0 + min-label chain → d2 component reps →
    q/d3 quality floor), shared by both composed-sweep oracles.
    ``corpus_sql`` must project doc_id plus ``cols``.  Ends with the
    d3 CTE (no trailing comma); the min-label chain also defines the
    ``moved`` convergence sentinel the caller must consume."""
    from metaprofi_spark.operators.dedup import (
        min_label_chain_sql,
        ngram_jaccard_sql,
    )

    cl = ", ".join(cols)
    d_cl = ", ".join(f"d.{c}" for c in cols)
    d1_cl = ", ".join(f"d1.{c}" for c in cols)
    d2_cl = ", ".join(f"d2.{c}" for c in cols)
    return f"""corpus AS MATERIALIZED ({corpus_sql}),
d0 AS MATERIALIZED (
  SELECT doc_id, {cl} FROM corpus
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, {cl} FROM corpus WHERE doc_id % 7 = 0
),
keep1 AS MATERIALIZED (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM d0)
  GROUP BY fp
),
d1 AS MATERIALIZED (SELECT d.doc_id, {d_cl} FROM d0 d JOIN keep1 USING (doc_id)),
pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({ngram_jaccard_sql(JACCARD_TAU, source="d1")})),
e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM d1),
{min_label_chain_sql(rounds)},
d2 AS MATERIALIZED (
  SELECT d1.doc_id, {d1_cl} FROM d1 JOIN l{rounds} ON d1.doc_id = l{rounds}.id
  WHERE l{rounds}.id = l{rounds}.lbl
),
q AS (SELECT * FROM ({_quality_micro_sql("d2")})),
d3 AS MATERIALIZED (
  SELECT d2.doc_id, {d2_cl} FROM d2 JOIN q USING (doc_id)
  WHERE q.q_micro >= 300000
)"""


def clean_corpus_verified_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training sweep under the HASH gate: exact dedup
    → verified near-dup components (keep each component's min id) →
    quantized quality floor, chained stage-for-stage in the oracle SQL
    — the verified twin of clean_corpus_ids (whose near-dup stage uses
    the collision graph, not SQL-expressible).

    The corpus carries no exact duplicates at gate scale, so the query
    PLANTS deterministic ones (every 7th doc mirrored at doc_id+10000,
    the simhash_verified_pairs trick) to make stage 1 non-vacuous; the
    quality floor compares integer micro-units (q_micro >= 300000) on
    both engines so the float-boundary gotcha cannot bite.

    Stage-1 materialization note (lives in _verified_clean_survivors):
    the exact-dedup survivors go to parquet and are re-read because the
    component step fans out over d1 twice (edges + nodes), and a reused
    union+semi-join (or localCheckpoint LogicalRDD) relation trips
    Spark 4.1's DeduplicateRelations inside the propagation loop's
    checkpoint (AttributeMap "key not found"); a parquet scan — like
    every other gate fixture — planes it away."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return _verified_clean_survivors(
        spark, docs, "clean_corpus_d1_"
    ).select("doc_id")


def _clean_corpus_verified_sql(rounds: int = 12) -> str:
    prefix = _verified_chain_prefix(
        "SELECT doc_id, text FROM documents", ["text"], rounds
    )
    return f"""
WITH {prefix}
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM d3
UNION ALL
SELECT -1 AS doc_id FROM moved WHERE n > 0
"""


CURATE_QUOTA = 15


def curated_sample_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation sweep under the hash gate — extends
    clean_corpus_verified_ids by the round's two new stages:

        planted exact dedup → verified near-dup components → quantized
        quality floor → benchmark decontamination (word 3-grams vs the
        doc_id%100==3 'eval' split) → deterministic per-lang quota
        sample (md5 rank keys)

    chained stage-for-stage in ONE oracle SQL.  This is the pipeline a
    pre-training corpus actually runs, end-to-end, value-checked.
    The first three stages are _verified_clean_survivors — the SAME
    code clean_corpus_verified_ids gates."""
    from metaprofi_spark.operators.decontam import drop_contaminated
    from metaprofi_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    is_bench = (F.col("doc_id") % DECONTAM_MOD) == DECONTAM_RES
    corpus, bench = docs.filter(~is_bench), docs.filter(is_bench)
    d3 = _verified_clean_survivors(spark, corpus, "curated_d1_")
    d4 = drop_contaminated(d3, bench, n=DECONTAM_N)
    out = stratified_sample(
        d4, ["lang"], CURATE_QUOTA, "doc_id", seed=SAMPLE_SEED
    )
    return out.select("doc_id", "lang")


def _curated_sample_sql(rounds: int = 12) -> str:
    n = DECONTAM_N
    prefix = _verified_chain_prefix(
        f"SELECT doc_id, text, lang FROM documents "
        f"WHERE doc_id % {DECONTAM_MOD} <> {DECONTAM_RES}",
        ["text", "lang"], rounds,
    )
    return f"""
WITH {prefix},
btoks AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
  FROM documents WHERE doc_id % {DECONTAM_MOD} = {DECONTAM_RES}
),
bgrams AS (
  SELECT DISTINCT array_to_string(ts[i : i + {n} - 1], ' ') AS gram
  FROM (SELECT ts, unnest(range(1, len(ts) - {n} + 2)) AS i
        FROM btoks WHERE len(ts) >= {n})
),
ctoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
  FROM d3
),
cgrams AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i : i + {n} - 1], ' ') AS gram
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - {n} + 2)) AS i
        FROM ctoks WHERE len(ts) >= {n})
),
bad AS (SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (gram)),
d4 AS MATERIALIZED (
  SELECT d3.doc_id, d3.lang FROM d3 LEFT JOIN bad USING (doc_id)
  WHERE bad.doc_id IS NULL
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM d4
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY md5(concat('{SAMPLE_SEED}', ':', CAST(doc_id AS VARCHAR))), doc_id
) <= {CURATE_QUOTA}
UNION ALL
SELECT -1 AS doc_id, 'SENTINEL' AS lang FROM moved WHERE n > 0
"""


def clean_corpus_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training sweep (exact dedup -> near-dup
    components -> quality floor) projected to surviving doc ids —
    deterministic (rows-only gate; stage equivalences are pinned by the
    dedup/quality tests)."""
    from metaprofi_spark.pipelines import clean_corpus

    cleaned, _ = clean_corpus(_docs(spark, sf_dir), with_stats=False)
    return cleaned.select("doc_id")


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-banded candidates (probabilistic; no SQL oracle)."""
    from metaprofi_spark.operators.dedup import simhash_candidates

    return simhash_candidates(_docs(spark, sf_dir))


KNN_QUERY_IDS = [0, 1, 2, 3, 4]
KNN_K = 10


def knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k neighbors by quantized dot product (integer
    arithmetic => bit-exact vs DuckDB)."""
    from metaprofi_spark.operators.similarity import knn_topk_quantized

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_topk_quantized(emb, KNN_QUERY_IDS, KNN_K)


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (recall vs brute force
    asserted in tests; no SQL oracle)."""
    from metaprofi_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, KNN_QUERY_IDS, dim=64, k=KNN_K, n_bits=4, n_tables=24)


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: spherical
    k-means coarse quantizer, nprobe cells scanned per query, exact
    re-rank (recall vs brute force asserted in tests; no SQL oracle)."""
    from metaprofi_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(emb, KNN_QUERY_IDS, k=KNN_K, n_centroids=16, nprobe=8)


def ann_ivf_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe == n_centroids + QUANTIZED exact re-rank: every
    cell is probed, so the candidate set is the full corpus and the
    result is bit-identical to brute force — the IVF path's hash-exact
    gate row against the same SQL as knn_quantized (the trick that
    converted ann_lsh; reference analog: exact-verify search,
    search_index.py:518-575)."""
    from metaprofi_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(
        emb, KNN_QUERY_IDS, k=KNN_K, n_centroids=16, nprobe=16, quantized=True
    )


def ann_ivf_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF appends under the hash gate (r5): persist a
    store on the even vec_ids, ``update_ivf`` the odd half as a
    manifest-committed segment, then FULL-probe quantized search with
    self excluded — bit-identical to the brute-force SQL truth (the
    knn_quantized oracle), proving appended segments score exactly like
    base ones.  Centroid training need not be deterministic: with
    nprobe == n_centroids the candidate set is the whole corpus
    regardless of the partition."""
    import tempfile

    from pyspark.sql import Window

    from metaprofi_spark.operators.similarity import (
        ann_ivf_search_store,
        persist_ivf,
        update_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = tempfile.mkdtemp(prefix="ivf_gate_upd_")
    persist_ivf(emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=16)
    update_ivf(emb.filter(F.col("vec_id") % 2 == 1), path)
    qs = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).collect()
    ]
    res = ann_ivf_search_store(
        spark, path, qs, k=KNN_K + 1, nprobe=16, quantized=True
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        res.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("query_id", "neighbor_id", "dot")
    )


def embedding_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup connected components (LSH star edges +
    min-label propagation — the embedding dedup SCALE path;
    deterministic, equality with the pair-graph closure pinned in
    tests; rows-only gate)."""
    from metaprofi_spark.operators.similarity import embedding_near_dup_components

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 12-bit buckets keep collision clusters tight => star graph diameter
    # (and so propagation round count) stays small at gate scale
    return embedding_near_dup_components(emb, dim=64, n_bits=12, n_tables=4)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode/feature plumbing (deterministic fake decoder
    — stable across partitionings; no SQL oracle).

    Gate-friendly projection: the library API (`decode_and_featurize`)
    returns `features array<float>`, which the driver's canonicalizer
    cannot hash — here the array is reduced to a quantized integer
    checksum (order within the array is fixed, so the checksum is
    bit-stable across partitionings)."""
    from metaprofi_spark.operators.multimodal import decode_and_featurize

    dec = decode_and_featurize(_docs(spark, sf_dir), payload_col="text")
    feat_checksum = F.aggregate(
        "features",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.round(x.cast("double") * 1e6).cast("long"),
    )
    return dec.select(
        "doc_id", "width", "height", "n_bytes", feat_checksum.alias("feat_checksum")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable slice of the decode plumbing: the payload byte count
    survives the Arrow round-trip bit-exactly (DuckDB oracle: strlen)."""
    from metaprofi_spark.operators.multimodal import decode_and_featurize

    dec = decode_and_featurize(_docs(spark, sf_dir), payload_col="text")
    return dec.select("doc_id", "n_bytes")


MULTIMODAL_META_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents
"""


# ---------------------------------------------------------------------------
# relational analytics over the TPC-H-ish tables (general engine surface:
# wide aggregation, fact-to-fact join, broadcast dim joins).  All money
# math is QUANTIZED to integer cents so Spark and DuckDB hash-match.
# ---------------------------------------------------------------------------

PRICING_CUTOFF = "1998-09-01 00:00:00"


def _cents(col):
    return F.round(col * 100).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide partial-agg rollup of lineitem with
    map-side combine; one shuffle on the 2-value group key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = _cents(F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(PRICING_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(_cents(F.col("l_extendedprice")) * disc).alias("sum_disc_cc"),
            F.count("*").alias("n_rows"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * CAST(round((1.0 - l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cc,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
GROUP BY 1, 2
"""

TOPK_SEGMENT = "BUILDING"
TOPK_N = 10


def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered fact-to-fact join + top-k.
    customer (filtered, broadcast) ⋈ orders ⋈ lineitem, revenue ranked
    with a deterministic tie-break."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == TOPK_SEGMENT)
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = _cents(F.lit(1.0) - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(_cents(F.col("l_extendedprice")) * disc).alias("revenue_cc"))
        .orderBy(F.desc("revenue_cc"), F.asc("o_orderkey"))
        .limit(TOPK_N)
    )


TOP_ORDERS_SQL = f"""
SELECT o_orderkey,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * CAST(round((1.0 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cc
FROM orders
JOIN customer ON o_custkey = c_custkey AND c_mktsegment = '{TOPK_SEGMENT}'
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey
ORDER BY revenue_cc DESC, o_orderkey ASC
LIMIT {TOPK_N}
"""


def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim rollup: customer ⋈ nation ⋈ region with BROADCAST
    dims (the small-side join the optimizer must never shuffle)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("sum_acctbal_c"),
        )
    )


CUSTOMERS_PER_REGION_SQL = """
SELECT r_name AS region, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# time/window analytics over the events table (general engine surface)
# ---------------------------------------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly windowed aggregation per event type (map-side partial agg
    + one shuffle on (hour, type); the bread-and-butter time rollup)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # sum a QUANTIZED long, not a double: float summation order
            # varies with partitioning, so an integer-domain sum is the
            # only aggregate that is bit-exact vs the oracle
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_e6,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""

SESSION_GAP_MIN = 30


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30-min gap
    (lag + cumulative-sum window, the standard stateful pattern)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet ts is TIMESTAMP_NTZ: cast via TIMESTAMP for epoch seconds
    # (gap is a difference, so the tz shift cancels)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    marked = ev.select(
        "user_id", "ts",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0).alias("new_s"),
    )
    sess = marked.withColumn(
        "session_no", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


USER_SESSIONS_SQL = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, CAST(max(session_no) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM sess GROUP BY user_id
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup tier (quantized integer dot => exact
    vs oracle).  LSH (ann_lsh) is the scale path; this is ground truth."""
    from metaprofi_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(emb, NEAR_DUP_MIN_DOT)


NEAR_DUP_MIN_DOT = 150_000


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# KMV distinct sketch with set operations (theta-style) — the overlap
# question HLL cannot answer: how much vocabulary do two languages share
# ---------------------------------------------------------------------------

KMV_K = 1 << 16


def kmv_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between languages via KMV bottom-k
    sketches (kernels/kmv.py): ONE distributed pass folds per-lang
    token sketches (mergeable UDAF, same shape as HLL/CMS/KLL); set
    algebra then runs on the fixed-size synopses.  k=65536 keeps every
    sketch unsaturated at gate scales — the EXACT tier (asserted
    in-query via require_exact, so saturation fails the gate loudly
    instead of silently hash-mismatching); the estimate tier's error
    bounds are pinned in tests/test_kmv.py."""
    from metaprofi_spark.functions.sketch_agg import kmv_agg, kmv_pairwise_ops
    from metaprofi_spark.functions.text import tokens_col

    toks = _docs(spark, sf_dir).select(
        "lang",
        F.explode(
            tokens_col(F.lower(F.col("text")))
        ).alias("token"),
    )
    agg = kmv_agg(toks, ["lang"], "token", k=KMV_K)
    pairs = kmv_pairwise_ops(agg, "lang", k=KMV_K, require_exact=True)
    return pairs.select(
        F.col("g_a").alias("lang_a"),
        F.col("g_b").alias("lang_b"),
        F.col("n_a").cast("long").alias("vocab_a"),
        F.col("n_b").cast("long").alias("vocab_b"),
        F.col("n_intersection").cast("long").alias("shared_vocab"),
        F.col("n_union").cast("long").alias("union_vocab"),
    )


KMV_VOCAB_SQL = """
WITH v AS (
  SELECT DISTINCT lang, token FROM (
    SELECT lang,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS token
    FROM documents
  )
),
sizes AS (SELECT lang, count(*) AS n FROM v GROUP BY lang),
shared AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_shared
  FROM v a JOIN v b ON a.token = b.token AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT sa.lang AS lang_a, sb.lang AS lang_b,
       CAST(sa.n AS BIGINT) AS vocab_a,
       CAST(sb.n AS BIGINT) AS vocab_b,
       CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS shared_vocab,
       CAST(sa.n + sb.n - COALESCE(sh.n_shared, 0) AS BIGINT) AS union_vocab
FROM sizes sa
JOIN sizes sb ON sa.lang < sb.lang
LEFT JOIN shared sh ON sh.lang_a = sa.lang AND sh.lang_b = sb.lang
"""


MG_TOPN, MG_K = 10, 64


def mg_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 tokens via the Misra–Gries heavy-hitters
    sketch (kernels/mg.py) — frequent items WITHOUT a watch list, the
    question CMS cannot answer.  k=64 counters; the corpus vocabulary
    (31/lang) keeps every partial undecremented, so counts are exact
    (require_exact asserts it in-query — saturation fails the gate
    loudly); degraded-tier bounds are pinned in tests/test_mg.py."""
    from metaprofi_spark.functions.sketch_agg import mg_topk
    from metaprofi_spark.functions.text import tokens_col

    toks = _docs(spark, sf_dir).select(
        "lang",
        F.explode(
            tokens_col(F.lower(F.col("text")))
        ).alias("token"),
    )
    return mg_topk(
        toks, ["lang"], "token", MG_TOPN, k=MG_K, require_exact=True
    )


MG_TOPK_SQL = f"""
WITH t AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
  FROM t GROUP BY lang, token
)
SELECT lang, token, cnt,
       CAST(row_number() OVER (
         PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rank
FROM c
QUALIFY rank <= {MG_TOPN}
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (operators/decontam.py) — n-gram overlap
# sweep against a held-out eval set
# ---------------------------------------------------------------------------

DECONTAM_N = 3  # the synthetic corpus shares no 5-grams across docs;
# 3-grams give a non-trivial contaminated set at both gate scales
DECONTAM_MOD, DECONTAM_RES = 100, 3


def decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per contaminated corpus doc, #distinct word 3-grams shared with
    the 'benchmark' split (docs with doc_id % 100 == 3 stand in for an
    eval suite).  Broadcast benchmark grams; the corpus side's only
    shuffle is the partial-agg count on doc_id."""
    from metaprofi_spark.operators.decontam import contamination_report

    docs = _docs(spark, sf_dir)
    is_bench = (F.col("doc_id") % DECONTAM_MOD) == DECONTAM_RES
    rep = contamination_report(
        docs.filter(~is_bench), docs.filter(is_bench), n=DECONTAM_N
    )
    return rep.select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))


DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(ts[i : i + {DECONTAM_N} - 1], ' ') AS gram
  FROM (
    SELECT doc_id, ts, unnest(range(1, len(ts) - {DECONTAM_N} + 2)) AS i
    FROM toks WHERE len(ts) >= {DECONTAM_N}
  )
),
bench AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % {DECONTAM_MOD} = {DECONTAM_RES}
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % {DECONTAM_MOD} <> {DECONTAM_RES}
GROUP BY g.doc_id
"""


def decontam_index_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-backed decontamination tier: benchmark 3-grams probed
    against the Bloom bit-sliced index (t=100, zero false negatives),
    exact-verified by instr — the corpus is never grammed; only
    candidates are touched.  Reuses the same memoized corpus index as
    bloom_substring_search (the persisted-store serving shape)."""
    from metaprofi_spark.operators.decontam import (
        benchmark_grams,
        contamination_report_indexed,
    )

    docs = _docs(spark, sf_dir)
    idx = _memo_index(spark, sf_dir, QUERY_CFG, _BUCKET, "text",
                      lambda: docs.select("doc_id", "text"))
    is_bench = (F.col("doc_id") % DECONTAM_MOD) == DECONTAM_RES
    grams = benchmark_grams(docs.filter(is_bench), DECONTAM_N, QUERY_CFG.k)
    rep = contamination_report_indexed(
        spark, idx, docs.filter(~is_bench), grams, QUERY_CFG, _BUCKET
    )
    return rep.select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))


DECONTAM_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(ts[i : i + {DECONTAM_N} - 1], ' ') AS gram
  FROM (
    SELECT doc_id, ts, unnest(range(1, len(ts) - {DECONTAM_N} + 2)) AS i
    FROM toks WHERE len(ts) >= {DECONTAM_N}
  )
),
bgrams AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % {DECONTAM_MOD} = {DECONTAM_RES}
    AND length(gram) >= {QUERY_CFG.k}
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM documents d
JOIN bgrams g ON instr(lower(d.text), g.gram) > 0
WHERE d.doc_id % {DECONTAM_MOD} <> {DECONTAM_RES}
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling (operators/sampling.py)
# ---------------------------------------------------------------------------

SAMPLE_N, SAMPLE_SEED = 20, 7


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample: the SAMPLE_N md5-hash-smallest docs
    of every lang — deterministic, engine-independent.  Spark side is
    the skew-safe two-phase top-N; the oracle is the single-window
    QUALIFY twin."""
    from metaprofi_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir)
    return stratified_sample(
        docs, ["lang"], SAMPLE_N, "doc_id", seed=SAMPLE_SEED
    ).select("doc_id", "lang")


TOKEN_BUDGET = 2000


def budget_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language TOKEN-BUDGET sample (operators/sampling.py
    budget_sample): docs in md5-hash order until 2000 cumulative
    tokens per lang — the 'N tokens of each language' mixture cut,
    value-checked against the window-SQL twin."""
    from metaprofi_spark.operators.sampling import budget_sample

    docs = _docs(spark, sf_dir)
    return budget_sample(
        docs, ["lang"], TOKEN_BUDGET, "doc_id", seed=SAMPLE_SEED
    ).select("doc_id", "lang")


BUDGET_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt,
         md5(concat('{SAMPLE_SEED}', ':', CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         COALESCE(SUM(nt) OVER (
           PARTITION BY lang ORDER BY rk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM t
) WHERE cumb < {TOKEN_BUDGET}
"""


def _stratified_sample_sql() -> str:
    from metaprofi_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql(
        "documents", ["lang"], SAMPLE_N, "doc_id", SAMPLE_SEED,
        select_cols="doc_id, lang",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_substring_search": bloom_substring_search,
        "bloom_threshold_search": bloom_threshold_search,
        "distinct_docs_per_lang": distinct_docs_per_lang,
        "hll_distinct_per_lang": hll_distinct_per_lang,
        "token_freq_topk": token_freq_topk,
        "cms_token_freq": cms_token_freq,
        "doclen_quantiles": doclen_quantiles,
        "kll_doclen_quantiles": kll_doclen_quantiles,
        "tdigest_doclen_centiles": tdigest_doclen_centiles,
        "docs_profile": docs_profile,
        "corpus_summary": corpus_summary,
        "text_stats": text_stats,
        "quality_scores": quality_scores,
        "bloom_lang_scoped_search": bloom_lang_scoped_search,
        "bloom_grouped_search": bloom_grouped_search,
        "fasta_source_roundtrip": fasta_source_roundtrip,
        "bloom_canonical_search": bloom_canonical_search,
        "bloom_sixframe_search": bloom_sixframe_search,
        "bloom_update_search": bloom_update_search,
        "bloom_delete_search": bloom_delete_search,
        "fingerprint_groups": fingerprint_groups,
        "stream_dedup_docs": stream_dedup_docs,
        "stream_events_hourly": stream_events_hourly,
        "repetition_stats": repetition_stats_q,
        "jaccard_pairs": jaccard_pairs,
        "minhash_candidates": minhash_candidates,
        "minhash_verified_pairs": minhash_verified_pairs_q,
        "simhash_verified_pairs": simhash_verified_pairs_q,
        "ann_lsh_verified": ann_lsh_verified,
        "near_dup_groups": near_dup_groups,
        "near_dup_groups_verified": near_dup_groups_verified,
        "embedding_components_verified": embedding_components_verified,
        "clean_corpus_ids": clean_corpus_ids,
        "clean_corpus_verified_ids": clean_corpus_verified_ids,
        "curated_sample_ids": curated_sample_ids,
        "simhash_pairs": simhash_pairs,
        "knn_quantized": knn_quantized,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "ann_ivf_verified": ann_ivf_verified,
        "ann_ivf_updated": ann_ivf_updated,
        "pricing_summary": pricing_summary,
        "top_orders_by_revenue": top_orders_by_revenue,
        "customers_per_region": customers_per_region,
        "events_hourly": events_hourly,
        "user_sessions": user_sessions,
        "embedding_near_dup": embedding_near_dup,
        "embedding_components": embedding_components,
        "multimodal_decode": multimodal_decode,
        "multimodal_meta": multimodal_meta,
        "kmv_vocab_overlap": kmv_vocab_overlap,
        "mg_token_topk": mg_token_topk,
        "decontam_hits": decontam_hits,
        "decontam_index_hits": decontam_index_hits,
        "stratified_sample_docs": stratified_sample_docs,
        "budget_sample_docs": budget_sample_docs,
    }


def oracle_sql() -> dict[str, str]:
    from metaprofi_spark.operators.dedup import ngram_jaccard_sql
    from metaprofi_spark.operators.similarity import knn_quantized_sql
    return {
        "bloom_substring_search": BLOOM_SUBSTRING_SQL,
        "bloom_threshold_search": _threshold_sql(),
        "distinct_docs_per_lang": DISTINCT_DOCS_SQL,
        "token_freq_topk": TOKEN_FREQ_SQL,
        "doclen_quantiles": DOCLEN_QUANTILES_SQL,
        "corpus_summary": CORPUS_SUMMARY_SQL,
        "text_stats": TEXT_STATS_SQL,
        "bloom_lang_scoped_search": _lang_probes_sql(),
        "bloom_grouped_search": BLOOM_GROUPED_SQL,
        "fasta_source_roundtrip": FASTA_ROUNDTRIP_SQL,
        "bloom_canonical_search": _canonical_sql(),
        "bloom_sixframe_search": _sixframe_sql(),
        "bloom_update_search": BLOOM_SUBSTRING_SQL,
        "bloom_delete_search": BLOOM_DELETE_SQL,
        "fingerprint_groups": FINGERPRINT_SQL,
        "stream_dedup_docs": FINGERPRINT_SQL,
        "stream_events_hourly": STREAM_EVENTS_HOURLY_SQL,
        "repetition_stats": REPETITION_SQL,
        "jaccard_pairs": ngram_jaccard_sql(JACCARD_TAU),
        "minhash_verified_pairs": ngram_jaccard_sql(JACCARD_TAU),
        "simhash_verified_pairs": SIMHASH_VERIFIED_SQL,
        "ann_lsh_verified": knn_quantized_sql(KNN_QUERY_IDS, KNN_K),
        "ann_ivf_verified": knn_quantized_sql(KNN_QUERY_IDS, KNN_K),
        "ann_ivf_updated": knn_quantized_sql(KNN_QUERY_IDS, KNN_K),
        "knn_quantized": knn_quantized_sql(KNN_QUERY_IDS, KNN_K),
        "pricing_summary": PRICING_SUMMARY_SQL,
        "top_orders_by_revenue": TOP_ORDERS_SQL,
        "customers_per_region": CUSTOMERS_PER_REGION_SQL,
        "events_hourly": EVENTS_HOURLY_SQL,
        "user_sessions": USER_SESSIONS_SQL,
        "multimodal_meta": MULTIMODAL_META_SQL,
        "tdigest_doclen_centiles": TDIGEST_DOCLEN_SQL,
        "docs_profile": DOCS_PROFILE_SQL,
        "quality_scores": QUALITY_SCORES_SQL,
        "embedding_near_dup": __import__("metaprofi_spark.operators.similarity", fromlist=["x"]).embedding_near_dup_sql(NEAR_DUP_MIN_DOT),
        "near_dup_groups_verified": _near_dup_groups_verified_sql(),
        "embedding_components_verified": _embedding_components_verified_sql(),
        "clean_corpus_verified_ids": _clean_corpus_verified_sql(),
        "curated_sample_ids": _curated_sample_sql(),
        "kmv_vocab_overlap": KMV_VOCAB_SQL,
        "mg_token_topk": MG_TOPK_SQL,
        "decontam_hits": DECONTAM_SQL,
        "decontam_index_hits": DECONTAM_INDEX_SQL,
        "stratified_sample_docs": _stratified_sample_sql(),
        "budget_sample_docs": BUDGET_SAMPLE_SQL,
        # no SQL oracle (estimates / probabilistic / stub):
        # hll_distinct_per_lang, cms_token_freq, kll_doclen_quantiles,
        # minhash_candidates, simhash_pairs, ann_lsh,
        # multimodal_decode — bounds/properties asserted in tests/.
    }
