"""Reference-parity tests for the nucleotide/aminoacid modes:
canonical k-mer build (T2) and six-frame translated search (T4)."""

import numpy as np
import pytest

from metaprofi_spark import SketchConfig
from metaprofi_spark.kernels.bio import revcomp, six_frame_frames, translate
from metaprofi_spark.kernels.mmh2 import mmh2_64_windows
from metaprofi_spark.kernels.shingle import (
    canonicalize_windows,
    shingle_positions,
    shingle_windows,
)
from metaprofi_spark.operators import build_index, build_matrix, search

NT_CFG = SketchConfig(
    k=8, h=2, m=1 << 16, chunk_bits=1 << 13, slice_buckets=16,
    normalize="canonical", sequence_type="nucleotide",
)
AA_CFG = SketchConfig(
    k=5, h=2, m=1 << 16, chunk_bits=1 << 13, slice_buckets=16,
    normalize="none", sequence_type="aminoacid",
)
BUCKET = 64


def _ref_canonical(kmer: bytes) -> bytes:
    """Scalar oracle with the reference basemap semantics
    (bloomfilter_cython.pyx:272-306): byte-wise lexicographic min of
    kmer and its reverse complement; unknown bytes complement to NUL."""
    table = {65: 84, 67: 71, 71: 67, 78: 78, 84: 65, 85: 65,
             97: 116, 99: 103, 103: 99, 116: 97, 117: 97}
    rc = bytes(table.get(b, 0) for b in reversed(kmer))
    return min(kmer, rc)


def _random_dna(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n)).decode()


def test_canonicalize_windows_matches_scalar_oracle():
    rng = np.random.default_rng(11)
    seqs = [_random_dna(rng, 8) for _ in range(500)]
    # include ties (palindromes), N, lowercase and non-DNA bytes
    seqs += ["ACGTACGT", "AATTAATT", "ACGNNNGT", "acgtACGT", "AC@TACGT"]
    windows = np.frombuffer(
        b"".join(s.encode() for s in seqs), dtype=np.uint8
    ).reshape(len(seqs), 8)
    got = canonicalize_windows(windows.copy())
    for i, s in enumerate(seqs):
        assert bytes(got[i]) == _ref_canonical(s.encode()), s


def test_shingle_positions_canonical_parity():
    """Fused canonical kernel == per-window canonicalize + hash."""
    rng = np.random.default_rng(13)
    texts = [_random_dna(rng, rng.integers(4, 60)) for _ in range(50)]
    seeds = np.asarray([0, 1], dtype=np.uint64)
    m = NT_CFG.m_padded
    doc_idx, pos = shingle_positions(texts, 8, seeds, m, "canonical")
    doc_idx2, windows = shingle_windows(texts, 8, "none")
    canon = canonicalize_windows(np.ascontiguousarray(windows))
    expect = mmh2_64_windows(canon, seeds) % np.uint64(m)
    assert (doc_idx == doc_idx2).all()
    assert (pos == expect).all() and len(pos)


def test_canonical_build_is_strand_invariant(spark):
    """The whole point of T2: a query on the REVERSE COMPLEMENT strand
    must hit the same samples (zero false negatives both strands)."""
    rng = np.random.default_rng(17)
    docs = [(i, _random_dna(rng, 300)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bf = build_matrix(df, NT_CFG, id_col="doc_id", text_col="text")
    idx = build_index(bf, NT_CFG, sample_bucket_size=BUCKET).cache()
    probes = []
    for i, seq in docs[:6]:
        sub = seq[50 : 50 + 5 * NT_CFG.k]
        probes.append((f"fwd{i}", sub))
        probes.append((f"rc{i}", revcomp(sub)))
    res = search(spark, idx, probes, NT_CFG, 100, BUCKET)
    got = {(r.query_id, r.sample_idx) for r in res.collect()}
    for i, _ in docs[:6]:
        assert (f"fwd{i}", i) in got, f"forward miss doc {i}"
        assert (f"rc{i}", i) in got, f"reverse-complement miss doc {i}"
    idx.unpersist()


def test_six_frame_named_frames_match_reference_layout():
    seq = "ATGGCCATTGTAATGGGCCGCTGAAAGGGTGCCCGATAG"
    frames = six_frame_frames(seq, "q", 5)
    assert all(
        k.startswith("q_forward_reading_frame_") or k.startswith("q_reverse_reading_frame_")
        for k in frames
    )
    # frame 0 forward is the direct translation
    assert frames["q_forward_reading_frame_0"] == translate(seq)
    # stop codons continue as '_' (translate_fasta.py note 1)
    assert "_" in frames["q_forward_reading_frame_0"]


def test_nucleotide_query_against_aminoacid_store(spark):
    """search(seq_type='nucleotide') on an aminoacid store six-frame
    translates and reports per-frame results (search_index.py:107-141)."""
    rng = np.random.default_rng(23)
    dna = [(i, _random_dna(rng, 240)) for i in range(20)]
    # aminoacid corpus: frame-0 translations of the DNA docs
    prot = [(i, translate(seq)) for i, seq in dna]
    df = spark.createDataFrame(prot, "doc_id long, text string")
    bf = build_matrix(df, AA_CFG, id_col="doc_id", text_col="text")
    idx = build_index(bf, AA_CFG, sample_bucket_size=BUCKET).cache()
    # query with the raw NUCLEOTIDE subsequence (codon-aligned so the
    # matching frame is forward_reading_frame_0)
    qid, seq = dna[3]
    q = [("q3", seq[30 : 30 + 3 * (AA_CFG.k + 6)])]
    res = search(spark, idx, q, AA_CFG, 100, BUCKET, seq_type="nucleotide")
    rows = res.collect()
    assert rows, "translated search returned nothing"
    frame_keys = {r.query_id for r in rows}
    assert any(k.startswith("q3_forward_reading_frame_") for k in frame_keys)
    assert any(r.sample_idx == qid for r in rows), "frame-0 query missed its doc"
    # without translation the raw nucleotide query must not parse as a hit
    raw = search(spark, idx, q, AA_CFG, 100, BUCKET)
    raw_hits = {(r.query_id, r.sample_idx) for r in raw.collect()}
    assert ("q3", qid) not in raw_hits
    idx.unpersist()


def test_translated_store_build_e2e(spark, tmp_path):
    """The reference's translate_fasta workflow as DataFrames: DNA rows
    -> six-frame translate -> grouped aminoacid store; a NUCLEOTIDE
    query then finds its source sequence regardless of frame, and a
    decoy finds nothing (build_side T4, translate_fasta.py:28-99)."""
    from metaprofi_spark import SketchConfig, api
    from metaprofi_spark.kernels.bio import revcomp
    from metaprofi_spark.sources.fasta import translate_six_frames_df

    rng = __import__("random").Random(11)
    dna = ["".join(rng.choice("ACGT") for _ in range(90)) for _ in range(12)]
    df = spark.createDataFrame(
        [(f"s{i}", s) for i, s in enumerate(dna)], "name string, seq string"
    )
    frames = translate_six_frames_df(df, min_len=4)
    assert frames.count() == 12 * 6  # 90nt: all six frames >= 4 aa
    cfg = SketchConfig(k=4, h=2, m=1 << 16, chunk_bits=1 << 13,
                       slice_buckets=8, normalize="none",
                       sequence_type="aminoacid")
    store = str(tmp_path / "aa_store")
    api.build_grouped(spark, frames, cfg, store, group_col="name",
                      text_col="seq", sample_bucket_size=64)
    dim = {r.group_key: r.sample_idx for r in api.samples_dim(spark, store).collect()}
    # nucleotide probes: a forward slice of s3 and the REVERSE
    # COMPLEMENT of a slice of s7 (reverse-strand frame must hit)
    res = api.query(
        spark, store,
        [("q_fwd", dna[3][12:48]), ("q_rc", revcomp(dna[7][9:45])),
         ("q_decoy", "TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT")],
        threshold=100, seq_type="nucleotide",
    )
    hits = {}
    for r in res.collect():
        base = r.query_id.split("_reading_frame")[0].rsplit("_", 1)[0]
        hits.setdefault(base, set()).add(r.sample_idx)
    assert dim["s3"] in hits.get("q_fwd", set())
    assert dim["s7"] in hits.get("q_rc", set())
