"""Dedup / similarity / text-analysis / multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from metaprofi_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    rolling_hash_fingerprint,
    token_count,
)
from metaprofi_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from metaprofi_spark.operators.multimodal import decode_and_featurize, frame_sample_plan
from metaprofi_spark.operators.similarity import ann_lsh_topk, knn_topk_cosine, knn_topk_quantized
from tests.conftest import SF01_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF01_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF01_DIR}/embeddings.parquet").cache()


# ------------------------- exact dedup -------------------------------------

def test_exact_dedup_finds_planted_duplicates(spark, docs):
    # plant duplicates: same text, different ids / whitespace / case
    rows = [
        (10001, "The Quick  Brown Fox"),
        (10002, "the quick brown fox"),
        (10003, "a unique document"),
    ]
    extra = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_duplicate_groups(extra)
    dup = [r for r in groups.collect() if r.n_docs > 1]
    assert len(dup) == 1 and dup[0].n_docs == 2 and dup[0].keep_id == 10001
    kept = drop_exact_duplicates(extra)
    assert kept.count() == 2
    assert {r.doc_id for r in kept.collect()} == {10001, 10003}


def test_jaccard_pairs_symmetric_bound(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),  # jacc 3/5 = 0.6
        (3, "zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r for r in ngram_jaccard_pairs(df, 50).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
    assert pairs[(1, 2)].shared == 3
    assert ngram_jaccard_pairs(df, 70).count() == 0


def test_minhash_lsh_recall_on_near_dups(spark, docs):
    """Planted near-identical docs must collide in >= 1 band."""
    base = [r.text for r in docs.limit(20).collect()]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        toks = t.split()
        toks[len(toks) // 2] = "PERTURBED"  # ~1-token difference
        rows.append((2 * i + 1, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, 64, 16).collect()}
    planted = [(2 * i, 2 * i + 1) for i in range(len(base))]
    recall = sum(p in cand for p in planted) / len(planted)
    assert recall >= 0.9, recall  # jacc ~0.9 ⇒ collision prob ≈ 1-(1-0.9^4)^16 ≈ 1


def test_simhash_near_dup_hamming(spark, docs):
    base = [r.text for r in docs.limit(10).collect()]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t + " tailtoken"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {(r.id_a, r.id_b): r.hamming for r in simhash_candidates(df).collect()}
    found = [cand.get((2 * i, 2 * i + 1)) for i in range(len(base))]
    hits = [h for h in found if h is not None]
    assert len(hits) >= 8  # near-identical docs share a 16-bit block
    assert all(h <= 16 for h in hits)


def test_simhash_collapse_equals_naive_join(spark, docs):
    """The signature-collapsed simhash candidate plan (scale path) must
    equal the naive per-doc block self-join bit-for-bit, including
    identical-signature clusters (intra pairs, hamming 0)."""
    base = [r.text for r in docs.limit(40).collect()]
    rows = []
    nid = 0
    for i, t in enumerate(base):
        # plant identical clusters of varying size + one near-dup
        for _ in range(1 + i % 3):
            rows.append((nid, t))
            nid += 1
        rows.append((nid, t + " tailtoken"))
        nid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {(r.id_a, r.id_b, r.hamming)
            for r in simhash_candidates(df, collapse=True).collect()}
    naive = {(r.id_a, r.id_b, r.hamming)
             for r in simhash_candidates(df, collapse=False).collect()}
    assert fast == naive and fast


def test_minhash_candidates_equal_naive_band_join(spark, docs):
    """The signature-group-collapsed plan must equal the naive band
    self-join + distinct bit-for-bit (including planted identical and
    near-identical docs exercising intra- and cross-group paths)."""
    from metaprofi_spark.operators.dedup import minhash_bands, minhash_lsh_candidates

    base = [r.text for r in docs.limit(60).collect()]
    rows = []
    for i, t in enumerate(base):
        rows.append((3 * i, t))
        rows.append((3 * i + 1, t))  # signature-identical twin
        toks = t.split()
        toks[len(toks) // 2] = "PERTURBED"
        rows.append((3 * i + 2, " ".join(toks)))  # near-identical
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bandsdf = minhash_bands(df, 64, 16)
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    naive = {
        (r.id_a, r.id_b)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .collect()
    }
    got = [(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, 64, 16).collect()]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == naive and naive


def test_near_dup_components_chain_and_cluster(spark, docs):
    """Components must equal the transitive closure of the pair graph:
    identical clusters collapse, and CHAINS (a~b, b~c, a!~c) merge even
    though a and c never share a bucket directly."""
    from metaprofi_spark.operators.dedup import (
        minhash_lsh_candidates,
        near_dup_components,
    )

    base = [r.text for r in docs.limit(15).collect()]
    rows = []
    for i, t in enumerate(base):
        toks = t.split()
        a = " ".join(toks)
        mid = list(toks); mid[len(mid) // 3] = "CHAINMID"
        c = list(mid); c[2 * len(c) // 3] = "CHAINEND"
        rows.append((10 * i, a))
        rows.append((10 * i + 1, a))              # identical twin
        rows.append((10 * i + 2, " ".join(mid)))  # near a
        rows.append((10 * i + 3, " ".join(c)))    # near mid, farther from a
    df = spark.createDataFrame(rows, "doc_id long, text string")
    comp = {r.id: r.comp for r in near_dup_components(df, 64, 16).collect()}
    # ground truth: transitive closure of the candidate pair graph
    pairs = [(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, 64, 16).collect()]
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i, _ in rows}
    assert comp == expect
    # identical twins always share a component
    assert all(comp[10 * i] == comp[10 * i + 1] for i in range(len(base)))


def test_verified_components_equal_jaccard_closure(spark):
    """verified_near_dup_components == transitive closure of the TRUE
    Jaccard pair graph, including a chain (A~B, B~C, A!~C merge) and
    isolated / token-less docs keeping their own label — the property
    the hash-exact gate row (near_dup_groups_verified) relies on."""
    from metaprofi_spark.operators.dedup import (
        ngram_jaccard_pairs,
        verified_near_dup_components,
    )

    toks = [f"t{i}" for i in range(12)]
    rows = [
        (1, " ".join(toks[0:10])),   # A
        (2, " ".join(toks[1:11])),   # B: J(A,B) = 9/11 ~ 0.818
        (3, " ".join(toks[2:12])),   # C: J(B,C) ~ 0.818, J(A,C) = 8/12 < 0.8
        (4, "loner only here"),      # isolated
        (5, ""),                     # token-less
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(df, 80).collect()}
    assert truth == {(1, 2), (2, 3)}  # the chain, no shortcut edge
    comp = {r.id: r.comp for r in verified_near_dup_components(df, 80).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_embedding_verified_components_equal_closure(spark):
    """embedding_verified_components merges chains through the
    quantized-dot threshold and leaves isolated vectors alone."""
    from metaprofi_spark.operators.similarity import embedding_verified_components

    rows = [
        (1, [1.0, 0.0]),    # A
        (2, [0.8, 0.6]),    # B: A.B = 0.8
        (3, [0.0, 1.0]),    # C: B.C = 0.6, A.C = 0
        (4, [-1.0, 0.0]),   # isolated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # threshold 500000 (quantized 0.5): edges A-B (800000), B-C (600000)
    comp = {r.id: r.comp for r in embedding_verified_components(df, 500_000).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4}


def test_min_label_propagation_long_chain_converges(spark):
    """Adversarial path graph (diameter 200 >> max_iter=25): pointer
    jumping must converge in O(log diameter) rounds where plain
    min-label propagation would hit the cap and raise (r5 verdict
    item 3) — and the labels are still the component minima."""
    from metaprofi_spark.operators.dedup import min_label_propagation

    n = 200
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(n - 1)], "id long, rep long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    comp = {
        r["id"]: r["comp"]
        for r in min_label_propagation(edges, nodes, max_iter=25).collect()
    }
    assert comp == {i: 0 for i in range(n)}


def test_min_label_chain_sql_closure_and_sentinel():
    """The DuckDB oracle chain converges to component minima on a path
    graph, and the convergence sentinel FIRES when rounds are too few —
    non-convergence must fail the gate loudly, not under-merge."""
    import duckdb

    from metaprofi_spark.operators.dedup import min_label_chain_sql

    def run(rounds):
        q = f"""
WITH pairs(id_a, id_b) AS (VALUES (1, 2), (2, 3), (3, 4), (4, 5)),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
l0 AS (SELECT * FROM (VALUES (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (9, 9)) t(id, lbl)),
{min_label_chain_sql(rounds)}
SELECT id, lbl FROM l{rounds}
UNION ALL
SELECT -1, -1 FROM moved WHERE n > 0
"""
        return sorted(duckdb.connect().execute(q).fetchall())

    assert run(12) == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (9, 9)]
    assert (-1, -1) in run(1)  # label 1 hasn't reached node 5: sentinel row


def test_drop_near_duplicates_keeps_one_per_component(spark, docs):
    from metaprofi_spark.operators.dedup import drop_near_duplicates, near_dup_components

    base = [r.text for r in docs.limit(10).collect()]
    rows = []
    for i, t in enumerate(base):
        rows.append((3 * i, t))
        rows.append((3 * i + 1, t))  # twin
        rows.append((3 * i + 2, t + " extratok"))  # near
    rows.append((999, ""))  # token-less: must survive
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in drop_near_duplicates(df).collect()}
    comps = {r.id: r.comp for r in near_dup_components(df).collect()}
    expect = set(comps.values()) | {999}
    assert kept == expect
    assert 999 in kept and len(kept) < len(rows)


def test_minhash_signature_equals_scalar_oracle(spark, docs):
    """The batch-vectorized signature kernel must equal the obvious
    per-doc formulation: band_hash = mmh2(min-over-tokens slice, seed=b)."""
    from metaprofi_spark.kernels.mmh2 import mmh2_64_bytes
    from metaprofi_spark.operators.dedup import minhash_bands

    sample = docs.limit(25).collect()
    n_perm, bands, rpb = 64, 16, 4
    expect = set()
    for r in sample:
        toks = sorted({t for t in r.text.lower().split() if t})
        if not toks:
            continue
        h = mmh2_64_bytes([t.encode() for t in toks], list(range(n_perm)))
        signature = h.min(axis=0)
        for b in range(bands):
            bh = mmh2_64_bytes([signature[b * rpb : (b + 1) * rpb].tobytes()], [b])[0, 0]
            expect.add((r.doc_id, b, int(bh & np.uint64(0x7FFFFFFFFFFFFFFF))))
    df = spark.createDataFrame(
        [(r.doc_id, r.text) for r in sample], "doc_id long, text string"
    )
    got = {(r.id, r.band_id, r.band_hash) for r in minhash_bands(df, n_perm, bands).collect()}
    assert got == expect and got


def test_simhash_signature_equals_scalar_oracle(spark, docs):
    """Vectorized simhash == per-doc frequency-weighted vote oracle."""
    from metaprofi_spark.kernels.mmh2 import mmh2_64_bytes
    from metaprofi_spark.operators.dedup import simhash_signatures

    sample = docs.limit(25).collect()
    expect = {}
    for r in sample:
        toks = [t for t in r.text.lower().split() if t]
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = mmh2_64_bytes([t.encode() for t in uniq], [0])[:, 0]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        sim = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(j)
        expect[r.doc_id] = int(sim.astype(np.int64))
    df = spark.createDataFrame(
        [(r.doc_id, r.text) for r in sample], "doc_id long, text string"
    )
    got = {r.id: r.simhash for r in simhash_signatures(df).collect()}
    assert got == expect and got


# ------------------------- similarity --------------------------------------

def test_knn_quantized_topk(spark, embeddings):
    res = knn_topk_quantized(embeddings, [0, 1], k=5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1}
    for q, rows in by_q.items():
        assert len(rows) == 5
        dots = [r.dot for r in rows]
        assert dots == sorted(dots, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_ann_lsh_recall_vs_brute_force(spark, embeddings):
    qids = [0, 1, 2, 3, 4]
    brute = knn_topk_cosine(embeddings, qids, k=10).collect()
    # weakly-clustered random vectors (top cosine ~0.37) need short codes
    # + many tables: p_collide = 1-(1-p_bit^4)^24 ~ 0.95 at cosine 0.3
    approx = ann_lsh_topk(embeddings, qids, dim=64, k=10, n_bits=4, n_tables=24).collect()
    bset = {}
    for r in brute:
        bset.setdefault(r.query_id, set()).add(r.neighbor_id)
    aset = {}
    for r in approx:
        aset.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bset[q] & aset.get(q, set())) / 10 for q in qids]
    assert float(np.mean(recalls)) >= 0.5, recalls  # ANN tradeoff, bounded below


def test_ann_ivf_recall_vs_brute_force(spark, embeddings):
    from metaprofi_spark.operators.similarity import ann_ivf_topk, ivf_assign, train_ivf_centroids

    qids = [0, 1, 2, 3, 4]
    brute = knn_topk_cosine(embeddings, qids, k=10).collect()
    approx = ann_ivf_topk(embeddings, qids, k=10, n_centroids=16, nprobe=8).collect()
    bset, aset = {}, {}
    for r in brute:
        bset.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        aset.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bset[q] & aset.get(q, set())) / 10 for q in qids]
    assert float(np.mean(recalls)) >= 0.5, recalls
    # probing ALL cells must recover brute force exactly (sanity: the
    # IVF partition covers the corpus)
    full = ann_ivf_topk(embeddings, qids, k=10, n_centroids=16, nprobe=16).collect()
    fset = {}
    for r in full:
        fset.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert fset == bset
    # every vector lands in exactly one cell
    cents = train_ivf_centroids(embeddings, 16)
    assigned = ivf_assign(embeddings, cents)
    assert assigned.count() == embeddings.count()
    assert assigned.select("id").distinct().count() == embeddings.count()


# ------------------------- text functions ----------------------------------

def test_text_functions(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "!!! ??? ***"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
        rolling_hash_fingerprint(F.col("text")).alias("rh"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert rows[1].n_tok == 9 and rows[1].lang == "en"
    assert rows[2].lang == "de"
    assert rows[3].q < rows[1].q  # punctuation garbage scores lower
    assert rows[4].n_tok == 0
    assert rows[1].fp != rows[2].fp and len(rows[1].fp) == 32
    assert rows[1].rh != rows[2].rh and rows[4].rh == 0


def test_bpe_token_count(spark):
    """BPE-ish pre-tokenizer: contractions split, space-prefixed word /
    digit / punctuation runs each count once."""
    from metaprofi_spark.functions.text import bpe_token_count, bpe_tokens_col

    rows = [
        (1, "it's 2024, isn't it?!"),
        (2, "hello world"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n, r.toks) for r in df.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("n"),
        bpe_tokens_col(F.col("text")).alias("toks"),
    ).collect()}
    assert out[2] == (2, ["hello", " world"])
    # it |'s| |2024|,| isn|'t| it|?!
    assert out[1][1] == ["it", "'s", " 2024", ",", " isn", "'t", " it", "?!"]
    assert out[3][0] == 0


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ba")], "doc_id long, text string")
    r = {x.doc_id: x.rh for x in df.select("doc_id", rolling_hash_fingerprint(F.col("text")).alias("rh")).collect()}
    assert r[1] != r[2]


# ------------------------- multimodal --------------------------------------

def test_multimodal_fake_decode_deterministic(spark, docs):
    feats = decode_and_featurize(docs.limit(50), payload_col="text")
    a = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in feats.collect()}
    b = {
        r.doc_id: (r.width, r.height, tuple(r.features))
        for r in decode_and_featurize(docs.limit(50).repartition(7), payload_col="text").collect()
    }
    assert a == b  # stable across partitionings
    w, h, f = next(iter(a.values()))
    assert 16 <= w < 1936 and 16 <= h < 1096 and len(f) == 16


def test_multimodal_raise_stub(spark, docs):
    from py4j.protocol import Py4JJavaError

    bad = decode_and_featurize(docs.limit(1), payload_col="text", decode_stub="raise")
    with pytest.raises(Exception) as ei:
        bad.collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_resize_payloads_deterministic(spark, docs):
    from metaprofi_spark.operators.multimodal import resize_payloads

    sub = docs.limit(50)
    a = {r.doc_id: (r.src_width, r.src_height, r.width, r.height, bytes(r.payload))
         for r in resize_payloads(sub, 64, 48, payload_col="text").collect()}
    b = {r.doc_id: (r.src_width, r.src_height, r.width, r.height, bytes(r.payload))
         for r in resize_payloads(sub.repartition(7), 64, 48, payload_col="text").collect()}
    assert a == b and len(a) == 50
    for srcw, srch, w, h, payload in a.values():
        assert (w, h) == (64, 48) and 16 <= srcw < 1936 and payload
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_payloads(sub, 64, 48, payload_col="text", decode_stub="raise").collect()


def test_frame_sample_plan(spark, docs):
    plan = frame_sample_plan(docs.limit(5), payload_col="text", every_n=2)
    rows = plan.collect()
    assert rows and all(r.frame_idx % 2 == 0 for r in rows)


def test_clean_corpus_pipeline(spark, docs):
    from metaprofi_spark.pipelines import clean_corpus

    base = [r.text for r in docs.limit(10).collect()]
    rows = []
    for i, t in enumerate(base):
        rows.append((3 * i, t))
        rows.append((3 * i + 1, t))  # exact dup
        toks = t.split(); toks[0] = "NEARDUP"
        rows.append((3 * i + 2, " ".join(toks)))  # near dup
    rows.append((900, "@@@@ %%%% ^^^^ &&&&"))  # low quality
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned, stats = clean_corpus(df, min_quality=0.3)
    assert stats["n_input"] == len(rows)
    assert stats["n_after_exact_dedup"] == len(rows) - len(base)  # twins gone
    assert stats["n_after_near_dedup"] <= len(base) + 1
    assert stats["n_after_quality"] < stats["n_after_near_dedup"]  # junk doc cut
    ids = {r.doc_id for r in cleaned.collect()}
    assert 900 not in ids
    assert stats["retention"] < 1.0
    # lazy variant produces the same rows
    lazy, s2 = clean_corpus(df, min_quality=0.3, with_stats=False)
    assert s2 == {} and {r.doc_id for r in lazy.collect()} == ids


# ------------------- verified (hash-exact gate) tiers ----------------------

def test_minhash_verified_pairs_equal_exact_jaccard(spark, docs):
    """Candidates + per-pair exact verify == the quadratic ground truth
    (zero false negatives of the banded LSH on this corpus)."""
    from metaprofi_spark.operators.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
    )

    d = docs.limit(200)
    got = {tuple(r) for r in minhash_verified_pairs(d, 80).collect()}
    want = {tuple(r) for r in ngram_jaccard_pairs(d, 80).collect()}
    assert got == want and got
    # planted identical clusters exercise the token-set-pair dedup in
    # the verify stage (one exact intersect per distinct set pair)
    base = docs.limit(20).select("doc_id", "text")
    extra = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    dd = base.unionByName(extra)
    got2 = {tuple(r) for r in minhash_verified_pairs(dd, 80).collect()}
    want2 = {tuple(r) for r in ngram_jaccard_pairs(dd, 80).collect()}
    assert got2 == want2 and got2


def test_simhash_verified_pairs_equal_fingerprint_pairs(spark, docs):
    """hamming-0 candidates verified by fingerprint == fingerprint
    self-join pairs (provable: equal normalized text => equal simhash
    => candidate)."""
    from metaprofi_spark.functions.text import fingerprint
    from metaprofi_spark.operators.dedup import simhash_verified_pairs

    base = docs.limit(30).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    d = base.unionByName(planted)
    got = {(r.id_a, r.id_b) for r in simhash_verified_pairs(d).collect()}
    fp = d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    a = fp.selectExpr("doc_id as id_a", "fp as fa")
    b = fp.selectExpr("doc_id as id_b", "fp as fb")
    want = {
        (r.id_a, r.id_b)
        for r in a.join(b, (F.col("fa") == F.col("fb")) & (F.col("id_a") < F.col("id_b"))).collect()
    }
    assert got == want and got


def test_ann_lsh_quantized_rerank_matches_brute_force(spark, embeddings):
    """With enough tables the LSH candidate union covers the true top-k
    and the quantized re-rank is bit-identical to knn_topk_quantized."""
    from metaprofi_spark.operators.similarity import ann_lsh_topk

    got = {tuple(r) for r in ann_lsh_topk(
        embeddings, [0, 1, 2], dim=64, k=5, n_bits=4, n_tables=24, quantized=True
    ).collect()}
    want = {tuple(r) for r in knn_topk_quantized(embeddings, [0, 1, 2], k=5).collect()}
    assert got == want and got


def test_embedding_near_dup_components_equal_closure(spark, embeddings):
    """Embedding LSH components == union-find transitive closure of the
    bucket-sharing pair graph."""
    from metaprofi_spark.operators.similarity import (
        embedding_near_dup_components,
        lsh_bucket_ids,
    )

    emb = embeddings.limit(300)
    comp = {
        r.id: r.comp
        for r in embedding_near_dup_components(emb, dim=64, n_bits=6, n_tables=4).collect()
    }
    b = lsh_bucket_ids(emb, 64, 6, 4)
    a_, b_ = b.alias("a"), b.alias("b")
    pairs = (
        a_.join(
            b_,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
        .distinct()
        .collect()
    )
    parent = {i: i for i in comp}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        rx, ry = find(r.x), find(r.y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    expect = {i: find(i) for i in comp}
    assert comp == expect and comp


def test_drop_embedding_near_duplicates(spark, embeddings):
    """One representative (min id) survives per embedding component."""
    from metaprofi_spark.operators.similarity import (
        drop_embedding_near_duplicates,
        embedding_near_dup_components,
    )

    emb = embeddings.limit(200)
    comp = {r.id: r.comp for r in
            embedding_near_dup_components(emb, 64, 6, 4).collect()}
    kept = {r.vec_id for r in
            drop_embedding_near_duplicates(emb, 64, 6, 4).collect()}
    expect = {min(ids) for c in set(comp.values())
              for ids in [[i for i, cc in comp.items() if cc == c]]}
    assert kept == expect and kept


def test_lsh_bucket_ids_match_numpy_reference(spark, embeddings):
    """The mapInArrow bucket kernel (Arrow-buffer matrix view, one
    matmul for all tables) equals a per-row numpy scalar reference —
    pins the r4 Arrow-buffer rewrite to the r3 semantics."""
    from metaprofi_spark.operators.similarity import _hyperplanes, lsh_bucket_ids

    emb = embeddings.limit(100)
    got = {(r.id, r.table_id, r.bucket) for r in
           lsh_bucket_ids(emb, 64, 6, 3).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    expect = set()
    for t in range(3):
        P = _hyperplanes(64, 6, t)
        for r in rows:
            v = np.asarray(r.embedding, dtype=np.float64)
            signs = (P @ v) > 0
            bucket = int(sum(int(s) << i for i, s in enumerate(signs)))
            expect.add((r.vec_id, t, bucket))
    assert got == expect and got


def test_ivf_assign_matches_numpy_reference(spark, embeddings):
    """The mapInArrow IVF assignment equals per-row numpy argmax."""
    from metaprofi_spark.operators.similarity import ivf_assign, train_ivf_centroids

    emb = embeddings.limit(100)
    C = train_ivf_centroids(emb, n_centroids=8)
    got = {r.id: r.cell for r in ivf_assign(emb, C).collect()}
    expect = {}
    for r in emb.select("vec_id", "embedding").collect():
        v = np.asarray(r.embedding, dtype=np.float64)
        v = v / (np.linalg.norm(v) + 1e-12)
        expect[r.vec_id] = int((C @ v).argmax())
    assert got == expect and got


def test_ann_ivf_verified_matches_brute_force(spark, embeddings):
    """nprobe == n_centroids probes every cell => candidate set is the
    full corpus => quantized re-rank is bit-identical to brute force
    (the ann_ivf_verified gate row's property)."""
    from metaprofi_spark.operators.similarity import ann_ivf_topk

    got = {tuple(r) for r in ann_ivf_topk(
        embeddings, [0, 1, 2], k=5, n_centroids=8, nprobe=8, quantized=True
    ).collect()}
    want = {tuple(r) for r in knn_topk_quantized(embeddings, [0, 1, 2], k=5).collect()}
    assert got == want and got


def test_rerank_broadcast_side_is_filtered(spark, embeddings, tmp_path):
    """The r3 verdict's scale-killer, pinned in the PHYSICAL PLAN: the
    re-rank's broadcast query-vector relation must scan a FILTERED
    parquet relation (PushedFilters on the query ids), never the whole
    corpus.  Fresh parquet path — a cached read would satisfy any scan
    (conftest cache-poisoning note)."""
    p = str(tmp_path / "emb_plan")
    embeddings.write.parquet(p)
    emb = spark.read.parquet(p)
    from metaprofi_spark.operators.similarity import ann_lsh_topk

    res = ann_lsh_topk(emb, [0, 1, 2], dim=64, k=5, n_bits=4, n_tables=4,
                       quantized=True)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(vec_id, [0,1,2" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_ivf_store_roundtrip_and_exactness(spark, embeddings, tmp_path):
    """Persisted IVF store: nprobe == n_centroids + quantized scoring
    equals a driver-side numpy oracle over ALL vectors (external query
    vectors, no self-exclusion)."""
    from metaprofi_spark.operators.similarity import (
        ann_ivf_search_store,
        persist_ivf,
    )

    from metaprofi_spark.operators.similarity import ivf_assign

    path = str(tmp_path / "ivfstore")
    emb = embeddings.limit(300)
    C = persist_ivf(emb, path, n_centroids=8)
    # the one-pass persist kernel's cells == the standalone assigner
    stored = {r.vec_id: r.cell for r in
              spark.read.parquet(path + "/cells").collect()}
    assigned = {r.id: r.cell for r in ivf_assign(emb, C).collect()}
    assert stored == assigned and stored
    rows = emb.select("vec_id", "embedding").collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows[:3]]
    got = {tuple(r) for r in ann_ivf_search_store(
        spark, path, queries, k=5, nprobe=8, quantized=True
    ).collect()}
    ids = np.array([r.vec_id for r in rows])
    Q = np.array([np.round(np.asarray(r.embedding, dtype=np.float64) * 1000)
                  for r in rows]).astype(np.int64)
    expect = set()
    for qid, _ in queries:
        qv = Q[ids == qid][0]
        dots = Q @ qv
        order = np.lexsort((ids, -dots))[:5]
        for i in order:
            expect.add((qid, int(ids[i]), int(dots[i])))
    assert got == expect and got


def test_ivf_store_scan_prunes_cell_partitions(spark, embeddings, tmp_path):
    """The store search's physical plan reads ONLY the probed cell
    partitions (PartitionFilters on the cell partition column) — the
    nprobe/n_centroids scan-fraction law made physical."""
    from metaprofi_spark.operators.similarity import (
        ann_ivf_search_store,
        persist_ivf,
    )

    path = str(tmp_path / "ivfplan")
    persist_ivf(embeddings.limit(300), path, n_centroids=8)
    r0 = embeddings.orderBy("vec_id").first()
    res = ann_ivf_search_store(
        spark, path, [(0, list(r0.embedding))], k=5, nprobe=2
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    assert res.count() == 5


def test_ivf_store_recall_vs_brute_force(spark, embeddings, tmp_path):
    """Partial-probe recall against the store's own full-probe truth."""
    from metaprofi_spark.operators.similarity import (
        ann_ivf_search_store,
        persist_ivf,
    )

    path = str(tmp_path / "ivfrecall")
    persist_ivf(embeddings, path, n_centroids=16)
    rows = embeddings.orderBy("vec_id").limit(5).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows]
    full = ann_ivf_search_store(spark, path, queries, k=10, nprobe=16).collect()
    part = ann_ivf_search_store(spark, path, queries, k=10, nprobe=6).collect()
    fset, pset = {}, {}
    for r in full:
        fset.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in part:
        pset.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(fset[q] & pset.get(q, set())) / 10 for q in fset]
    assert float(np.mean(recalls)) >= 0.5, recalls


def test_repetition_stats_planted_values(spark):
    """Hand-computed repetition signals on planted docs."""
    from metaprofi_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a b a b"), (2, "x"), (3, ""), (4, "p q  p Q")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.top_token_count,
                      r.top_bigram_count)
           for r in repetition_stats(df).collect()}
    assert got == {
        1: (5, 3, 3, 2),   # toks a,a,b,a,b; top tok a=3; top bigram 'a b'=2
        2: (1, 0, 1, 0),   # single token: no bigrams
        3: (0, 0, 0, 0),   # empty text
        4: (4, 2, 2, 2),   # lowercased p,q,p,q — empties filtered BEFORE
                           # adjacency, so 'p q' occurs twice
    }


def test_repetition_stats_plan_is_jvm_only(spark):
    """No Python stage anywhere: tokenize/explode/agg are all JVM
    (BatchEvalPython/ArrowEvalPython absent from the physical plan)."""
    from metaprofi_spark.functions.text import repetition_stats
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_ivf_store_update_matches_rebuild(spark, embeddings, tmp_path):
    """update_ivf (incremental append to a persisted IVF store): an
    updated store answers full-probe searches IDENTICALLY to a store
    rebuilt from scratch over the union with the SAME centroids (the
    coarse quantizer is immutable under appends), a replayed named
    segment is an exactly-once no-op, a crashed append's orphan dir is
    invisible, and the probed scan still prunes cell partitions."""
    from metaprofi_spark.operators.similarity import (
        ann_ivf_search_store,
        load_ivf,
        persist_ivf,
        update_ivf,
    )

    first = embeddings.filter(F.col("vec_id") < 300)
    rest = embeddings.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 500)
    )
    up, full = str(tmp_path / "ivf_up"), str(tmp_path / "ivf_full")
    cents = persist_ivf(first, up, n_centroids=8)
    m = update_ivf(rest, up)
    assert m["segments"] == ["cells", "cells_u1"] and m["update_count"] == 1
    persist_ivf(
        embeddings.filter(F.col("vec_id") < 500), full, centroids=cents
    )
    qs = [
        (int(r.vec_id), list(r.embedding))
        for r in embeddings.filter(F.col("vec_id") < 3).collect()
    ]
    res_up = {
        (r.query_id, r.neighbor_id, r.dot)
        for r in ann_ivf_search_store(
            spark, up, qs, k=5, nprobe=8, quantized=True
        ).collect()
    }
    res_full = {
        (r.query_id, r.neighbor_id, r.dot)
        for r in ann_ivf_search_store(
            spark, full, qs, k=5, nprobe=8, quantized=True
        ).collect()
    }
    assert res_up == res_full and res_up
    # appended vectors are actually retrievable
    q300 = embeddings.filter(F.col("vec_id") == 300).first()
    hit = ann_ivf_search_store(
        spark, up, [(300, list(q300.embedding))], k=1, nprobe=8
    ).first()
    assert hit.neighbor_id == 300
    # exactly-once replay by name
    n_before = load_ivf(spark, up)[0].count()
    m2 = update_ivf(rest, up, segment_name="cells_u1")
    assert m2["update_count"] == 1
    assert load_ivf(spark, up)[0].count() == n_before
    # dim-mismatch guard
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(999, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="dim"):
        update_ivf(bad, up)
    # crashed append (data written, manifest not): orphan is invisible
    import shutil

    shutil.copytree(f"{up}/cells_u1", f"{up}/cells_u9")
    assert load_ivf(spark, up)[0].count() == n_before
    # probed scan still prunes partitions on the updated store
    res = ann_ivf_search_store(spark, up, qs[:1], k=3, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
