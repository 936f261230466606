"""Benchmark decontamination (operators/decontam.py) and deterministic
stratified sampling (operators/sampling.py)."""

import hashlib

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window

from metaprofi_spark.operators.decontam import (
    contamination_report,
    drop_contaminated,
    ngram_rows,
    word_ngrams,
)
from metaprofi_spark.operators.sampling import rank_key, stratified_sample

SF_DIR = "/root/testdata/sf0.001"


def _grams_py(text, n):
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _ngram_list(text, n):
    """Ordered oracle twin of word_ngrams (regex \\s+ split, empties
    dropped, lowercase) — str.split() without args == split on \\s+
    runs with empties removed."""
    toks = [t for t in text.lower().split() if t]
    return [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))]


class TestDecontam:
    def test_word_ngrams_matches_python(self, spark):
        texts = [
            "The quick  Brown fox jumps",
            "one two",            # shorter than n=3 -> empty, not a
            "single",             # descending-sequence artifact
            "",
            "a b c",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = df.select(
            "doc_id", word_ngrams(F.col("text"), 3).alias("g")
        ).collect()
        for r in rows:
            assert set(r["g"]) == _grams_py(texts[r["doc_id"]], 3)

    def test_contamination_report_matches_python(self, spark):
        corpus_texts = {
            1: "alpha beta gamma delta",
            2: "beta gamma delta epsilon",
            3: "nothing shared here at all",
            4: "alpha beta gamma alpha beta gamma",  # dup grams count once
        }
        bench_texts = {100: "alpha beta gamma", 101: "gamma delta epsilon"}
        corpus = spark.createDataFrame(
            list(corpus_texts.items()), "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            list(bench_texts.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["n_hits"]
            for r in contamination_report(corpus, bench, n=3).collect()
        }
        bench_grams = set().union(
            *(_grams_py(t, 3) for t in bench_texts.values())
        )
        want = {
            i: len(_grams_py(t, 3) & bench_grams)
            for i, t in corpus_texts.items()
            if _grams_py(t, 3) & bench_grams
        }
        assert got == want
        cleaned = {
            r["doc_id"]
            for r in drop_contaminated(corpus, bench, n=3).collect()
        }
        assert cleaned == set(corpus_texts) - set(want)

    @given(
        st.lists(
            st.lists(st.sampled_from(["aa", "bb", "cc", "", "d e"]), max_size=8),
            min_size=1, max_size=10,
        ),
        st.integers(2, 4),
    )
    @settings(max_examples=25, deadline=None)
    def test_word_ngrams_hypothesis(self, spark, docs_toks, n):
        """Random token lists (including empties and tokens containing
        spaces — the join/split asymmetry trap): word_ngrams == the
        python oracle for every doc and every n."""
        texts = ["  ".join(toks) for toks in docs_toks]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = df.select(
            "doc_id", word_ngrams(F.col("text"), n).alias("g")
        ).collect()
        for r in rows:
            assert list(r["g"]) == _ngram_list(texts[r["doc_id"]], n), (
                r["doc_id"], n
            )

    def test_indexed_tier_equals_direct_instr(self, spark):
        """Index prefilter + instr verify == brute-force instr over the
        whole corpus (zero false negatives at t=100; false positives
        removed by the verify)."""
        from metaprofi_spark.config import SketchConfig
        from metaprofi_spark.operators import build_index, build_matrix
        from metaprofi_spark.operators.decontam import (
            benchmark_grams,
            contamination_report_indexed,
        )

        cfg = SketchConfig(
            k=8, h=2, m=1 << 16, chunk_bits=1 << 14, slice_buckets=8
        )
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        is_bench = F.col("doc_id") % 10 == 3
        corpus = docs.filter(~is_bench).select("doc_id", "text")
        idx = build_index(
            build_matrix(corpus, cfg, id_col="doc_id", text_col="text"),
            cfg, sample_bucket_size=256,
        )
        grams = benchmark_grams(docs.filter(is_bench), 3, cfg.k)
        assert grams
        got = {
            (r["doc_id"], r["n_hits"])
            for r in contamination_report_indexed(
                spark, idx, corpus, grams, cfg, 256
            ).collect()
        }
        gdf = spark.createDataFrame([(g,) for g in grams], "gram string")
        want = {
            (r["doc_id"], r["n_hits"])
            for r in corpus.crossJoin(F.broadcast(gdf))
            .filter(F.instr(F.lower(F.col("text")), F.col("gram")) > 0)
            .groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("n_hits"))
            .collect()
        }
        assert got == want and got

    def test_report_shuffles_only_on_doc_id(self, spark):
        """The benchmark side must be broadcast: the corpus-side plan
        has exactly ONE Exchange (the partial-agg count on id), no
        sort-merge join of corpus grams against benchmark grams."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rep = contamination_report(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            n=3,
        )
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestStratifiedSample:
    def _docs(self, spark):
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def test_two_phase_equals_single_window(self, spark):
        docs = self._docs(spark)
        got = {
            (r["doc_id"], r["lang"])
            for r in stratified_sample(
                docs, ["lang"], 7, "doc_id", seed=3
            ).select("doc_id", "lang").collect()
        }
        w = Window.partitionBy("lang").orderBy(
            rank_key("doc_id", 3), "doc_id"
        )
        want = {
            (r["doc_id"], r["lang"])
            for r in docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 7)
            .select("doc_id", "lang")
            .collect()
        }
        assert got == want and len(got) > 0

    def test_quota_and_subset(self, spark):
        docs = self._docs(spark)
        sample = stratified_sample(docs, ["lang"], 5, "doc_id", seed=1)
        counts = {
            r["lang"]: r["n"]
            for r in sample.groupBy("lang").agg(
                F.count("*").alias("n")
            ).collect()
        }
        sizes = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert counts == {g: min(5, n) for g, n in sizes.items()}
        # sampled rows are real input rows (ids and langs agree)
        assert sample.join(
            docs.select("doc_id", "lang"), ["doc_id", "lang"], "left_anti"
        ).count() == 0

    def test_deterministic_across_partitioning(self, spark):
        docs = self._docs(spark)
        a = {
            r["doc_id"]
            for r in stratified_sample(docs, ["lang"], 9, seed=5).collect()
        }
        b = {
            r["doc_id"]
            for r in stratified_sample(
                docs.repartition(13), ["lang"], 9, seed=5
            ).collect()
        }
        assert a == b

    def test_budget_sample_covers_budget_minimally(self, spark):
        """Kept docs' tokens reach the budget wherever the stratum can
        (coverage), and dropping the hash-LAST kept doc falls below it
        (minimality) — per stratum."""
        from metaprofi_spark.functions.text import token_count
        from metaprofi_spark.operators.sampling import budget_sample, rank_key

        docs = self._docs(spark).select("doc_id", "text", "lang")
        budget = 1500
        kept = budget_sample(docs, ["lang"], budget, seed=3).select(
            "doc_id", "lang",
            token_count(F.col("text")).cast("long").alias("nt"),
            rank_key("doc_id", 3).alias("rk"),
        )
        totals = {
            r["lang"]: (r["t"], r["n"])
            for r in docs.groupBy("lang")
            .agg(
                F.sum(token_count(F.col("text")).cast("long")).alias("t"),
                F.count("*").alias("n"),
            )
            .collect()
        }
        rows = kept.collect()
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        assert set(by_lang) == set(totals)
        for lang, rs in by_lang.items():
            s = sum(r["nt"] for r in rs)
            total_toks, total_docs = totals[lang]
            if total_toks >= budget:
                assert s >= budget, lang
                last = max(rs, key=lambda r: (r["rk"], r["doc_id"]))
                assert s - last["nt"] < budget, lang
            else:
                assert len(rs) == total_docs, lang  # whole stratum kept

    @given(
        st.lists(
            st.tuples(
                st.integers(0, 300),      # id
                st.integers(0, 2),        # stratum
                st.integers(0, 6),        # token count
            ),
            max_size=40, unique_by=lambda t: t[0],
        ),
        st.integers(1, 12),
    )
    @settings(max_examples=20, deadline=None)
    def test_budget_sample_matches_python_oracle(self, spark, rows, budget):
        """Random (id, stratum, n_tokens): budget_sample == the python
        prefix-sum oracle, including zero-token docs (kept for free
        while budget remains) and strata below the budget."""
        from metaprofi_spark.operators.sampling import budget_sample

        if not rows:
            return
        df = spark.createDataFrame(
            [(i, str(g), " ".join(["tok"] * nt)) for i, g, nt in rows],
            "doc_id long, lang string, text string",
        )
        got = {
            r["doc_id"]
            for r in budget_sample(df, ["lang"], budget, seed=2).collect()
        }
        by_g: dict = {}
        for i, g, nt in rows:
            key = hashlib.md5(f"2:{i}".encode()).hexdigest()
            by_g.setdefault(str(g), []).append((key, i, nt))
        want = set()
        for g, ks in by_g.items():
            cum = 0
            for _, i, nt in sorted(ks):
                if cum < budget:
                    want.add(i)
                cum += nt
        assert got == want

    def test_budget_sample_equals_window_twin_both_scales(self, spark):
        """The scalable bucket-refinement plan == the single-window
        exact twin, row-set identical, at sf0.01 AND sf0.1 (the r5
        verdict's equality gate for retiring the single-reducer plan),
        across prefix_len granularities (16 / 256 buckets)."""
        from metaprofi_spark.operators.sampling import (
            budget_sample,
            budget_sample_window,
        )

        for sf in ("sf0.01", "sf0.1"):
            docs = spark.read.parquet(
                f"/root/testdata/{sf}/documents.parquet"
            ).select("doc_id", "text", "lang")
            for budget in (1, 1500, 10**9):
                want = {
                    (r["doc_id"], r["lang"])
                    for r in budget_sample_window(
                        docs, ["lang"], budget, seed=3
                    ).collect()
                }
                for plen in (1, 2):
                    got = {
                        (r["doc_id"], r["lang"])
                        for r in budget_sample(
                            docs, ["lang"], budget, seed=3, prefix_len=plen
                        ).collect()
                    }
                    assert got == want, (sf, budget, plen)

    def test_budget_sample_plan_has_no_full_stratum_window(self, spark):
        """Scale pin: every Window in the scalable plan partitions by
        (strata, _pb) — one hash-range bucket, never a whole stratum
        through one reducer (the r5 verdict's perf-weak item)."""
        import re

        from metaprofi_spark.operators.sampling import budget_sample

        docs = self._docs(spark).select("doc_id", "text", "lang")
        plan = (
            budget_sample(docs, ["lang"], 1500, seed=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        windows = re.findall(r"Window \[.*?windowspecdefinition\([^)]*\)", plan)
        assert windows, plan  # the boundary bucket does use a window
        for w in windows:
            assert "_pb" in w, w  # ...partitioned by the hash bucket

    def test_curate_corpus_composition(self, spark):
        """curate_corpus == clean_corpus -> drop_contaminated ->
        stratified_sample, stage for stage, with monotone stats."""
        from metaprofi_spark.operators.decontam import drop_contaminated
        from metaprofi_spark.operators.sampling import stratified_sample
        from metaprofi_spark.pipelines import clean_corpus, curate_corpus

        docs = self._docs(spark).select("doc_id", "text", "lang")
        bench = docs.filter(F.col("doc_id") % 10 == 3)
        corpus = docs.filter(F.col("doc_id") % 10 != 3)
        sample, stats = curate_corpus(
            corpus, bench, ["lang"], 5, decontam_n=3, seed=11
        )
        got = {r["doc_id"] for r in sample.collect()}
        cleaned, _ = clean_corpus(corpus, with_stats=False)
        want = {
            r["doc_id"]
            for r in stratified_sample(
                drop_contaminated(cleaned, bench, n=3), ["lang"], 5,
                seed=11,
            ).collect()
        }
        assert got == want and got
        assert (
            stats["n_input"]
            >= stats["n_after_exact_dedup"]
            >= stats["n_after_near_dedup"]
            >= stats["n_after_quality"]
            >= stats["n_after_decontam"]
            >= stats["n_sampled"]
            == len(got)
        )

    @given(
        st.lists(
            st.tuples(st.integers(0, 400), st.integers(0, 4)),
            max_size=60, unique_by=lambda t: t[0],
        ),
        st.integers(1, 6),   # quota
        st.integers(1, 5),   # salt groups
        st.integers(0, 3),   # seed
    )
    @settings(max_examples=25, deadline=None)
    def test_two_phase_matches_python_oracle(
        self, spark, rows, n, salt, seed
    ):
        """Random (id, stratum) sets, quotas, salts, seeds: the
        two-phase sample == a pure-python per-stratum sort on
        (md5 key, id) — pins the superset guarantee (including empty
        strata, quota > stratum size, salt > #rows)."""
        from metaprofi_spark.operators.sampling import stratified_sample

        if not rows:
            return
        df = spark.createDataFrame(
            [(i, str(g)) for i, g in rows], "doc_id long, lang string"
        )
        got = {
            (r["doc_id"], r["lang"])
            for r in stratified_sample(
                df, ["lang"], n, "doc_id", seed=seed, salt=salt
            ).collect()
        }
        by_g: dict = {}
        for i, g in rows:
            key = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            by_g.setdefault(str(g), []).append((key, i))
        want = {
            (i, g)
            for g, ks in by_g.items()
            for _, i in sorted(ks)[:n]
        }
        assert got == want

    def test_cli_curate_rejects_nonpositive_quota(self, tmp_path):
        """--per-stratum 0 must be an argparse usage error (exit 2),
        not a silent fall-through into the token-budget branch."""
        from metaprofi_spark.__main__ import main

        for flag in ("--per-stratum", "--token-budget"):
            with pytest.raises(SystemExit) as e:
                main([
                    "curate", "--input", "x.parquet", "--output",
                    str(tmp_path / "o"), flag, "0",
                ])
            assert e.value.code == 2, flag

    def test_cli_curate_end_to_end(self, spark, tmp_path, capsys):
        """`python -m metaprofi_spark curate` == the library pipeline,
        in both quota modes, with stats on stdout."""
        import json

        from metaprofi_spark.__main__ import main
        from metaprofi_spark.operators.decontam import drop_contaminated
        from metaprofi_spark.operators.sampling import stratified_sample
        from metaprofi_spark.pipelines import clean_corpus

        docs = self._docs(spark).select("doc_id", "text", "lang")
        corpus_p = str(tmp_path / "corpus.parquet")
        bench_p = str(tmp_path / "bench.parquet")
        out_p = str(tmp_path / "out.parquet")
        docs.filter(F.col("doc_id") % 10 != 3).write.parquet(corpus_p)
        docs.filter(F.col("doc_id") % 10 == 3).write.parquet(bench_p)
        rc = main([
            "curate", "--input", corpus_p, "--output", out_p,
            "--benchmark", bench_p, "--strata", "lang",
            "--per-stratum", "4", "--seed", "9",
        ])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        got = {r["doc_id"] for r in spark.read.parquet(out_p).collect()}
        cleaned, _ = clean_corpus(
            spark.read.parquet(corpus_p), with_stats=False
        )
        want = {
            r["doc_id"]
            for r in stratified_sample(
                drop_contaminated(
                    cleaned, spark.read.parquet(bench_p), n=3
                ),
                ["lang"], 4, seed=9,
            ).collect()
        }
        assert got == want and got
        assert stats["n_sampled"] == len(got)
        assert stats["n_input"] >= stats["n_after_decontam"] >= len(got)

    def test_seed_changes_sample(self, spark):
        docs = self._docs(spark)
        a = {r["doc_id"] for r in stratified_sample(docs, ["lang"], 9, seed=5).collect()}
        c = {r["doc_id"] for r in stratified_sample(docs, ["lang"], 9, seed=6).collect()}
        assert a != c  # 2^-128-ish collision odds; a failure means the
        # seed is not reaching the rank key
