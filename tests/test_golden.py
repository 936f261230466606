"""Golden end-to-end test — mirrors the reference's committed query
result files (benchmarks/tara_oceans_index/metaprofi_query_results-*.txt):
deterministic pages corpus -> build index -> fixed query workbook ->
compare to the committed golden JSON (tests/data/golden_workbook.json).

Regenerate (after an INTENTIONAL semantic change only):
    PYTHONPATH=. REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from metaprofi_spark import SketchConfig
from metaprofi_spark.operators import build_index, build_matrix, search
from metaprofi_spark.sources.pages import generate_pages

CFG = SketchConfig(k=12, h=2, m=1 << 16, chunk_bits=1 << 16, slice_buckets=16)
BUCKET = 512
N_DOCS = 2000
GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_workbook.json")


def _workbook(docs_rows):
    """Fixed query set: positive spans from known docs + decoys."""
    queries, thresholds = [], {}
    for i, r in enumerate(docs_rows):
        span = r.text[7 : 7 + 5 * CFG.k]
        qid = f"pos{i}"
        queries.append((qid, span))
        thresholds[qid] = 100
    for i, decoy in enumerate(["@@##$$%%^^&&**((", "zzzz####yyyy@@@@", "qqq|||www~~~eee"]):
        qid = f"neg{i}"
        queries.append((qid, decoy))
        thresholds[qid] = 100
    queries.append(("mix0", docs_rows[0].text[: 4 * CFG.k] + " @@@@@@@@@@@@"))
    thresholds["mix0"] = 40
    return queries, thresholds


def test_golden_workbook(spark):
    pages = generate_pages(spark, N_DOCS, partitions=8).withColumn(
        "doc_id", F.substring_index(F.col("url"), "/", -1).cast("long")
    ).cache()
    idx = build_index(build_matrix(pages, CFG), CFG, sample_bucket_size=BUCKET).cache()
    docs_rows = (
        pages.filter(F.octet_length("text") > 8 * CFG.k).orderBy("doc_id").limit(5).collect()
    )
    queries, thresholds = _workbook(docs_rows)

    results = {}
    for t in sorted({*thresholds.values()}):
        qs = [(q, text) for q, text in queries if thresholds[q] == t]
        res = search(spark, idx, qs, CFG, t, BUCKET).collect()
        for r in res:
            results.setdefault(r.query_id, []).append(
                [int(r.sample_idx), int(r.kgram_hits), int(r.n_kgrams)]
            )
    for q in results:
        results[q].sort()

    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        pytest.skip("golden regenerated")

    with open(GOLDEN) as f:
        golden = json.load(f)
    assert results == golden
    # structural sanity pinned alongside the bytes:
    for i in range(5):
        qid = f"pos{i}"
        assert any(s == docs_rows[i].doc_id for s, _, _ in results.get(qid, [])), qid
