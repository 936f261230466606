"""Deterministic pages source: FIXTURES.md §1 invariants + end-to-end
lang-scoped membership on the north-rule input shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from metaprofi_spark import SketchConfig
from metaprofi_spark.operators import build_index, build_matrix, search
from metaprofi_spark.sources.pages import (
    N_HOSTS,
    extract_text,
    doc_id_from_url,
    generate_pages,
)

CFG = SketchConfig(k=12, h=2, m=1 << 16, chunk_bits=1 << 16, slice_buckets=16)


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 2000, partitions=8).cache()


def test_schema_and_determinism(spark, pages):
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    # regenerating with different partitioning yields identical rows
    again = {
        r.url: (r.text, r.lang, r.warc_ts)
        for r in generate_pages(spark, 2000, partitions=3).collect()
    }
    for r in pages.collect():
        assert again[r.url] == (r.text, r.lang, r.warc_ts), r.url
    assert len(again) == 2000


def test_extract_text_invariant(pages):
    """extract_text(html) == text byte-identically per url (the driver
    invariant, FIXTURES.md §1)."""
    for r in pages.limit(500).collect():
        assert extract_text(bytes(r.html)) == r.text.encode("utf-8"), r.url


def test_zipf_host_skew(pages):
    """A few hosts dominate (exercises explicit skew handling)."""
    hosts = (
        pages.select(F.regexp_extract("url", r"host(\d+)", 1).alias("h"))
        .groupBy("h").count().collect()
    )
    counts = sorted((r["count"] for r in hosts), reverse=True)
    assert counts[0] > 5 * np.median(counts)
    assert len(hosts) <= N_HOSTS


def test_short_doc_pruning(spark, pages):
    """Docs shorter than k are pruned before the kernel (the
    length(text) >= k early filter, zarrstore.py:137-145 analog)."""
    docs = pages.limit(20).withColumn(
        "doc_id", F.substring_index(F.col("url"), "/", -1).cast("long")
    ).select("doc_id", "text")
    planted = docs.unionByName(
        spark.createDataFrame([(999999, "tiny")], "doc_id long, text string")
    )
    bf = build_matrix(planted, CFG)
    assert bf.filter(F.col("sample_idx") == 999999).count() == 0
    assert bf.count() > 0


def test_lang_scoped_membership_on_pages(spark, pages):
    """North-star query on the north-rule input shape, with doc_id
    densified from the url."""
    docs = pages.withColumn(
        "doc_id", F.substring_index(F.col("url"), "/", -1).cast("long")
    )
    idx = build_index(build_matrix(docs, CFG), CFG, sample_bucket_size=512)
    # take a k-gram from a known en page
    target = docs.filter(
        (F.col("lang") == "en") & (F.octet_length("text") > 8 * CFG.k)
    ).first()
    probe = target.text[10 : 10 + 3 * CFG.k]
    cand = search(spark, idx, [("q", probe)], CFG, 100, 512)
    joined = cand.join(docs, cand.sample_idx == docs.doc_id)
    scoped = joined.filter(F.col("lang") == "en").filter(
        F.instr(F.lower("text"), probe.lower()) > 0
    )
    got = {r.doc_id for r in scoped.collect()}
    assert target.doc_id in got  # zero false negatives through scoping
    # oracle: exhaustive scan
    expect = {
        r.doc_id
        for r in docs.filter(
            (F.col("lang") == "en") & (F.instr(F.lower("text"), probe.lower()) > 0)
        ).collect()
    }
    assert got == expect


def test_doc_id_from_url():
    assert doc_id_from_url("https://host001.example.com/doc/00001234") == 1234
