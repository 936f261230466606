"""Deterministic synthetic `pages` table (FIXTURES.md §1 shape).

Iceberg-shaped Common-Crawl-style web pages:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Fully deterministic per doc id (seed=42, PCG64(42*2^32 + i)) and
generated DISTRIBUTED (mapInPandas over spark.range) — no driver loop,
so the generator itself scales with the cluster.  Host assignment is
Zipf(alpha~1.2) over 100 hosts, so a few hosts are heavily skewed —
the fixture that exercises explicit salting.

``extract_text`` is the FROZEN pure function html -> text; the per-row
invariant ``extract_text(html) == text`` (byte-identical per url) is
pinned by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
N_HOSTS = 100
ZIPF_ALPHA = 1.2
VOCAB_SIZE = 50_000
LANGS = ["en", "de", "fr", "es", "ru"]
LANG_P = [0.6, 0.15, 0.1, 0.1, 0.05]
_LANG_CDF = np.cumsum(LANG_P)

_HTML_PREFIX = b"<html><head><title>doc %d</title></head><body><p>"
_HTML_SUFFIX = b"</p></body></html>"

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _vocab() -> np.ndarray:
    return np.array([f"w{j:05d}" for j in range(VOCAB_SIZE)], dtype=object)


def _zipf_host_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, N_HOSTS + 1) ** ZIPF_ALPHA
    return np.cumsum(w / w.sum())


def _gen_rows(ids: np.ndarray, vocab: np.ndarray, host_cdf: np.ndarray) -> pd.DataFrame:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    for i in ids:
        rng = np.random.Generator(np.random.PCG64(SEED * (1 << 32) + int(i)))
        length = int(np.clip(rng.lognormal(5.0, 1.0), 0, 4000))
        toks = vocab[rng.integers(0, VOCAB_SIZE, length)] if length else []
        text = " ".join(toks)
        host = int(np.searchsorted(host_cdf, rng.random()))
        lang = LANGS[int(np.searchsorted(_LANG_CDF, rng.random()))]
        urls.append(f"https://host{host:03d}.example.com/doc/{int(i):08d}")
        tss.append(base_ts + np.timedelta64(int(i), "s"))
        htmls.append((_HTML_PREFIX % int(i)) + text.encode("utf-8") + _HTML_SUFFIX)
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def generate_pages(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n_docs`` rows."""
    parts = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    vocab = _vocab()
    host_cdf = _zipf_host_cdf()

    def fn(batches):
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy(), vocab, host_cdf)

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(fn, PAGES_SCHEMA)


def extract_text(html: bytes) -> bytes:
    """FROZEN extraction: strip the fixed wrapper.  Must stay
    byte-identical per url forever (the driver invariant)."""
    start = html.index(b"<p>") + 3
    end = html.rindex(b"</p>")
    return html[start:end]


def doc_id_from_url(url: str) -> int:
    return int(url.rsplit("/", 1)[1])
