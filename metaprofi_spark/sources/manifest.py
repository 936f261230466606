"""Input-manifest scan — S1/F1/F2 of SURVEY.md §2.

The reference parses `sample_id: path; path` lines, dropping comments
and blanks and validating identifiers
(/root/reference/metaprofi/lib/zarrstore.py:100-215).  Here the scan is
a DataFrame job: spark.read.text + filters, erroring on malformed rows
exactly like the reference's validation raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# forbidden characters in sample ids (zarrstore.py:105-129 semantics)
_ID_OK = r"^[A-Za-z0-9_.\-]+$"


def parse_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Returns DataFrame(sample_id string, paths array<string>).

    Raises ValueError on malformed lines (not exactly one ':', bad id) —
    fail-fast like the reference rather than silently dropping data.
    """
    lines = (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("line"))
        .filter(~F.col("line").rlike(r"^\s*(#.*)?$"))  # F1: comments/blanks
    )
    parsed = lines.select(
        "line",
        F.size(F.split(F.col("line"), ":")).alias("n_colon_parts"),
        F.trim(F.substring_index(F.col("line"), ":", 1)).alias("sample_id"),
        F.transform(
            F.split(F.substring_index(F.col("line"), ":", -1), ";"),
            lambda p: F.trim(p),
        ).alias("paths"),
    )
    bad = parsed.filter(
        (F.col("n_colon_parts") != 2) | ~F.col("sample_id").rlike(_ID_OK)
    )
    bad_rows = bad.limit(5).collect()
    if bad_rows:  # F2 validation
        raise ValueError(
            "malformed manifest lines: " + "; ".join(r.line for r in bad_rows)
        )
    return parsed.select("sample_id", "paths")


def sniff_format(first_bytes: bytes) -> str:
    """S4 magic-byte sniffing (utilities.py:405-429): gzip / fasta /
    fastq / unknown.  Spark decodes .gz transparently; this is for
    dispatching record parsers."""
    if first_bytes[:2] == b"\x1f\x8b":
        return "gzip"
    if first_bytes[:1] == b">":
        return "fasta"
    if first_bytes[:1] == b"@":
        return "fastq"
    return "unknown"
