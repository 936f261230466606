"""FASTA / FASTQ record sources — S2/S3 of SURVEY.md §2.

The reference streams records with pyfastx
(/root/reference/metaprofi/lib/utilities.py:508-523).  Spark-first:

* FASTA: ``spark.read.text(lineSep=">")`` — one row per record, split
  header from sequence lines JVM-side.  Scales: the file splits on the
  record delimiter, so a 1 TB FASTA fans out across executors.
* FASTQ: 4-line records can't be split safely on a delimiter (``@``
  also starts quality lines), so files are parsed whole per task via
  ``binaryFiles`` + an Arrow-batched parser — correct everywhere,
  parallel across FILES (the common multi-file layout at scale).

Both normalize sequences to uppercase at read, matching the
reference (lmdb_faq_index.py:122, search_index.py:106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame(name string, seq string) from FASTA file(s)."""
    recs = (
        spark.read.option("lineSep", ">").text(path)
        .select(F.trim(F.col("value")).alias("rec"))
        .filter(F.col("rec") != "")
    )
    name = F.substring_index(F.col("rec"), "\n", 1)
    seq = F.upper(
        F.regexp_replace(
            F.expr("substring(rec, instr(rec, '\n') + 1)"), r"\s+", ""
        )
    )
    return recs.filter(F.instr(F.col("rec"), "\n") > 0).select(
        F.trim(name).alias("name"), seq.alias("seq")
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame(name string, seq string, qual string) from FASTQ files.

    Whole-file parse per task (safe for the 4-line format); parallelism
    across files.
    """
    import pandas as pd

    def _decompress(raw: bytes) -> bytes:
        """gzip/zstd payloads sniffed by magic (the reference reads
        compressed FASTQ, utilities.py:508-523); zstd gated behind an
        import-try since the codec lib may be absent."""
        if raw[:2] == b"\x1f\x8b":
            import gzip

            return gzip.decompress(raw)
        if raw[:4] == b"\x28\xb5\x2f\xfd":
            try:
                import zstandard
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "zstd-compressed FASTQ needs the zstandard package"
                ) from e
            return zstandard.ZstdDecompressor().decompress(raw)
        return raw

    def parse(iterator):
        for pdf in iterator:
            names, seqs, quals = [], [], []
            for content in pdf["content"]:
                lines = _decompress(bytes(content)).decode("utf-8").splitlines()
                for i in range(0, len(lines) - 3, 4):
                    if not lines[i].startswith("@"):
                        raise ValueError(f"malformed FASTQ near line {i}")
                    names.append(lines[i][1:].strip())
                    seqs.append(lines[i + 1].strip().upper())
                    quals.append(lines[i + 3].strip())
            yield pd.DataFrame({"name": names, "seq": seqs, "qual": quals})

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse, "name string, seq string, qual string")
