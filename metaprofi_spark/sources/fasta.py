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
    """DataFrame(name string, seq string) from FASTA file(s).

    Split boundary at scale: an UNCOMPRESSED FASTA splits on the ``>``
    record delimiter, so one multi-GB file fans out across executors.
    A gzip member is not splittable (Hadoop gzip codec): a single
    multi-GB ``.fa.gz`` is read by ONE task.  Parallelism over
    compressed inputs comes from the FILE axis — many ``.fa.gz`` files
    read in parallel (pinned by test) — which is the common layout at
    scale; the reference has the same constraint and works around it
    with an indexed_gzip sidecar (utilities.py:508-523), out of scope
    here.  Prefer bgzip-chunked or uncompressed inputs for single huge
    files."""
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


def translate_six_frames_df(
    df, id_col: str = "name", seq_col: str = "seq", min_len: int = 1
):
    """Build-side six-frame translation — the reference's
    `translate_fasta` step (translate_fasta.py:28-99) as a DataFrame
    transform: each nucleotide row explodes into its >= min_len
    translated frames, keyed (id, frame_id, seq).

    Feed the output to `api.build_grouped(group_col=id_col,
    text_col="seq", cfg(sequence_type="aminoacid"))` so all frames of
    one input sequence OR-merge into ONE sample's filter — then
    `search(seq_type="nucleotide")` queries translate symmetrically and
    match regardless of strand/frame, the reference's protein-store
    workflow end-to-end.

    Translation runs in an Arrow-batched pandas iterator over the
    base-5 LUT kernel (kernels/bio.py translate: one vectorized numpy
    gather per frame, no per-codon python — r4 replaced the earlier
    per-frame dict loop).
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    from metaprofi_spark.kernels.bio import six_frame_frames

    out_schema = f"{id_col} string, frame_id string, seq string"

    def fn(batches):
        for pdf in batches:
            ids, frames, seqs = [], [], []
            for name, seq in zip(pdf[id_col], pdf[seq_col]):
                for fid, frame in six_frame_frames(seq, str(name), min_len).items():
                    ids.append(str(name))
                    frames.append(fid)
                    seqs.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_id": frames, "seq": seqs})

    return df.select(
        F.col(id_col).cast("string").alias(id_col), F.col(seq_col).alias(seq_col)
    ).mapInPandas(fn, out_schema)
