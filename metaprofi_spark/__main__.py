"""CLI mirroring the reference's subcommands
(/root/reference/metaprofi/metaprofi_main.py:19-282):

    python -m metaprofi_spark build   --input pages.parquet --store /s ...
    python -m metaprofi_spark update  --input new.parquet   --store /s ...
    python -m metaprofi_spark search  --store /s -s "query text" -t 100
    python -m metaprofi_spark summary --store /s
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="metaprofi_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--store", required=True)
        sp.add_argument("--k", type=int, default=12)
        sp.add_argument("--h", type=int, default=2)
        sp.add_argument("--m", type=int, default=1 << 20)
        sp.add_argument("--slice-buckets", type=int, default=64)
        sp.add_argument("--cores", default="*")
        sp.add_argument("--normalize", default="lower",
                        choices=["lower", "none", "canonical"])
        sp.add_argument("--sequence-type", default="text",
                        choices=["text", "nucleotide", "aminoacid"])

    b = sub.add_parser("build")
    common(b)
    b.add_argument("--input", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--sample-bucket-size", type=int, default=None)
    b.add_argument("--group-col", default=None,
                   help="file-level mode: one sample per GROUP of rows "
                        "(the reference's `build`); omit for per-row "
                        "mode (the reference's `build-seq`)")

    u = sub.add_parser("update")
    common(u)
    u.add_argument("--input", required=True)
    u.add_argument("--id-col", default="doc_id")
    u.add_argument("--text-col", default="text")

    # staged pipeline — the reference's build_matrix / build_index /
    # update_index subcommands (metaprofi_main.py:216-247)
    bm = sub.add_parser("build-matrix", help="stage 1: persist the Bloom matrix only")
    bm.add_argument("--k", type=int, default=12)
    bm.add_argument("--h", type=int, default=2)
    bm.add_argument("--m", type=int, default=1 << 20)
    bm.add_argument("--slice-buckets", type=int, default=64)
    bm.add_argument("--cores", default="*")
    bm.add_argument("--normalize", default="lower",
                    choices=["lower", "none", "canonical"])
    bm.add_argument("--sequence-type", default="text",
                    choices=["text", "nucleotide", "aminoacid"])
    bm.add_argument("--input", required=True)
    bm.add_argument("--id-col", default="doc_id")
    bm.add_argument("--text-col", default="text")
    bm.add_argument("--matrix-store", required=True)

    bi = sub.add_parser("build-index", help="stage 2: index a pre-built matrix store")
    bi.add_argument("--matrix-store", required=True)
    bi.add_argument("--store", required=True)
    bi.add_argument("--sample-bucket-size", type=int, default=None)
    bi.add_argument("--cores", default="*")

    ui = sub.add_parser("update-index", help="append a pre-built update matrix to the index")
    ui.add_argument("--matrix-store", required=True)
    ui.add_argument("--store", required=True)
    ui.add_argument("--cores", default="*")

    s = sub.add_parser("search")
    common(s)
    s.add_argument("-s", "--sequence", action="append", default=[],
                   help="query text (repeatable)")
    s.add_argument("-f", "--file",
                   help="query file: parquet of (query_id, query_text), "
                        "or FASTA/FASTQ (.fa/.fasta/.fq/.fastq[.gz]) — "
                        "the reference's search_index input shape")
    s.add_argument("-t", "--threshold", type=int, default=100)
    s.add_argument("-o", "--output", help="write reference-format report")
    s.add_argument("--seq-type", default=None,
                   choices=["nucleotide", "aminoacid"],
                   help="nucleotide queries against an aminoacid store "
                        "are six-frame translated")
    s.add_argument("--sample-ids", default=None,
                   help="comma-separated sample ids to scope the search")
    s.add_argument("--sample-names", default=None,
                   help="comma-separated sample IDENTIFIERS (grouped "
                        "stores) — resolved via the samples/ dim")
    s.add_argument("--snapshot", type=int, default=None,
                   help="time-travel: search the N-th committed snapshot")

    m = sub.add_parser("summary")
    common(m)

    c = sub.add_parser(
        "compact",
        help="rewrite all segments into one (zeroing tombstoned samples' "
             "bits — physical takedown reclaim) + vacuum orphans",
    )
    common(c)

    d = sub.add_parser(
        "delete",
        help="tombstone samples (logical delete: results exclude them "
             "immediately; bits reclaimed at the next rebuild)",
    )
    common(d)
    d.add_argument("--sample-ids", help="comma-separated matrix positions")
    d.add_argument("--sample-names", help="comma-separated sample names (grouped stores)")

    rb = sub.add_parser(
        "rollback",
        help="make snapshot N current via a new commit (undoes later "
             "updates and deletes; rolled-past snapshots stay readable)",
    )
    common(rb)
    rb.add_argument("--snapshot", type=int, required=True)

    cu = sub.add_parser(
        "curate",
        help="training-data curation sweep: exact dedup -> near-dup "
             "dedup -> quality floor -> optional benchmark "
             "decontamination -> deterministic stratified sample "
             "(doc quota or token budget); writes the sampled parquet "
             "and prints per-stage retention stats",
    )
    cu.add_argument("--input", required=True, help="corpus parquet")
    cu.add_argument("--output", required=True, help="sampled parquet out")
    cu.add_argument("--benchmark",
                    help="eval-set parquet to decontaminate against (omit to skip)")
    cu.add_argument("--strata", default="lang", help="comma-separated stratum columns")
    def _positive(s: str) -> int:
        v = int(s)
        if v <= 0:
            raise argparse.ArgumentTypeError("must be a positive integer")
        return v

    quota = cu.add_mutually_exclusive_group(required=True)
    quota.add_argument("--per-stratum", type=_positive,
                       help="doc quota per stratum")
    quota.add_argument("--token-budget", type=_positive,
                       help="token budget per stratum")
    cu.add_argument("--no-stats", action="store_true",
                    help="skip per-stage retention counts (one lazy plan; "
                         "the dedup chain executes once instead of per-count)")
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--decontam-n", type=int, default=3)
    cu.add_argument("--seed", type=int, default=42)
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--cores", default="*")

    args = p.parse_args(argv)
    if args.cmd == "delete" and not (args.sample_ids or args.sample_names):
        # argparse usage error, not api.delete's ValueError traceback
        d.error("one of --sample-ids / --sample-names is required")

    from pyspark.sql import SparkSession

    from metaprofi_spark import SketchConfig, api
    from metaprofi_spark.plans.session import get_spark

    cores = args.cores if args.cores == "*" else int(args.cores)
    # stop only a session WE created — when embedded (tests, notebooks)
    # getOrCreate returns the caller's session and stopping it would
    # pull the JVM out from under them
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(cores=cores, app_name=f"metaprofi-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = None
    if hasattr(args, "k"):  # staged index/update read config from manifests
        cfg = SketchConfig(
            k=args.k, h=args.h, m=args.m,
            # chunk width: byte- and slab-aligned, capped at 2^20 bits
            chunk_bits=min((args.m + 2047) // 2048 * 2048, 1 << 20),
            slice_buckets=args.slice_buckets,
            normalize=args.normalize, sequence_type=args.sequence_type,
        )
    try:
        if args.cmd == "build":
            docs = spark.read.parquet(args.input)
            if args.group_col:
                out = api.build_grouped(
                    spark, docs, cfg, args.store, group_col=args.group_col,
                    sample_bucket_size=args.sample_bucket_size,
                    text_col=args.text_col,
                )
            else:
                out = api.build(spark, docs, cfg, args.store,
                                sample_bucket_size=args.sample_bucket_size,
                                id_col=args.id_col, text_col=args.text_col)
            print(json.dumps(out))
        elif args.cmd == "update":
            docs = spark.read.parquet(args.input)
            out = api.update(spark, args.store, docs, cfg,
                             id_col=args.id_col, text_col=args.text_col)
            print(json.dumps(out))
        elif args.cmd == "build-matrix":
            docs = spark.read.parquet(args.input)
            out = api.build_matrix_store(
                spark, docs, cfg, args.matrix_store,
                id_col=args.id_col, text_col=args.text_col,
            )
            print(json.dumps(out))
        elif args.cmd == "build-index":
            out = api.build_index_from_matrix(
                spark, args.matrix_store, args.store,
                sample_bucket_size=args.sample_bucket_size,
            )
            print(json.dumps(out))
        elif args.cmd == "update-index":
            out = api.update_index_from_matrix(spark, args.store, args.matrix_store)
            print(json.dumps(out))
        elif args.cmd == "search":
            if args.file:
                from pyspark.sql import functions as F

                base = args.file.removesuffix(".gz")
                if base.endswith((".fa", ".fasta")):
                    from metaprofi_spark.sources.fasta import read_fasta

                    queries = read_fasta(spark, args.file).select(
                        F.col("name").alias("query_id"),
                        F.col("seq").alias("query_text"),
                    )
                elif base.endswith((".fq", ".fastq")):
                    from metaprofi_spark.sources.fasta import read_fastq

                    queries = read_fastq(spark, args.file).select(
                        F.col("name").alias("query_id"),
                        F.col("seq").alias("query_text"),
                    )
                else:
                    queries = spark.read.parquet(args.file)
            else:
                queries = [(f"q{i}", s) for i, s in enumerate(args.sequence)]
                if not queries:
                    print("no queries given (-s or -f)", file=sys.stderr)
                    return 2
            sample_ids = (
                [int(x) for x in args.sample_ids.split(",")]
                if args.sample_ids else None
            )
            names = args.sample_names.split(",") if args.sample_names else None
            res = api.query(spark, args.store, queries, args.threshold,
                            write_to_file=args.output,
                            seq_type=args.seq_type, sample_ids=sample_ids,
                            sample_names=names, snapshot=args.snapshot)
            for r in res.collect():
                print(f"{r.query_id}\t{r.sample_idx}\t{r.kgram_hits}/{r.n_kgrams}")
        elif args.cmd == "summary":
            print(json.dumps(api.summary(spark, args.store)))
        elif args.cmd == "compact":
            from metaprofi_spark.operators import compact_store, vacuum_store

            manifest = compact_store(spark, args.store)
            removed = vacuum_store(args.store)
            print(json.dumps({"segments": manifest["segments"], "vacuumed": removed}))
        elif args.cmd == "delete":
            ids = ([int(x) for x in args.sample_ids.split(",")]
                   if args.sample_ids else None)
            names = (args.sample_names.split(",")
                     if args.sample_names else None)
            manifest = api.delete(spark, args.store, sample_ids=ids,
                                  sample_names=names)
            print(json.dumps({
                "tombstones": manifest["tombstones"],
                "delete_count": manifest["delete_count"],
            }))
        elif args.cmd == "curate":
            from metaprofi_spark.operators.decontam import drop_contaminated
            from metaprofi_spark.operators.sampling import (
                budget_sample,
                stratified_sample,
            )
            from metaprofi_spark.pipelines import clean_corpus

            docs = spark.read.parquet(args.input)
            strata = args.strata.split(",")
            cleaned, stats = clean_corpus(
                docs, args.min_quality,
                id_col=args.id_col, text_col=args.text_col,
                with_stats=not args.no_stats,
            )
            if args.benchmark:
                cleaned = drop_contaminated(
                    cleaned, spark.read.parquet(args.benchmark),
                    n=args.decontam_n,
                    id_col=args.id_col, text_col=args.text_col,
                )
                if not args.no_stats:
                    # persist before the count so the dedup chain does
                    # not re-execute for the count AND the sample write
                    cleaned = cleaned.persist()
                    stats["n_after_decontam"] = cleaned.count()
            if args.per_stratum is not None:
                sample = stratified_sample(
                    cleaned, strata, args.per_stratum, args.id_col,
                    seed=args.seed,
                )
            else:
                sample = budget_sample(
                    cleaned, strata, args.token_budget, args.id_col,
                    args.text_col, seed=args.seed,
                )
            sample.write.mode("overwrite").parquet(args.output)
            stats["n_sampled"] = spark.read.parquet(args.output).count()
            print(json.dumps(stats))
        elif args.cmd == "rollback":
            manifest = api.rollback(args.store, args.snapshot)
            print(json.dumps({
                "snapshot_id": manifest["snapshot_id"],
                "segments": manifest["segments"],
                "n_samples": manifest["n_samples"],
            }))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
