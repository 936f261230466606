"""spark-submit entry point for the index build — the deployment shape
the north rule names (`spark-submit --py-files metaprofi_spark.zip`).

Smoke-verified (r3):
    python scripts/make_pyfiles_zip.py
    spark-submit --master local[8] --driver-memory 8g \
        --py-files dist/metaprofi_spark.zip scripts/submit_build.py \
        --input .../documents.parquet --output /tmp/store --k 8 --m 65536
(--driver-memory matters: spark-submit defaults to 1g, far below what
the local-mode build needs; a cluster sets executor memory instead.)

Package + submit:

    python scripts/make_pyfiles_zip.py            # -> dist/metaprofi_spark.zip
    $SPARK_HOME/bin/spark-submit \
        --master "local[8]"                       # or yarn/k8s master \
        --py-files dist/metaprofi_spark.zip \
        scripts/submit_build.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/metaprofi_store \
        --id-col doc_id --text-col text \
        --k 12 --h 2 --m 65536

On a real cluster the same invocation fans out across executors; the
only local-mode difference is the master URL.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--k", type=int, default=12)
    p.add_argument("--h", type=int, default=2)
    p.add_argument("--m", type=int, default=1 << 20)
    p.add_argument("--chunk-bits", type=int, default=None)
    p.add_argument("--slice-buckets", type=int, default=64)
    p.add_argument("--sample-bucket-size", type=int, default=None)
    args = p.parse_args()

    # imports AFTER spark-submit has set up --py-files on the path
    from pyspark.sql import SparkSession

    from metaprofi_spark import SketchConfig
    from metaprofi_spark.api import build

    spark = SparkSession.builder.appName("metaprofi-build").getOrCreate()
    cfg = SketchConfig(
        k=args.k, h=args.h, m=args.m,
        chunk_bits=args.chunk_bits or min(args.m, 1 << 20),
        slice_buckets=args.slice_buckets,
    )
    docs = spark.read.parquet(args.input)
    summary = build(
        spark, docs, cfg, args.output,
        sample_bucket_size=args.sample_bucket_size,
        id_col=args.id_col, text_col=args.text_col,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
