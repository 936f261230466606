"""Structured-Streaming dedup — streaming twins of the batch dedup
operators (a stream of crawled pages needs duplicate pages dropped
BEFORE any downstream build/sketch stage sees them):

* EXACT: ``stream_drop_exact_duplicates`` (dropDuplicates /
  dropDuplicatesWithinWatermark state on the normalized-text md5);
* NEAR-DUP: ``foreach_batch_near_dedup`` over an LSM parquet signature
  store — committed per-batch dirs + bucketed ``gen_K/bucket=B``
  generations with size-tiered merging (``compact_sig_store``), probed
  per micro-batch with partition pruning + broadcast semi-joins, and
  optionally bounded by a recency window (``history_batches``) with
  physical expiry — the shape that survives an unbounded crawl.

Semantics: the batch twin keeps the min-id representative of every
normalized-text fingerprint group; a stream cannot know the future min
id, so the streaming operator keeps the FIRST-SEEN row per fingerprint
— the standard streaming-dedup contract (Spark's dropDuplicates
state semantics).  What IS identical to batch: the surviving
fingerprint set (exactly one survivor per group, each a member of its
group), pinned by test against exact_duplicate_groups on the same rows.

State shape at 100 TB: one state row per DISTINCT fingerprint (16-byte
md5 key), partitioned by the shuffle on the dedup key — linear in
unique documents, constant per duplicate.  With an event-time column,
``watermark`` bounds the state instead
(dropDuplicatesWithinWatermark): fingerprints older than the watermark
are evicted, which is the only sustainable mode on an unbounded crawl
stream (an unwatermarked stream's state grows with the corpus — fine
for bounded backfills, documented trade).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.functions.text import fingerprint

_FP = "__fp"
_SIG_BUCKETS = 64  # band_hash % P partition dirs in the compacted layout


def stream_drop_exact_duplicates(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first-seen row per normalized-text fingerprint.

    ``ts_col``+``watermark`` (e.g. ``("ts", "1 hour")``) switches to
    dropDuplicatesWithinWatermark: state for fingerprints whose event
    time has passed the watermark is evicted, bounding state on
    unbounded streams.  The ts column is cast to TIMESTAMP first
    (event-time watermarks reject TIMESTAMP_NTZ).
    """
    fp = stream_df.withColumn(_FP, fingerprint(F.col(text_col)))
    if ts_col is not None:
        if watermark is None:
            raise ValueError("ts_col given without a watermark duration")
        fp = (
            fp.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([_FP])
        )
    else:
        fp = fp.dropDuplicates([_FP])
    return fp.drop(_FP)


def _batches_dir(sig_store: str) -> str:
    return os.path.join(sig_store, "batches")


def _committed_batch_dirs(
    sig_store: str, before_batch: int | None = None
) -> list[tuple[int, str]]:
    """(batch_id, dir) of COMMITTED per-batch signature dirs — only
    dirs carrying Spark's ``_SUCCESS`` marker, optionally restricted to
    ``batch < before_batch``.  Listing committed dirs explicitly (and
    never globbing ``batch=*``) means a crashed prior attempt's torn,
    _SUCCESS-less partition is never touched by schema inference — the
    r4-advice failure mode where one torn footer broke every retry."""
    bdir = _batches_dir(sig_store)
    out: list[tuple[int, str]] = []
    if not os.path.isdir(bdir):
        return out
    for e in sorted(os.listdir(bdir)):
        if not e.startswith("batch="):
            continue
        try:
            n = int(e.split("=", 1)[1])
        except ValueError:
            continue
        if before_batch is not None and n >= before_batch:
            continue
        d = os.path.join(bdir, e)
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append((n, d))
    return out


def _read_sig_manifest(sig_store: str) -> dict | None:
    try:
        with open(os.path.join(sig_store, "sig_manifest.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_sig_manifest(sig_store: str, man: dict) -> None:
    p = os.path.join(sig_store, "sig_manifest.json")
    with open(p + ".tmp", "w") as f:
        json.dump(man, f, indent=2, sort_keys=True)
    os.replace(p + ".tmp", p)  # atomic commit (POSIX rename)


def read_signature_history(
    spark: SparkSession,
    sig_store: str,
    batch_id: int,
    buckets: list[int] | None = None,
    min_batch: int | None = None,
) -> DataFrame | None:
    """DataFrame(id, band_id, band_hash) of every signature committed
    BEFORE ``batch_id`` (and at/after ``min_batch``, if given), or None
    when there is no history.

    Two tiers, unioned:

    * recent per-batch dirs (``batches/batch=N`` with ``_SUCCESS``,
      N < batch_id, not yet folded) — read by EXPLICIT path list, so an
      in-flight or torn partition is never scanned;
    * the compacted layout (``gen_K/bucket=B`` dirs listed in
      sig_manifest.json) — partitioned by ``band_hash % n_buckets``;
      passing the probing batch's ``buckets`` prunes the scan to those
      partition dirs (PartitionFilters, pinned by plan test).  Rows
      keep their ``batch`` column through compaction, so the
      ``batch < batch_id`` retry invariant holds even for folded
      batches.

    ``min_batch`` is the RECENCY WINDOW bound (the near-dup analog of
    dropDuplicatesWithinWatermark): generations whose recorded batch
    range (``gen_ranges``) lies wholly before it are skipped without
    touching a file, straggling rows are filtered on the ``batch``
    column, and anything before the store's committed
    ``expired_before`` mark is excluded unconditionally.  This is what
    bounds per-batch probe cost on an unbounded crawl — bucket pruning
    alone cannot (a large batch touches every bucket).
    """
    man = _read_sig_manifest(sig_store)
    folded = set(man["folded_batches"]) if man else set()
    lo = max(
        int(min_batch or 0), int(man.get("expired_before", 0)) if man else 0
    )
    parts: list[DataFrame] = []
    dirs = [
        d for n, d in _committed_batch_dirs(sig_store, batch_id)
        if n not in folded and n >= lo
    ]
    if dirs:
        parts.append(
            spark.read.option("basePath", _batches_dir(sig_store))
            .parquet(*dirs)
            .select("id", "band_id", "band_hash")
        )
    ranges = (man.get("gen_ranges") or {}) if man else {}
    for g in (man["generations"] if man else []):
        g_lo, g_hi = ranges.get(g, (0, None))
        if g_hi is not None and g_hi < lo:
            continue  # generation wholly outside the window: zero IO
        gdf = spark.read.parquet(os.path.join(sig_store, g)).filter(
            F.col("batch") < batch_id
        )
        if lo and (g_lo < lo):
            gdf = gdf.filter(F.col("batch") >= lo)
        if buckets is not None:
            gdf = gdf.filter(
                F.col("bucket").isin([int(x) for x in buckets])
            )
        parts.append(gdf.select("id", "band_id", "band_hash"))
    if not parts:
        return None
    df = parts[0]
    for extra in parts[1:]:
        df = df.unionByName(extra)
    return df


def compact_sig_store(
    spark: SparkSession,
    sig_store: str,
    n_buckets: int = _SIG_BUCKETS,
    full: bool = False,
    expire_before: int | None = None,
) -> dict:
    """Fold committed per-batch signature dirs into a bucketed
    generation (``gen_K/bucket=band_hash%P``) so per-batch history
    joins prune instead of shuffling all history — the LSM/Iceberg
    rewrite-data-files step for the signature store (reference analog:
    the two-phase fetch/share scratch store, search_index.py:312-351 —
    fetch each slice once, not all).

    Incremental fold (cost = O(new batches)) followed by SIZE-TIERED
    generation merging: while the newest generation has grown to the
    size of the one before it, the two merge into one, cascading — the
    binary-counter LSM policy, keeping the generation count
    <= log2(N)+1 and the cumulative rewrite work O(N log N) over an
    unbounded crawl (a fixed-interval full rewrite would be O(N²),
    and never merging would accumulate O(N) relations in the history
    union).  Row counts come from parquet footers (metadata-only) and
    are cached in the manifest.  ``full=True`` forces everything into
    one generation.

    ``expire_before=B`` commits a RECENCY-WINDOW mark: batches < B
    leave the dedup horizon permanently (the unbounded-crawl state
    bound — dropDuplicatesWithinWatermark's analog).  Generations whose
    recorded batch range lies wholly before the mark are dropped from
    the manifest and deleted; expired committed batch dirs are
    reclaimed; readers exclude anything < the mark unconditionally.
    The mark is monotone (never rewinds).

    Crash-safe: each generation dir is written first, the manifest
    rename is the commit, and folded batch dirs / superseded gens are
    reclaimed only after it — a crash anywhere re-converges because
    this function first removes dirs the manifest already marks folded
    or no longer lists.  ``n_buckets`` is sticky: the first compaction
    fixes it for the store's life (mixed bucketing would break
    pruning).  Runs under the Bloom store's :func:`store_lock`
    single-writer lease, so the stream's auto-compaction and an
    external maintenance call can never interleave their manifest
    read-modify-writes."""
    from metaprofi_spark.operators.bloom_update import store_lock

    os.makedirs(sig_store, exist_ok=True)
    with store_lock(sig_store):
        return _compact_sig_store_locked(
            spark, sig_store, n_buckets, full, expire_before
        )


def _compact_sig_store_locked(
    spark: SparkSession,
    sig_store: str,
    n_buckets: int,
    full: bool,
    expire_before: int | None,
) -> dict:
    man = _read_sig_manifest(sig_store) or {
        "format": 1,
        "n_buckets": int(n_buckets),
        "generations": [],
        "gen_counter": 0,
        "folded_batches": [],
        "gen_rows": {},
        "gen_ranges": {},
        "expired_before": 0,
    }
    n_buckets = int(man["n_buckets"])
    folded = set(man["folded_batches"])
    # convergent cleanup of a prior crash: anything the committed
    # manifest marks folded, or a gen dir it doesn't list, is invisible
    # to readers and reclaimable
    for n, d in _committed_batch_dirs(sig_store):
        if n in folded:
            shutil.rmtree(d, ignore_errors=True)
    live = set(man["generations"])
    if os.path.isdir(sig_store):
        for e in os.listdir(sig_store):
            if e.startswith("gen_") and e not in live:
                shutil.rmtree(os.path.join(sig_store, e), ignore_errors=True)

    ranges = {
        g: tuple(v) for g, v in (man.get("gen_ranges") or {}).items()
    }
    if expire_before is not None and int(expire_before) > int(
        man.get("expired_before", 0)
    ):
        exp = int(expire_before)
        keep, dropg = [], []
        for g in man["generations"]:
            g_lo, g_hi = ranges.get(g, (0, None))
            (dropg if (g_hi is not None and g_hi < exp) else keep).append(g)
        man.update(
            expired_before=exp,
            generations=keep,
            gen_rows={
                g: r for g, r in (man.get("gen_rows") or {}).items()
                if g in keep
            },
            gen_ranges={g: list(ranges[g]) for g in keep if g in ranges},
            folded_batches=sorted(n for n in man["folded_batches"] if n >= exp),
        )
        _write_sig_manifest(sig_store, man)  # commit the mark first
        for g in dropg:
            shutil.rmtree(os.path.join(sig_store, g), ignore_errors=True)
        for n, d in _committed_batch_dirs(sig_store):
            if n < exp:
                shutil.rmtree(d, ignore_errors=True)
        folded = set(man["folded_batches"])
        ranges = {g: r for g, r in ranges.items() if g in set(keep)}
    exp = int(man.get("expired_before", 0))

    fresh = [
        (n, d) for n, d in _committed_batch_dirs(sig_store)
        if n not in folded and n >= exp
    ]
    if not fresh and not (full and len(man["generations"]) > 1):
        return man

    gen_counter = int(man["gen_counter"])
    gens = list(man["generations"])
    rows = {g: int(r) for g, r in (man.get("gen_rows") or {}).items()}

    def footer_rows(g: str) -> int:  # parquet metadata-only count
        if g not in rows:
            rows[g] = spark.read.parquet(os.path.join(sig_store, g)).count()
        return rows[g]

    def write_gen(df: DataFrame, n_rows: int | None, new_gens: list[str],
                  drop_batches: list[tuple[int, str]],
                  drop_gens: list[str],
                  rng: tuple[int, int | None]) -> str:
        nonlocal gen_counter, gens
        gen_counter += 1
        gname = f"gen_{gen_counter}"
        (
            df.withColumn(
                "bucket",
                F.pmod(F.col("band_hash"), F.lit(n_buckets)).cast("int"),
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(sig_store, gname))
        )
        gens = new_gens + [gname]
        if n_rows is None:
            n_rows = spark.read.parquet(
                os.path.join(sig_store, gname)
            ).count()  # footer-only
        rows[gname] = int(n_rows)
        ranges[gname] = (int(rng[0]), None if rng[1] is None else int(rng[1]))
        man.update(
            gen_counter=gen_counter,
            generations=gens,
            folded_batches=sorted(
                set(man["folded_batches"]) | {n for n, _ in drop_batches}
            ),
            gen_rows={g: rows[g] for g in gens},
            gen_ranges={
                g: list(ranges[g]) for g in gens if g in ranges
            },
        )
        _write_sig_manifest(sig_store, man)  # atomic commit
        for _, d in drop_batches:
            shutil.rmtree(d, ignore_errors=True)
        for g in drop_gens:
            shutil.rmtree(os.path.join(sig_store, g), ignore_errors=True)
        return gname

    cols = ["batch", "id", "band_id", "band_hash"]
    if fresh:
        fresh_df = (
            spark.read.option("basePath", _batches_dir(sig_store))
            .parquet(*[d for _, d in fresh])
            .select(*cols)
        )
        ns = [n for n, _ in fresh]
        write_gen(fresh_df, None, gens, fresh, [], (min(ns), max(ns)))
    # size-tiered cascade (binary-counter policy: merge while the
    # newest generation has grown to the size of the one before it —
    # equal-size incoming batches then behave like binary increments,
    # giving <= log2(N)+1 generations and O(N log N) cumulative work);
    # full=True merges unconditionally down to one
    while len(gens) >= 2 and (
        full or footer_rows(gens[-1]) >= footer_rows(gens[-2])
    ):
        a, b = gens[-2], gens[-1]
        merged = (
            spark.read.parquet(os.path.join(sig_store, a)).select(*cols)
            .unionByName(
                spark.read.parquet(os.path.join(sig_store, b)).select(*cols)
            )
        )
        ra, rb = ranges.get(a, (0, None)), ranges.get(b, (0, None))
        hi = None if (ra[1] is None or rb[1] is None) else max(ra[1], rb[1])
        write_gen(
            merged, footer_rows(a) + footer_rows(b), gens[:-2], [], [a, b],
            (min(ra[0], rb[0]), hi),
        )
    return man


def foreach_batch_near_dedup(
    sig_store: str,
    out_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 8,
    n_buckets: int = _SIG_BUCKETS,
    history_batches: int | None = None,
):
    """foreachBatch callback: MinHash near-dup dedup of a document
    stream against everything seen before — the streaming twin of
    operators/dedup.drop_near_duplicates, with the LSH signature state
    in a PARQUET STORE instead of executor memory (the only shape that
    survives an unbounded crawl: state is ~b longs per doc, readable by
    any later job, and pruned per micro-batch).

    Per micro-batch:

    1. band signatures of the batch (`minhash_bands` — the same
       Arrow-buffer kernel as batch dedup);
    2. drop docs sharing ANY band bucket with a PREVIOUS batch: the
       history side (`read_signature_history`) is partition-PRUNED to
       the batch's own `band_hash % P` buckets and probed with two
       BROADCAST semi-joins (batch keys → matched keys → batch ids),
       so history is never shuffled — per-batch cost is
       O(history ∩ batch buckets), not O(history), the r4 fix for the
       O(N²)-cumulative unbucketed join;
    3. within-batch: the exact batch operator (`drop_near_duplicates`:
       connected components, min-id representative) over the survivors
       — a single-batch stream is therefore IDENTICAL to the batch
       pipeline (pinned by test);
    4. write the kept docs (`out/batch=N`) and the batch's signatures
       (`batches/batch=N`) — both mode=overwrite into per-batch dirs,
       so at-least-once retries are idempotent; history reads list only
       `_SUCCESS`-committed dirs with `batch < current`, so a retry
       never collides with its own (possibly torn) signatures;
    5. every ``compact_every`` committed batches, fold them into the
       bucketed layout (`compact_sig_store`) — the amortized LSM
       maintenance step that keeps (2) pruned.  ``None`` disables
       auto-compaction (call it from a maintenance job instead).

    ``history_batches=W`` bounds dedup to the last W batches — the
    near-dup analog of dropDuplicatesWithinWatermark, and the piece
    that makes per-batch cost CONSTANT on an unbounded crawl: bucket
    pruning alone degrades to a full history scan once a batch is big
    enough to touch every bucket, but a recency window caps the
    scanned history at W batches regardless of stream age.  Expired
    generations are physically reclaimed by the auto-compaction
    (``expire_before`` mark); W=None (default) dedups against all
    history — right for bounded backfills, documented trade for
    crawls.

    Invariant pinned by test: no kept doc shares a band bucket with any
    doc of an earlier batch INSIDE the window, and within a batch the
    kept set equals the batch operator's output on the
    store-survivors.
    """
    from metaprofi_spark.operators.dedup import drop_near_duplicates, minhash_bands

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = minhash_bands(batch_df, n_perm, bands, id_col, text_col)
        man = _read_sig_manifest(sig_store)
        nb = int(man["n_buckets"]) if man else n_buckets
        buckets = None
        if man and man["generations"]:
            # bounded collect: ≤ n_buckets ints, the partition-pruning
            # predicate for the compacted history (IVF-store pattern)
            buckets = [
                int(r[0])
                for r in b.select(
                    F.pmod(F.col("band_hash"), F.lit(nb))
                    .cast("int")
                    .alias("bk")
                ).distinct().collect()
            ]
        min_batch = (
            max(0, batch_id - history_batches)
            if history_batches is not None
            else None
        )
        survivors = batch_df
        hist = read_signature_history(
            spark, sig_store, batch_id, buckets, min_batch=min_batch
        )
        if hist is not None:
            # micro-batches are trigger-bounded → their key set is the
            # broadcast side; the (big) history side streams through
            # both semi-joins without a shuffle
            bkeys = b.select("band_id", "band_hash").distinct()
            hit_keys = (
                hist.join(F.broadcast(bkeys), ["band_id", "band_hash"], "left_semi")
                .select("band_id", "band_hash")
                .distinct()
            )
            hit = (
                b.join(F.broadcast(hit_keys), ["band_id", "band_hash"], "left_semi")
                .select(F.col("id").alias(id_col))
                .distinct()
            )
            survivors = batch_df.join(hit, id_col, "left_anti")
        kept = drop_near_duplicates(survivors, n_perm, bands, id_col, text_col)
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        b.write.mode("overwrite").parquet(
            os.path.join(_batches_dir(sig_store), f"batch={batch_id}")
        )
        if compact_every:
            folded = set(man["folded_batches"]) if man else set()
            unfolded = [
                n for n, _ in _committed_batch_dirs(sig_store)
                if n not in folded
            ]
            if len(unfolded) >= compact_every:
                compact_sig_store(
                    spark, sig_store, n_buckets=nb,
                    expire_before=min_batch if history_batches is not None
                    else None,
                )

    return fn


def stream_drop_near_duplicates(
    stream_df: DataFrame,
    sig_store: str,
    out_dir: str,
    checkpoint_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 8,
    n_buckets: int = _SIG_BUCKETS,
    history_batches: int | None = None,
):
    """Wire a document stream through MinHash near-dup dedup; kept docs
    land under ``out_dir/batch=N``.  Returns the StreamingQuery."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            foreach_batch_near_dedup(
                sig_store, out_dir, n_perm, bands, id_col, text_col,
                compact_every=compact_every, n_buckets=n_buckets,
                history_batches=history_batches,
            )
        )
        .start()
    )
