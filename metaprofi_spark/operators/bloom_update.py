"""Incremental index append — A4 of SURVEY.md §2.4.

The reference extends every stored bit-slice with the new samples' bits
(decompress, concatenate, recompress — zstd_compress_cat,
/root/reference/metaprofi/lib/utilities.py:95-107, applied at
build_index_zarr.py:485-496) and bumps ``update_count`` metadata
(build_index_zarr.py:286-301).

Spark-first replacement: sample growth is BUCKET-ALIGNED.  Each update
batch starts at the next sample_bucket boundary, so new slabs live in
new (range_id, sample_bucket) cells and the update is a pure UNION —
no rewrite of existing slabs, which is exactly an append-only snapshot
(Iceberg-style).  The padding columns are zero bits that cost nothing
(slabs are fixed-width already, zeros compress away in Parquet).
Config equality is enforced before appending (the F8 guard,
build_index_zarr.py:262-283).
"""

from __future__ import annotations

import contextlib as _contextlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators.bloom_build import build_matrix
from metaprofi_spark.operators.bloom_index import (
    build_index,
    load_index,
    plan_index_geometry,
)


def next_sample_base(n_samples: int, bucket: int) -> int:
    """First sample_idx of the next update batch (bucket-aligned)."""
    return (n_samples + bucket - 1) // bucket * bucket


@_contextlib.contextmanager
def store_lock(
    path: str,
    timeout: float = 600.0,
    poll: float = 0.2,
    stale_sec: float = 3600.0,
):
    """Single-writer mutual exclusion for a persisted store.

    All manifest read-modify-write operations (update_store,
    compact_store, vacuum_store) run under this lock, so a vacuum can
    never delete a segment a concurrent update has written but not yet
    committed, and a compaction can never lose a concurrently committed
    update (the race the r2 advice flagged).  The reference gets the
    same guarantee from its Zarr write transaction
    (build_index_zarr.py:286-301).

    Implementation: O_CREAT|O_EXCL lock file next to manifest.json
    carrying {pid, ts}.  Takeover rules:

    * a LIVE owner is never broken, however long it holds the lock —
      a big update legitimately holds it across whole Spark jobs (the
      r3 review caught an age-based break that destroyed mutual
      exclusion mid-write);
    * a lock whose owner pid is DEAD is broken;
    * a lock that stays unreadable/empty past a short grace window is
      broken too (a writer that crashed between open and write);
    * breaking is ATOMIC: the breaker os.rename()s the stale lock to a
      unique name first — exactly one concurrent waiter wins the
      rename (the rest get FileNotFoundError and re-loop), so two
      waiters can never both "inherit" and delete each other's fresh
      locks (the r3 review's TOCTOU).

    ``stale_sec`` only bounds how long an UNASSESSABLE owner (pid from
    another host) may hold the lock.  Works on any POSIX-rename
    filesystem; on object stores swap for a DynamoDB/ZooKeeper lease —
    the call sites don't change.
    """
    import json
    import time

    lock_path = os.path.join(path, "manifest.lock")
    deadline = time.time() + timeout
    unreadable_grace = 10.0

    def try_break(reason: str) -> None:
        # atomic: exactly one breaker wins the rename
        claim = f"{lock_path}.broken.{os.getpid()}.{time.monotonic_ns()}"
        try:
            os.rename(lock_path, claim)
        except FileNotFoundError:
            return  # someone else broke or released it
        with _contextlib.suppress(FileNotFoundError):
            os.unlink(claim)

    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode()
            )
            os.close(fd)
            break
        except FileExistsError:
            meta = None
            try:
                with open(lock_path) as f:
                    meta = json.load(f)
            except FileNotFoundError:
                continue  # released between open attempts: retry now
            except (OSError, ValueError):
                # unreadable/empty: owner crashed mid-write, or is about
                # to write.  Give it a short grace from the file mtime.
                try:
                    age = time.time() - os.stat(lock_path).st_mtime
                except FileNotFoundError:
                    continue
                if age > unreadable_grace:
                    try_break("unreadable")
                    continue
            if meta is not None:
                owner_dead = False
                pid_unknown = False
                try:
                    os.kill(int(meta.get("pid", -1)), 0)
                except (ProcessLookupError, ValueError):
                    owner_dead = True
                except PermissionError:
                    pid_unknown = True  # exists but not ours to signal
                if owner_dead or (
                    pid_unknown
                    and time.time() - float(meta.get("ts", 0)) > stale_sec
                ):
                    try_break("dead owner")
                    continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"store writer lock busy after {timeout}s: {lock_path}"
                )
            time.sleep(poll)
    try:
        yield
    finally:
        # release ONLY if we still own the lock: if a peer (wrongly or
        # rightly) broke ours and acquired its own, unlinking here would
        # destroy the peer's mutual exclusion for a third writer (r3
        # advice).  A live same-host owner is never broken by protocol,
        # so read-then-unlink is race-free for the local case.
        try:
            with open(lock_path) as f:
                owner = json.load(f)
            if int(owner.get("pid", -1)) == os.getpid():
                os.unlink(lock_path)
        except (OSError, ValueError):
            pass  # gone, unreadable, or not ours: leave it alone


def update_index(
    old_index_df: DataFrame,
    new_docs: DataFrame,
    cfg: SketchConfig,
    old_n_samples: int,
    sample_bucket_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Append new documents to an existing index.

    ``new_docs[id_col]`` must be dense 0..n_new-1 (renumbered here to
    the padded global range).  Returns (index_df, new_samples_dim_df,
    new_total_samples); ``new_samples_dim_df`` maps the batch's global
    sample_idx back to the caller's ids (J2 dim-table growth, the
    metadata append of zarrstore.py:243-272).
    """
    bucket = plan_index_geometry(cfg, sample_bucket_size=sample_bucket_size)
    base = next_sample_base(old_n_samples, bucket)

    shifted = new_docs.withColumn("__sid", F.col(id_col) + F.lit(base))
    n_new = shifted.count()
    dim = shifted.select(
        F.col("__sid").alias("sample_idx"), F.col(id_col).alias("sample_id")
    )
    bf = build_matrix(shifted, cfg, id_col="__sid", text_col=text_col)
    new_slabs = build_index(bf, cfg, sample_bucket_size=bucket)
    # a store-loaded index carries the `seg` partition column that fresh
    # slabs don't have — drop it before the union (search never uses it)
    if "seg" in old_index_df.columns:
        old_index_df = old_index_df.drop("seg")
    return old_index_df.unionByName(new_slabs), dim, base + n_new


def update_store(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame | None = None,
    cfg: SketchConfig | None = None,
    sample_bucket_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    fail_before_commit: bool = False,
    segment_name: str | None = None,
    matrix_path: str | None = None,
) -> dict:
    """Persisted-store variant: write the new slabs as a NEW SEGMENT
    directory, then commit by atomically rewriting the manifest.

    Crash-safe, exactly-once (the snapshot protocol the reference gets
    from its Zarr transaction, build_index_zarr.py:286-301):
      * the segment is written with mode=overwrite into its own
        ``seg=uN`` dir — a retry after any crash rewrites the same
        files instead of duplicating slabs;
      * readers only see segments listed in the manifest, and the
        manifest rewrite is tmp+os.replace (atomic on POSIX), so a
        crash between data write and commit leaves the store readable
        at the PREVIOUS snapshot;
      * every committed update is recorded in lineage.json with
        metrics, like build chunks (plans/lineage.py).

    ``fail_before_commit`` injects a crash for the kill-between-steps
    test.

    ``segment_name`` makes the append IDEMPOTENT BY NAME: if the named
    segment is already committed the call is a no-op (returns the
    current manifest).  Structured Streaming's foreachBatch is
    at-least-once — passing the micro-batch id as the segment name is
    what upgrades the sink to exactly-once across batch RETRIES, not
    just crashes (streaming/append.py does this).

    ``matrix_path`` (instead of ``new_docs``) appends from a PRE-BUILT
    matrix store — the reference's staged ``update_index`` subcommand,
    which indexes a matrix the ``build_matrix``-with-update step wrote
    earlier (metaprofi_main.py:238-247).  The matrix's sample_idx must
    be dense 0..n_new-1; its config is F8-checked against the store.
    """
    import time

    from metaprofi_spark.operators.bloom_index import _write_manifest
    from metaprofi_spark.plans.lineage import read_lineage, _write_lineage

    t0 = time.time()
    with store_lock(path):
        _old_df, _stored_cfg, manifest = load_index(spark, path, cfg)
        if not manifest.get("segments"):
            raise ValueError(
                "update_store requires a format_version>=2 segmented store; "
                "rebuild with persist_index"
            )
        # u{update_count+1}, NOT u{len(segments)}: compaction shrinks the
        # segment list, so a length-derived name could collide with a
        # pre-compaction segment that archived snapshots still reference
        # (overwriting it would silently corrupt time travel).  Each
        # u{k} is only ever written while update_count == k-1, and a
        # crash-retry before the commit rewrites the SAME name
        # (idempotent), never a committed one.
        seg = segment_name or f"u{manifest.get('update_count', 0) + 1}"
        # Idempotency must survive COMPACTION: compact_store replaces the
        # segment list with one c* name, so `seg in segments` alone would
        # let a replayed micro-batch (streaming restart re-running the
        # last committed batch) re-append its docs (r3 advice).  The
        # manifest's committed_segments set records every name ever
        # committed; stores written before the field fall back to the
        # live list + lineage's updates dict (which also survives
        # compaction).
        committed = set(manifest.get("committed_segments") or [])
        if not committed:
            committed = set(manifest["segments"]) | set(
                read_lineage(path).get("updates", {})
            )
        if seg in committed:
            # named segment already committed: at-least-once caller retried
            # after success — exactly-once means doing nothing
            return manifest
        cfg = cfg if cfg is not None else _stored_cfg
        bucket = manifest.get(
            "sample_bucket_size", plan_index_geometry(cfg, sample_bucket_size=sample_bucket_size)
        )
        base = next_sample_base(manifest["n_samples"], bucket)
        if matrix_path is not None:
            from metaprofi_spark.operators.bloom_build import load_matrix

            bf_raw, _mcfg, m_manifest = load_matrix(spark, matrix_path, cfg)
            n_new = int(m_manifest["n_samples"])
            # the append shifts sample_idx by `base` and buckets by
            # integer division — OUT-OF-RANGE ids would land samples in
            # wrong buckets or collide across the bucket boundary,
            # corrupting the segment SILENTLY (r3 advice).  One cheap
            # agg validates the range before any data is written.
            # GAPS inside [0, n_new) are legitimate and safe: a doc
            # shorter than k produces no filter rows (build_matrix
            # min-length pruning), its sample simply has zero bits —
            # same as the primary build path (r4 review: an exact
            # density check rejected matrices the project's own
            # pipeline produces).
            ext = bf_raw.agg(
                F.min("sample_idx").alias("mn"),
                F.max("sample_idx").alias("mx"),
            ).first()
            if ext["mn"] is not None and (
                ext["mn"] < 0 or ext["mx"] > n_new - 1
            ):
                raise ValueError(
                    f"matrix at {matrix_path} has non-dense sample_idx "
                    f"(min={ext['mn']}, max={ext['mx']}, expected within "
                    f"0..{n_new - 1}); appending it would corrupt bucket "
                    "alignment"
                )
            bf = bf_raw.withColumn("sample_idx", F.col("sample_idx") + F.lit(base))
        elif new_docs is not None:
            shifted = new_docs.withColumn("__sid", F.col(id_col) + F.lit(base))
            n_new = shifted.count()
            bf = build_matrix(shifted, cfg, id_col="__sid", text_col=text_col)
        else:
            raise ValueError("update_store needs new_docs or matrix_path")
        new_slabs = build_index(bf, cfg, sample_bucket_size=bucket)
        new_slabs.write.mode("overwrite").partitionBy("slice_bucket").parquet(
            os.path.join(path, "index", f"seg={seg}")
        )
        if fail_before_commit:
            raise RuntimeError("injected crash between segment write and commit")
        manifest["segments"] = manifest["segments"] + [seg]
        manifest["committed_segments"] = sorted(committed | {seg})
        manifest["n_samples"] = base + n_new
        manifest["update_count"] = manifest.get("update_count", 0) + 1
        _write_manifest(path, manifest)
        lineage = read_lineage(path)
        lineage.setdefault("updates", {})[seg] = {
            "n_new_samples": int(n_new),
            "sample_base": int(base),
            "wall_sec": round(time.time() - t0, 3),
            "ts": int(time.time()),
        }
        _write_lineage(path, lineage)
        return manifest


def compact_store(spark: SparkSession, path: str) -> dict:
    """Rewrite all committed segments into ONE new segment and swap the
    manifest atomically — the maintenance op that keeps long-lived
    stores from accumulating per-update file sets.

    TOMBSTONE-AWARE (r4 verdict item 7): the rewrite ANDs a per-bucket
    column mask over the slabs of buckets holding tombstoned samples,
    physically zeroing the deleted samples' bit columns (the Iceberg
    rewrite-data-files analog — zeroed columns compress to ~nothing
    under zstd, so the takedown reclaims space without a full rebuild).
    The tombstone list STAYS in the manifest: the ids remain allocated
    (n_samples is unchanged) and readers keep excluding them on the
    result edge, so search results are identical before/after (a zeroed
    column can only produce zero hits, and those rows were anti-joined
    away already) — pinned by test.  Pre-compaction snapshots still
    reference the OLD segments with the bits intact, so time travel and
    rollback semantics are unchanged until vacuum expires them.

    Same crash-safety as update_store: the compacted segment name is
    deterministic from the manifest counters (idempotent retry via
    mode=overwrite), the commit is the atomic manifest rename, and a
    crash in between leaves the store readable at the previous
    snapshot.  Old segment dirs become orphans — reclaim with
    :func:`vacuum_store` AFTER the commit.

    Runs under :func:`store_lock`: the manifest is read AND swapped
    inside one critical section, so a concurrently committed update
    segment can't be dropped by this read-modify-write (lost update)."""
    import numpy as np

    with store_lock(path):
        df, _cfg, manifest = load_index(spark, path)
        if not manifest.get("segments"):
            raise ValueError("compact_store requires a segmented (v2) store")
        old_segments = list(manifest["segments"])
        seg = f"c{manifest.get('update_count', 0)}_{manifest.get('compactions', 0)}"
        out = df.select("range_id", "sample_bucket", "bits", "slice_bucket")
        tomb = load_tombstones(spark, path, manifest)
        if tomb is not None:
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            from metaprofi_spark.kernels.bits import apply_column_mask

            bucket_w = int(manifest["sample_bucket_size"])
            w = bucket_w // 8
            # takedown lists are result-edge small (the rare-delete
            # trade documented in delete_samples) — a bounded collect
            masks: dict[int, np.ndarray] = {}
            for r in tomb.collect():
                b, p = divmod(int(r.sample_idx), bucket_w)
                m = masks.setdefault(b, np.full(w, 0xFF, dtype=np.uint8))
                m[p >> 3] &= np.uint8(0xFF ^ (1 << (p & 7)))
            bc = spark.sparkContext.broadcast(
                {b: m.tobytes() for b, m in masks.items()}
            )

            # no type hints: `from __future__ import annotations` turns
            # them into strings pyspark can't resolve here (pd is a
            # local import); hint-less pandas_udf defaults to SCALAR
            @pandas_udf("binary")
            def _mask(bucket, bits):
                mm = {
                    b: np.frombuffer(m, dtype=np.uint8)
                    for b, m in bc.value.items()
                }
                return pd.Series(
                    [
                        apply_column_mask(blob, mm[int(bkt)])
                        for bkt, blob in zip(bucket, bits)
                    ]
                )

            hit = sorted(masks)
            touched = out.filter(F.col("sample_bucket").isin(hit)).withColumn(
                "bits", _mask("sample_bucket", "bits")
            )
            rest = out.filter(~F.col("sample_bucket").isin(hit))
            out = rest.unionByName(touched)
        (
            out.write.mode("overwrite")
            .partitionBy("slice_bucket")
            .parquet(os.path.join(path, "index", f"seg={seg}"))
        )
        from metaprofi_spark.operators.bloom_index import _write_manifest

        manifest["segments"] = [seg]
        # committed_segments is the idempotency ledger and must SURVIVE
        # compaction (it is why replayed micro-batches stay no-ops after
        # a compact); the c* name joins it so a later caller reusing
        # that name can never overwrite the live compacted segment
        committed = set(manifest.get("committed_segments") or [])
        if not committed:
            from metaprofi_spark.plans.lineage import read_lineage

            committed = set(old_segments) | set(
                read_lineage(path).get("updates", {})
            )
        manifest["committed_segments"] = sorted(committed | {seg})
        manifest["compactions"] = manifest.get("compactions", 0) + 1
        _write_manifest(path, manifest)
        return manifest


def vacuum_store(path: str) -> list[str]:
    """Delete segment dirs not referenced by the committed manifest
    (orphans from crashes and compactions); returns the removed segment
    names.

    Runs under :func:`store_lock` and re-reads the manifest inside the
    critical section: while vacuum holds the lock no writer is between
    segment-write and manifest-commit, so every ``seg=`` dir absent from
    the manifest is truly orphaned — never an in-flight append."""
    import json
    import shutil

    with store_lock(path):
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        live = {f"seg={s}" for s in manifest.get("segments", [])}
        removed = []
        idx_dir = os.path.join(path, "index")
        for d in os.listdir(idx_dir):
            if d.startswith("seg=") and d not in live:
                shutil.rmtree(os.path.join(idx_dir, d))
                removed.append(d[len("seg="):])
        # orphan tombstone files (crash between write and commit, or a
        # rebuild's previous generation): same rule — anything not in
        # the committed list is invisible to CURRENT readers and
        # reclaimable.  Note tombstone lists are NOT strictly
        # prefix-ordered across history: rollback_store restores an
        # older (shorter) list, so rolled-past snapshots may reference
        # extra tombstones this pass deletes — those snapshots are then
        # expired by the check below, exactly as for segments (r4
        # advice: an earlier comment claimed a prefix invariant that
        # rollback breaks).
        tomb_dir = os.path.join(path, "tombstones")
        if os.path.isdir(tomb_dir):
            live_tombs = set(manifest.get("tombstones", []))
            for d in os.listdir(tomb_dir):
                if d not in live_tombs:
                    shutil.rmtree(os.path.join(tomb_dir, d))
                    removed.append(f"tombstones/{d}")
        # expire snapshots whose segment dirs are no longer ALL on disk
        # (the Iceberg expire-snapshots step) — checked against the
        # filesystem, not just this call's removals, so a vacuum that
        # crashed between rmtree and expiry converges on re-run; the
        # CURRENT snapshot always survives (its segments are the live
        # set, which this vacuum never deletes).  Unparseable snapshot
        # files (should not occur: archives are tmp+rename) are removed
        # rather than skipped forever.
        snap_dir = os.path.join(path, "snapshots")
        if os.path.isdir(snap_dir):
            for name in os.listdir(snap_dir):
                spath = os.path.join(snap_dir, name)
                if name.endswith(".tmp"):
                    # leftover from a crashed archive write — transient
                    # by construction (we hold the writer lock)
                    with _contextlib.suppress(FileNotFoundError):
                        os.unlink(spath)
                    continue
                if not name.endswith(".json"):
                    continue
                try:
                    with open(spath) as f:
                        snap = json.load(f)
                except (OSError, ValueError):
                    with _contextlib.suppress(FileNotFoundError):
                        os.unlink(spath)
                    continue
                if any(
                    not os.path.isdir(os.path.join(idx_dir, f"seg={s}"))
                    for s in snap.get("segments", [])
                ) or any(
                    not os.path.isdir(os.path.join(tomb_dir, d))
                    for d in snap.get("tombstones", [])
                ):
                    os.unlink(spath)
        return removed


def delete_samples(
    spark: SparkSession, path: str, sample_ids: list[int]
) -> dict:
    """LOGICAL deletion of samples from a persisted store — tombstones,
    the Iceberg delete-file pattern applied to a Bloom index (a Bloom
    filter cannot physically unset bits; the reference has no delete at
    all).  The training-pipeline use case is takedown/opt-out: a sample
    must stop appearing in ANY search result immediately, while the
    physical bits are reclaimed only at the next full rebuild.

    Mechanics mirror segments: each delete writes one parquet tombstone
    file ``tombstones/d{N}/`` (sample_idx long, distinct, validated in
    range), and commits by listing it in ``manifest["tombstones"]`` via
    the atomic manifest rename — so a crash between write and commit
    leaves an invisible orphan (vacuum reclaims it), snapshot N applies
    exactly the tombstones committed AT snapshot N (time travel shows
    pre-delete results), and the whole op runs under store_lock.

    Readers: :func:`load_tombstones` -> anti-join on search results
    (api.query does this automatically).  Searches still SCAN the
    deleted samples' bits — cost of deletion is on the result edge, not
    the scan, which is the right trade for rare deletes; physical
    reclaim = :func:`compact_store` (zeroes the deleted columns in the
    rewritten segment) or a full rebuild (persist_index overwrite) from
    the retained docs.
    """
    import json
    import time

    from metaprofi_spark.operators.bloom_index import _write_manifest
    from metaprofi_spark.plans.lineage import read_lineage, _write_lineage

    ids = sorted(set(int(i) for i in sample_ids))
    if not ids:
        raise ValueError("delete_samples: empty sample_ids")
    with store_lock(path):
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        n = int(manifest["n_samples"])
        bad = [i for i in ids if not 0 <= i < n]
        if bad:
            raise ValueError(
                f"sample ids out of range [0, {n}): {bad[:5]}"
            )
        dname = f"d{manifest.get('delete_count', 0) + 1}"
        spark.createDataFrame(
            [(i,) for i in ids], "sample_idx long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "tombstones", dname)
        )
        manifest["tombstones"] = manifest.get("tombstones", []) + [dname]
        manifest["delete_count"] = manifest.get("delete_count", 0) + 1
        _write_manifest(path, manifest)
        lineage = read_lineage(path)
        lineage.setdefault("deletes", {})[dname] = {
            "n_ids": len(ids), "ts": int(time.time()),
        }
        _write_lineage(path, lineage)
        return manifest


def load_tombstones(spark: SparkSession, path: str, manifest: dict):
    """DataFrame(sample_idx) of the manifest's committed tombstones, or
    None when the store has none.  Pass the manifest from load_index —
    for a snapshot read that is the HISTORICAL manifest, so time travel
    applies exactly the deletes committed at that snapshot."""
    names = manifest.get("tombstones") or []
    if not names:
        return None
    paths = [os.path.join(path, "tombstones", d) for d in names]
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        # only reachable via a snapshot manifest whose tombstones a
        # vacuum reclaimed after a rollback — fail clearly, never
        # silently resurrect deleted samples
        raise FileNotFoundError(
            f"snapshot expired: tombstone files reclaimed: {missing}"
        )
    return spark.read.parquet(*paths).select("sample_idx").distinct()


def rollback_store(path: str, snapshot: int) -> dict:
    """Iceberg ``rollback_to_snapshot``: make the N-th committed
    snapshot the CURRENT state via a NEW commit on top of the history
    (never by rewinding the chain — the rolled-past snapshots stay
    readable until vacuum expires them).

    Visible state (segments, tombstones, n_samples, bucket size,
    config) comes from the snapshot; the name COUNTERS
    (update_count / compactions / delete_count / rebuild_count) carry
    forward as the max of current and snapshot values, so a
    post-rollback update can never reuse a segment name that a
    rolled-past snapshot still references (the same collision rule the
    compaction naming comment documents).  committed_segments stays the
    UNION — it is the exactly-once ledger and must never forget.
    """
    import json

    with store_lock(path):
        spath = os.path.join(path, "snapshots", f"v{int(snapshot)}.json")
        if not os.path.exists(spath):
            raise FileNotFoundError(
                f"snapshot {snapshot} does not exist in {path}/snapshots"
            )
        with open(spath) as f:
            snap = json.load(f)
        idx_dir = os.path.join(path, "index")
        missing = [
            s for s in snap.get("segments", [])
            if not os.path.isdir(os.path.join(idx_dir, f"seg={s}"))
        ] + [
            f"tombstones/{d}" for d in snap.get("tombstones", [])
            if not os.path.isdir(os.path.join(path, "tombstones", d))
        ]
        if missing:
            raise FileNotFoundError(
                f"snapshot {snapshot} expired: reclaimed by vacuum/compact: "
                f"{missing}"
            )
        with open(os.path.join(path, "manifest.json")) as f:
            cur = json.load(f)
        new = dict(snap)
        for key in ("update_count", "compactions", "delete_count",
                    "rebuild_count"):
            m = max(int(cur.get(key, 0)), int(snap.get(key, 0)))
            if m:
                new[key] = m
        # union EVERYTHING the ledger could have known: for a store
        # written before the committed_segments field, cur/snap carry
        # it only implicitly in the live segment lists and lineage —
        # omitting those would make a later at-least-once replay of a
        # named segment re-append (r4 review)
        from metaprofi_spark.plans.lineage import read_lineage

        new["committed_segments"] = sorted(
            set(cur.get("committed_segments") or [])
            | set(cur.get("segments") or [])
            | set(snap.get("committed_segments") or [])
            | set(snap.get("segments") or [])
            | set(read_lineage(path).get("updates", {}))
        )
        from metaprofi_spark.operators.bloom_index import _write_manifest

        _write_manifest(path, new)
        # _write_manifest assigns the new snapshot_id on disk; return
        # the COMMITTED state, not the pre-commit dict
        with open(os.path.join(path, "manifest.json")) as f:
            return json.load(f)
