"""Mergeable sketch UDAFs: HLL, count–min, KLL over DataFrames.

All three share the Bloom build's execution shape (SURVEY.md §2.4 A1):

  stage 1 (map, ``mapInPandas``): fold each task's rows into ONE partial
      sketch per group — the map-side combine Catalyst cannot inject
      into pandas UDAFs, done explicitly so only fixed-size sketch
      blobs cross the shuffle, never raw rows;
  stage 2 (reduce, ``groupBy().applyInPandas``): merge partials with the
      sketch's associative+commutative merge (max / sum / compact).

Built-in cross-checks (used by tests, not by these implementations):
``approx_count_distinct`` (HLL++), SQL ``count_min_sketch``,
``percentile_approx``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from metaprofi_spark.kernels import hll as H
from metaprofi_spark.kernels.arrowbuf import utf8_values
from metaprofi_spark.kernels import cms as C
from metaprofi_spark.kernels.kll import KLLSketch


def _group_ddl(df: DataFrame, group_cols: list[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {fields[c]}" for c in group_cols)


def _partial_final(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    new_acc,
    fold,          # (acc, value_series) -> None
    merge_blobs,   # list[bytes] -> bytes
    out_cols_ddl: str,
    finalize,      # bytes -> dict of output column -> scalar
) -> DataFrame:
    gddl = _group_ddl(df, group_cols)
    partial_schema = f"{gddl}, sketch binary"

    def partial(batches):
        accs: dict[tuple, object] = {}
        keyvals: dict[tuple, tuple] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                acc = accs.get(key)
                if acc is None:
                    acc = accs[key] = new_acc()
                    keyvals[key] = key
                fold(acc, sub[value_col])
        rows = {c: [] for c in group_cols}
        blobs = []
        for key, acc in accs.items():
            for c, v in zip(group_cols, keyvals[key]):
                rows[c].append(v)
            blobs.append(serialize_acc(acc))
        rows["sketch"] = blobs
        yield pd.DataFrame(rows)

    def serialize_acc(acc):
        return acc.serialize() if hasattr(acc, "serialize") else acc

    final_schema = f"{gddl}, {out_cols_ddl}, sketch binary"

    def final(key, pdf):
        blob = merge_blobs(list(pdf["sketch"]))
        out = {c: [v] for c, v in zip(group_cols, key)}
        for name, val in finalize(blob).items():
            out[name] = [val]
        out["sketch"] = [blob]
        return pd.DataFrame(out)

    partials = df.select(*group_cols, value_col).mapInPandas(partial, partial_schema)
    return partials.groupBy(*group_cols).applyInPandas(final, final_schema)


# ---------------------------------------------------------------------------
# HLL — distinct cardinality
# ---------------------------------------------------------------------------

def hll_agg(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 12
) -> DataFrame:
    """Per-group HLL: (group..., n_distinct_est double, sketch binary)."""

    def merge_blobs(blobs):
        regs = H.hll_deserialize(blobs[0])
        for b in blobs[1:]:
            regs = H.hll_merge(regs, H.hll_deserialize(b))
        return H.hll_serialize(regs)

    def finalize(blob):
        return {"n_distinct_est": float(H.hll_estimate(H.hll_deserialize(blob)))}

    class _Acc:
        __slots__ = ("regs",)

        def __init__(self):
            self.regs = H.hll_init(p)

        def serialize(self):
            return H.hll_serialize(self.regs)

    def fold(acc, series):
        # Arrow C path with interpreter fallback (kernels/arrowbuf.py)
        H.hll_add(acc.regs, utf8_values(series))

    return _partial_final(
        df, group_cols, value_col, _Acc, fold, merge_blobs,
        "n_distinct_est double", finalize,
    )


# ---------------------------------------------------------------------------
# CMS — frequency estimates
# ---------------------------------------------------------------------------

def cms_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Per-group count–min sketch: (group..., n_total long, sketch binary).

    ``value_col`` values are counted once each (pre-explode tokens
    upstream; pre-aggregated (value, count) folding is available on the
    kernel directly).
    """

    class _Acc:
        __slots__ = ("table", "n")

        def __init__(self):
            self.table = C.cms_init(depth, width)
            self.n = 0

        def serialize(self):
            return np.int64(self.n).tobytes() + C.cms_serialize(self.table)

    def fold(acc, series: pd.Series):
        counts = series.value_counts()
        vals = utf8_values(pd.Series(counts.index))
        C.cms_add(acc.table, vals, counts.to_numpy().astype(np.int64))
        acc.n += int(counts.sum())

    def merge_blobs(blobs):
        n = sum(int(np.frombuffer(b[:8], dtype=np.int64)[0]) for b in blobs)
        table = C.cms_deserialize(blobs[0][8:])
        for b in blobs[1:]:
            table = C.cms_merge(table, C.cms_deserialize(b[8:]))
        return np.int64(n).tobytes() + C.cms_serialize(table)

    def finalize(blob):
        return {"n_total": int(np.frombuffer(blob[:8], dtype=np.int64)[0])}

    return _partial_final(
        df, group_cols, value_col, _Acc, fold, merge_blobs, "n_total long", finalize
    )


def cms_query_blob(blob: bytes, keys: list[str]) -> dict[str, int]:
    """Point-query a serialized CMS blob (driver side)."""
    table = C.cms_deserialize(blob[8:])
    ests = C.cms_query(table, [k.encode("utf-8") for k in keys])
    return {k: int(e) for k, e in zip(keys, ests)}


def cms_estimate_df(
    df: DataFrame, value_col: str, blob: bytes, out_col: str = "est"
) -> DataFrame:
    """Distributed point-queries against one merged CMS blob.

    The blob is a FIXED-SIZE sketch (depth*width counters) shipped to
    executors via a Spark broadcast; estimates run vectorized inside
    ``mapInPandas`` over the (distributed) key DataFrame — the scale
    path for "estimate every distinct token", where collecting the key
    set to the driver would OOM at corpus scale.
    """
    sc = df.sparkSession.sparkContext
    bblob = sc.broadcast(bytes(blob))

    def fn(batches):
        table = C.cms_deserialize(bblob.value[8:])
        for pdf in batches:
            # drop_null=False: estimates must stay row-aligned with the
            # input batch (a null key estimates as the string "None",
            # matching the pre-Arrow str(v) behavior)
            vals = utf8_values(pdf[value_col], drop_null=False)
            ests = C.cms_query(table, vals)
            yield pd.DataFrame(
                {value_col: pdf[value_col], out_col: pd.array(ests, dtype="int64")}
            )

    return df.select(value_col).mapInPandas(fn, f"{value_col} string, {out_col} long")


# ---------------------------------------------------------------------------
# KLL — quantiles
# ---------------------------------------------------------------------------

def kll_agg(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL sketch: (group..., n long, sketch binary)."""

    def new_acc():
        return KLLSketch(k)

    def fold(acc: KLLSketch, series: pd.Series):
        acc.add(series.dropna().to_numpy(dtype=np.float64))

    def merge_blobs(blobs):
        sk = KLLSketch.deserialize(blobs[0])
        for b in blobs[1:]:
            sk = sk.merge(KLLSketch.deserialize(b))
        return sk.serialize()

    def finalize(blob):
        return {"n": int(KLLSketch.deserialize(blob).n)}

    return _partial_final(
        df, group_cols, value_col, new_acc, fold, merge_blobs, "n long", finalize
    )


def tdigest_agg(
    df: DataFrame, group_cols: list[str], value_col: str, compression: float = 100.0
) -> DataFrame:
    """Per-group t-digest: (group..., n long, sketch binary)."""
    from metaprofi_spark.kernels.tdigest import TDigest

    def new_acc():
        return TDigest(compression)

    def fold(acc: TDigest, series: pd.Series):
        acc.add(series.dropna().to_numpy(dtype=np.float64))

    def merge_blobs(blobs):
        td = TDigest.deserialize(blobs[0])
        for b in blobs[1:]:
            td = td.merge(TDigest.deserialize(b))
        return td.serialize()

    def finalize(blob):
        return {"n": int(TDigest.deserialize(blob).n)}

    return _partial_final(
        df, group_cols, value_col, new_acc, fold, merge_blobs, "n long", finalize
    )


def kmv_agg(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 8192
) -> DataFrame:
    """Per-group KMV bottom-k distinct sketch (kernels/kmv.py):
    (group..., n_distinct_est double, sketch binary).

    The estimate is EXACT while a group's distinct-value count stays
    under k (the sketch is then the full hash set) — the tier the
    hash-exact gate row pins; saturated sketches fall back to the
    unbiased (k-1)/U_(k) estimator with ~1/sqrt(k-2) relative error.
    """
    from metaprofi_spark.kernels import kmv as K

    class _Acc:
        __slots__ = ("state",)

        def __init__(self):
            self.state = K.kmv_init()

        def serialize(self):
            return K.kmv_serialize(self.state)

    def fold(acc: _Acc, series: pd.Series):
        acc.state = K.kmv_add(acc.state, utf8_values(series), k)

    def merge_blobs(blobs):
        state = K.kmv_deserialize(blobs[0])
        for b in blobs[1:]:
            state = K.kmv_merge(state, K.kmv_deserialize(b), k)
        return K.kmv_serialize(state)

    def finalize(blob):
        return {"n_distinct_est": K.kmv_estimate(K.kmv_deserialize(blob), k)}

    return _partial_final(
        df, group_cols, value_col, _Acc, fold, merge_blobs,
        "n_distinct_est double", finalize,
    )


def kmv_pairwise_ops(agg_df: DataFrame, group_col: str, k: int,
                     require_exact: bool = False) -> DataFrame:
    """All-pairs set-operation estimates between the groups of a
    ``kmv_agg`` result: (g_a, g_b, n_a, n_b, n_intersection, n_union)
    for g_a < g_b.

    The sketches (one fixed-size blob per group — language, domain,
    shard) are collected to the driver and combined pairwise in numpy;
    this is the theta-sketch serving shape: set algebra happens on
    merged synopses AFTER the one distributed pass, never by
    re-shuffling raw values.  Bounded by #groups collected blobs and
    #groups² pairwise ops, independent of corpus size.  Estimates are
    exact when both sketches are unsaturated (kernels/kmv.py)."""
    from metaprofi_spark.kernels import kmv as K

    rows = agg_df.select(group_col, "sketch").collect()
    sketches = {r[0]: K.kmv_deserialize(r[1]) for r in rows}
    if require_exact:
        # exact-tier guard (the hash-exact gate row): a saturated
        # sketch would silently degrade to estimates — fail loudly
        sat = sorted(g for g, s in sketches.items() if len(s) >= k)
        if sat:
            raise ValueError(
                f"kmv exact tier requires n_distinct < k={k}; "
                f"saturated groups: {sat}"
            )
    names = sorted(sketches)
    out = []
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            ops = K.kmv_set_ops(sketches[ga], sketches[gb], k)
            out.append((ga, gb, ops["n_a"], ops["n_b"],
                        ops["intersection"], ops["union"]))
    return agg_df.sparkSession.createDataFrame(
        out,
        f"g_a {agg_df.schema[group_col].dataType.simpleString()}, "
        f"g_b {agg_df.schema[group_col].dataType.simpleString()}, "
        "n_a double, n_b double, n_intersection double, n_union double",
    )


def mg_agg(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 4096
) -> DataFrame:
    """Per-group Misra–Gries heavy-hitters sketch (kernels/mg.py):
    (group..., n_counters long, decremented boolean, sketch binary).

    Counts are EXACT while no partial ever exceeded k distinct values
    (decremented = false — assertable, unlike CMS/HLL); otherwise each
    count is within n/(k+1)-degraded MG bounds and every item above
    that frequency is guaranteed present."""
    from metaprofi_spark.kernels.mg import MGSketch

    def new_acc():
        return MGSketch(k)

    def fold(acc: MGSketch, series: pd.Series):
        acc.fold_series(series)

    def merge_blobs(blobs):
        sk = MGSketch.deserialize(blobs[0])
        for b in blobs[1:]:
            sk = sk.merge(MGSketch.deserialize(b))
        return sk.serialize()

    def finalize(blob):
        sk = MGSketch.deserialize(blob)
        return {"n_counters": len(sk.counters), "decremented": sk.decremented}

    return _partial_final(
        df, group_cols, value_col, new_acc, fold, merge_blobs,
        "n_counters long, decremented boolean", finalize,
    )


def mg_topk(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    topn: int,
    k: int = 4096,
    require_exact: bool = False,
) -> DataFrame:
    """Per-group top-n frequent values WITHOUT a watch list:
    (group..., value string, cnt long, rank int), rank by count desc
    then value asc (total order — deterministic).

    require_exact raises if any partial decremented (counts would be
    lower bounds, items below n/(k+1) possibly missing) — the gate
    row's loud exact-tier guard."""
    from metaprofi_spark.kernels.mg import MGSketch

    agg = mg_agg(df, group_cols, value_col, k)
    gddl = _group_ddl(df, group_cols)
    schema = f"{gddl}, {value_col} string, cnt long, rank int"

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        # one merged-sketch row per group frame (see kll_quantiles)
        rows = {c: [] for c in pdf.columns if c in set(group_cols)}
        rows.update({value_col: [], "cnt": [], "rank": []})
        for _, r in pdf.iterrows():
            sk = MGSketch.deserialize(r["sketch"])
            if require_exact and sk.decremented:
                raise ValueError(
                    f"mg exact tier requires <= k={k} distinct values "
                    f"per partial; group {tuple(r[c] for c in group_cols)} "
                    "decremented"
                )
            for rank, (v, c) in enumerate(sk.topk(topn), start=1):
                for gc in group_cols:
                    rows[gc].append(r[gc])
                rows[value_col].append(v.decode("utf-8"))
                rows["cnt"].append(c)
                rows["rank"].append(rank)
        return pd.DataFrame(
            {c: rows[c] for c in (*group_cols, value_col, "cnt", "rank")}
        )

    return agg.groupBy(*group_cols).applyInPandas(
        lambda key, pdf: expand(pdf), schema
    )


def kll_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    k: int = 200,
) -> DataFrame:
    """Per-group quantile estimates: (group..., qp double, value double)."""
    agg = kll_agg(df, group_cols, value_col, k)
    gddl = _group_ddl(df, group_cols)
    schema = f"{gddl}, qp double, value double"

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas hands each GROUP as one frame, and kll_agg
        # yields exactly one merged-sketch row per group — so this
        # "loop" runs once per frame; no vectorization to be had
        rows = {c: [] for c in group_cols}
        rows["qp"], rows["value"] = [], []
        for _, r in pdf.iterrows():
            sk = KLLSketch.deserialize(r["sketch"])
            for q in qs:
                for c in group_cols:
                    rows[c].append(r[c])
                rows["qp"].append(float(q))
                rows["value"].append(sk.quantile(q))
        return pd.DataFrame(rows)

    return agg.groupBy(*group_cols).applyInPandas(
        lambda key, pdf: expand(pdf), schema
    )
