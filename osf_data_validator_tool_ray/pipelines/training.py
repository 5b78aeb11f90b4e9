"""Training-data preparation operators: sequence packing and
stratified sampling.

These extend the corpus-curation family (pipelines/corpus.py) with the
two ops a pre-training data pipeline runs after dedup/quality: packing
documents into fixed token-budget sequences, and drawing reproducible
per-stratum samples.  Both are streaming Ray-Data-first; neither holds
corpus-sized state anywhere.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def pack_sequences(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> "ray.data.Dataset":
    """Greedy sequence packing: within each ``group_col`` value (the
    shard / source file — the standard packing unit, so packing is
    deterministic and resumable per shard), documents are taken in
    ``id_col`` order and appended to the current pack until adding the
    next would exceed ``budget`` tokens; then a new pack starts.  A
    single document larger than the budget gets its own (overflowing)
    pack — it is never split here (truncation is a separate policy).

    Returns (group, doc id, n_tokens, pack_id, pack_tokens) where
    ``pack_id`` is the 0-based pack index within the group and
    ``pack_tokens`` the pack's total.  One groupby exchange on the shard
    key; the per-group kernel is a vectorized cumsum-with-reset (numpy
    loop over PACK BOUNDARIES only, not rows-per-pack).

    Partitioning assumption (SURVEY §2.2 custom-operator contract): one
    group's rows fit in a worker heap — groups are shards by
    construction, already sized for that.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        toks = g[tokens_col].to_numpy(dtype=np.int64)
        n = len(toks)
        pack_ids = np.empty(n, dtype=np.int64)
        # greedy reset-on-overflow: iterate pack boundaries via
        # searchsorted on the running cumsum — O(#packs log n), not O(n)
        csum = np.concatenate([[0], np.cumsum(toks)])
        start = 0
        pid = 0
        while start < n:
            # furthest end with total <= budget; always take >= 1 doc
            end = int(np.searchsorted(csum, csum[start] + budget,
                                      side="right")) - 1
            end = max(end, start + 1)
            pack_ids[start:end] = pid
            start = end
            pid += 1
        out = g[[group_col, id_col, tokens_col]].copy()
        out["pack_id"] = pack_ids
        totals = np.bincount(pack_ids, weights=toks).astype(np.int64)
        out["pack_tokens"] = totals[pack_ids]
        return out

    return ds.select_columns([group_col, id_col, tokens_col]) \
        .groupby(group_col).map_groups(per_group, batch_format="pandas")


def split_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    train_permille: int = 800,
    val_permille: int = 100,
    knuth: int = 2654435761,
    mod: int = 1 << 32,
) -> "ray.data.Dataset":
    """Group-aware train/val/test assignment: the SPLIT is keyed on
    ``group_col``'s hash (not the row id), so all rows of one group —
    one user, one source document — land in the same split and never
    leak across the train/eval boundary.  Adds a ``split`` column
    ('train' | 'val' | 'test'); deterministic, SQL-expressible, no
    shuffle.  Non-integer group keys hash via their int64 cast."""

    def fn(t: pa.Table) -> pa.Table:
        g = t.column(group_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (g.astype(np.uint64) * np.uint64(knuth)) % np.uint64(mod)
        b = (h % np.uint64(1000)).astype(np.int64)
        split = np.where(b < train_permille, "train",
                         np.where(b < train_permille + val_permille,
                                  "val", "test")).astype(object)
        return t.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def chunk_documents(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    size: int,
    stride: int,
) -> "ray.data.Dataset":
    """Context-window chunking: split each document into windows of
    ``size`` characters starting every ``stride`` characters (overlap =
    size - stride).  A document of length L yields
    ``1 if L <= size else ceil((L - size) / stride) + 1`` chunks — the
    last window is the final ``<= size`` tail; empty/null texts yield
    one empty chunk (the row is preserved).

    Returns (id, chunk_id, chunk).  Vectorized bookkeeping (lengths,
    chunk counts, start offsets via repeat/arange); the string slices
    themselves are one Python slice per OUTPUT chunk — that copy IS the
    operator's work (proportional to emitted bytes), not avoidable
    per-row overhead."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        ids = t.column(id_col)
        lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                           count=len(texts))
        n_chunks = np.where(
            lens <= size, 1,
            ((lens - size + stride - 1) // stride) + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(texts)), n_chunks)
        chunk_id = np.concatenate([np.arange(n) for n in n_chunks]) \
            if len(texts) else np.array([], dtype=np.int64)
        starts = chunk_id * stride
        chunks = [texts[r][s:s + size]
                  for r, s in zip(row_idx, starts)]
        return pa.table({
            id_col: ids.take(pa.array(row_idx, type=pa.int64())),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "chunk": pa.array(chunks, type=pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=None)


def stratified_sample(
    ds: "ray.data.Dataset",
    strata_col: str,
    id_col: str,
    permille: Mapping,
    default_permille: int = 0,
    knuth: int = 2654435761,
    mod: int = 1 << 32,
) -> "ray.data.Dataset":
    """Reproducible per-stratum sampling: row kept iff
    ``((id * knuth) % mod) % 1000 < permille[stratum]`` — the
    deterministic_sample hash applied with a per-stratum rate (domain
    rebalancing: e.g. keep 100% of code, 5% of crawl).  The rate map is
    tiny and ships inside the task closure; per-batch fully vectorized;
    no shuffle; SQL-expressible for the oracle."""
    rates = dict(permille)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(knuth)) % np.uint64(mod)
        bucket = (h % np.uint64(1000)).astype(np.int64)
        strata = t.column(strata_col).to_pandas()
        limit = strata.map(rates).fillna(default_permille) \
            .to_numpy(dtype=np.int64)
        return t.filter(pa.array(bucket < limit))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
