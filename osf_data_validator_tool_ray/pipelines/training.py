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
