"""Referential-integrity / existence checks (anti-joins at scale).

Reference analog: CheckURIExistence — every referenced URI must exist
somewhere in datasets ∪ ontologies, evaluated as a SPARQL
`filter not exists` anti-join (CheckURIExistence.php:42-55); its fix()
deletes dangling triples (ibid.:392-480) — here the fix path quarantines
dangling rows to a sink instead of mutating the source.

Two scale regimes:

  * small key side  -> broadcast: collect the distinct key set (or a
    Bloom filter of it) on the driver via partial-distinct map_batches,
    ``ray.put`` once, filter the ref side per batch.  No shuffle.
  * both sides large -> union-groupby anti-join: per-batch distinct
    partials on both sides tagged {is_ref, is_key}, one
    ``groupby(key).aggregate(Max)`` exchange, keep rows with
    is_ref=1, is_key=0.  The per-batch distinct is the combiner that
    keeps the shuffle proportional to distinct keys, not rows.
    An optional Bloom prefilter (functions.sketches.BloomFilter) built
    from the key side splits refs into definite-miss (immediate
    violations, no shuffle) and maybe-present (small exact anti-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max

from ..checks.base import empty_violations, make_violations
from ..stages.base_ids import CARD_MIN_102, REF_EXISTENCE_100


def _distinct_partial(col: str, tag: str):
    def fn(batch: pa.Table) -> pa.Table:
        # per-batch distinct = the combiner that keeps the exchange
        # proportional to distinct keys; key dtype is preserved so int
        # keys stay ints (both sides of the union must share the dtype)
        vals = pa.array(pd.unique(batch.column(col).to_pandas().dropna()),
                        type=batch.schema.field(col).type)
        return pa.table({
            "key": vals,
            "is_ref": pa.array(np.full(len(vals), 1 if tag == "ref" else 0, dtype=np.int8)),
            "is_key": pa.array(np.full(len(vals), 1 if tag == "key" else 0, dtype=np.int8)),
        })
    return fn


def anti_join_missing(
    refs: "ray.data.Dataset",
    ref_column: str,
    keys: "ray.data.Dataset",
    key_column: str,
) -> "ray.data.Dataset":
    """Distinct ref values with no matching key value (big-big regime).

    One hash exchange over per-batch-distinct partials; returns a Dataset
    with a single `key` column of missing values.
    """
    from ..pipelines.relational import fits_driver_merge
    from .cardinality import coalesce_partials

    r = refs.select_columns([ref_column]).map_batches(
        _distinct_partial(ref_column, "ref"), batch_format="pyarrow", batch_size=None)
    k = keys.select_columns([key_column]).map_batches(
        _distinct_partial(key_column, "key"), batch_format="pyarrow", batch_size=None)

    def missing(t: pa.Table) -> pa.Table:
        m = (t.column("is_ref").to_numpy(zero_copy_only=False) == 1) & (
            t.column("is_key").to_numpy(zero_copy_only=False) == 0)
        return t.filter(pa.array(m)).select(["key"])

    # adaptive final merge (same pattern as the grouped checks): the
    # per-batch-distinct partials are bounded by distinct keys, so small
    # sets skip the hash exchange's fixed latency; at 10^12-key scale
    # the count exceeds the threshold and the shuffle path runs
    union_m = r.union(k).materialize()
    if fits_driver_merge(union_m):
        df = union_m.to_pandas()
        agg = df.groupby("key", sort=False).agg(
            is_ref=("is_ref", "max"), is_key=("is_key", "max")).reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)
        return ray.data.from_arrow(missing(t))

    merged = coalesce_partials(union_m).groupby("key").aggregate(
        Max("is_ref", alias_name="is_ref"), Max("is_key", alias_name="is_key"))
    return merged.map_batches(missing, batch_format="pyarrow")


def ref_existence_violations(
    refs: "ray.data.Dataset",
    ref_column: str,
    keys: "ray.data.Dataset",
    key_column: str,
    check_id: str = REF_EXISTENCE_100,
) -> "ray.data.Dataset":
    missing = anti_join_missing(refs, ref_column, keys, key_column)

    def to_violations(t: pa.Table) -> pa.Table:
        vals = t.column("key").to_pylist()
        if not vals:
            return empty_violations()
        return make_violations(check_id, vals, ref_column, vals,
                               expected=f"exists in {key_column}")

    return missing.map_batches(to_violations, batch_format="pyarrow")


def zero_edge_violations(
    expected_keys: "ray.data.Dataset",
    expected_column: str,
    ds: "ray.data.Dataset",
    key_column: str,
) -> "ray.data.Dataset":
    """CheckOwlRestrictionMin zero-occurrence edge
    (CheckOwlRestrictionMin.php:210-250): expected keys with NO rows at
    all — the groupby can never see them, so they come from this
    anti-join against the expected-key universe."""
    return ref_existence_violations(expected_keys, expected_column, ds, key_column,
                                    check_id=CARD_MIN_102)


def broadcast_membership_filter(
    refs: "ray.data.Dataset",
    ref_column: str,
    key_set_ref: "ray.ObjectRef",
) -> "ray.data.Dataset":
    """Broadcast regime: ``key_set_ref`` is ray.put(frozenset_of_keys) —
    shipped to each task once via the object store, never per batch.
    Returns distinct missing ref values per batch (caller unions)."""

    class Probe:
        def __init__(self):
            # once per actor: resolve the broadcast and pre-build the
            # Arrow value_set for vectorized pc.is_in probes
            keys = ray.get(key_set_ref)
            self.key_arr = pa.array(list(keys)) if keys else None

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = pa.array(pd.unique(batch.column(ref_column).to_pandas().dropna()),
                            type=batch.schema.field(ref_column).type)
            if self.key_arr is None:
                return pa.table({"key": vals})
            import pyarrow.compute as pc
            present = pc.is_in(vals, value_set=self.key_arr.cast(vals.type))
            return pa.table({"key": vals.filter(pc.invert(present))})

    cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
    return refs.select_columns([ref_column]).map_batches(
        Probe, batch_format="pyarrow", concurrency=(1, cpus))
