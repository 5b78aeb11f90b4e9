"""Resumable partitioned validation — the production entry path.

Input layout: a directory of parquet files (Lance fragments when Lance
is available); ONE FILE = ONE PARTITION = the resume/lineage unit.

Per incomplete partition (skipped when its checkpoint record is done):
  1. fused stateless pass -> violations parquet artifact
  2. decode actor-pool pass -> decode violations artifact (optional)
  3. grouped-constraint PARTIAL aggregates per key -> partials artifact
     (the combiner half of the two-phase aggregate: stored, so the
     global merge never needs the raw rows again)
  4. metrics + lineage record -> checkpoint store (atomic)

Execution model: ONE Ray task per partition.  The partition is the unit
of parallelism — a fleet processes thousands of fragments concurrently,
each task streaming its file batch-by-batch through the same vectorized
kernels the Dataset path uses (StatelessValidator, _PartialAggregator,
BytesSuitePass).  This avoids paying a full Ray Dataset execution's
fixed cost (planning + scheduling + barrier) several times per
partition, which dominates when fragments are small; for large
fragments the in-task loop is memory-bounded (iter_batches streams).
Reads are branch-pruned AT THE SCAN: iter_batches(columns=...) reads
only what each branch touches, so the wide `bytes` column is never
decompressed unless the decode branch runs.  The checkpoint store's
atomic per-partition records keep resume semantics unchanged (store
root must be on a filesystem all workers share — same contract as the
artifact sinks).

Final merge (cheap, always re-run):
  * read all partitions' partials -> ONE groupby(key) -> grouped
    violations (cardinality/existential constraints hold GLOBALLY across
    partitions — duplicate clip_ids in different partitions are caught
    here, which a purely per-partition design would miss)
  * union with stored per-partition violations -> verdicts + report

Pass/fail is decided by ERROR-severity violations only; warnings are
counted separately (mirrors SuiteResult.report and the reference's
-5x warning / -10x error id split).

This mirrors the reference's accumulate-then-report lifecycle (dvt:167,
174-191) with crash-resume added (the reference restarts from scratch —
SURVEY.md §4).
"""

from __future__ import annotations

import glob
import os
import time
import uuid
from typing import Optional

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..checks.cardinality import _PartialAggregator
from ..checks.predicates import PREDICATE_COLUMNS
from ..sources.io import _cache_fsspec_http_import
from ..spec import ConstraintSpec
from ..stages.facet_stage import StatelessValidator, stateless_columns
from ..state.checkpoint import CheckpointStore

# concurrent partition threads issue Ray IO in parallel; make the
# path-resolver's per-call fsspec import race-free first
_cache_fsspec_http_import()

_BYTES_COLS = ("clip_id", "bytes", "transcript", "sr_hz", "dur_ms", "codec")


def _partition_id(partition: str) -> str:
    """Checkpoint-record id of a partition.  Lance ``<path>#<frag>`` ids
    map to ``<stem>_frag<frag>`` so every fragment gets its own record
    (a bare splitext would collapse all fragments of one table)."""
    if "#" in partition and partition.rsplit("#", 1)[0].endswith(".lance"):
        path, frag = partition.rsplit("#", 1)
        stem = os.path.splitext(os.path.basename(path))[0]
        return f"{stem}_frag{frag}"
    return os.path.splitext(os.path.basename(partition))[0]


def _run_partition(
    path: str,
    spec: ConstraintSpec,
    store_root: str,
    decode: bool,
    batch_size: Optional[int],
    key: Optional[str],
    cards: list,
    meta_exts: list,
    declared_universals: frozenset,
) -> dict:
    """Process ONE partition inside one Ray task: stream the partition's
    batches through the vectorized kernels, write artifacts, record the
    checkpoint.  No nested Ray Data execution — at fleet scale the outer
    task fan-out IS the parallelism.  ``path`` is a partition id in
    either form ``sources.io.iter_partition_batches`` accepts (parquet
    file path or Lance ``<path>#<fragment_id>``), so Lance fragments are
    first-class resume units here, not just in the listing."""
    import pyarrow.parquet as pq

    from ..sources.io import iter_partition_batches, partition_schema_and_rows
    from ..stages.decode_stage import (
        BytesSuitePass, combined_ext_partials, combined_violations)

    store = CheckpointStore(store_root)
    pid = _partition_id(path)
    t0 = time.time()
    names, n_rows = partition_schema_and_rows(path)   # metadata, no scan
    have_bytes = decode and "bytes" in names

    tmp_base = os.path.join(store.root, f"_tmp_{pid}_{uuid.uuid4().hex[:6]}")

    # ---- branch-pruned column sets -------------------------------------
    skip = ("bytes",) if have_bytes else ()
    sl_cols = [c for c in stateless_columns(spec, skip_columns=skip,
                                            include_universals=True)
               if c in names]
    part_cols = set()
    if key:
        part_cols.add(key)
    for c in cards:
        part_cols.add(c.column)
        if c.qualifier:
            part_cols |= PREDICATE_COLUMNS[c.qualifier]
    for e in meta_exts:
        part_cols |= PREDICATE_COLUMNS[e.predicate]
    # `bytes` stays in part_cols only if a qualifier genuinely reads it
    meta_cols = sorted((set(sl_cols) | part_cols) & names)

    sl = StatelessValidator(spec, skip_columns=skip, include_universals=True)
    do_partials = bool(key and (cards or meta_exts) and key in names)
    agg = _PartialAggregator(key, cards, meta_exts) if do_partials else None

    class _ArtifactStream:
        """Incremental artifact writer: each appended table flushes
        straight into an open ParquetWriter, so a pathological
        partition (every row violating) holds at most one BATCH of
        violations in task memory, never the partition's whole
        violation set (round-2 verdict item #8)."""

        def __init__(self, suffix: str):
            self.dir = tmp_base + suffix
            os.makedirs(self.dir, exist_ok=True)
            self.writer = None
            self.schema = None
            self.n = 0

        def append(self, tbl: pa.Table) -> None:
            if tbl.num_rows == 0:
                return
            if self.writer is None:
                self.schema = tbl.schema
                self.writer = pq.ParquetWriter(
                    os.path.join(self.dir, "part-0.parquet"), self.schema)
            if tbl.schema != self.schema:
                tbl = tbl.select(self.schema.names).cast(self.schema)
            self.writer.write_table(tbl)
            self.n += tbl.num_rows

        def publish(self, kind: str) -> None:
            if self.writer is not None:
                self.writer.close()
            store.publish_artifact(pid, kind, self.dir)

    import pyarrow.compute as pc

    viol_stream = _ArtifactStream("_violations")
    part_stream = _ArtifactStream("_partials") if agg is not None else None
    n_err = n_warn = 0

    def _add_viol(tbl: pa.Table) -> None:
        nonlocal n_err, n_warn
        if tbl.num_rows:
            sev = tbl.column("severity")
            n_err += pc.sum(pc.cast(pc.equal(sev, "error"),
                                    pa.int64())).as_py() or 0
            n_warn += pc.sum(pc.cast(pc.equal(sev, "warning"),
                                     pa.int64())).as_py() or 0
        viol_stream.append(tbl)

    if meta_cols:
        for rb in iter_partition_batches(path, batch_size=batch_size or 65536,
                                         columns=meta_cols):
            t = pa.Table.from_batches([rb])
            _add_viol(sl(t.select([c for c in sl_cols if c in t.column_names])))
            if agg is not None:
                part_stream.append(agg(t))

    if have_bytes:
        # decode=True: ONE streamed scan of the payload column; small
        # batches keep the wide bytes rows within the task heap
        bp = BytesSuitePass(universal_predicates=declared_universals)
        bytes_cols = [c for c in _BYTES_COLS if c in names]
        ext_stream = _ArtifactStream("_extpartials")
        for rb in iter_partition_batches(path, batch_size=256,
                                         columns=bytes_cols):
            comb = bp(pa.Table.from_batches([rb]))
            _add_viol(combined_violations(comb))
            ext_stream.append(combined_ext_partials(comb))
        ext_stream.publish("ext_partials")

    viol_stream.publish("violations")
    if part_stream is not None:
        part_stream.publish("partials")

    metrics = {"n_rows": n_rows, "lineage": path,
               "n_violations": n_err, "n_warnings": n_warn,
               "pass": n_err == 0, "runtime_s": time.time() - t0}
    store.record(pid, metrics)
    return metrics


# one Ray task per partition; _run_partition stays directly callable so
# the per-partition wiring is testable in-process (e.g. with a stub
# Lance backend that exists only in the driver's module table)
_partition_task = ray.remote(_run_partition)


def validate_partitioned(
    input_glob: str,
    spec: ConstraintSpec,
    store: CheckpointStore,
    decode: bool = False,
    batch_size: Optional[int] = None,
    refs: Optional[dict[str, "ray.data.Dataset"]] = None,
    max_inflight: Optional[int] = None,
    task_num_cpus: float = 1,
) -> dict:
    """Run/resume the partitioned validation; returns the merged report.

    One Ray task per partition; the cluster scheduler runs as many as
    CPU slots allow.  ``max_inflight`` optionally caps submitted-but-
    unfinished tasks (for memory-constrained artifact stores); resume
    granularity stays one partition (atomic checkpoint records).

    ``input_glob`` may be a parquet glob/dir or a Lance table path
    (``*.lance``): Lance tables list one partition per FRAGMENT via
    ``sources.io.partition_files`` and each task scans exactly its
    fragment — the fragment is the resume/lineage unit end-to-end.
    """
    from ..sources.io import partition_files, partition_schema_and_rows

    files = partition_files(input_glob)
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    done = store.completed()

    # constraint lists are filtered against the FIRST partition's schema
    # (all partitions of one table share it) so the partials' positional
    # ext{j}_n / card{i}_n columns stay consistent across partitions
    names0, _ = partition_schema_and_rows(files[0])
    key = spec.key_column
    cards = [c for c in spec.cardinalities
             if c.key == key and c.column in names0
             and (c.qualifier is None
                  or PREDICATE_COLUMNS.get(c.qualifier, {None}) <= names0)]
    exts = [e for e in spec.existentials
            if e.key == key
            and PREDICATE_COLUMNS.get(e.predicate, {None}) <= names0]
    # decode mode: bytes-derived existentials come from the decode scan's
    # stored ext_partials; metadata-only ones stay in the keyed partials.
    # NOTE: one store assumes one decode setting across its lifetime (the
    # partials' ext{j}_n column indices are positional in this list).
    meta_exts = ([e for e in exts if "bytes" not in PREDICATE_COLUMNS[e.predicate]]
                 if decode else exts)
    declared_universals = {u.predicate for u in spec.universals}

    todo = [p for p in files if _partition_id(p) not in done]
    n_skipped = len(files) - len(todo)
    if todo:
        import ray as _ray

        task = _partition_task.options(num_cpus=task_num_cpus)
        pending: list = []
        finished: list = []
        for path in todo:
            if max_inflight and len(pending) >= max_inflight:
                ready, pending = _ray.wait(pending, num_returns=1)
                finished.extend(ready)
            pending.append(task.remote(path, spec, store.root, decode,
                                       batch_size, key, cards, meta_exts,
                                       frozenset(declared_universals)))
        _ray.get(finished + pending)     # re-raises the first task failure
    n_ran = len(todo)

    # ---- global merge (always re-run; reads only stored artifacts) -------
    report: dict = {"partitions_total": len(files), "partitions_skipped": n_skipped,
                    "partitions_ran": n_ran}

    def _files(dirs: list[str]) -> list[str]:
        out = []
        for d in dirs:
            out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return out

    viol_files = _files(store.artifact_dirs("violations"))
    all_viol = ray.data.read_parquet(viol_files) if viol_files else None

    partial_files = _files(store.artifact_dirs("partials"))
    ext_files = _files(store.artifact_dirs("ext_partials"))
    # the ext list the stored partials were written with: positional
    # ext{j}_n columns — decode runs store bytes existentials separately
    part_exts_used = meta_exts if ext_files else exts
    if partial_files and key and (cards or exts):
        partials = ray.data.read_parquet(partial_files)
        have_cols = set(partials.schema().names)
        merge_exts = [e for j, e in enumerate(part_exts_used)
                      if f"ext{j}_n" in have_cols]
        sum_cols = [f"card{i}_n" for i in range(len(cards))
                    if f"card{i}_n" in have_cols]
        sum_cols += [f"ext{j}_n" for j in range(len(merge_exts))]
        sum_cols += ["n_rows"]
        emitter = _make_emitter(cards, merge_exts)
        # adaptive: the stored partials are one row per (key, block) —
        # small stores merge driver-side, large ones take the exchange
        from .relational import fits_driver_merge
        partials_m = partials.materialize()
        if fits_driver_merge(partials_m):
            df = partials_m.to_pandas()
            agg = df.groupby("key", sort=False)[sum_cols].sum().reset_index()
            t = pa.Table.from_pandas(agg, preserve_index=False) \
                .replace_schema_metadata(None)
            grouped = ray.data.from_arrow(emitter(t))
        else:
            merged = partials_m.groupby("key").aggregate(
                *[Sum(c, alias_name=c) for c in sum_cols])
            grouped = merged.map_batches(emitter, batch_format="pyarrow")
        all_viol = grouped if all_viol is None else all_viol.union(grouped)

    if ext_files:
        from ..stages.decode_stage import existential_violations_from_partials
        ev = existential_violations_from_partials(ray.data.read_parquet(ext_files))
        all_viol = ev if all_viol is None else all_viol.union(ev)

    # referential existence across ALL partitions: the stored partials
    # carry every present key, so the refs side anti-joins against them
    # without touching the raw rows again
    if refs and partial_files:
        from ..checks.referential import ref_existence_violations
        keys_ds = ray.data.read_parquet(partial_files).map_batches(
            lambda t: t.select(["key"]), batch_format="pyarrow")
        for ri in spec.ref_integrity:
            if ri.ref_table in refs:
                rv = ref_existence_violations(
                    refs[ri.ref_table], ri.ref_column, keys_ds, "key")
                all_viol = rv if all_viol is None else all_viol.union(rv)

    if all_viol is not None:
        # verdict counts via per-block value_counts partials merged on
        # the driver (tiny) — no second hash exchange
        import pandas as pd

        def count_partial(t: pa.Table) -> pa.Table:
            df = t.select(["check_id", "severity"]).to_pandas()
            agg = df.groupby(["check_id", "severity"], sort=False) \
                .size().rename("n").reset_index()
            return pa.Table.from_pandas(agg, preserve_index=False) \
                .replace_schema_metadata(None)

        parts = [b.to_pandas() for b in all_viol.map_batches(
            count_partial, batch_format="pyarrow",
            batch_size=None).iter_batches(batch_format="pyarrow", batch_size=None)]
        counts = (pd.concat(parts, ignore_index=True)
                  .groupby(["check_id", "severity"])["n"].sum().reset_index()
                  if parts else pd.DataFrame(columns=["check_id", "severity", "n"]))
        err = counts[counts.severity == "error"]
        warn = counts[counts.severity == "warning"]
        report["violations"] = {r["check_id"]: int(r["n"]) for _, r in err.iterrows()}
        report["warnings"] = {r["check_id"]: int(r["n"]) for _, r in warn.iterrows()}
    else:
        report["violations"] = {}
        report["warnings"] = {}
    recs = store.records()
    report["n_rows"] = sum(r.get("n_rows", 0) for r in recs)
    report["partitions"] = {
        r["partition_id"]: {"pass": r.get("pass", True),
                            "n_violations": r.get("n_violations", 0),
                            "n_warnings": r.get("n_warnings", 0),
                            "n_rows": r.get("n_rows", 0),
                            "lineage": r.get("lineage")}
        for r in recs
    }
    report["pass"] = not report["violations"]
    return report


def _make_emitter(cards, exts):
    import numpy as np
    from ..checks.base import empty_violations, make_violations
    from ..stages.base_ids import CARD_EXACT_100, CARD_MAX_100, CARD_MIN_100, SOME_100

    def emit(t: pa.Table) -> pa.Table:
        out = []
        keys = np.asarray(t.column("key").to_pylist(), dtype=object)
        for i, c in enumerate(cards):
            n = t.column(f"card{i}_n").to_numpy(zero_copy_only=False)
            if c.max_count is not None and (n > c.max_count).any():
                m = n > c.max_count
                out.append(make_violations(CARD_MAX_100, keys[m], c.column, n[m],
                                           expected=f"count<={c.max_count}"))
            if c.min_count is not None and (n < c.min_count).any():
                m = n < c.min_count
                out.append(make_violations(CARD_MIN_100, keys[m], c.column, n[m],
                                           expected=f"count>={c.min_count}"))
            if c.exact_count is not None and (n != c.exact_count).any():
                m = n != c.exact_count
                out.append(make_violations(CARD_EXACT_100, keys[m], c.column, n[m],
                                           expected=f"count=={c.exact_count}"))
        for j, e in enumerate(exts):
            n = t.column(f"ext{j}_n").to_numpy(zero_copy_only=False)
            if (n == 0).any():
                m = n == 0
                out.append(make_violations(SOME_100, keys[m], e.predicate, n[m],
                                           expected=f"some row satisfies {e.predicate}"))
        return pa.concat_tables(out).combine_chunks() if out else empty_violations()

    return emit
