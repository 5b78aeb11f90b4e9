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

Final merge (cheap, always re-run):
  * read all partitions' partials -> ONE groupby(key) -> grouped
    violations (cardinality/existential constraints hold GLOBALLY across
    partitions — duplicate clip_ids in different partitions are caught
    here, which a purely per-partition design would miss)
  * union with stored per-partition violations -> verdicts + report

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
from ..spec import ConstraintSpec
from ..stages.facet_stage import StatelessValidator, stateless_columns
from ..state.checkpoint import CheckpointStore


def _partition_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def validate_partitioned(
    input_glob: str,
    spec: ConstraintSpec,
    store: CheckpointStore,
    decode: bool = False,
    batch_size: Optional[int] = None,
    refs: Optional[dict[str, "ray.data.Dataset"]] = None,
) -> dict:
    """Run/resume the partitioned validation; returns the merged report.

    Partitions are driven sequentially (each partition's pipeline is
    itself parallel over its blocks); resume granularity = partition.
    """
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    done = store.completed()

    key = spec.key_column
    cards = [c for c in spec.cardinalities if c.key == key]
    exts = [e for e in spec.existentials if e.key == key]

    n_skipped = n_ran = 0
    for path in files:
        pid = _partition_id(path)
        if pid in done:
            n_skipped += 1
            continue
        t0 = time.time()
        ds = ray.data.read_parquet(path)

        tmp_base = os.path.join(store.root, f"_tmp_{pid}_{uuid.uuid4().hex[:6]}")

        # decode=True: the fused pass is the ONE scan of the bytes column
        # (stateless drops its bytes-sniffing universals; the decodable
        # existential comes from the stored ext partials)
        have_bytes = decode and "bytes" in ds.schema().names
        cols = [c for c in stateless_columns(
            spec, skip_columns=("bytes",) if have_bytes else (),
            include_universals=not have_bytes) if c in ds.schema().names]
        viol = ds.select_columns(cols).map_batches(
            StatelessValidator(spec, skip_columns=("bytes",) if have_bytes else (),
                               include_universals=not have_bytes),
            batch_format="pyarrow",
            **({"batch_size": batch_size} if batch_size else {}))
        if have_bytes:
            from ..stages.decode_stage import bytes_suite_pass
            bytes_v, ext_p = bytes_suite_pass(ds)
            viol = viol.union(bytes_v)
            e_tmp = tmp_base + "_extpartials"
            ext_p.write_parquet(e_tmp)
            store.publish_artifact(pid, "ext_partials", e_tmp)
        v_tmp = tmp_base + "_violations"
        viol.write_parquet(v_tmp)
        vdir = store.publish_artifact(pid, "violations", v_tmp)

        # per-partition verdict from the written artifact's parquet
        # metadata (no recompute)
        import pyarrow.parquet as pq
        n_viol = sum(pq.ParquetFile(f).metadata.num_rows
                     for f in glob.glob(os.path.join(vdir, "*.parquet")))
        n_rows = ds.count()
        metrics = {"n_rows": n_rows, "lineage": path,
                   "n_violations": n_viol, "pass": n_viol == 0}

        # grouped-constraint partials: metadata only when the fused decode
        # pass already contributed the existential partials
        part_exts = [] if have_bytes else exts
        if key and (cards or part_exts) and key in ds.schema().names:
            partials = ds.map_batches(
                _PartialAggregator(key, cards, part_exts), batch_format="pyarrow",
                **({"batch_size": batch_size} if batch_size else {}))
            p_tmp = tmp_base + "_partials"
            partials.write_parquet(p_tmp)
            store.publish_artifact(pid, "partials", p_tmp)

        metrics["runtime_s"] = time.time() - t0
        store.record(pid, metrics)
        n_ran += 1

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
    if partial_files and key and (cards or exts):
        partials = ray.data.read_parquet(partial_files)
        # sum only the columns these partials carry: decode-fused runs
        # store existential partials separately (ext_partials artifacts)
        have_cols = set(partials.schema().names)
        merge_exts = [e for j, e in enumerate(exts) if f"ext{j}_n" in have_cols]
        sums = [Sum(f"card{i}_n", alias_name=f"card{i}_n")
                for i in range(len(cards)) if f"card{i}_n" in have_cols]
        sums += [Sum(f"ext{j}_n", alias_name=f"ext{j}_n")
                 for j in range(len(merge_exts))]
        sums += [Sum("n_rows", alias_name="n_rows")]
        merged = partials.groupby("key").aggregate(*sums)
        emitter = _make_emitter(cards, merge_exts)
        grouped = merged.map_batches(emitter, batch_format="pyarrow")
        all_viol = grouped if all_viol is None else all_viol.union(grouped)

    ext_files = _files(store.artifact_dirs("ext_partials"))
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
        counts = all_viol.groupby("check_id").count().to_pandas()
        counts = counts.rename(columns={"count()": "n"})
        report["violations"] = {r["check_id"]: int(r["n"]) for _, r in counts.iterrows()}
    else:
        report["violations"] = {}
    recs = store.records()
    report["n_rows"] = sum(r.get("n_rows", 0) for r in recs)
    report["partitions"] = {
        r["partition_id"]: {"pass": r.get("pass", True),
                            "n_violations": r.get("n_violations", 0),
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
