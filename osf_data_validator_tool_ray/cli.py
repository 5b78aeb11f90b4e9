"""CLI driver — the engine's analog of the reference `dvt` script
(/root/reference/.../dvt: parse ini -> instantiate configured checks ->
inject context -> run() -> optional fix() -> append XML/JSON report).

    python -m osf_data_validator_tool_ray.cli \
        --input '/data/clips/*.parquet' [--refs /data/refs.parquet] \
        [--checkpoint-dir /ckpt] [--decode] [--fix --fix-dir /out] \
        [--baseline-profile profile.json] [--output-json report.json] \
        [--mode strict|loose] [--num-cpus 32]

Differences from the reference, by design:
  * checks run as streaming Ray Data pipelines, not sequential SPARQL
  * reports are JSON only (the XML writer was an artifact of the OSF
    stack); violations also land as a parquet sink for downstream use
  * --fix quarantines rows instead of mutating the source (see
    pipelines/fix.py)

This script OWNS the Ray session (init guarded / shutdown at exit);
library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="osf-dvt-ray")
    ap.add_argument("--input", required=True, help="parquet glob of the clips table")
    ap.add_argument("--refs", help="parquet path of the refs side table")
    ap.add_argument("--checkpoint-dir", help="enable resumable partitioned run")
    ap.add_argument("--decode", action="store_true", help="run the decode actor stage")
    ap.add_argument("--fix", action="store_true", help="quarantine violating rows")
    ap.add_argument("--fix-dir", default="/tmp/osfdvt_fix")
    ap.add_argument("--baseline-profile", help="drift baseline JSON path")
    ap.add_argument("--drift-slice-column",
                    help="also compare drift per slice of this column "
                         "(DRIFT-101 per segment; e.g. codec)")
    ap.add_argument("--write-profile", help="write the current profile JSON here")
    ap.add_argument("--output-json", help="report file (default: stdout)")
    ap.add_argument("--output-xml", help="XML report file (reference dual-format analog)")
    ap.add_argument("--violations-dir", help="violations parquet sink")
    ap.add_argument("--mode", default="strict", choices=["strict", "loose"])
    ap.add_argument("--spec", help="JSON constraint-spec file (spec_to_dict "
                    "format) — validates ANY table, not just clips")
    ap.add_argument("--checks", help="comma-separated check entries (dvt.ini "
                    "analog), e.g. 'schema,stateless,decode?profile=full,keyed'; "
                    "default: the full built-in suite")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--stats", action="store_true",
                    help="print ray Dataset per-stage stats to stderr")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data
    from .spec import clips_spec
    from .pipelines.runner import run_suite

    if args.spec:
        from .spec import spec_from_dict
        with open(args.spec) as f:
            spec = spec_from_dict(json.load(f))
        spec.params.setdefault("mode", args.mode)
    else:
        spec = clips_spec(mode=args.mode)
    report: dict = {}

    if args.checks:
        import pandas as pd
        from .checks.registry import RunContext, plan_checks
        files = sorted(glob.glob(args.input))
        ctx = RunContext(
            ds=ray.data.read_parquet(files), spec=spec,
            refs={"refs": ray.data.read_parquet(args.refs)} if args.refs else None,
            baseline_profile_path=args.baseline_profile)
        frames = [r.to_pandas() for r in plan_checks(ctx, args.checks.split(","))]
        v = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=["check_id", "severity", "key", "column", "observed", "expected"])
        err = v[v.severity == "error"].groupby("check_id").size().to_dict()
        report = {"pass": not err,
                  "violations": {k: int(n) for k, n in err.items()},
                  "warnings": {k: int(n) for k, n in
                               v[v.severity == "warning"].groupby("check_id").size().items()}}
        if args.violations_dir and len(v):
            ray.data.from_pandas(v).write_parquet(args.violations_dir)
            report["violations_dir"] = args.violations_dir
    elif args.checkpoint_dir:
        from .pipelines.partitioned import validate_partitioned
        from .state.checkpoint import CheckpointStore
        store = CheckpointStore(args.checkpoint_dir)
        refs = {"refs": ray.data.read_parquet(args.refs)} if args.refs else None
        report = validate_partitioned(args.input, spec, store, decode=args.decode,
                                      refs=refs)
    else:
        from .pipelines.runner import metadata_columns
        files = sorted(glob.glob(args.input))
        ds = ray.data.read_parquet(files)
        meta_ds = (ray.data.read_parquet(files, columns=metadata_columns(spec))
                   if args.decode else None)
        refs = {"refs": ray.data.read_parquet(args.refs)} if args.refs else None
        res = run_suite(ds, spec, refs=refs, decode=args.decode, metadata_ds=meta_ds)
        violations = res.violations
        if args.violations_dir:
            # deterministic output ordering: reproducible violation files
            # for parity diffs (SURVEY §7.4)
            violations.sort(["check_id", "key", "column"]).write_parquet(
                args.violations_dir)
            res.violations = ray.data.read_parquet(args.violations_dir)
        report = res.report()
        if args.stats:
            try:
                print(res.violations.stats(), file=sys.stderr)
            except Exception:   # stats() availability varies by plan shape
                pass
        if args.output_xml:
            with open(args.output_xml, "w") as f:
                f.write(res.report_xml())

    if args.baseline_profile or args.write_profile:
        from .checks.drift import TableProfile, build_profile, drift_violations
        ds = ray.data.read_parquet(sorted(glob.glob(args.input)))
        prof = build_profile(ds, numeric_cols=["dur_ms"],
                             cat_cols=["codec", "sr_hz"], key_cols=["clip_id"])
        if args.write_profile:
            with open(args.write_profile, "w") as f:
                f.write(prof.to_json())
        if args.baseline_profile:
            with open(args.baseline_profile) as f:
                base = TableProfile.from_json(f.read())
            dv = drift_violations(prof, base).to_pandas()
            report["drift"] = {"n_violations": len(dv),
                               "columns": sorted(set(dv["column"]))}
        if args.drift_slice_column:
            import json as _json

            from .checks.drift import (build_profiles_by_group,
                                       grouped_drift_violations)
            slices = build_profiles_by_group(
                ds, args.drift_slice_column, numeric_cols=["dur_ms"],
                cat_cols=["sr_hz"])
            slice_base_path = (args.baseline_profile or "") + ".slices"
            if args.write_profile:
                with open(args.write_profile + ".slices", "w") as f:
                    _json.dump({g: p.to_json() for g, p in slices.items()}, f)
            if args.baseline_profile and os.path.exists(slice_base_path):
                with open(slice_base_path) as f:
                    base_slices = {g: TableProfile.from_json(s)
                                   for g, s in _json.load(f).items()}
                gdv = grouped_drift_violations(slices, base_slices).to_pandas()
                report["slice_drift"] = {
                    "n_violations": int((gdv.check_id == "DRIFT-101").sum()),
                    "n_warnings": int((gdv.check_id == "DRIFT-50").sum()),
                    "slices": sorted(set(gdv["key"])),
                }

    if args.fix:
        from .pipelines.fix import quarantine
        ds = ray.data.read_parquet(sorted(glob.glob(args.input)))
        if args.checkpoint_dir:
            from .state.checkpoint import CheckpointStore
            store = CheckpointStore(args.checkpoint_dir)
            vfiles = []
            for d in store.artifact_dirs("violations"):
                vfiles.extend(glob.glob(os.path.join(d, "*.parquet")))
            bad = (ray.data.read_parquet(vfiles).to_pandas()["key"].dropna().unique()
                   if vfiles else [])
        elif args.checks:
            bad = v["key"].dropna().unique() if "key" in v.columns else []
        else:
            bad = res.violations.to_pandas()["key"].dropna().unique()
        # a CLI re-run owns its --fix-dir: clear stale parts rather than
        # refuse (the library default refuses so programmatic callers
        # can't silently mix runs)
        report["fix"] = quarantine(ds, list(bad), spec.key_column or "clip_id",
                                   os.path.join(args.fix_dir, "clean"),
                                   os.path.join(args.fix_dir, "quarantine"),
                                   overwrite=True)

    out = json.dumps(report, indent=1, default=str)
    if args.output_json:
        with open(args.output_json, "w") as f:
            f.write(out)
    else:
        print(out)
    ray.shutdown()
    return 0 if report.get("pass") else 1


if __name__ == "__main__":
    sys.exit(main())
