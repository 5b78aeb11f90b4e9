"""Distribution-drift checks (KS / PSI) against a baseline profile.

The "ontology" analog here is a *baseline profile* artifact: per-column
streaming histograms (numeric), frequency tables (categorical) and HLL
sketches (cardinality), built once from a reference run and stored as a
small JSON/pickle file.  A validation run rebuilds the same profile from
the current table — per-block partials in ONE map_batches, merged
driver-side (sketches are monoids; no shuffle) — and compares:

  * numeric columns: KS statistic over merged histogram CDFs -> DRIFT-100
  * categorical columns: PSI over frequency tables -> DRIFT-100
  * key columns: HLL distinct-count ratio (dedup-rate drift)
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field
from typing import Optional

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.sketches import (
    HyperLogLog,
    StreamHist,
    freq_table_psi,
    ks_statistic,
)
from ..checks.base import empty_violations, make_violations
from ..stages.base_ids import DRIFT_100


def exact_ks(
    ds: "ray.data.Dataset",
    value_col: str,
    side_col: str,
    side_a,
    side_b,
) -> float:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the rows
    where ``side_col == side_a`` and ``side_col == side_b`` — the
    SQL-checkable tier of the drift family (the sketch tier above is
    the unbounded-cardinality path).

    ONE map_batches pass emits per-batch (value, n_a, n_b) count
    partials — bounded by the column's distinct-value count per batch,
    never its row count — then a tiny driver merge sorts the distinct
    values and takes max |ECDF_a - ECDF_b|.

    The driver merge is row+byte gated (``fits_driver_merge``, same
    contract as distinct_counts): on overflow the partials first take a
    grouped-count hash exchange (one row per GLOBAL distinct value —
    collapses cross-block duplicates), and if even that exceeds the gate
    (a genuinely continuous column: ~one distinct value per row) the
    check falls back to the StreamHist sketch-tier KS, which is bounded
    at max_bins centroids per side regardless of cardinality."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v": batch.column(value_col).to_pandas(),
            "a": (batch.column(side_col).to_pandas() == side_a)
            .astype("int64"),
            "b": (batch.column(side_col).to_pandas() == side_b)
            .astype("int64"),
        }).dropna(subset=["v"])
        agg = df.groupby("v", sort=False)[["a", "b"]].sum().reset_index()
        return pa.Table.from_pandas(agg[(agg.a > 0) | (agg.b > 0)],
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    from ..pipelines.relational import fits_driver_merge

    parts = ds.select_columns([value_col, side_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).materialize()
    if not fits_driver_merge(parts):
        # hash exchange: one row per global distinct value
        from ray.data.aggregate import Sum
        parts = parts.groupby("v").aggregate(
            Sum("a", alias_name="a"), Sum("b", alias_name="b")).materialize()
        if not fits_driver_merge(parts):
            # continuous high-cardinality column: bounded sketch tier
            return _streamhist_ks(ds, value_col, side_col, side_a, side_b)
    frames = [t.to_pandas()
              for t in parts.iter_batches(batch_format="pyarrow",
                                          batch_size=None)]
    if not frames:
        return 0.0
    agg = pd.concat(frames, ignore_index=True) \
        .groupby("v", sort=True)[["a", "b"]].sum()
    if len(agg) == 0:
        return 0.0
    na = agg["a"].to_numpy(dtype=np.float64)
    nb = agg["b"].to_numpy(dtype=np.float64)
    ta, tb = na.sum(), nb.sum()
    if ta == 0 or tb == 0:
        return 0.0
    return float(np.abs(np.cumsum(na) / ta - np.cumsum(nb) / tb).max())


def _streamhist_ks(
    ds: "ray.data.Dataset",
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    max_bins: int = 256,
) -> float:
    """Sketch-tier two-slice KS: one map_batches pass builds a
    StreamHist per side per block (bounded at max_bins centroids each),
    the driver merges the bounded partials and evaluates the CDF gap.
    The unbounded-cardinality path for exact_ks's overflow fallback."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        side = batch.column(side_col).to_numpy(zero_copy_only=False)
        out = []
        for tag, sel in (("a", side == side_a), ("b", side == side_b)):
            v = vals[sel]
            v = v[~pd.isna(v)]
            if len(v) == 0:
                continue
            h = StreamHist(max_bins)
            h.update(v.astype(np.float64))
            out.append((tag, base64.b64encode(h.to_bytes()).decode()))
        return pa.table({"side": pa.array([t for t, _ in out], type=pa.string()),
                         "hist": pa.array([s for _, s in out], type=pa.string())})

    merged: dict[str, StreamHist] = {}
    parts = ds.select_columns([value_col, side_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for tag, s in zip(b.column("side").to_pylist(),
                          b.column("hist").to_pylist()):
            h = StreamHist.from_bytes(base64.b64decode(s))
            merged[tag] = merged[tag].merge(h) if tag in merged else h
    if "a" not in merged or "b" not in merged:
        return 0.0
    return float(ks_statistic(merged["a"], merged["b"]))


@dataclass
class TableProfile:
    n_rows: int = 0
    numeric: dict[str, StreamHist] = field(default_factory=dict)
    categorical: dict[str, dict] = field(default_factory=dict)
    distinct: dict[str, HyperLogLog] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({
            "n_rows": self.n_rows,
            "numeric": {c: base64.b64encode(h.to_bytes()).decode()
                        for c, h in self.numeric.items()},
            "categorical": self.categorical,
            "distinct": {c: base64.b64encode(h.to_bytes()).decode()
                         for c, h in self.distinct.items()},
        })

    @classmethod
    def from_json(cls, s: str) -> "TableProfile":
        d = json.loads(s)
        return cls(
            n_rows=d["n_rows"],
            numeric={c: StreamHist.from_bytes(base64.b64decode(v))
                     for c, v in d["numeric"].items()},
            categorical=d["categorical"],
            distinct={c: HyperLogLog.from_bytes(base64.b64decode(v))
                      for c, v in d["distinct"].items()},
        )


def build_profile(
    ds: "ray.data.Dataset",
    numeric_cols: list[str],
    cat_cols: list[str],
    key_cols: Optional[list[str]] = None,
    max_bins: int = 128,
) -> TableProfile:
    """One streaming pass; per-block sketch partials merged on the driver.
    Partial size ~ KB/block regardless of block rows."""
    key_cols = key_cols or []
    cols = sorted(set(numeric_cols) | set(cat_cols) | set(key_cols))

    def partial(batch: pa.Table) -> pa.Table:
        prof = TableProfile(n_rows=batch.num_rows)
        for c in numeric_cols:
            h = StreamHist(max_bins)
            h.update(batch.column(c).to_numpy(zero_copy_only=False))
            prof.numeric[c] = h
        for c in cat_cols:
            vc = pd.Series(batch.column(c).to_pandas()).value_counts()
            prof.categorical[c] = {str(k): int(v) for k, v in vc.items()}
        for c in key_cols:
            hll = HyperLogLog()
            hll.update(batch.column(c).to_pandas())
            prof.distinct[c] = hll
        return pa.table({"profile": pa.array([prof.to_json()], type=pa.string())})

    merged = TableProfile()
    parts = ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for s in b.column("profile").to_pylist():
            p = TableProfile.from_json(s)
            merged.n_rows += p.n_rows
            for c, h in p.numeric.items():
                merged.numeric[c] = merged.numeric[c].merge(h) if c in merged.numeric else h
            for c, t in p.categorical.items():
                acc = merged.categorical.setdefault(c, {})
                for k, v in t.items():
                    acc[k] = acc.get(k, 0) + v
            for c, h in p.distinct.items():
                merged.distinct[c] = merged.distinct[c].merge(h) if c in merged.distinct else h
    return merged


def build_profiles_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    numeric_cols: list[str],
    cat_cols: Optional[list[str]] = None,
    max_bins: int = 128,
) -> dict[str, TableProfile]:
    """Per-slice profiles (TFDV-style segment drift): one TableProfile
    per distinct ``group_col`` value, built in ONE streaming pass —
    per-(block, group) sketch partials merged driver-side.  Partial
    volume is O(blocks x groups x KB); assumes low group cardinality
    (codec, language, source — the slicing columns validation cares
    about)."""
    cat_cols = cat_cols or []
    cols = sorted(set(numeric_cols) | set(cat_cols) | {group_col})

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        out_g, out_p = [], []
        for gval, sub in df.groupby(group_col, sort=False, dropna=True):
            prof = TableProfile(n_rows=len(sub))
            for c in numeric_cols:
                h = StreamHist(max_bins)
                h.update(sub[c].to_numpy())
                prof.numeric[c] = h
            for c in cat_cols:
                vc = sub[c].value_counts()
                prof.categorical[c] = {str(k): int(v) for k, v in vc.items()}
            out_g.append(str(gval))
            out_p.append(prof.to_json())
        return pa.table({"group": pa.array(out_g, type=pa.string()),
                         "profile": pa.array(out_p, type=pa.string())})

    merged: dict[str, TableProfile] = {}
    parts = ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for g, s in zip(b.column("group").to_pylist(),
                        b.column("profile").to_pylist()):
            p = TableProfile.from_json(s)
            acc = merged.setdefault(g, TableProfile())
            acc.n_rows += p.n_rows
            for c, h in p.numeric.items():
                acc.numeric[c] = acc.numeric[c].merge(h) if c in acc.numeric else h
            for c, t in p.categorical.items():
                d = acc.categorical.setdefault(c, {})
                for k, v in t.items():
                    d[k] = d.get(k, 0) + v
    return merged


def grouped_drift_violations(
    current: dict[str, TableProfile],
    baseline: dict[str, TableProfile],
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> pa.Table:
    """DRIFT-101 per slice: compare each group's profile against the
    same group's baseline; slices present on only one side get a
    warning (DRIFT-50 — unevaluable, mirroring the -5x tier)."""
    out = []
    for g in sorted(set(current) | set(baseline)):
        if g not in current or g not in baseline:
            out.append(make_violations("DRIFT-50", [g], "slice",
                                       ["missing" if g not in current
                                        else "new slice"],
                                       expected="slice present in both profiles",
                                       severity="warning"))
            continue
        cur, base = current[g], baseline[g]
        for c, hist in cur.numeric.items():
            if c not in base.numeric:
                continue
            ks = ks_statistic(hist, base.numeric[c])
            if ks > ks_threshold:
                out.append(make_violations("DRIFT-101", [g], c,
                                           [f"ks={ks:.4f}"],
                                           expected=f"ks<={ks_threshold}"))
        for c, table in cur.categorical.items():
            if c not in base.categorical:
                continue
            v = freq_table_psi(base.categorical[c], table)
            if v > psi_threshold:
                out.append(make_violations("DRIFT-101", [g], c,
                                           [f"psi={v:.4f}"],
                                           expected=f"psi<={psi_threshold}"))
    return pa.concat_tables(out) if out else empty_violations()


def drift_violations(
    current: TableProfile,
    baseline: TableProfile,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
) -> pa.Table:
    out = []
    for c, hist in current.numeric.items():
        if c not in baseline.numeric:
            continue
        ks = ks_statistic(hist, baseline.numeric[c])
        if ks > ks_threshold:
            out.append(make_violations(DRIFT_100, [None], c, [f"ks={ks:.4f}"],
                                       expected=f"ks<={ks_threshold}"))
    for c, table in current.categorical.items():
        if c not in baseline.categorical:
            continue
        v = freq_table_psi(baseline.categorical[c], table)
        if v > psi_threshold:
            out.append(make_violations(DRIFT_100, [None], c, [f"psi={v:.4f}"],
                                       expected=f"psi<={psi_threshold}"))
    for c, hll in current.distinct.items():
        if c not in baseline.distinct:
            continue
        cur, base = hll.estimate(), baseline.distinct[c].estimate()
        # normalize by row counts: distinct-per-row ratio drift
        cur_r = cur / max(current.n_rows, 1)
        base_r = base / max(baseline.n_rows, 1)
        ratio = cur_r / max(base_r, 1e-12)
        lo, hi = distinct_ratio_band
        if not (lo <= ratio <= hi):
            out.append(make_violations(DRIFT_100, [None], c,
                                       [f"distinct_ratio={ratio:.3f}"],
                                       expected=f"in [{lo},{hi}]"))
    return pa.concat_tables(out) if out else empty_violations()
