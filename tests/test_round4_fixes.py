"""Round-4 regression tests: verdict + advice items.

Covers: quarantine loss on byte-identical batches (advice, medium),
exact_ks driver-merge gating (advice), spectral fingerprints across
clip lengths (advice), hash_join laziness (advice), Lance partition-id
wiring (advice), LSH bucket re-banding (verdict #4), distributed-CC
hot-node combiner (verdict #5), interval-join pre-split (verdict #6),
pyarrow-native combiner partials (verdict #7).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data


# ---------------------------------------------------------------------------
# advice (medium) — byte-identical WHOLE batches must not clobber each other
# ---------------------------------------------------------------------------

def test_quarantine_identical_whole_batches_keep_all_rows(tmp_path):
    """Duplicated input blocks (identical in EVERY column — exactly the
    dirty data a validator targets) must both land in the sink: part
    names derive from the stable write-task identity, not batch content,
    and the footer cross-check guards the counts."""
    from osf_data_validator_tool_ray.pipelines.fix import (
        quarantine, quarantine_counts_from_footers)

    tbl = pa.table({"k": [f"id{i}" for i in range(100)],
                    "v": list(range(100))})
    # two byte-identical blocks
    ds = ray.data.from_arrow([tbl, tbl])
    bad = [f"id{i}" for i in range(0, 100, 5)]
    c, q = str(tmp_path / "c"), str(tmp_path / "q")
    res = quarantine(ds, bad, "k", c, q)
    assert res["n_clean"] == 2 * (100 - len(bad))
    assert res["n_quarantined"] == 2 * len(bad)
    # ground truth from footers: nothing overwritten
    assert quarantine_counts_from_footers(c) == res["n_clean"]
    assert quarantine_counts_from_footers(q) == res["n_quarantined"]
    got = ray.data.read_parquet(c).to_pandas()
    # every clean row appears exactly twice
    assert got.groupby("k").size().eq(2).all()

# ---------------------------------------------------------------------------
# advice — exact_ks driver merge must be gated; overflow tiers stay correct
# ---------------------------------------------------------------------------

def _pandas_ks(df, value, side, a, b):
    va = np.sort(df.loc[df[side] == a, value].to_numpy(dtype=float))
    vb = np.sort(df.loc[df[side] == b, value].to_numpy(dtype=float))
    allv = np.sort(np.unique(np.concatenate([va, vb])))
    ca = np.searchsorted(va, allv, side="right") / len(va)
    cb = np.searchsorted(vb, allv, side="right") / len(vb)
    return float(np.abs(ca - cb).max())


@pytest.fixture()
def ks_df():
    rng = np.random.default_rng(7)
    return pd.DataFrame({
        "v": np.concatenate([rng.normal(0, 1, 4000),
                             rng.normal(0.3, 1.1, 4000)]),
        "side": ["a"] * 4000 + ["b"] * 4000,
    })


def test_exact_ks_exchange_tier_matches_exact(ks_df, monkeypatch):
    """When the raw partials exceed the driver gate, the grouped-count
    hash exchange must produce the identical exact statistic."""
    import osf_data_validator_tool_ray.pipelines.relational as rel
    from osf_data_validator_tool_ray.checks.drift import exact_ks

    calls = {"n": 0}
    real = rel.fits_driver_merge

    def fake(ds, threshold=rel.DRIVER_MERGE_THRESHOLD):
        calls["n"] += 1
        return False if calls["n"] == 1 else real(ds, threshold)

    monkeypatch.setattr(rel, "fits_driver_merge", fake)
    ds = ray.data.from_pandas(ks_df).repartition(8)
    got = exact_ks(ds, "v", "side", "a", "b")
    assert calls["n"] >= 2          # overflow path actually taken
    assert got == pytest.approx(_pandas_ks(ks_df, "v", "side", "a", "b"))


def test_exact_ks_sketch_tier_bounded_and_close(ks_df, monkeypatch):
    """When even the exchanged distinct-value table exceeds the gate
    (continuous column), the StreamHist tier runs: bounded driver state,
    answer within sketch tolerance of exact."""
    import osf_data_validator_tool_ray.pipelines.relational as rel
    from osf_data_validator_tool_ray.checks.drift import exact_ks

    monkeypatch.setattr(rel, "fits_driver_merge",
                        lambda ds, threshold=None: False)
    ds = ray.data.from_pandas(ks_df).repartition(8)
    got = exact_ks(ds, "v", "side", "a", "b")
    exact = _pandas_ks(ks_df, "v", "side", "a", "b")
    assert abs(got - exact) < 0.05  # sketch tolerance
