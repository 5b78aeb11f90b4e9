"""Regression tests for the round-2 verdict / advice items fixed in
round 3 (distinct_counts gating, hash_join sparse-right guard,
deterministic_sample uint64, quarantine retry-safe sinks, bucket-pair
memory budget, as-of int64 composite keys, partition streaming writes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


# ---------------------------------------------------------------------------
# verdict #3 — distinct_counts adaptive gating
# ---------------------------------------------------------------------------

def _dc_frame(n=4000):
    rng = np.random.default_rng(7)
    return pd.DataFrame({
        "a": rng.integers(0, 700, n),                   # 700 distinct
        "b": [f"v{int(x)}" for x in rng.integers(0, 150, n)],  # 150 distinct
    })


def test_distinct_counts_overflow_path_matches_exact():
    from osf_data_validator_tool_ray.pipelines.relational import (
        distinct_counts)

    df = _dc_frame()
    ds = ray.data.from_pandas(df).repartition(5)
    exact = distinct_counts(ds, ["a", "b"])
    # threshold=0 forces the overflow (exchange) path on the same input
    forced = distinct_counts(ray.data.from_pandas(df).repartition(5),
                             ["a", "b"], threshold=0)
    assert exact.to_pydict() == forced.to_pydict()
    assert exact.column("n_a")[0].as_py() == df["a"].nunique()
    assert exact.column("n_b")[0].as_py() == df["b"].nunique()


def test_distinct_counts_hll_tier_within_tolerance():
    from osf_data_validator_tool_ray.pipelines.relational import (
        distinct_counts)

    df = _dc_frame(20_000)
    ds = ray.data.from_pandas(df).repartition(6)
    est = distinct_counts(ds, ["a", "b"], approx=True)
    for col, true in (("n_a", df["a"].nunique()), ("n_b", df["b"].nunique())):
        got = est.column(col)[0].as_py()
        assert abs(got - true) / true < 0.05   # p=14 => ~0.8% typical


# ---------------------------------------------------------------------------
# verdict #4 — hash_join sparse/small right side must not crash
# ---------------------------------------------------------------------------

def test_hash_join_sparse_right_side():
    from osf_data_validator_tool_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": np.arange(2000) % 40,
                         "x": np.arange(2000)})
    right = pd.DataFrame({"k": [0, 1, 2, 3, 39], "y": [10, 11, 12, 13, 14]})
    lds = ray.data.from_pandas(left).repartition(16)
    rds = ray.data.from_pandas(right)        # 5-row sparse right side
    got = hash_join(lds, rds, "k").to_pandas() \
        .sort_values(["k", "x"]).reset_index(drop=True)
    want = left.merge(right, on="k").sort_values(["k", "x"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "x", "y"]].astype({"k": "int64", "x": "int64", "y": "int64"}),
        want.astype({"k": "int64", "x": "int64", "y": "int64"}))


def test_hash_join_big_right_still_works():
    from osf_data_validator_tool_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": np.arange(300) % 50, "x": np.arange(300)})
    right = pd.DataFrame({"k": np.arange(50), "y": np.arange(50) * 2})
    got = hash_join(ray.data.from_pandas(left).repartition(4),
                    ray.data.from_pandas(right).repartition(4),
                    "k", broadcast_threshold=0,
                    use_native=False).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    assert got["y"].sum() == want["y"].sum()


# ---------------------------------------------------------------------------
# advice — deterministic_sample must not wrap for ids >= 2^31
# ---------------------------------------------------------------------------

def test_deterministic_sample_large_ids_match_sql():
    import duckdb

    from osf_data_validator_tool_ray.pipelines.relational import (
        deterministic_sample)

    ids = np.array([1, 2**31 - 1, 2**31, 2**33 + 7, 2**40 + 123,
                    3_470_000_000, 2**62 + 5], dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    got = deterministic_sample(ray.data.from_pandas(df), "doc_id",
                               permille=500).to_pandas()
    want = duckdb.sql(
        "SELECT doc_id FROM df WHERE "
        "((doc_id::HUGEINT * 2654435761) % 4294967296) % 1000 < 500"
    ).df()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
