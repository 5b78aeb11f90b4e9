import numpy as np
import pandas as pd
import pytest

from osf_data_validator_tool_ray.functions.sketches import (
    BloomFilter,
    CountMin,
    HyperLogLog,
    StreamHist,
    freq_table_psi,
    ks_statistic,
    psi,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    a = HyperLogLog()
    b = HyperLogLog()
    va = pd.Series([f"k{i}" for i in rng.integers(0, 50_000, 80_000)])
    vb = pd.Series([f"k{i}" for i in rng.integers(25_000, 75_000, 80_000)])
    a.update(va)
    b.update(vb)
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    true = len(set(va) | set(vb))
    assert abs(merged.estimate() - true) / true < 0.05


def test_hll_small_range():
    h = HyperLogLog()
    h.update(pd.Series([f"x{i}" for i in range(100)]))
    assert abs(h.estimate() - 100) < 5


def test_countmin_heavy_hitters():
    rng = np.random.default_rng(2)
    vals = pd.Series(["hot"] * 5000 + [f"cold{i}" for i in rng.integers(0, 10_000, 5000)])
    a, b = CountMin(), CountMin()
    a.update(vals[:5000])
    b.update(vals[5000:])
    m = CountMin.from_bytes(a.to_bytes()).merge(b)
    est = m.query(pd.Series(["hot"]))[0]
    assert 5000 <= est <= 5200   # overestimates only, tightly


def test_bloom_no_false_negatives():
    keys = pd.Series([f"key{i}" for i in range(20_000)])
    bf = BloomFilter(n_bits=1 << 18)
    bf.update(keys)
    assert bf.contains(keys).all()
    absent = pd.Series([f"zzz{i}" for i in range(5000)])
    fp_rate = bf.contains(absent).mean()
    assert fp_rate < 0.05
    m = BloomFilter.from_bytes(bf.to_bytes())
    assert m.contains(keys).all()


def test_streamhist_quantiles_and_merge():
    rng = np.random.default_rng(3)
    x = rng.lognormal(3.0, 0.6, 200_000)
    a, b = StreamHist(), StreamHist()
    a.update(x[:100_000])
    b.update(x[100_000:])
    m = StreamHist.from_bytes(a.to_bytes()).merge(b)
    for q in (0.1, 0.5, 0.9):
        true = np.quantile(x, q)
        got = m.quantile(q)[0]
        assert abs(got - true) / true < 0.05, (q, got, true)
    assert m.n == 200_000


def test_ks_detects_shift():
    rng = np.random.default_rng(4)
    base = StreamHist().update(rng.normal(0, 1, 50_000))
    same = StreamHist().update(rng.normal(0, 1, 50_000))
    shifted = StreamHist().update(rng.normal(0.8, 1, 50_000))
    assert ks_statistic(base, same) < 0.05
    assert ks_statistic(base, shifted) > 0.2


def test_psi():
    assert psi(np.array([50, 50]), np.array([50, 50])) < 1e-9
    assert psi(np.array([90, 10]), np.array([10, 90])) > 1.0
    assert freq_table_psi({"a": 100, "b": 100}, {"a": 100, "b": 100}) < 1e-9
    assert freq_table_psi({"a": 200}, {"a": 100, "b": 100}) > 0.2
