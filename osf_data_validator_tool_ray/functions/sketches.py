"""Mergeable sketches — the approximate tier for 10^12-row validation.

All sketches are commutative monoids: build one per block inside
``map_batches`` (vectorized over the batch), serialize to bytes, merge
either driver-side (few KB per block) or in a tree.  No shuffle is ever
needed for a sketch-backed check.

Implementations follow the public algorithms:
  * HyperLogLog (Flajolet et al. 2007) with the standard bias/small-range
    corrections
  * Count-Min (Cormode & Muthukrishnan 2005)
  * Bloom filter (Bloom 1970), double hashing (Kirsch & Mitzenmacher)
  * Streaming histogram (Ben-Haim & Tom-Tov 2010) for quantiles — the
    mergeable t-digest-style quantile sketch
  * KLL compactor sketch (Karnin-Lang-Liberty 2016) — the
    provable-rank-error quantile tier
  * KS statistic from merged CDFs; PSI over fixed baseline bins
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd


def _hash_u64(values) -> np.ndarray:
    arr = values.to_numpy() if isinstance(values, pd.Series) else np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        return pd.util.hash_array(np.asarray(arr, dtype=object),
                                  hash_key="0123456789abcdef").astype(np.uint64)
    return pd.util.hash_array(arr).astype(np.uint64)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, values) -> "HyperLogLog":
        h = _hash_u64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)          # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers))

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(b)
        s = cls(p)
        s.registers = regs
        return s


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

class CountMin:
    def __init__(self, width: int = 2048, depth: int = 5, seed: int = 17):
        self.width, self.depth = width, depth
        rng = np.random.default_rng(seed)
        self.salts = rng.integers(1, 1 << 62, size=depth, dtype=np.uint64)
        self.table = np.zeros((depth, width), dtype=np.int64)

    def update(self, values) -> "CountMin":
        h = _hash_u64(values)
        for d in range(self.depth):
            hd = (h * np.uint64(0x9E3779B97F4A7C15) ^ self.salts[d])
            idx = (hd % np.uint64(self.width)).astype(np.int64)
            np.add.at(self.table[d], idx, 1)
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        return self

    def query(self, values) -> np.ndarray:
        h = _hash_u64(values)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            hd = (h * np.uint64(0x9E3779B97F4A7C15) ^ self.salts[d])
            idx = (hd % np.uint64(self.width)).astype(np.int64)
            est = np.minimum(est, self.table[d][idx])
        return est

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.width, self.depth, self.salts, self.table))

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        w, d, salts, table = pickle.loads(b)
        s = cls.__new__(cls)
        s.width, s.depth, s.salts, s.table = w, d, salts, table
        return s


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.n_bits, self.k = n_bits, k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        h1 = _hash_u64(values)
        pos = np.empty((self.k, len(h1)), dtype=np.uint64)
        for i in range(self.k):
            # splitmix64 finalizer per probe: decorrelates the k positions
            z = h1 + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            pos[i] = z % np.uint64(self.n_bits)
        return pos

    def update(self, values) -> "BloomFilter":
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
        return self

    def contains(self, values) -> np.ndarray:
        """False = definitely absent; True = maybe present."""
        pos = self._positions(values)
        ok = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            byte = self.bits[(pos[i] >> np.uint64(3)).astype(np.int64)]
            bit = (np.uint8(1) << (pos[i] & np.uint64(7)).astype(np.uint8))
            ok &= (byte & bit) != 0
        return ok

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.n_bits, self.k, np.packbits(np.unpackbits(self.bits))))

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        n_bits, k, bits = pickle.loads(b)
        s = cls(n_bits, k)
        s.bits = bits[: len(s.bits)].copy()
        return s


# ---------------------------------------------------------------------------
# Streaming histogram (Ben-Haim & Tom-Tov) — mergeable quantiles
# ---------------------------------------------------------------------------

class StreamHist:
    """Fixed-size (centroid, count) histogram; add/merge keep the closest
    pair merged.  Quantile interpolation per the BHTT paper §2.2."""

    def __init__(self, max_bins: int = 128):
        self.max_bins = max_bins
        self.centroids = np.empty(0, dtype=np.float64)
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0
        self._min = np.inf
        self._max = -np.inf

    def update(self, values) -> "StreamHist":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.n += v.size
        # bulk path: bin the batch into max_bins quantile-ish bins first
        uniq, cnt = np.unique(v, return_counts=True)
        self.centroids = np.concatenate([self.centroids, uniq])
        self.counts = np.concatenate([self.counts, cnt])
        self._compress()
        return self

    def merge(self, other: "StreamHist") -> "StreamHist":
        self.centroids = np.concatenate([self.centroids, other.centroids])
        self.counts = np.concatenate([self.counts, other.counts])
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def _compress(self):
        order = np.argsort(self.centroids, kind="stable")
        c, w = self.centroids[order], self.counts[order]
        while len(c) > self.max_bins:
            gaps = np.diff(c)
            n_merge = max(1, len(c) - self.max_bins)
            merge_idx = np.argsort(gaps)[:n_merge]
            keep = np.ones(len(c), dtype=bool)
            new_c, new_w = c.copy(), w.copy()
            merged_into = set()
            for i in sorted(merge_idx):
                if i in merged_into or i + 1 in merged_into:
                    continue
                tot = new_w[i] + new_w[i + 1]
                new_c[i + 1] = (new_c[i] * new_w[i] + new_c[i + 1] * new_w[i + 1]) / tot
                new_w[i + 1] = tot
                keep[i] = False
                merged_into.add(i)
                merged_into.add(i + 1)
            c, w = new_c[keep], new_w[keep]
        self.centroids, self.counts = c, w

    def cdf_at(self, xs: np.ndarray) -> np.ndarray:
        if self.n == 0:
            return np.zeros(len(xs))
        cum = np.cumsum(self.counts) - self.counts / 2.0
        return np.interp(xs, self.centroids, cum / self.n, left=0.0, right=1.0)

    def quantile(self, q: "float | np.ndarray") -> np.ndarray:
        if self.n == 0:
            return np.atleast_1d(np.nan)
        cum = (np.cumsum(self.counts) - self.counts / 2.0) / self.n
        return np.interp(np.atleast_1d(q), cum, self.centroids,
                         left=self._min, right=self._max)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.max_bins, self.centroids, self.counts,
                             self.n, self._min, self._max))

    @classmethod
    def from_bytes(cls, b: bytes) -> "StreamHist":
        mb, c, w, n, mn, mx = pickle.loads(b)
        s = cls(mb)
        s.centroids, s.counts, s.n, s._min, s._max = c, w, n, mn, mx
        return s


# ---------------------------------------------------------------------------
# Drift statistics
# ---------------------------------------------------------------------------

def ks_statistic(a: StreamHist, b: StreamHist, n_points: int = 256) -> float:
    """Two-sample KS statistic approximated from the merged histograms'
    CDFs on a shared evaluation grid."""
    lo = min(a._min, b._min)
    hi = max(a._max, b._max)
    if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
        return 0.0
    xs = np.linspace(lo, hi, n_points)
    return float(np.max(np.abs(a.cdf_at(xs) - b.cdf_at(xs))))


def psi(expected_counts: np.ndarray, actual_counts: np.ndarray,
        eps: float = 1e-6) -> float:
    """Population Stability Index over aligned bins."""
    e = np.asarray(expected_counts, dtype=np.float64)
    a = np.asarray(actual_counts, dtype=np.float64)
    ep = np.clip(e / max(e.sum(), 1), eps, None)
    ap = np.clip(a / max(a.sum(), 1), eps, None)
    return float(np.sum((ap - ep) * np.log(ap / ep)))


def freq_table_psi(expected: dict, actual: dict) -> float:
    """PSI over categorical frequency tables (codec / sr drift)."""
    keys = sorted(set(expected) | set(actual))
    e = np.array([expected.get(k, 0) for k in keys], dtype=np.float64)
    a = np.array([actual.get(k, 0) for k in keys], dtype=np.float64)
    return psi(e, a)


class KLL:
    """KLL quantile sketch (Karnin-Lang-Liberty, FOCS 2016): a mergeable
    multi-level compactor with O(k) space and rank error ~O(1/k),
    independent of stream length — the provable-bound quantile tier
    beside StreamHist's heuristic centroids.

    Levels hold value buffers; a full level sorts and keeps every other
    item (weight doubles), pushing survivors up.  Compaction offsets
    alternate deterministically (the standard practical derandomization;
    same trick as Apache DataSketches' deterministic mode), so identical
    inputs always yield identical sketches — required for the engine's
    partitioning-invariance tests.  Level capacities shrink geometrically
    (c = 2/3) below the top ``k``."""

    _C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._flips: list[bool] = [False]

    def _capacity(self, height_from_top: int) -> int:
        return max(2, int(np.ceil(self.k * (self._C ** height_from_top))))

    def update(self, values) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            top = len(self.levels) - 1
            cap = self._capacity(top - h)
            buf = self.levels[h]
            if len(buf) > cap:
                buf = np.sort(buf)
                off = 1 if self._flips[h] else 0
                self._flips[h] = not self._flips[h]
                survivors = buf[off::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self._flips.append(False)
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], survivors])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        self.n += other.n
        for h, buf in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self._flips.append(False)
            self.levels[h] = np.concatenate([self.levels[h], buf])
        self._compress()
        return self

    def _weighted(self) -> "tuple[np.ndarray, np.ndarray]":
        vals, wts = [], []
        for h, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << h, dtype=np.int64))
        if not vals:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, qs) -> np.ndarray:
        v, w = self._weighted()
        out = np.full(len(np.atleast_1d(qs)), np.nan)
        if len(v) == 0:
            return out
        cum = np.cumsum(w)
        total = cum[-1]
        for i, q in enumerate(np.atleast_1d(qs)):
            target = q * total
            out[i] = v[min(np.searchsorted(cum, target, side="left"),
                           len(v) - 1)]
        return out

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if len(v) == 0:
            return 0.0
        idx = np.searchsorted(v, x, side="right")
        return float(np.sum(w[:idx]) / np.sum(w))

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.n, self.levels, self._flips))

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        k, n, levels, flips = pickle.loads(b)
        s = cls(k)
        s.n, s.levels, s._flips = n, levels, flips
        return s
