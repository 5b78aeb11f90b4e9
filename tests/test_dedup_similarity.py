"""Dedup + similarity pipelines on tables with planted duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osf_data_validator_tool_ray.checks.dedup import (
    exact_dedup_groups,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from osf_data_validator_tool_ray.checks.similarity import (
    ann_topk_bruteforce,
    ann_topk_lsh,
    embedding_near_dup_pairs,
)


def _docs():
    rng = np.random.default_rng(5)
    texts, ids = [], []
    for i in range(60):
        texts.append(" ".join(str(rng.integers(0, 500)) for _ in range(80)))
        ids.append(i)
    # plant exact dup of 3 and near dup of 7
    texts.append(texts[3]); ids.append(100)
    texts.append(texts[7][:-15] + " slightly changed"); ids.append(101)
    return ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(3)


def test_exact_dedup():
    ds = _docs()
    groups = exact_dedup_groups(ds, "text", "doc_id").to_pandas()
    dups = groups[groups.n > 1]
    assert len(dups) == 1
    assert dups.iloc[0]["keep_id"] == 3 and dups.iloc[0]["n"] == 2
    assert groups.n.sum() == 62


def test_minhash_near_dups():
    ds = _docs()
    pairs = minhash_near_dup_pairs(ds, "text", "doc_id", num_perm=64, bands=16,
                                   threshold=0.5).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (3, 100) in found          # exact dup certainly found
    assert (7, 101) in found          # near dup found
    # no wild false positives among random docs
    assert len(found) <= 4


def test_simhash_near_dups():
    ds = _docs()
    pairs = simhash_near_dup_pairs(ds, "text", "doc_id", max_hamming=6).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (3, 100) in found
    ham = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert ham[(3, 100)] == 0


def _embs():
    rng = np.random.default_rng(9)
    m = rng.standard_normal((200, 32)).astype(np.float32)
    m[50] = m[10] + rng.standard_normal(32).astype(np.float32) * 0.01   # near-dup pair
    ids = np.arange(200)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(m), type=pa.list_(pa.float32()))})
    return ray.data.from_arrow(tbl).repartition(3), m


def test_ann_bruteforce_topk():
    ds, m = _embs()
    top = ann_topk_bruteforce(ds, "embedding", "vec_id", m[:2], k=3).to_pandas()
    assert len(top) == 6
    # rank 1 for each query is the query itself (cosine 1)
    r1 = top[top["rank"] == 1].sort_values("query_id")
    assert r1["vec_id"].tolist() == [0, 1]
    assert np.allclose(r1["score"], 1.0)


def test_ann_lsh_recall_of_self():
    ds, m = _embs()
    top = ann_topk_lsh(ds, "embedding", "vec_id", m[5:6], k=3, n_planes=6).to_pandas()
    assert top[top["rank"] == 1]["vec_id"].iloc[0] == 5


def test_embedding_near_dup_pairs():
    ds, m = _embs()
    pairs = embedding_near_dup_pairs(ds, "embedding", "vec_id", tau=0.98).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (10, 50) in found


def test_embedding_near_dup_multi_table_recall():
    """n_tables multiplies candidate recall: 40 planted ~0.96-cosine
    twins must ALL be recovered with n_tables=16/n_planes=6 (P(miss)
    ~3e-7 per pair), while each table alone would miss ~40-65%%.  Also
    pins the float64 rerank path: emitted cosines equal the exact
    numpy float64 values to 1e-12."""
    rng = np.random.default_rng(21)
    base = rng.standard_normal((200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    ids = np.arange(200)
    twin_src = ids[ids % 5 == 0]
    noise = rng.standard_normal((len(twin_src), 32)) * 0.04
    twins = base[twin_src] + noise
    m = np.concatenate([base, twins])
    all_ids = np.concatenate([ids, twin_src + 1000])
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": all_ids, "embedding": list(m)})).repartition(3)
    pairs = embedding_near_dup_pairs(
        ds, "embedding", "vec_id", tau=0.9, n_planes=6, n_tables=16,
        rerank_dtype=np.float64).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for src in twin_src:
        assert (src, src + 1000) in found, src
        row = pairs[(pairs.id_a == src) & (pairs.id_b == src + 1000)]
        exact = float(mn[src] @ mn[200 + np.where(twin_src == src)[0][0]])
        assert abs(row["cosine"].iloc[0] - exact) < 1e-12
    # every emitted pair genuinely >= tau (no false positives from the
    # bucket stage — rerank is exact)
    assert (pairs["cosine"] >= 0.9).all()


def test_exact_jaccard_for_pairs_distributed_parity():
    """Distributed pair verification == naive local shingle Jaccard."""
    import numpy as np
    import pandas as pd
    import ray.data

    from osf_data_validator_tool_ray.checks.dedup import exact_jaccard_for_pairs
    from osf_data_validator_tool_ray.functions import text as T

    rng = np.random.default_rng(13)
    texts = [" ".join(str(rng.integers(0, 300)) for _ in range(60))
             for _ in range(25)]
    texts[20] = texts[2]                       # exact dup
    texts[21] = texts[3][:-15] + " small edit"  # near dup
    ids = list(range(25))
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})) \
        .repartition(3)
    pairs = pd.DataFrame({"id_a": [2, 3, 0], "id_b": [20, 21, 24]})
    got = exact_jaccard_for_pairs(ds, pairs, "text", "doc_id", shingle_k=5)
    for _, r in got.iterrows():
        want = T.exact_jaccard(T.char_shingle_hashes(texts[int(r.id_a)], 5),
                               T.char_shingle_hashes(texts[int(r.id_b)], 5))
        assert abs(r.jaccard - want) < 1e-12
    assert got.loc[got.id_a == 2, "jaccard"].iloc[0] == 1.0


def test_exact_jaccard_for_pairs_empty():
    import pandas as pd
    import ray.data

    from osf_data_validator_tool_ray.checks.dedup import exact_jaccard_for_pairs

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["abcdef"]}))
    out = exact_jaccard_for_pairs(
        ds, pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64")}), "text", "doc_id")
    assert len(out) == 0 and "jaccard" in out.columns


def test_ann_lsh_recall_vs_bruteforce():
    """Recall gate for the LSH ANN path: against exact brute-force top-k
    on the driver testdata, probe-bucket+hamming-1 recall >= 0.6 and the
    self-match (rank-1) is always found."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from osf_data_validator_tool_ray.checks.similarity import (
        ann_topk_bruteforce,
        ann_topk_lsh,
    )

    sf = "/root/testdata/sf0.001"
    qt = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 3)
    queries = np.stack([np.asarray(v, dtype=np.float32)
                        for v in qt.column("embedding").to_pylist()])
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = ann_topk_bruteforce(ds, "embedding", "vec_id", queries, k=5).to_pandas()
    approx = ann_topk_lsh(ds, "embedding", "vec_id", queries, k=5,
                          n_planes=6).to_pandas()
    recalls = []
    for qi in sorted(exact.query_id.unique()):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
        # the query IS row qi: cosine 1.0 must be found (same bucket)
        assert qi in a
    assert np.mean(recalls) >= 0.6, recalls


def test_ann_ivf_recall_vs_bruteforce():
    """Recall gate for the IVF ANN path: nprobe/n_centroids = 8/32 over
    the driver testdata must reach recall >= 0.6 vs exact brute force,
    and the self-match (cosine 1.0) must always be found — the query's
    own vector lies in one of its nprobe closest centroid cells."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from osf_data_validator_tool_ray.checks.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    sf = "/root/testdata/sf0.001"
    qt = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 3)
    queries = np.stack([np.asarray(v, dtype=np.float32)
                        for v in qt.column("embedding").to_pylist()])
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = ann_topk_bruteforce(ds, "embedding", "vec_id", queries,
                                k=5).to_pandas()
    approx = ann_topk_ivf(ds, "embedding", "vec_id", queries, k=5,
                          n_centroids=32, nprobe=8).to_pandas()
    recalls = []
    for qi in sorted(exact.query_id.unique()):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
        assert qi in a
    assert np.mean(recalls) >= 0.6, recalls
    # determinism: same seed => identical result
    again = ann_topk_ivf(ds, "embedding", "vec_id", queries, k=5,
                         n_centroids=32, nprobe=8).to_pandas()
    assert again[["query_id", "vec_id"]].values.tolist() == \
        approx[["query_id", "vec_id"]].values.tolist()


def test_audio_near_dup_planted_pairs():
    """Acoustic dedup: amplitude-scaled and ulaw-transcoded copies of a
    clip must pair with the original at hamming 0-ish; distinct tones
    and noise clips must not pair."""
    import numpy as np
    import pandas as pd
    import ray.data

    from osf_data_validator_tool_ray.audio import encode
    from osf_data_validator_tool_ray.checks.dedup import audio_near_dup_pairs

    sr = 8000
    t = np.arange(sr, dtype=np.float32) / sr

    def tone(f, amp):
        return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)

    rows = []
    for i, f0 in enumerate([300, 470, 710, 1100, 1650]):
        pcm = tone(f0, 0.5) + tone(f0 * 1.5, 0.25)
        rows.append({"clip_id": i, "bytes": encode(pcm, sr, "pcm_s16le")})
    base = tone(300, 0.5) + tone(450, 0.25)        # == clip 0's content
    rows.append({"clip_id": 100, "bytes": encode(base * 0.2, sr, "pcm_s16le")})
    rows.append({"clip_id": 101, "bytes": encode(base, sr, "ulaw")})
    rows.append({"clip_id": 200, "bytes": encode(
        np.random.default_rng(3).normal(0, 0.2, sr).astype(np.float32),
        sr, "pcm_s16le")})

    pairs = audio_near_dup_pairs(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(3),
        "bytes", "clip_id").to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 100) in got and (0, 101) in got and (100, 101) in got
    # no cross-tone or noise pairings
    for a, b in got:
        assert {a, b} <= {0, 100, 101}, (a, b)
    assert (pairs["hamming"] <= 16).all()
