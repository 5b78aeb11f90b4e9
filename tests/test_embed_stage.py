"""Batched model-inference stage: deterministic embeddings, stable
across partitionings/scheduling modes; downstream ANN composes."""

import numpy as np
import pandas as pd
import ray.data

from osf_data_validator_tool_ray.stages.embed_stage import TextEmbedder, embed_text


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(["alpha", "beta", "gamma", "delta", "eps"],
                                 rng.integers(3, 12)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": list(range(n)), "text": texts})


def test_embeddings_deterministic_across_partitionings():
    df = _docs()
    a = embed_text(ray.data.from_pandas(df).repartition(2)).to_pandas()
    b = embed_text(ray.data.from_pandas(df).repartition(5)).to_pandas()
    a = a.set_index("doc_id").sort_index()
    b = b.set_index("doc_id").sort_index()
    for i in a.index:
        assert np.allclose(np.asarray(a.loc[i, "embedding"]),
                           np.asarray(b.loc[i, "embedding"]))
    # unit-normalized non-empty docs
    v = np.asarray(a.loc[0, "embedding"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_actor_pool_matches_task_path():
    df = _docs(20, seed=9)
    t = embed_text(ray.data.from_pandas(df)).to_pandas() \
        .set_index("doc_id").sort_index()
    ap = embed_text(ray.data.from_pandas(df), concurrency=(1, 2)).to_pandas() \
        .set_index("doc_id").sort_index()
    for i in t.index:
        assert np.allclose(np.asarray(t.loc[i, "embedding"]),
                           np.asarray(ap.loc[i, "embedding"]))


def test_similar_docs_get_similar_embeddings():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma delta", "alpha beta gamma delta eps",
                 "zeta omega pi tau"],
    })
    e = embed_text(ray.data.from_pandas(df)).to_pandas() \
        .set_index("doc_id")
    v0, v1, v2 = (np.asarray(e.loc[i, "embedding"]) for i in (0, 1, 2))
    assert v0 @ v1 > v0 @ v2


def test_embeddings_feed_ann():
    """Compose: embed -> brute-force cosine top-k over the output column."""
    from osf_data_validator_tool_ray.checks.similarity import ann_topk_bruteforce

    df = _docs(30, seed=5)
    emb = embed_text(ray.data.from_pandas(df)).materialize()
    first = emb.take(1)[0]["embedding"]
    q = np.asarray(first, dtype=np.float32).reshape(1, -1)
    top = ann_topk_bruteforce(emb, "embedding", "doc_id", q, k=3).to_pandas()
    assert top.iloc[0]["vec_id"] == 0 and abs(top.iloc[0]["score"] - 1.0) < 1e-5


def test_backend_hash_matches_auto_without_model():
    """auto with no model_path and explicit hash produce identical
    embeddings (the fallback IS the stand-in)."""
    df = _docs(20)
    a = TextEmbedder(backend="auto")
    h = TextEmbedder(backend="hash")
    t = ray.data.from_pandas(df).take_batch(100, batch_format="pyarrow")
    ea = a(t).column("embedding").to_pylist()
    eh = h(t).column("embedding").to_pylist()
    assert ea == eh


def test_real_backends_error_clearly_when_runtime_absent(tmp_path):
    import pytest

    for mod, backend in (("torch", "torch"), ("onnxruntime", "onnx")):
        try:
            __import__(mod)
            continue                      # runtime present: covered below
        except ImportError:
            pass
        with pytest.raises(ImportError, match=backend):
            TextEmbedder(backend=backend, model_path=str(tmp_path / "m"))
    with pytest.raises(ValueError, match="model_path"):
        TextEmbedder(backend="torch")
    with pytest.raises(ValueError, match="backend"):
        TextEmbedder(backend="tf")


def test_torchscript_model_path_runs_real_model(tmp_path):
    """Skip-unless-torch: a tiny TorchScript mean-of-embedding encoder
    loaded via model_path must drive _embed_batch (not the hash table)
    and produce unit-norm deterministic embeddings."""
    import pytest

    torch = pytest.importorskip("torch")

    dim = 8

    class MeanEmbed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.emb = torch.nn.EmbeddingBag(
                (1 << 16) + 1, dim, mode="mean", padding_idx=0)

        def forward(self, ids):
            return self.emb(ids)

    path = str(tmp_path / "enc.pt")
    torch.jit.script(MeanEmbed()).save(path)
    st = TextEmbedder(dim=dim, backend="torch", model_path=path)
    assert st._model is not None and not hasattr(st, "proj")
    df = _docs(10)
    t = ray.data.from_pandas(df).take_batch(100, batch_format="pyarrow")
    e1 = np.asarray(st(t).column("embedding").to_pylist())
    e2 = np.asarray(st(t).column("embedding").to_pylist())
    assert e1.shape == (10, dim)
    assert np.array_equal(e1, e2)
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-5)
