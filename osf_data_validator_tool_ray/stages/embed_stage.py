"""Batched model-inference stage — the actor-pool "model scoring"
pattern for training-data pipelines.

The Ray-side contract is exactly what a real encoder (sentence
transformer, audio embedder) uses at 100 TB:

  * the model loads ONCE per actor in ``__init__``,
  * ``__call__`` embeds a whole batch vectorized,
  * output is a fixed-dim ``list<float32>`` column ready for the ANN /
    embedding-near-dup operators in checks/similarity.py.

Model backends (``backend=`` in ``TextEmbedder``):

  * ``"auto"`` (default): try a REAL model — TorchScript via torch,
    then ONNX via onnxruntime — when ``model_path`` is given and the
    runtime imports; otherwise fall back to the hash stand-in.  Neither
    runtime ships in this sandbox, so the fallback is what CI
    exercises; the real paths are tested skip-if-unavailable.
  * ``"torch"`` / ``"onnx"``: require that runtime (clear ImportError
    otherwise).  The model contract is tokenizer-free on the model
    side: the stage hash-tokenizes (shared with the stand-in) and feeds
    an int64 ``[batch, max_len]`` token-id tensor — id 0 is PADDING and
    real tokens occupy 1..2^16 inclusive, so the model's embedding
    table needs ``(1 << 16) + 1`` rows with ``padding_idx=0``; the
    model returns ``[batch, dim]`` float32, which the stage
    L2-normalizes.
  * ``"hash"``: the deterministic stand-in — a 16 MB seeded
    hash-projection table standing in for weights; mean of hashed-token
    projections, L2-normalized.

The stand-in is deterministic by construction (seeded projection,
stable token hash), so outputs are reproducible across runs,
partitionings, and cluster sizes — the property every oracle/check
downstream relies on.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_LOG = logging.getLogger("osf_data_validator_tool_ray.embed")

_VOCAB_BITS = 16                      # 65,536-row projection table


class TextEmbedder:
    """map_batches(TextEmbedder, fn_constructor_args=(dim,), concurrency=N)
    — or pass an instance for task scheduling on warm workers."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 dim: int = 64, seed: int = 7, backend: str = "auto",
                 model_path: "str | None" = None, max_len: int = 256):
        self.text_col, self.id_col, self.dim = text_col, id_col, dim
        self.max_len = max_len
        # "model load": one-time per-actor setup.  Real-runtime probes
        # first; the hash table is only built when no model loads.
        self._model = None
        if backend not in ("auto", "torch", "onnx", "hash"):
            raise ValueError(f"unknown backend {backend!r}")
        if model_path is not None and backend in ("auto", "torch"):
            try:
                import torch

                m = torch.jit.load(model_path).eval()

                def run_torch(ids: np.ndarray) -> np.ndarray:
                    with torch.no_grad():
                        out = m(torch.from_numpy(ids))
                    return out.numpy().astype(np.float32)

                self._model = run_torch
            except ImportError:
                if backend == "torch":
                    raise ImportError(
                        "backend='torch' requires torch; install it or "
                        "use backend='auto'/'hash'") from None
            except Exception as e:
                # auto means TRY torch — a non-TorchScript file or
                # corrupt weights must fall through to ONNX/hash, not
                # abort; an explicit backend="torch" propagates.  The
                # fallthrough is LOUD: silently degrading to stand-in
                # embeddings would skew every downstream ANN/dedup
                # result with no signal.
                if backend == "torch":
                    raise
                _LOG.warning(
                    "TextEmbedder backend='auto': torch load of %r "
                    "failed (%s: %s); trying ONNX, then the hash "
                    "stand-in", model_path, type(e).__name__, e)
        if (self._model is None and model_path is not None
                and backend in ("auto", "onnx")):
            try:
                import onnxruntime as ort

                sess = ort.InferenceSession(model_path)
                in_name = sess.get_inputs()[0].name

                def run_onnx(ids: np.ndarray) -> np.ndarray:
                    return sess.run(None, {in_name: ids})[0] \
                        .astype(np.float32)

                self._model = run_onnx
            except ImportError:
                if backend == "onnx":
                    raise ImportError(
                        "backend='onnx' requires onnxruntime; install it "
                        "or use backend='auto'/'hash'") from None
            except Exception as e:
                # same contract as the torch probe: auto falls through
                # (a torch checkpoint is not valid ONNX either), an
                # explicit backend="onnx" propagates
                if backend == "onnx":
                    raise
                _LOG.warning(
                    "TextEmbedder backend='auto': onnxruntime load of %r "
                    "failed (%s: %s); using the hash stand-in",
                    model_path, type(e).__name__, e)
        if self._model is None and backend in ("torch", "onnx") \
                and model_path is None:
            raise ValueError(f"backend={backend!r} needs a model_path")
        if self._model is None:
            rng = np.random.default_rng(seed)
            self.proj = rng.standard_normal(
                (1 << _VOCAB_BITS, dim)).astype(np.float32)

    def _token_ids(self, texts: "pd.Series"):
        """Shared hash tokenizer: ONE split for the whole batch, ONE
        hash of the flat token column.  Returns (ids, offsets,
        nonempty) or None when the batch has no tokens."""
        from ..functions.text import tokenize_flat

        mask = np.uint64((1 << _VOCAB_BITS) - 1)
        flat, offsets, nonempty = tokenize_flat(texts, r"\s+")
        if len(flat) == 0:
            return None
        toks = flat.to_numpy(zero_copy_only=False)
        ids = (pd.util.hash_array(toks, hash_key="0123456789abcdef")
               .astype(np.uint64) & mask).astype(np.int64)
        return ids, offsets, nonempty

    def _embed_model(self, texts: "pd.Series") -> np.ndarray:
        """Real-model path: pack hashed token ids into a 0-padded
        [batch, max_len] int64 tensor, run the loaded model once for
        the whole batch, L2-normalize its [batch, dim] output."""
        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.float32)
        tk = self._token_ids(texts)
        if tk is None:
            return out
        ids, offsets, nonempty = tk
        ids = np.where(nonempty.astype(bool), ids + 1, 0)  # 0 = pad
        mat = np.zeros((n, self.max_len), dtype=np.int64)
        for r in range(n):
            seg = ids[offsets[r]: offsets[r + 1]][: self.max_len]
            mat[r, : len(seg)] = seg
        emb = self._model(mat)
        if emb.shape != (n, self.dim):
            raise ValueError(
                f"model returned {emb.shape}, expected {(n, self.dim)}")
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (emb / norms).astype(np.float32)

    def _embed_batch(self, texts: "pd.Series") -> np.ndarray:
        """Mean of hashed-token projections per text, L2-normalized
        (stand-in path), or the loaded real model when one is present.
        Vectorized end to end: ONE tokenizing split for the whole batch,
        ONE hash of the flat token column, projection gather + per-row
        segment means — no per-row Python loop."""
        from ..functions.text import segment_sums

        if self._model is not None:
            return self._embed_model(texts)
        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.float32)
        if n == 0:
            return out
        tk = self._token_ids(texts)
        if tk is None:
            return out
        ids, offsets, nonempty = tk
        vecs = self.proj[ids]                      # float32, like the
        vecs[~nonempty.astype(bool)] = 0.0        # old per-row mean path
        # offsets are strictly increasing (split yields >= 1 element per
        # row), so reduceat segments map 1:1 to rows — one pass, no
        # (tokens x dim) cumsum temporary
        sums = np.add.reduceat(vecs, offsets[:-1], axis=0)
        counts = segment_sums(nonempty, offsets)
        have = counts > 0
        means = sums[have] / counts[have, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out[have] = (means / norms).astype(np.float32)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas()
        emb = self._embed_batch(texts)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), type=pa.float32()), self.dim),
        })


def embed_text(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: int = 7,
    batch_size: int = 512,
    concurrency: "int | tuple[int, int] | None" = None,
    backend: str = "auto",
    model_path: "str | None" = None,
) -> "ray.data.Dataset":
    """Embed a text column.  concurrency=None runs task-scheduled on warm
    workers (cheap stand-in model); pass (min, max) for an actor pool
    when the per-worker model load is genuinely heavy (always do this
    for a real torch/onnx ``model_path`` so the model loads once per
    actor, not per task)."""
    sub = ds.select_columns([id_col, text_col])
    if concurrency is None:
        return sub.map_batches(
            TextEmbedder(text_col, id_col, dim, seed, backend, model_path),
            batch_format="pyarrow", batch_size=batch_size)
    return sub.map_batches(
        TextEmbedder, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(text_col, id_col, dim, seed, backend,
                             model_path),
        concurrency=concurrency, num_cpus=1)
