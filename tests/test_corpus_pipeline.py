"""End-to-end corpus curation: quality filter -> exact dedup -> near
dedup -> sample -> embed, with planted defects."""

import numpy as np
import pandas as pd
import ray.data

from osf_data_validator_tool_ray.pipelines.corpus import curate_corpus


def _corpus():
    rng = np.random.default_rng(21)
    # wide vocabulary so random docs are genuinely dissimilar
    texts = [" ".join(f"w{rng.integers(0, 5000)}" for _ in range(40))
             for _ in range(50)]
    ids = list(range(50))
    # planted: 3 exact dups of doc 2; 1 near dup of doc 3; 2 junk docs
    texts += [texts[2], texts[2].upper(), "  " + texts[2] + "  "]
    ids += [100, 101, 102]
    texts += [texts[3][:-12] + " tail change x"]
    ids += [103]
    texts += ["short", "the the the the the the"]
    ids += [104, 105]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_curate_corpus_end_to_end():
    df = _corpus()
    res = curate_corpus(ray.data.from_pandas(df).repartition(3),
                        near_dup_threshold=0.6, embed_dim=16)
    stats = res["stats"]
    out = res["docs"].to_pandas()
    kept = set(out["doc_id"])
    assert stats["n_input"] == 56
    # junk dropped by quality gates
    assert 104 not in kept and 105 not in kept
    # exact dups collapse to the min id (normalization folds case/ws)
    assert 2 in kept
    assert not {100, 101, 102} & kept
    # near dup of doc 3 collapses to doc 3
    assert 3 in kept and 103 not in kept
    assert stats["n_near_dup_rows"] >= 1
    # text is normalized in the output
    assert out[out.doc_id == 2]["text"].iloc[0].islower()
    # embeddings cover exactly the survivors
    emb = res["embeddings"].to_pandas()
    assert set(emb["doc_id"]) == kept
    assert len(np.asarray(emb["embedding"].iloc[0])) == 16


def test_exact_dup_groups_driver_sees_only_duplicates():
    """High-cardinality all-unique corpus: the collected dup-group table
    must be EMPTY — the n>1 filter runs inside the Dataset, so the
    driver never materializes the one-row-per-distinct-content table
    (round-2 verdict item #2)."""
    from osf_data_validator_tool_ray.pipelines.corpus import (
        exact_dup_group_table)

    n = 5000
    uniq = pd.DataFrame({"doc_id": range(n),
                         "h": [f"hash{i:08d}" for i in range(n)]})
    got = exact_dup_group_table(
        ray.data.from_pandas(uniq).repartition(4), "h", "doc_id")
    assert len(got) == 0                      # nothing crosses to the driver

    # plant 3 duplicated contents among the unique mass: exactly those
    # 3 groups (and nothing else) reach the driver, with min-id keep
    dup = pd.DataFrame({"doc_id": [9001, 9002, 9003, 9004, 9005, 9006],
                        "h": ["hash00000001", "hash00000001",
                              "hash00000002", "hash00000002",
                              "hash00000002", "hash00000003"]})
    both = pd.concat([uniq, dup], ignore_index=True)
    got = exact_dup_group_table(
        ray.data.from_pandas(both).repartition(4), "h", "doc_id")
    assert len(got) == 3
    g = got.set_index("h")
    assert g.loc["hash00000001", "n"] == 3        # 1 original + 2 dups
    assert g.loc["hash00000001", "keep_id"] == 1
    assert g.loc["hash00000002", "n"] == 4
    assert g.loc["hash00000003", "n"] == 2


def test_curate_corpus_lazy_intermediates_identical():
    """persist_intermediates=False (the 100 TB recompute-over-pin mode)
    must produce exactly the same curated corpus."""
    df = _corpus()
    a = curate_corpus(ray.data.from_pandas(df).repartition(3),
                      near_dup_threshold=0.6)["docs"].to_pandas()
    b = curate_corpus(ray.data.from_pandas(df).repartition(3),
                      near_dup_threshold=0.6,
                      persist_intermediates=False)["docs"].to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_curate_corpus_sampling_deterministic():
    df = _corpus()
    a = curate_corpus(ray.data.from_pandas(df).repartition(2),
                      sample_permille=500)["docs"].to_pandas()
    b = curate_corpus(ray.data.from_pandas(df).repartition(5),
                      sample_permille=500)["docs"].to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_curate_corpus_checkpoint_resume(tmp_path):
    """Kill-and-resume (round-4 verdict item #6): finished stages load
    from their manifests instead of recomputing.  Proven by resuming
    against a POISONED input dataset — a resumed run that touched the
    raw input or re-ran a finished stage would see the poison."""
    import json
    import os

    ck = str(tmp_path / "ck")
    df = _corpus()
    r1 = curate_corpus(ray.data.from_pandas(df).repartition(3),
                       near_dup_threshold=0.6, checkpoint_dir=ck)
    out1 = r1["docs"].to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    poison = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [9999], "text": ["poison " * 30]}))

    # full resume: every stage recorded -> identical output + stats,
    # and no record is rewritten (timestamps unchanged)
    rec_dir = os.path.join(ck, "records")
    ts_before = {f: json.load(open(os.path.join(rec_dir, f)))["ts"]
                 for f in os.listdir(rec_dir)}
    r2 = curate_corpus(poison, near_dup_threshold=0.6, checkpoint_dir=ck)
    out2 = r2["docs"].to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out2.equals(out1)
    assert r2["stats"] == r1["stats"]
    ts_after = {f: json.load(open(os.path.join(rec_dir, f)))["ts"]
                for f in os.listdir(rec_dir)}
    assert ts_after == ts_before

    # partial resume: drop the records of the two downstream stages —
    # they recompute FROM THE exact-unique ARTIFACT (not the poisoned
    # input), so the output is still identical
    for name in ("stage-clusters", "stage-curated"):
        os.remove(os.path.join(rec_dir, f"{name}.json"))
    r3 = curate_corpus(poison, near_dup_threshold=0.6, checkpoint_dir=ck)
    out3 = r3["docs"].to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out3.equals(out1)
    ts_final = {f: json.load(open(os.path.join(rec_dir, f)))["ts"]
                for f in os.listdir(rec_dir)}
    # upstream untouched, downstream re-recorded
    assert ts_final["stage-cleaned.json"] == ts_before["stage-cleaned.json"]
    assert ts_final["stage-exact_unique.json"] == \
        ts_before["stage-exact_unique.json"]
    assert ts_final["stage-clusters.json"] > ts_before["stage-clusters.json"]


def test_curate_corpus_checkpoint_empty_stage_completes(tmp_path):
    """Round-5 review fix: a stage whose output is EMPTY must still
    register complete (schema-bearing placeholder artifact), so resume
    skips it instead of re-running it forever."""
    import json
    import os

    ck = str(tmp_path / "ck_empty")
    # every doc fails the quality gate -> cleaned is empty
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["tiny", "small", "x"]})
    r1 = curate_corpus(ray.data.from_pandas(df).repartition(2),
                       checkpoint_dir=ck)
    assert r1["stats"]["n_after_quality"] == 0
    assert r1["stats"]["n_output"] == 0
    rec_dir = os.path.join(ck, "records")
    ts1 = {f: json.load(open(os.path.join(rec_dir, f)))["ts"]
           for f in os.listdir(rec_dir)}
    poison = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [9], "text": ["poison words " * 20]}))
    r2 = curate_corpus(poison, checkpoint_dir=ck)
    assert r2["stats"]["n_output"] == 0          # resumed, not re-run
    ts2 = {f: json.load(open(os.path.join(rec_dir, f)))["ts"]
           for f in os.listdir(rec_dir)}
    assert ts2 == ts1
