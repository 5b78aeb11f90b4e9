"""FIXTURES.md F3: drift baseline — a shifted dur_ms distribution must
trip the KS drift check; same-distribution data must not."""

import numpy as np
import pyarrow as pa
import ray.data

from osf_data_validator_tool_ray.checks.drift import (
    TableProfile,
    build_profile,
    drift_violations,
)
from osf_data_validator_tool_ray.synth import synth_clips


def _profile(table):
    ds = ray.data.from_arrow(table.select(["clip_id", "sr_hz", "dur_ms", "codec"])).repartition(3)
    return build_profile(ds, numeric_cols=["dur_ms"], cat_cols=["codec", "sr_hz"],
                        key_cols=["clip_id"])


def test_no_drift_same_distribution():
    base, _ = synth_clips(800, seed=43, defect_rate=0.0)
    cur, _ = synth_clips(800, seed=42, defect_rate=0.0)
    v = drift_violations(_profile(cur), _profile(base)).to_pandas()
    assert len(v) == 0, v


def test_drift_detected_on_shifted_durations():
    base, _ = synth_clips(800, seed=43, defect_rate=0.0)
    shifted, _ = synth_clips(800, seed=44, defect_rate=0.0)
    # scale dur_ms by 1.3 (distribution shift)
    dur = (shifted.column("dur_ms").to_numpy() * 1.3).astype(np.int32)
    shifted = shifted.set_column(shifted.schema.get_field_index("dur_ms"),
                                 "dur_ms", pa.array(dur, type=pa.int32()))
    v = drift_violations(_profile(shifted), _profile(base)).to_pandas()
    assert "DRIFT-100" in set(v.check_id)
    assert "dur_ms" in set(v["column"])


def test_categorical_psi_drift():
    base, _ = synth_clips(600, seed=43, defect_rate=0.0)
    skewed, _ = synth_clips(600, seed=44, defect_rate=0.0)
    codecs = pa.array(["ulaw"] * skewed.num_rows, type=pa.string())
    skewed = skewed.set_column(skewed.schema.get_field_index("codec"), "codec", codecs)
    v = drift_violations(_profile(skewed), _profile(base)).to_pandas()
    assert any((v.check_id == "DRIFT-100") & (v["column"] == "codec"))


def test_profile_roundtrip():
    base, _ = synth_clips(300, seed=43, defect_rate=0.0)
    p = _profile(base)
    p2 = TableProfile.from_json(p.to_json())
    assert p2.n_rows == p.n_rows
    assert abs(p2.distinct["clip_id"].estimate() - p.distinct["clip_id"].estimate()) < 1
    assert p2.numeric["dur_ms"].quantile(0.5)[0] == p.numeric["dur_ms"].quantile(0.5)[0]
