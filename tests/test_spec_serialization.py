"""Spec (de)serialization — the config-file analog of the reference's
ini-driven setup: the whole 'ontology' round-trips through JSON and the
CLI can validate arbitrary tables from a spec file."""

import json

import ray.data

from osf_data_validator_tool_ray.pipelines.runner import run_suite
from osf_data_validator_tool_ray.spec import (
    ConstraintSpec,
    Facets,
    clips_spec,
    spec_from_dict,
    spec_to_dict,
)
from osf_data_validator_tool_ray.synth import synth_clips


def test_roundtrip_clips_spec():
    s = clips_spec(mode="loose")
    s2 = spec_from_dict(json.loads(json.dumps(spec_to_dict(s))))
    assert s2.key_column == s.key_column
    assert s2.expected_schema == s.expected_schema
    assert s2.facets == s.facets
    assert {e.column for e in s2.enums} == {e.column for e in s.enums}
    assert s2.enums[0].closure() == s.enums[0].closure()
    assert s2.cardinalities == s.cardinalities
    assert s2.ref_integrity == s.ref_integrity
    assert s2.params["mode"] == "loose"


def test_roundtripped_spec_validates_identically():
    table, ledger = synth_clips(200, seed=42, defect_rate=0.05)
    ds = ray.data.from_arrow(table).repartition(2)
    s2 = spec_from_dict(spec_to_dict(clips_spec()))
    v1 = run_suite(ds, clips_spec()).violations.to_pandas()
    v2 = run_suite(ds, s2).violations.to_pandas()
    key = lambda df: sorted(map(tuple, df[["check_id", "key", "column"]].fillna("").to_numpy()))
    assert key(v1) == key(v2)


def test_generic_table_spec():
    import pandas as pd
    spec = spec_from_dict({
        "table": "users",
        "key_column": "uid",
        "facets": {"email": {"dtype": "string", "pattern": r"[^@]+@[^@]+",
                             "not_null": True},
                   "age": {"dtype": "int", "min_inclusive": 0, "max_inclusive": 130}},
        "cardinalities": [{"key": "uid", "column": "uid", "max_count": 1}],
    })
    df = pd.DataFrame({"uid": ["a", "b", "b", "c"],
                       "email": ["x@y.z", "bad", "b@c.d", None],
                       "age": [30, 200, 12, 5]})
    v = run_suite(ray.data.from_pandas(df), spec).violations.to_pandas()
    assert set(v[v["column"] == "email"]["key"]) == {"b", "c"}
    assert set(v[v["column"] == "age"]["key"]) == {"b"}
    assert set(v[v.check_id == "CARD-MAX-100"]["key"]) == {"b"}


def test_int_keyed_table_with_refs():
    """Integer primary keys flow through the unified keyed pass (incl.
    referential existence) without string coercion mismatches."""
    import pandas as pd
    from osf_data_validator_tool_ray.spec import spec_from_dict
    spec = spec_from_dict({
        "table": "t", "key_column": "id",
        "facets": {"id": {"dtype": "int", "not_null": True}},
        "cardinalities": [{"key": "id", "column": "id", "max_count": 1}],
        "ref_integrity": [{"ref_table": "refs", "ref_column": "tid",
                           "key_column": "id"}],
    })
    ds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2, 2, 3]}))
    refs = ray.data.from_pandas(pd.DataFrame({"tid": [1, 3, 99]}))
    v = run_suite(ds, spec, refs={"refs": refs}).violations.to_pandas()
    assert set(v[v.check_id == "CARD-MAX-100"]["key"]) == {"2"}
    assert set(v[v.check_id == "REF-EXISTENCE-100"]["key"]) == {"99"}
