"""strict|loose mode semantics + warning/error separation + XML report."""

import pyarrow as pa
import ray.data

from osf_data_validator_tool_ray.pipelines.runner import run_suite
from osf_data_validator_tool_ray.spec import clips_spec
from osf_data_validator_tool_ray.synth import synth_clips


def _widened(table):
    i = table.schema.get_field_index("sr_hz")
    return table.set_column(i, "sr_hz", table.column("sr_hz").cast(pa.int64()))


def test_strict_mode_type_drift_is_error():
    t, _ = synth_clips(50, seed=3, defect_rate=0.0)
    res = run_suite(ray.data.from_arrow(_widened(t)), clips_spec(mode="strict"))
    rep = res.report()
    assert rep["checks"]["SCHEMA-COLUMN-100"]["n_violations"] == 1
    assert rep["pass"] is False


def test_loose_mode_widening_is_warning():
    t, _ = synth_clips(50, seed=3, defect_rate=0.0)
    res = run_suite(ray.data.from_arrow(_widened(t)), clips_spec(mode="loose"))
    rep = res.report()
    assert rep["checks"]["SCHEMA-COLUMN-100"]["n_violations"] == 0
    assert rep["checks"]["SCHEMA-COLUMN-100"]["n_warnings"] == 1
    assert rep["pass"] is True      # warnings never fail a check


def test_unknown_cross_domain_type_is_warning():
    t, ledger = synth_clips(300, seed=42, defect_rate=0.03)
    res = run_suite(ray.data.from_arrow(t), clips_spec())
    rep = res.report()
    # unknown codec rows can't be domain-validated -> warning, not error
    assert rep["checks"]["CROSS-DOMAIN-50"]["n_warnings"] >= len(ledger["unknown_codec"])
    assert rep["checks"]["CROSS-DOMAIN-50"]["n_violations"] == 0


def test_xml_report():
    t, _ = synth_clips(60, seed=4, defect_rate=0.05)
    res = run_suite(ray.data.from_arrow(t), clips_spec())
    xml = res.report_xml()
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml)
    assert root.tag == "checks"
    ids = {el.get("id") for el in root}
    assert "DATATYPE-FACET-101" in ids
    failing = [el for el in root if el.get("status") == "fail"]
    assert failing and any(len(el) > 0 for el in failing)   # sample rows attached
