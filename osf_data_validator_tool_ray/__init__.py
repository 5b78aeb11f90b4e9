"""osf_data_validator_tool_ray — a Ray-Data-native schema + constraint
validation engine.

Re-expresses the declarative constraint-checking semantics of
structureddynamics/OSF-Data-Validator-Tool (reference read-only at
/root/reference: a PHP CLI that discovers OWL-style constraints from
ontologies and evaluates them against RDF datasets over SPARQL) as
streaming ``ray.data.Dataset`` pipelines over Arrow tables — primarily a
table of audio clip + transcript rows:

    clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
    codec:string, transcript:string

Architecture (NOT a port — see SURVEY.md):
  * ``spec``        — the declarative constraint spec (the "ontology")
  * ``functions``   — vectorized facet validators, sketches, text ops
  * ``checks``      — check classes emitting violation-row Datasets
  * ``stages``      — reusable map_batches stages (fused facet pass,
                      audio-decode actor pool)
  * ``pipelines``   — suite runner, report assembly, checkpoint/resume
  * ``sources``     — table readers/writers (parquet; Lance when present)
"""

__version__ = "0.1.0"
