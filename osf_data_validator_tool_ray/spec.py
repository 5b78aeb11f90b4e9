"""Constraint spec — the engine's analog of the reference's "ontologies".

In the reference, constraints are RDF triples discovered at runtime via
SPARQL (e.g. owl:Restriction with owl:maxQualifiedCardinality,
rdfs:domain/range, xsp:* facets — see
/root/reference/.../checks/CheckOwlRestrictionMax.php:45-64 and
checks/Check.php:559-953).  Here the constraint spec is a small, explicit
Python object: cheap to serialize, broadcast once into every Ray task /
actor by closure capture (Ray ships the function+captures to workers a
single time, not per batch).

Facets are evaluated CONJUNCTIVELY (all declared facets must pass).  This
deliberately diverges from the reference's early-return facet evaluator
(pattern short-circuits min/max, and its `length` facet compares against
maxLength — checks/Check.php:849-951); SURVEY.md §7.4 documents the
divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import pyarrow as pa


@dataclass(frozen=True)
class Facets:
    """XSP-style facet set for one column.

    Analog of the reference's custom-datatype facet vocabulary
    (xsp:pattern, xsp:minInclusive/maxInclusive, xsp:minLength/maxLength,
    xsp:length — checks/Check.php:561-577).
    """

    dtype: str = "string"             # logical datatype name (see functions.facets)
    pattern: Optional[str] = None      # full-match regex
    min_inclusive: Optional[float] = None
    max_inclusive: Optional[float] = None
    min_exclusive: Optional[float] = None
    max_exclusive: Optional[float] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    length: Optional[int] = None
    not_null: bool = False
    not_empty: bool = False            # strings: != ""; binary: len > 0


@dataclass(frozen=True)
class EnumDomain:
    """Closed value domain with an optional subsumption hierarchy.

    Analog of CheckClassesDefined (every used class must be defined,
    checks/CheckClassesDefined.php:40-51) + the superclass-closure logic
    of CheckObjectPropertiesRange.php:205-281: a value passes if it is in
    the transitive closure of the allowed set under ``parents``.
    """

    column: str
    allowed: frozenset[str]
    # child -> parent edges, e.g. {"pcm_s16le": "pcm", "pcm": "audio"}
    parents: dict[str, str] = field(default_factory=dict)

    def closure(self) -> frozenset[str]:
        """All values whose ancestor chain reaches a member of ``allowed``."""
        out = set()
        universe = set(self.allowed) | set(self.parents)
        for v in universe:
            node: Optional[str] = v
            seen = set()
            while node is not None and node not in seen:
                if node in self.allowed:
                    out.add(v)
                    break
                seen.add(node)
                node = self.parents.get(node)
        return frozenset(out)


@dataclass(frozen=True)
class Cardinality:
    """Per-key cardinality restriction.

    Analog of owl:min/max/qualifiedCardinality restrictions
    (CheckOwlRestrictionMax/Min/Exact).  ``qualifier`` optionally names a
    predicate id registered in checks.cardinality.QUALIFIERS so that only
    rows matching it are counted (the owl:onDataRange / owl:onClass
    qualified variants).
    """

    key: str                            # grouping key column
    column: str                         # counted column (non-null occurrences)
    min_count: Optional[int] = None
    max_count: Optional[int] = None
    exact_count: Optional[int] = None
    qualifier: Optional[str] = None
    # dataRange analog: values COUNTED by this restriction must also pass
    # this facet set (CheckOwlRestrictionMax.php:535-549 MAX-102,
    # Min:599 MIN-104) — emitted as CARD-{MAX,MIN,EXACT}-102 rows
    value_facets: Optional[Facets] = None


@dataclass(frozen=True)
class RefIntegrity:
    """Referential-integrity constraint: every value of ``ref_column`` in
    the ``ref_table`` must exist in ``key_column`` of the primary table.

    Analog of CheckURIExistence (every referenced URI must exist,
    checks/CheckURIExistence.php:42-55)."""

    ref_table: str
    ref_column: str
    key_column: str


@dataclass(frozen=True)
class CrossColumnDomain:
    """Column value must be drawn from a per-type allowed set: for rows
    whose ``type_column`` value is T, ``column`` must be in allowed[T].

    Analog of CheckObjectDatatypePropertiesDomain (the types of subjects
    using a property must match its rdfs:domain,
    checks/CheckObjectDatatypePropertiesDomain.php:136-250)."""

    type_column: str
    column: str
    allowed: dict[str, frozenset]        # type value -> allowed set
    unknown_type_ok: bool = True


@dataclass(frozen=True)
class Existential:
    """Per-group existential: every group (by ``key``) must contain at
    least one row satisfying the named predicate.

    Analog of owl:someValuesFrom (CheckOwlRestrictionSome)."""

    key: str
    predicate: str                      # id in checks registry
    # dataRange analog: values on rows SATISFYING the predicate must also
    # pass this facet set (CheckOwlRestrictionSome.php:517 SOME-102)
    column: Optional[str] = None
    value_facets: Optional[Facets] = None


@dataclass(frozen=True)
class Universal:
    """Per-row universal: every row must satisfy the named predicate
    (violations are the counterexamples).

    Analog of owl:allValuesFrom (CheckOwlRestrictionOnly)."""

    predicate: str
    # dataRange analog: every value the universal ranges over must also
    # pass this facet set (CheckOwlRestrictionOnly.php:536 ONLY-102)
    column: Optional[str] = None
    value_facets: Optional[Facets] = None


@dataclass
class ConstraintSpec:
    """The full "ontology" for one table."""

    table: str
    expected_schema: Optional[pa.Schema] = None
    facets: dict[str, Facets] = field(default_factory=dict)
    enums: list[EnumDomain] = field(default_factory=list)
    cross_domains: list[CrossColumnDomain] = field(default_factory=list)
    cardinalities: list[Cardinality] = field(default_factory=list)
    ref_integrity: list[RefIntegrity] = field(default_factory=list)
    existentials: list[Existential] = field(default_factory=list)
    universals: list[Universal] = field(default_factory=list)
    key_column: Optional[str] = None     # primary record key (clip_id analog)
    params: dict[str, Any] = field(default_factory=dict)  # check params (?mode=strict|loose analog)


def spec_to_dict(spec: "ConstraintSpec") -> dict:
    """JSON-serializable form of a spec (the dvt.ini-file analog: the
    whole 'ontology' as declarative config)."""
    d: dict = {"table": spec.table, "key_column": spec.key_column,
               "params": dict(spec.params)}
    if spec.expected_schema is not None:
        d["expected_schema"] = {f.name: str(f.type) for f in spec.expected_schema}
    # Identity (not equality) checks: 0 == False in Python, so an equality
    # filter would silently drop zero-valued bounds (min_inclusive=0.0).
    def _facets_d(f: "Facets") -> dict:
        return {k: v for k, v in f.__dict__.items()
                if v is not None and v is not False}

    def _with_vf(obj) -> dict:
        d2 = {k: v for k, v in obj.__dict__.items() if v is not None}
        if d2.get("value_facets") is not None:
            d2["value_facets"] = _facets_d(obj.value_facets)
        return d2

    d["facets"] = {c: _facets_d(f) for c, f in spec.facets.items()}
    d["enums"] = [{"column": e.column, "allowed": sorted(e.allowed),
                   "parents": dict(e.parents)} for e in spec.enums]
    d["cross_domains"] = [{"type_column": c.type_column, "column": c.column,
                           "allowed": {k: sorted(v) for k, v in c.allowed.items()},
                           "unknown_type_ok": c.unknown_type_ok}
                          for c in spec.cross_domains]
    d["cardinalities"] = [_with_vf(c) for c in spec.cardinalities]
    d["ref_integrity"] = [dict(r.__dict__) for r in spec.ref_integrity]
    d["existentials"] = [_with_vf(e) for e in spec.existentials]
    d["universals"] = [_with_vf(u) for u in spec.universals]
    return d


def spec_from_dict(d: dict) -> "ConstraintSpec":
    schema = None
    if d.get("expected_schema"):
        schema = pa.schema([(n, _parse_type(t)) for n, t in d["expected_schema"].items()])
    return ConstraintSpec(
        table=d.get("table", "table"),
        key_column=d.get("key_column"),
        expected_schema=schema,
        params=d.get("params", {}),
        facets={c: Facets(**f) for c, f in d.get("facets", {}).items()},
        enums=[EnumDomain(column=e["column"], allowed=frozenset(e["allowed"]),
                          parents=e.get("parents", {})) for e in d.get("enums", [])],
        cross_domains=[CrossColumnDomain(
            type_column=c["type_column"], column=c["column"],
            allowed={k: frozenset(v) for k, v in c["allowed"].items()},
            unknown_type_ok=c.get("unknown_type_ok", True))
            for c in d.get("cross_domains", [])],
        cardinalities=[Cardinality(**_parse_vf(c)) for c in d.get("cardinalities", [])],
        ref_integrity=[RefIntegrity(**r) for r in d.get("ref_integrity", [])],
        existentials=[Existential(**_parse_vf(e)) for e in d.get("existentials", [])],
        universals=[Universal(**_parse_vf(u)) for u in d.get("universals", [])],
    )


def _parse_vf(d: dict) -> dict:
    if d.get("value_facets") is not None:
        d = dict(d, value_facets=Facets(**d["value_facets"]))
    return d


def _parse_type(name: str) -> pa.DataType:
    try:
        return pa.type_for_alias(name)
    except ValueError:
        if name.startswith("timestamp"):
            unit = name.split("[")[1].rstrip("]") if "[" in name else "us"
            return pa.timestamp(unit)
        raise


# ---------------------------------------------------------------------------
# The flagship spec for the audio clip + transcript table (input_hint shape).
# ---------------------------------------------------------------------------

CODEC_HIERARCHY = {"pcm_s16le": "pcm", "pcm_u8": "pcm", "pcm": "audio", "ulaw": "audio"}
KNOWN_CODECS = frozenset({"pcm_s16le", "pcm_u8", "ulaw"})
CODEC_SR = {
    "pcm_s16le": frozenset({8000, 16000, 22050, 44100, 48000}),
    "pcm_u8": frozenset({8000, 16000, 22050}),
    "ulaw": frozenset({8000, 16000}),
}


def clips_schema() -> pa.Schema:
    return pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
        ]
    )


def clips_spec(mode: str = "strict") -> ConstraintSpec:
    """Constraint spec for the audio table — the engine's default run
    config, mirroring the reference's dvt.ini check list (dvt.ini:21-33)."""
    return ConstraintSpec(
        table="clips",
        key_column="clip_id",
        expected_schema=clips_schema(),
        facets={
            "clip_id": Facets(dtype="Name", pattern=r"clip:[0-9]{4}:[0-9]{8}",
                              not_null=True, not_empty=True),
            "bytes": Facets(dtype="binary", not_null=True, not_empty=True),
            "sr_hz": Facets(dtype="int", min_inclusive=8000, max_inclusive=48000,
                            not_null=True),
            "dur_ms": Facets(dtype="int", min_inclusive=200, max_inclusive=30000,
                             not_null=True),
            "codec": Facets(dtype="NCName", not_null=True, not_empty=True),
            "transcript": Facets(dtype="normalizedString", max_length=2000,
                                 not_null=True, not_empty=True),
        },
        enums=[EnumDomain(column="codec", allowed=KNOWN_CODECS, parents=CODEC_HIERARCHY)],
        cross_domains=[CrossColumnDomain(type_column="codec", column="sr_hz",
                                         allowed=CODEC_SR)],
        cardinalities=[
            # uniqueness of the primary key == max-cardinality 1
            Cardinality(key="clip_id", column="clip_id", max_count=1),
            # every clip has >= 1 non-empty transcript (min + zero-edge)
            Cardinality(key="clip_id", column="transcript", min_count=1,
                        qualifier="nonempty_transcript"),
        ],
        existentials=[Existential(key="clip_id", predicate="decodable_bytes")],
        universals=[Universal(predicate="bytes_matches_codec"),
                    Universal(predicate="frames_match_dur")],
        ref_integrity=[RefIntegrity(ref_table="refs", ref_column="clip_id",
                                    key_column="clip_id")],
        params={"mode": mode},
    )
