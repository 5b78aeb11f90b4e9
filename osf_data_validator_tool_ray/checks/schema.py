"""Driver-side metadata checks — no data motion.

* schema conformance (CheckPropertiesDefined analog: every used property
  must be defined, checks/CheckPropertiesDefined.php:40-51 — here every
  column present must be in the expected schema with the declared type,
  and every expected column must be present)
* spec completeness (CheckFieldTypeDefined analog: every used
  owl:DatatypeProperty must carry a fieldType annotation,
  checks/CheckFieldTypeDefined.php:39-61 — here every physical column
  must have a facet entry in the spec; the spec itself is validated)
"""

from __future__ import annotations

import pyarrow as pa

from ..spec import ConstraintSpec
from .base import empty_violations, make_violations
from ..stages.base_ids import SCHEMA_COLUMN_100, SCHEMA_COLUMN_101, SPEC_COMPLETENESS_100


def schema_violations(actual: pa.Schema, spec: ConstraintSpec) -> pa.Table:
    """mode=strict (default): any physical-type drift is an error.
    mode=loose: numeric widenings (int32->int64, float->double) degrade
    to warnings — the analog of the reference's strict|loose datatype
    check parameter and its Virtuoso integer-coercion mute list
    (CheckDatatypePropertiesDatatype.php:12-26, 198-231)."""
    if spec.expected_schema is None:
        return empty_violations()
    loose = spec.params.get("mode") == "loose"
    expected = spec.expected_schema
    out = []
    exp = {f.name: f.type for f in expected}
    for field in actual:
        if field.name not in exp:
            out.append(make_violations(SCHEMA_COLUMN_100, [None], field.name,
                                       [str(field.type)], expected="column not in spec schema"))
        elif exp[field.name] != field.type:
            widening = (pa.types.is_integer(exp[field.name]) and pa.types.is_integer(field.type)
                        and field.type.bit_width >= exp[field.name].bit_width) or (
                pa.types.is_floating(exp[field.name]) and pa.types.is_floating(field.type))
            sev = "warning" if (loose and widening) else "error"
            out.append(make_violations(SCHEMA_COLUMN_100, [None], field.name,
                                       [str(field.type)], expected=str(exp[field.name]),
                                       severity=sev))
    actual_names = set(actual.names)
    for name in exp:
        if name not in actual_names:
            out.append(make_violations(SCHEMA_COLUMN_101, [None], name,
                                       [None], expected="column present"))
    return pa.concat_tables(out) if out else empty_violations()


def unevaluable_warnings(
    actual: pa.Schema,
    spec: ConstraintSpec,
    ref_tables: "set[str] | None" = None,
) -> pa.Table:
    """Warning tier (-50 ids): one warning row per declared constraint
    that CANNOT be evaluated — absent column, unknown facet dtype,
    unknown predicate/qualifier, missing refs table.

    The reference separates warnings from errors for every check (e.g.
    CheckPropertiesDefined.php:83-86 -50;
    CheckOwlRestrictionMax.php -50..-55; CheckURIExistence.php:77-81
    -50..-53).  Planners silently skip unevaluable constraints (the data
    pass can't check what isn't there); this driver-side sweep makes
    every skip loud so a spec/table mismatch is never invisible.
    """
    from ..functions.facets import VALIDATORS
    from .predicates import PREDICATE_COLUMNS, PREDICATES

    names = set(actual.names)
    out: list[pa.Table] = []

    def warn(cid: str, column: str, observed, expected: str) -> None:
        out.append(make_violations(cid, [None], column, [observed],
                                   expected=expected, severity="warning"))

    for col, f in spec.facets.items():
        if col not in names:
            warn("DATATYPE-FACET-50", col, None,
                 "column present for declared facet set")
        elif f.dtype not in VALIDATORS and f.dtype not in ("binary",):
            warn("DATATYPE-FACET-51", col, f.dtype,
                 "facet dtype with a registered validator")
    for e in spec.enums:
        if e.column not in names:
            warn("ENUM-DOMAIN-50", e.column, None,
                 "column present for enum-domain check")
    for cd in spec.cross_domains:
        for m in sorted({cd.type_column, cd.column} - names):
            warn("CROSS-DOMAIN-51", m, None,
                 "column present for cross-domain check")
    for c in spec.cardinalities:
        cid = ("CARD-MAX-50" if c.max_count is not None
               else "CARD-EXACT-50" if c.exact_count is not None
               else "CARD-MIN-50")
        if c.key not in names:
            warn(cid, c.key, None, "key column present for cardinality check")
        elif c.column not in names:
            warn(cid, c.column, None, "counted column present for cardinality check")
        elif c.qualifier is not None and c.qualifier not in PREDICATES:
            warn(cid, c.qualifier, None, "registered qualifier predicate")
        elif c.qualifier is not None and not (PREDICATE_COLUMNS[c.qualifier] <= names):
            warn(cid, c.qualifier,
                 ",".join(sorted(PREDICATE_COLUMNS[c.qualifier] - names)),
                 "qualifier predicate columns present")
    for e in spec.existentials:
        if e.predicate not in PREDICATES:
            warn("SOME-50", e.predicate, None, "registered predicate")
        elif e.key not in names:
            warn("SOME-50", e.key, None, "key column present for existential check")
        elif not (PREDICATE_COLUMNS[e.predicate] <= names):
            warn("SOME-50", e.predicate,
                 ",".join(sorted(PREDICATE_COLUMNS[e.predicate] - names)),
                 "predicate columns present")
    for u in spec.universals:
        if u.predicate not in PREDICATES:
            warn("ONLY-50", u.predicate, None, "registered predicate")
        elif not (PREDICATE_COLUMNS[u.predicate] <= names):
            warn("ONLY-50", u.predicate,
                 ",".join(sorted(PREDICATE_COLUMNS[u.predicate] - names)),
                 "predicate columns present")
    if ref_tables is not None:
        for ri in spec.ref_integrity:
            if ri.ref_table not in ref_tables:
                warn("REF-EXISTENCE-50", ri.ref_column, ri.ref_table,
                     "refs table supplied for referential check")
    return pa.concat_tables(out) if out else empty_violations()


def spec_completeness_violations(actual: pa.Schema, spec: ConstraintSpec) -> pa.Table:
    missing = [n for n in actual.names if n not in spec.facets]
    if not missing:
        return empty_violations()
    return make_violations(SPEC_COMPLETENESS_100, [None] * len(missing), "",
                           missing, expected="facet entry in constraint spec"
                           ).set_column(3, "column", pa.array(missing, type=pa.string()))
