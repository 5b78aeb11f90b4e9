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


def spec_completeness_violations(actual: pa.Schema, spec: ConstraintSpec) -> pa.Table:
    missing = [n for n in actual.names if n not in spec.facets]
    if not missing:
        return empty_violations()
    return make_violations(SPEC_COMPLETENESS_100, [None] * len(missing), "",
                           missing, expected="facet entry in constraint spec"
                           ).set_column(3, "column", pa.array(missing, type=pa.string()))
