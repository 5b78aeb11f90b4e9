"""Vectorized lexical validators + facet evaluation.

Parity target: the reference's scalar validator battery
(/root/reference/.../checks/Check.php:87-554 — dateTime, base64Binary,
anyURI, boolean, the signed/unsigned integer family, decimal/double/float
incl. NaN/INF, hexBinary, language/Name/NCName/NMTOKEN,
string/token/normalizedString, XMLLiteral/PlainLiteral) and its XSP
custom-datatype facet evaluator (checks/Check.php:559-953).

These are NOT ports of the PHP code: each validator is written from the
public XSD 1.1 datatype definitions (https://www.w3.org/TR/xmlschema11-2/)
as a *vectorized* kernel — one compiled regex / numpy pass over a whole
column per batch, never a Python loop over rows in the hot path.

All validators:  np.ndarray[object] of str|None  ->  np.ndarray[bool]
(None is invalid at this layer; nullability is a separate facet).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Callable, Optional

import numpy as np
import pandas as pd

from ..spec import Facets

# ---------------------------------------------------------------------------
# regexes (XSD 1.1 lexical spaces, ASCII-pragmatic where the spec allows
# full Unicode name characters)
# ---------------------------------------------------------------------------

_TZ = r"(Z|[+-](0\d|1[0-4]):[0-5]\d)"
_DATE = r"-?\d{4,}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
_TIME = r"([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?|24:00:00(\.0+)?"
RE_DATETIME = re.compile(rf"{_DATE}T({_TIME}){_TZ}?$")
RE_DATETIMESTAMP = re.compile(rf"{_DATE}T({_TIME}){_TZ}$")
RE_DATE_ONLY = re.compile(rf"{_DATE}{_TZ}?$")
RE_TIME_ONLY = re.compile(rf"({_TIME}){_TZ}?$")

RE_BASE64 = re.compile(r"(?:[A-Za-z0-9+/]\s?)*(?:[A-Za-z0-9+/](\s?=\s?=|\s?=)?)?$")
RE_HEX = re.compile(r"(?:[0-9a-fA-F]{2})*$")
RE_BOOLEAN = re.compile(r"(true|false|1|0)$")
RE_INTEGER = re.compile(r"[+-]?\d+$")
RE_DECIMAL = re.compile(r"[+-]?(\d+(\.\d*)?|\.\d+)$")
RE_FLOATING = re.compile(r"([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$")
# RFC 3986-shaped URI: scheme ':' hier-part [? query] [# fragment]
RE_ANYURI = re.compile(
    r"[A-Za-z][A-Za-z0-9+.\-]*:"          # scheme
    r"[^\s<>\"{}|\\^`]*$"                  # no chars excluded by RFC 3986 §2
)
RE_LANGUAGE = re.compile(r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")
# XML Name productions (pragmatic: Unicode letters via \w minus leading digit)
_NAME_START = r"[^\W\d]|[_:]"
_NCNAME_START = r"[^\W\d]|_"
RE_NAME = re.compile(rf"({_NAME_START})[\w.\-:]*$", re.UNICODE)
RE_NCNAME = re.compile(rf"({_NCNAME_START})[\w.\-]*$", re.UNICODE)
RE_NMTOKEN = re.compile(r"[\w.\-:]+$", re.UNICODE)
RE_HAS_WS_CHARS = re.compile(r"[\n\r\t]")
RE_TOKEN_BAD = re.compile(r"(^\s)|(\s$)|(\s\s)|[\n\r\t]")
RE_PLAINLITERAL = re.compile(r"[\s\S]*@([a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*)?$")

_INT_BOUNDS = {
    "byte": (-128, 127),
    "short": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "long": (-9223372036854775808, 9223372036854775807),
    "integer": (None, None),
    "nonNegativeInteger": (0, None),
    "positiveInteger": (1, None),
    "nonPositiveInteger": (None, 0),
    "negativeInteger": (None, -1),
    "unsignedByte": (0, 255),
    "unsignedShort": (0, 65535),
    "unsignedInt": (0, 4294967295),
    "unsignedLong": (0, 18446744073709551615),
}


def _as_str_series(values) -> pd.Series:
    if isinstance(values, pd.Series):
        return values
    return pd.Series(values, dtype="object")


def _all_str(s: pd.Series) -> bool:
    """True iff every non-null entry is a str — decided by ONE C pass
    (pandas infer_dtype), not a per-value Python map.  Columns arriving
    from Arrow string arrays (the workhorse case) hit this fast path."""
    kind = pd.api.types.infer_dtype(s, skipna=True)
    return kind in ("string", "empty", "unicode")


def _only_strings(s: pd.Series) -> pd.Series:
    """Mask non-str entries to NaN so .str accessors never crash on mixed
    object columns (non-strings are lexically invalid by definition)."""
    if s.dtype == object and len(s) and not _all_str(s):
        return s.where(s.map(lambda v: isinstance(v, str)))
    return s


def _regex_valid(values, rx: re.Pattern) -> np.ndarray:
    s = _only_strings(_as_str_series(values))
    if len(s) == 0 or s.isna().all():
        return np.zeros(len(s), dtype=bool)
    out = s.str.match(rx, na=False)
    return out.to_numpy(dtype=bool)


def _int_family(values, lo, hi) -> np.ndarray:
    s = _only_strings(_as_str_series(values))
    if len(s) == 0 or s.isna().all():
        return np.zeros(len(s), dtype=bool)
    ok = s.str.match(RE_INTEGER, na=False)
    if lo is None and hi is None:
        return ok.to_numpy(dtype=bool)
    okn = ok.to_numpy(dtype=bool)
    if not okn.any():
        return okn
    sub = s.where(ok)
    # Fast path: lexicals of <= 15 chars are < 10^15 < 2^53 in absolute
    # value, so a float64 parse is EXACT and the bounds compare with the
    # _INT_BOUNDS constants (all either <= 2^31 exactly-representable or
    # >= 2^63-ish, far above any 15-digit value) is exact too — one
    # vectorized to_numeric instead of a per-value Python int().
    lens = sub.str.len()
    short = ((lens <= 15).fillna(False) & ok).to_numpy(dtype=bool)
    out = okn.copy()
    if short.any():
        vals = pd.to_numeric(
            sub.where(pd.Series(short, index=sub.index)),
            errors="coerce").to_numpy(dtype=np.float64)
        good = np.ones(len(s), dtype=bool)
        if lo is not None:
            good &= vals >= lo
        if hi is not None:
            good &= vals <= hi
        out &= np.where(short, good, True)
    # Slow path (rare: 16+ chars, e.g. near the long/unsignedLong
    # bounds): exact arbitrary-precision Python ints — floats would
    # round 2^64 onto the unsignedLong max.
    long_mask = okn & ~short
    for i in np.flatnonzero(long_mask):
        v = int(s.iloc[i])
        out[i] = ((lo is None or v >= lo) and (hi is None or v <= hi))
    return out


def _valid_string(values) -> np.ndarray:
    """xsd:string — any well-formed character data.  The reference
    validates by round-tripping through an XML parser
    (checks/Check.php:469-538); here any non-null str is valid (Arrow
    strings are guaranteed valid UTF-8)."""
    s = _as_str_series(values)
    if s.dtype == object:
        if _all_str(s):
            return s.notna().to_numpy(dtype=bool)
        return s.map(lambda v: isinstance(v, str)).to_numpy(dtype=bool)
    return s.notna().to_numpy(dtype=bool)


def _valid_xmlliteral(values) -> np.ndarray:
    """rdf:XMLLiteral — value must parse as an XML fragment.  Inherently
    per-value (XML parsing has no vectorized kernel); only used for
    explicitly XML-typed columns, never in the hot default path."""
    s = _as_str_series(values)
    out = np.zeros(len(s), dtype=bool)
    for i, v in enumerate(s):
        if isinstance(v, str):
            try:
                ET.fromstring(f"<r>{v}</r>")
                out[i] = True
            except ET.ParseError:
                out[i] = False
    return out


VALIDATORS: dict[str, Callable[..., np.ndarray]] = {
    "dateTime": lambda v: _regex_valid(v, RE_DATETIME),
    "dateTimeStamp": lambda v: _regex_valid(v, RE_DATETIMESTAMP),
    "date": lambda v: _regex_valid(v, RE_DATE_ONLY),
    "time": lambda v: _regex_valid(v, RE_TIME_ONLY),
    "base64Binary": lambda v: _regex_valid(v, RE_BASE64),
    "hexBinary": lambda v: _regex_valid(v, RE_HEX),
    "anyURI": lambda v: _regex_valid(v, RE_ANYURI),
    "boolean": lambda v: _regex_valid(v, RE_BOOLEAN),
    "decimal": lambda v: _regex_valid(v, RE_DECIMAL),
    "double": lambda v: _regex_valid(v, RE_FLOATING),
    "float": lambda v: _regex_valid(v, RE_FLOATING),
    "language": lambda v: _regex_valid(v, RE_LANGUAGE),
    "Name": lambda v: _regex_valid(v, RE_NAME),
    "NCName": lambda v: _regex_valid(v, RE_NCNAME),
    "NMTOKEN": lambda v: _regex_valid(v, RE_NMTOKEN),
    "string": _valid_string,
    "normalizedString": lambda v: _valid_string(v) & ~_regex_contains(v, RE_HAS_WS_CHARS),
    "token": lambda v: _valid_string(v) & ~_regex_contains(v, RE_TOKEN_BAD),
    "XMLLiteral": _valid_xmlliteral,
    "PlainLiteral": lambda v: _regex_valid(v, RE_PLAINLITERAL),
}
for _name, (_lo, _hi) in _INT_BOUNDS.items():
    VALIDATORS[_name] = (lambda lo, hi: lambda v: _int_family(v, lo, hi))(_lo, _hi)


def _regex_contains(values, rx: re.Pattern) -> np.ndarray:
    s = _only_strings(_as_str_series(values))
    if len(s) == 0 or s.isna().all():
        return np.zeros(len(s), dtype=bool)
    return s.str.contains(rx, na=False).to_numpy(dtype=bool)


def validate(datatype: str, value: Optional[str]) -> bool:
    """Scalar convenience wrapper (test/parity surface, mirrors the
    reference's per-value validateXXX calls)."""
    if datatype not in VALIDATORS:
        raise KeyError(f"unknown datatype {datatype!r}")
    if value is None:
        return False
    return bool(VALIDATORS[datatype](np.array([value], dtype=object))[0])


# ---------------------------------------------------------------------------
# Facet evaluation over a batch column
# ---------------------------------------------------------------------------

def facet_violations(values, facets: Facets) -> dict[str, np.ndarray]:
    """Evaluate all declared facets conjunctively over one column.

    Returns {facet_name: boolean violation mask}.  Null handling: nulls
    only violate ``not_null``; every other facet treats null as pass
    (absence is the cardinality checks' concern, mirroring how the
    reference only validates values that exist).
    """
    s = _as_str_series(values)
    isnull = s.isna().to_numpy(dtype=bool)
    notnull = ~isnull
    out: dict[str, np.ndarray] = {}

    if facets.not_null:
        out["not_null"] = isnull

    is_bytes = len(s) > 0 and isinstance(s.dropna().iloc[0] if notnull.any() else None, (bytes, bytearray))

    if facets.not_empty:
        if is_bytes:
            lens = s.map(lambda b: len(b) if isinstance(b, (bytes, bytearray)) else None)
            out["not_empty"] = (lens.fillna(1) == 0).to_numpy(dtype=bool) & notnull
        else:
            out["not_empty"] = (s.fillna("x") == "").to_numpy(dtype=bool) & notnull

    if facets.pattern is not None:
        rx = _compiled(facets.pattern)
        s2 = _only_strings(s)
        if len(s2) == 0 or s2.isna().all():
            out["pattern"] = np.zeros(len(s), dtype=bool)
        else:
            ok = s2.str.fullmatch(rx, na=True)
            out["pattern"] = (~ok.to_numpy(dtype=bool)) & notnull

    numeric_needed = any(
        x is not None
        for x in (facets.min_inclusive, facets.max_inclusive,
                  facets.min_exclusive, facets.max_exclusive)
    )
    if numeric_needed:
        nums = pd.to_numeric(s, errors="coerce")
        bad = np.zeros(len(s), dtype=bool)
        if facets.min_inclusive is not None:
            bad |= (nums < facets.min_inclusive).to_numpy(dtype=bool)
        if facets.max_inclusive is not None:
            bad |= (nums > facets.max_inclusive).to_numpy(dtype=bool)
        if facets.min_exclusive is not None:
            bad |= (nums <= facets.min_exclusive).to_numpy(dtype=bool)
        if facets.max_exclusive is not None:
            bad |= (nums >= facets.max_exclusive).to_numpy(dtype=bool)
        out["bounds"] = bad & notnull

    length_needed = any(x is not None for x in (facets.min_length, facets.max_length, facets.length))
    if length_needed:
        if is_bytes:
            lens = s.map(lambda b: len(b) if isinstance(b, (bytes, bytearray)) else np.nan)
        else:
            s2 = _only_strings(s)
            lens = (pd.Series(np.nan, index=s2.index)
                    if (len(s2) == 0 or s2.isna().all()) else s2.str.len())
        lens = pd.to_numeric(lens, errors="coerce")
        bad = np.zeros(len(s), dtype=bool)
        if facets.min_length is not None:
            bad |= (lens < facets.min_length).to_numpy(dtype=bool)
        if facets.max_length is not None:
            bad |= (lens > facets.max_length).to_numpy(dtype=bool)
        if facets.length is not None:
            bad |= (lens != facets.length).to_numpy(dtype=bool) & notnull
        out["length"] = bad & notnull

    # lexical datatype validation only applies to string-typed data; numeric
    # columns arrive as Arrow ints/floats whose type conformance is the
    # schema check's concern
    if facets.dtype in VALIDATORS and not is_bytes and s.dtype == object and notnull.any():
        if facets.dtype not in ("string",):
            valid = VALIDATORS[facets.dtype](s)
            if _all_str(s):
                strish = notnull
            else:
                strish = s.map(lambda v: isinstance(v, str)) \
                    .to_numpy(dtype=bool)
            mask = (~valid) & notnull & strish
            if mask.any():
                out["datatype"] = mask
    return out


_RX_CACHE: dict[str, re.Pattern] = {}


def _compiled(pattern: str) -> re.Pattern:
    rx = _RX_CACHE.get(pattern)
    if rx is None:
        rx = _RX_CACHE[pattern] = re.compile(pattern)
    return rx
