from .base import VIOLATION_SCHEMA, make_violations, empty_violations  # noqa: F401
