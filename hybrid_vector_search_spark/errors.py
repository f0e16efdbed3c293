"""Engine error types.

Mirrors the reference's hard-error contract (ValidationError /
FilterSpecError raised at src/dataio/validators.py:14-15): malformed
query specs abort the run before any result row is produced.
"""


class ValidationError(ValueError):
    """Data or query-parameter validation failure (hard error)."""


class FilterSpecError(ValueError):
    """Filter DSL specification failure: malformed JSON, unknown column,
    unknown operator, or ill-formed geo predicate (hard error)."""
