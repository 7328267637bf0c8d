"""Schema compatibility and intersection semantics.

Reproduces the reference's schema reconciliation exactly
(reference: /root/reference/src/main.rs — `schemas_compatible` :674-686,
`find_common_columns` :617-642, `check_schema_mismatch` :408-430):

- Compatibility = same field count, same names, same types, SAME ORDER.
  Nullability is ignored.  No type widening: int vs bigint = incompatible.
- Reconciliation on mismatch = INTERSECTION of columns (name + exact type
  present in every schema), ordered by the FIRST schema — not a union with
  null-fill.  Spark's ``mergeSchema`` / ``unionByName(allowMissingColumns)``
  implement the opposite semantics and must not be used for this.
- Mismatch detection over a file set compares every schema to the first;
  an unreadable schema counts as a mismatch.

These run on the driver over ``StructType`` metadata (footer-only probes);
no executor work.
"""

from __future__ import annotations

from pyspark.sql.types import DataType, StructType


def _signature(schema: StructType) -> list[tuple[str, DataType]]:
    """(name, dataType) pairs in schema order; nullability dropped."""
    return [(f.name, f.dataType) for f in schema.fields]


def schemas_compatible(s1: StructType, s2: StructType) -> bool:
    """True iff same column count, names, and types in the same order.

    Nullability differences do not break compatibility; column order does.
    (reference: src/main.rs:674-686)
    """
    return _signature(s1) == _signature(s2)


def check_schema_mismatch(schemas: list[StructType | None]) -> bool:
    """True if any schema is unreadable (None) or incompatible with the first.

    Fewer than 2 readable inputs => trivially compatible (False), matching
    the reference's early-exit.  (reference: src/main.rs:408-430)
    """
    if len(schemas) < 2:
        # DELIBERATE DEVIATION from the reference, which returns false
        # unconditionally for <2 files (src/main.rs:409-411): a single
        # UNREADABLE file is still flagged here, so the advisory mismatch
        # flag can't claim a broken file is clean.  Harmless either way —
        # merged_df() re-probes and hard-errors on unreadable schemas.
        return any(s is None for s in schemas)
    if any(s is None for s in schemas):
        return True
    first = schemas[0]
    return any(not schemas_compatible(first, s) for s in schemas[1:])


def find_common_columns(schemas: list[StructType]) -> list[str]:
    """Columns present in ALL schemas with an exactly-equal type,
    ordered by their position in the first schema.

    Types must match exactly (no widening); nullability is ignored because
    the comparison is on ``dataType`` only.  (reference: src/main.rs:617-642)
    """
    if not schemas:
        return []
    rest = [dict(_signature(s)) for s in schemas[1:]]
    common = []
    for field in schemas[0].fields:
        if all(types.get(field.name) == field.dataType for types in rest):
            common.append(field.name)
    return common


class NoCommonColumnsError(ValueError):
    """Raised when the schema intersection of a merge batch is empty.

    (reference error: "No common columns found across all files",
    src/main.rs:573-575)
    """


class NoFilesToMergeError(ValueError):
    """Raised when a merge batch contains no files.

    (reference error: "No files to merge", src/main.rs:550-552)
    """


class UnreadableSchemaError(ValueError):
    """Raised when a file's footer schema cannot be read during merge.

    (reference: hard error naming the file, src/main.rs:557-561)
    """
