"""Column-expression string functions (SURVEY §2.8 F5, F8-F10) —
the data-plane counterparts of the naming helpers, built entirely from
JVM-side ``pyspark.sql.functions`` so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_filename_col(col: Column | str) -> Column:
    """``sanitize_filename`` as a codegen'd expression: any char outside
    Unicode-alphanumeric / ``_-.`` becomes ``_``
    (reference semantics: src/main.rs:537-547)."""
    return F.regexp_replace(col, r"[^\p{L}\p{N}_\-.]", "_")


def basename_col(path: Column | str) -> Column:
    """Final path component (reference: Path::file_name, src/main.rs:249-252)."""
    return F.regexp_extract(path, r"([^/]+)$", 1)


def stem_col(path: Column | str) -> Column:
    """Basename with its final extension stripped
    (reference: Path::file_stem, src/main.rs:271-275).

    Dot-leading names keep the reference semantics: ``.bashrc`` IS the
    stem (a hidden file, not an empty stem with a ``bashrc`` extension)
    — the lookbehind requires at least one character before the dot
    being stripped, exactly Rust's ``file_stem`` rule."""
    return F.regexp_replace(basename_col(path), r"(?<=.)\.[^.]*$", "")


def lower_contains(col: Column | str, query: str) -> Column:
    """Case-insensitive substring predicate — the reference's file-search
    filter (src/main.rs:1034-1044)."""
    return F.contains(F.lower(col), F.lit(query.lower()))


def is_internal_column(name: str) -> bool:
    """``__name__``-style internal columns (e.g. pandas' __index_level_0__),
    dropped by the CSV sink only (reference: src/main.rs:689-691)."""
    return name.startswith("__") and name.endswith("__")
