"""Batch-naming scalar functions (SURVEY §2.8 F1-F5).

These operate on *metadata* (file/batch names — at most a few thousand short
strings), so they are driver-side pure-Python by design, exactly like the
reference runs them on its in-memory file list.  Column-expression versions
of the data-plane-relevant ones live in ``functions.strings``.

Reference semantics (not code) from /root/reference/src/main.rs:
`find_common_prefix` :482-500, `find_common_suffix` :502-510,
`find_common_substring` :512-534, `generate_batch_name` :440-480,
`sanitize_filename` :537-547.
"""

from __future__ import annotations


def find_common_prefix(strings: list[str]) -> str:
    """Longest common prefix of all strings (char-wise against the first)."""
    if not strings:
        return ""
    first = strings[0]
    n = len(first)
    for s in strings[1:]:
        n = min(n, len(s))
        i = 0
        while i < n and s[i] == first[i]:
            i += 1
        n = i
        if n == 0:
            return ""
    return first[:n]


def find_common_suffix(strings: list[str]) -> str:
    """Longest common suffix = reverse -> common prefix -> reverse."""
    return find_common_prefix([s[::-1] for s in strings])[::-1]


def find_common_substring(strings: list[str]) -> str | None:
    """Longest substring of the FIRST string that appears in all strings,
    requiring length >= 3 and at least 2 alphabetic characters; longest
    candidates are tried first.
    """
    if not strings:
        return None
    first = strings[0]
    for length in range(len(first), 2, -1):
        for start in range(0, len(first) - length + 1):
            cand = first[start : start + length]
            if sum(c.isalpha() for c in cand) < 2:
                continue
            if all(cand in s for s in strings[1:]):
                return cand
    return None


def _trim_trailing_separators_and_digits(s: str) -> str:
    return s.rstrip("_-0123456789").rstrip("_-")


def _trim_leading_separators_and_digits(s: str) -> str:
    return s.lstrip("_-0123456789").lstrip("_-")


def generate_batch_name(names: list[str], batch_number: int) -> str:
    """Derive a human-readable batch name from member file names.

    Fallback chain: single name -> itself; common prefix (trailing
    separator/digit-trimmed) if >= 3 chars; common suffix (leading-trimmed
    mirror) if >= 3 chars; common substring (>= 3); else ``batch_{n}``.
    """
    if len(names) == 1:
        return names[0]
    if names:
        prefix = _trim_trailing_separators_and_digits(find_common_prefix(names))
        if len(prefix) >= 3:
            return prefix
        suffix = _trim_leading_separators_and_digits(find_common_suffix(names))
        if len(suffix) >= 3:
            return suffix
        sub = find_common_substring(names)
        if sub is not None and len(sub) >= 3:
            return sub
    return f"batch_{batch_number}"


def sanitize_filename(name: str) -> str:
    """Replace every char that is not Unicode-alphanumeric or in ``_-.``
    with ``_`` (safe output file names)."""
    return "".join(c if (c.isalnum() or c in "_-.") else "_" for c in name)
