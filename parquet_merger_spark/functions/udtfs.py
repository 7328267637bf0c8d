"""Python UDTF surface (SURVEY §2.10): user-defined TABLE functions.

The reference has no extension mechanism at all; Spark's UDTF API is the
most general user hook — one input row to N output rows with arbitrary
Python state per partition.  This module demonstrates the surface with a
deterministic tokenizer-with-positions (oracle-expressible, so the
differential harness can certify the UDTF path end-to-end).

Scale notes: UDTFs execute row-at-a-time in the Python worker — the
SLOWEST path in the engine (SURVEY §9.3's hierarchy: JVM expression >
Arrow-batched pandas UDF > row Python).  Legitimate uses are row
expanders whose logic genuinely needs Python (a real tokenizer library,
a parser); anything expressible as explode(expr) should be explode(expr)
— :func:`operators.chunking.chunk_documents` is the native counterpart.
The class-based API still scales horizontally: each partition gets its
own instance, no cross-partition state, so 1000 executors run 1000
independent streams.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, tok string")
class TokenPositions:
    """Yield (1-based position, token) per whitespace token — the
    UDTF-API sibling of ``posexplode(split(text, ' '))`` with two
    deliberate differences the oracle mirrors: positions are 1-based
    (posexplode is 0-based), and empty/NULL text yields NO rows (the
    ``if text:`` guard — split('') would yield one empty token).  The
    udtf_tokens oracle's ``length(text) > 0`` clause exists to match
    this; keep them in lockstep."""

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if text:
            for i, t in enumerate(text.split(" "), start=1):
                yield i, t


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL use (idempotent)."""
    spark.udtf.register("token_positions", TokenPositions)
