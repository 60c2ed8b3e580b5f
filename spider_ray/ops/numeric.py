"""Shared numeric-determinism helpers for the oracle-parity contract.

Every op that folds float money/values into integer space must round the
way ANSI SQL / DuckDB ``round()`` does — HALF AWAY FROM ZERO — not
pyarrow's default half-to-even, or the engine and its SQL oracle silently
diverge on exact .5 boundaries (pc.round(12.5) = 12, DuckDB round(12.5) =
13).  This is the single definition of that contract; do not inline
``pc.round`` for oracle-compared integer outputs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HALF_AWAY = pc.RoundOptions(round_mode="half_towards_infinity")


def round_sql(col):
    """SQL-compatible round-to-integer (half away from zero)."""
    return pc.round(col, options=_HALF_AWAY)


def to_cents(col) -> pa.Array:
    """float value column -> int64 cents, SQL-rounding contract."""
    return pc.cast(round_sql(pc.multiply(col, 100.0)), pa.int64())
