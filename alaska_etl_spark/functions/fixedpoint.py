"""Integer fixed-point emit helpers shared by the exact-arithmetic
operators (simjoin, containment, bitext margin, novelty, rollup, and
the avg-emitting queries).

The engine's cross-engine float protocol (README "Oracle protocol"):
ratios that must hash-match a DuckDB oracle are computed in exact
integer arithmetic and only converted to float by ONE final division
by a power of ten — both engines then produce bit-identical IEEE
doubles. The core move is round-half-up of ``scale·num/den`` for
non-negative integers without ever leaving BIGINT:

    (2·scale·num + den) div (2·den)

(adding half the denominator before truncating division). Before round
6 this expression was copied, with per-site constant folding, across
~20 call sites; VERDICT r5 #9 asked for one helper property-pinned
against ``fractions.Fraction`` rounding. The helper emits the same
arithmetic, so every existing oracle is unchanged.

Domain contract (asserted by the property test, not at runtime): num
is a non-negative BIGINT expression, den positive, and 2·scale·num
stays within signed-64 range — every call site divides counts or
fixed-pointed sums whose magnitudes are bounded by construction
(4dp/6dp micros of values in [-1, 1], row counts, gram counts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def div_half_up(num: str, den: str, scale: int = 1) -> Column:
    """``round_half_up(scale * num / den)`` as exact BIGINT arithmetic.

    ``num`` and ``den`` are SQL expression strings (column names or
    arithmetic over them) evaluating to BIGINT, num ≥ 0, den > 0.
    Property-pinned against Fraction rounding in
    tests/test_properties.py::test_div_half_up_matches_fraction.
    """
    return F.expr(f"(2 * {scale} * ({num}) + ({den})) div (2 * ({den}))")


def div_half_up_py(num: int, den: int, scale: int = 1) -> int:
    """Pure-Python replica of :func:`div_half_up` (the property test's
    subject, and the replica used by driver-side checks)."""
    return (2 * scale * num + den) // (2 * den)


def div_half_up_signed(num: str, den: str, scale: int = 1) -> Column:
    """Sign-aware ``round_half_away_from_zero(scale * num / den)``:
    compute :func:`div_half_up` on ``abs(num)`` and reapply the sign.

    The plain helper's contract requires num ≥ 0 because Spark ``div``
    truncates toward zero while DuckDB ``//`` floors — they disagree
    exactly when the dividend goes negative (ADVICE r6: TWAP weighted
    sums and DID cell sums CAN go negative when the value column
    does). Routing through abs() keeps both engines on non-negative
    operands, where floor == truncate, so the twin SQL form
    ``CASE WHEN num < 0 THEN -((2*scale*(-num)+den) // (2*den))
    ELSE (2*scale*num+den) // (2*den) END`` is engine-exact.
    Property-pinned in tests/test_properties.py.
    """
    mag = f"(2 * {scale} * abs({num}) + ({den})) div (2 * ({den}))"
    return F.expr(f"CASE WHEN ({num}) < 0 THEN -({mag}) ELSE ({mag}) END")


def div_half_up_signed_py(num: int, den: int, scale: int = 1) -> int:
    """Pure-Python replica of :func:`div_half_up_signed`."""
    mag = (2 * scale * abs(num) + den) // (2 * den)
    return -mag if num < 0 else mag


def sql_div_half_up_signed(num: str, den: str, scale: int = 1) -> str:
    """The DuckDB twin of :func:`div_half_up_signed` as a SQL fragment
    (``//`` floor-division; abs() keeps operands non-negative so it
    matches Spark's truncating ``div``). Used by oracle strings so the
    two engines share one sign convention by construction."""
    mag = f"(2 * {scale} * abs({num}) + ({den})) // (2 * ({den}))"
    return f"(CASE WHEN ({num}) < 0 THEN -({mag}) ELSE ({mag}) END)"
