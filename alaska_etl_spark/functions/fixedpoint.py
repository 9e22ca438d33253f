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
