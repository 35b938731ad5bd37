"""Cross-engine-deterministic numeric helpers.

The one lesson of nine rounds of differential fuzzing: every oracle-
compared double must be rounded IDENTICALLY by both engines, and
Spark's ``F.round`` is not that function.  On doubles it goes through
``BigDecimal.valueOf`` = ``Double.toString``'s SHORTEST decimal
representation, while DuckDB rounds the EXACT BINARY value by float
scaling.  The two disagree exactly when a double sits just below a
decimal midpoint but its shortest repr IS the midpoint — which is
common, not exotic, for values that live on a decimal grid: sums of
already-rounded terms, ratios of integers with 2^a·5^b denominators,
products of counts with 9-dp log weights.  Round-9 fuzz catch:
``(13.0 + 1.1195624999999998) + 2.2789879999999996`` =
16.39855049999999892, shortest repr "16.3985505" → ``F.round(·, 6)``
gives 16.398551 while DuckDB gives 16.398550.

``round_half_away_col`` is the float-scaled form —
``floor(|x|·10^d + 0.5) / 10^d · signum(x)`` — matching DuckDB's
``round``, numpy-side ``operators.ann._round_half_away``, and the
scalar ``operators.linear.round_half_away`` (pinned to DuckDB over
5000 random values in ``tests/test_train_ops.py``).

VALIDITY REGIME: bit-parity with DuckDB holds while ``|x|·10^d`` stays
well inside 2^53 (stress-checked: 0 mismatches in 20k adversarial
values at d=6/9 with |x|≤1e6; divergence appears only at d=12 with
|x|≥~4e3, where BOTH rounds degenerate to near-no-ops).  Use for
scores/ratios/log-likelihoods; do not use to round large-magnitude
values at high precision.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_away(x: float, decimals: int = 6) -> float:
    """Scalar twin of :func:`round_half_away_col` — the ONE Python-side
    half-away-from-zero kernel (driver-fit model scores, test oracles).
    Formula-identical to DuckDB's ``round(double, n)``; NaN/±inf pass
    through unchanged (``math.floor(nan)`` would raise).  Pinned to
    DuckDB over 5000 random values in ``tests/test_train_ops.py``."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    scale = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)


def round_half_away_col(c: Column, decimals: int = 6) -> Column:
    """Half-away-from-zero rounding of a DOUBLE column on its exact
    binary value — the cross-engine-deterministic replacement for
    ``F.round`` at every oracle-compared site (see module docstring
    for the hazard and the validity regime)."""
    scale = F.lit(float(10 ** decimals))
    return F.floor(F.abs(c) * scale + F.lit(0.5)) / scale * F.signum(c)
