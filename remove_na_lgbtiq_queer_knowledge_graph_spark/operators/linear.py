"""Logistic-regression training as relational aggregation — the
"ML on MapReduce" statistical-query form (Chu et al. 2007, NIPS "Map-
Reduce for Machine Learning on Multicore"): each full-batch gradient
step is ONE map-side-combinable aggregate over the feature frame, so
training cost per step is a single scan + partial-agg exchange of d+2
numbers — the shape that survives a 100 TB corpus (the model crosses
the wire, never the data).

Cross-engine determinism (the same discipline as every oracle-checked
score in this repo):

- per-row sigmoid outputs round to 12 dp BEFORE entering any sum, so a
  last-ulp ``exp`` difference between the JVM and DuckDB's libm cannot
  survive into the gradient;
- gradient terms round to 14 dp and SUM as DECIMAL(28,14) — decimal
  addition is exact and associative, so Spark's partial-aggregate
  order vs DuckDB's single-threaded order cannot change bits;
- weight updates round to 12 dp with the same half-away-from-zero
  rule DuckDB's ``round`` applies (verified formula-equal over 10k
  random doubles), computed driver-side in pure Python;
- reported weights round to 6 dp — any residual 1e-12-scale drift is
  six orders of magnitude below the comparison grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# round_half_away: the shared scalar kernel (half-away-from-zero,
# formula-identical to DuckDB's ``round(double, n)``, NaN/inf-safe) —
# hoisted to functions.numeric so the convention has exactly one home.
from ..functions.numeric import round_half_away, round_half_away_col  # noqa: F401


def logreg_train_rounds(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    steps: int = 5,
) -> tuple[list[tuple[int, list[float], int]], list[float]]:
    """Full-batch gradient descent on logistic loss (η = 1, zero init).

    ``features`` columns: ``label_col`` ∈ {0,1} plus double-typed
    ``feature_cols`` (the caller supplies the bias column as a feature
    if wanted — this trainer adds an implicit intercept feature 1.0 at
    position 0).

    Returns ``(curve, final_weights)``: one curve row per step *t* =
    0..steps−1 — (t, weights USED at step t rounded to 6 dp, n_correct
    of those weights) — so a cross-engine divergence at ANY iteration
    is caught, not just in the final model; plus the unrounded-to-6
    (12-dp) weights AFTER all ``steps`` updates, for inference.

    Per step: one aggregate computing d+1 decimal gradient sums, the
    row count, and the decision-rule hit count; the weight update runs
    driver-side on d+1 scalars.  The feature frame should be persisted
    by the caller when the source scan is expensive — at 100 TB that
    persist (or a recompute-per-step scan) is the entire cost."""
    y = F.col(label_col)
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    w = [0.0] * len(xs)
    out: list[tuple[int, list[float], int]] = []
    for t in range(steps):
        z = F.lit(w[0])
        for wj, xj in zip(w[1:], xs[1:]):
            z = z + F.lit(wj) * xj  # left-assoc, mirroring the SQL text
        # p (a sigmoid in (0,1), d=12) is deep inside the float-scaled
        # form's validity regime, so it rounds DuckDB-matching like
        # every other oracle-compared double (round-9 review: keeping
        # F.round here left the repr-midpoint hazard live on the
        # training path while the scoring twin was converted).  The
        # d=14 GRADIENT round stays F.round: |d·xj| up to ~10 at
        # d=14 sits at the regime edge (functions/numeric.py), and
        # that exact discipline is DuckDB-pinned by the LR property
        # tests.
        p = round_half_away_col(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 12)
        d = p - y
        aggs = [
            F.sum(F.round(d * xj, 14).cast("decimal(28,14)")).alias(f"g{j}")
            for j, xj in enumerate(xs)
        ]
        aggs.append(F.count(F.lit(1)).alias("n"))
        aggs.append(
            F.sum(
                F.when((p >= F.lit(0.5)) == (y == F.lit(1)), 1).otherwise(0)
            ).alias("ok")
        )
        row = features.agg(*aggs).collect()[0]
        n = int(row["n"])
        out.append(
            (t, [round_half_away(wj, 6) for wj in w], int(row["ok"]))
        )
        # float(Decimal) and DuckDB's CAST(DECIMAL AS DOUBLE) are both
        # correctly-rounded; the update expression order (divide, then
        # subtract, then round) matches the oracle's text exactly
        w = [
            round_half_away(wj - float(row[f"g{j}"]) / n, 12)
            for j, wj in enumerate(w)
        ]
    return out, w
