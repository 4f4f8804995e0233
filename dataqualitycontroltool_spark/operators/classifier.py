"""Distributed logistic-regression quality classifier in pure Catalyst.

Trains the keep/drop filter itself on the engine: full-batch gradient
descent where every step is ONE map-side-combinable global aggregate
(`avg` of per-row gradient terms) over the corpus, and the model is
``d + 1`` driver-held doubles folded into the scoring projection as
literals.  This is the standard data-parallel GD layout: at 10^12 rows a
step is a single whole-stage-codegen scan + partial/final hash aggregate
— no shuffle of row data, only the d+1 partial sums cross the wire.

The reference tool's keep/drop logic is hand-written per-column rules
(mipqctool/model/qcfrictionless — row-at-a-time checks); this operator
closes the loop from engineered quality signals to a LEARNED decision on
the same engine, CCNet-style (quality classifier over cheap features).

Cross-engine determinism contract (same discipline as the bigram-LM and
centroid operators): gradients are rounded to 9 decimals INSIDE the
aggregate, so the float noise from distributed summation order
(~1e-15 relative) is absorbed before the weight update; the update
itself (``w - lr * g``) is exact IEEE arithmetic on identical inputs, so
the trained weights are bit-identical to a SQL replay that unrolls the
same number of steps.  Keep ``lr`` exactly representable (1.0, 0.5,
0.25) to preserve that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _z(weights: list[float], feats: list[Column]) -> Column:
    """Left-associated w0 + w1*x1 + ... — mirrors the SQL replay's parse
    order so the float result is bit-identical."""
    z = F.lit(float(weights[0]))
    for w, x in zip(weights[1:], feats):
        z = z + F.lit(float(w)) * x
    return z


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 4,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch GD from zero init; returns ``[bias, w_1, ..., w_d]``.

    Each step collects exactly d+1 doubles (the averaged gradient) — a
    bounded driver transfer by design, like the connected-components
    convergence scalar.  For a minibatch variant at extreme scale,
    pre-filter ``df`` with a deterministic md5-threshold sample (see
    ``operators.corpus.stratified_sample``) — replayable, no RNG state.
    """
    feats = [F.col(c) for c in feature_cols]
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(steps):
        err = _sigmoid(_z(w, feats)) - F.col(label_col)
        grad = df.agg(
            F.round(F.avg(err), 9).alias("g0"),
            *[
                F.round(F.avg(err * x), 9).alias(f"g{j + 1}")
                for j, x in enumerate(feats)
            ],
        ).first()
        if grad[0] is None:
            raise ValueError(
                "train_logistic: no rows with non-null label/features — "
                "nothing to train on"
            )
        w = [w[i] - lr * float(grad[i]) for i in range(len(w))]
    return w


def _det3(m: list[list[str]]) -> str:
    return (
        f"{m[0][0]} * ({m[1][1]} * {m[2][2]} - {m[1][2]} * {m[2][1]})"
        f" - {m[0][1]} * ({m[1][0]} * {m[2][2]} - {m[1][2]} * {m[2][0]})"
        f" + {m[0][2]} * ({m[1][0]} * {m[2][1]} - {m[1][1]} * {m[2][0]})"
    )


def _det4(m: list[list[str]]) -> str:
    def minor(j: int) -> list[list[str]]:
        return [[m[i][c] for c in range(4) if c != j] for i in range(1, 4)]

    return (
        f"{m[0][0]} * ({_det3(minor(0))})"
        f" - {m[0][1]} * ({_det3(minor(1))})"
        f" + {m[0][2]} * ({_det3(minor(2))})"
        f" - {m[0][3]} * ({_det3(minor(3))})"
    )


def irls_update_exprs() -> tuple[list[str], str]:
    """Cramer's-rule solve of the 4x4 IRLS normal equations as EXPRESSION
    STRINGS over names a00..a33 (symmetric: aij -> a<min><max>) and b0..b3.

    The SAME text is evaluated by the Python driver (``eval``) and pasted
    into the DuckDB oracle as SQL, so the update arithmetic is op-for-op
    identical across engines — the closed-form analogue of the GD twin's
    "same left-associated z" contract.  Returns (numerators, denominator);
    delta_k = numerators[k] / denominator."""
    a = [[f"a{min(i, j)}{max(i, j)}" for j in range(4)] for i in range(4)]
    den = _det4(a)
    nums = [
        _det4([[f"b{i}" if j == k else a[i][j] for j in range(4)]
               for i in range(4)])
        for k in range(4)
    ]
    return nums, den


def train_logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 4,
    ridge: float = 1e-3,
) -> list[float]:
    """Ridge-regularized IRLS (Newton) from zero init: ``steps`` jobs total,
    each ONE map-side-combinable aggregate of 14 doubles (the symmetric
    4x4 moment matrix X'RX and the gradient X'(y - mu), averaged), vs the
    24 sequential jobs of plain GD — same scan shape per step, 6x fewer
    driver round-trips, quadratic convergence.  The ridge term keeps the
    Hessian invertible on (near-)separable teachers, where unregularized
    Newton diverges.

    Determinism contract: the 14 moments round to 9 decimals INSIDE the
    aggregate (absorbing distributed-sum order and libm exp noise), the
    ridge is added to the rounded diagonal, and the solve evaluates the
    ``irls_update_exprs`` strings — the exact text the SQL twin runs — so
    the trained weights replay bit-identically in DuckDB."""
    if len(feature_cols) != 3:
        raise ValueError("train_logistic_irls: exactly 3 features (4x4 solve)")
    feats = [F.col(c) for c in feature_cols]
    nums, den = irls_update_exprs()
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(steps):
        mu = _sigmoid(_z(w, feats))
        r = mu * (F.lit(1.0) - mu)
        u = [F.lit(1.0)] + feats
        aggs = []
        for i in range(4):
            for j in range(i, 4):
                e = r
                if i > 0:
                    e = e * u[i]
                if j > 0:
                    e = e * u[j]
                aggs.append(F.round(F.avg(e), 9).alias(f"a{i}{j}"))
        resid = F.col(label_col) - mu
        aggs.append(F.round(F.avg(resid), 9).alias("b0"))
        for i in range(1, 4):
            aggs.append(F.round(F.avg(resid * u[i]), 9).alias(f"b{i}"))
        row = df.agg(*aggs).first()
        if row["a00"] is None:
            raise ValueError(
                "train_logistic_irls: no rows with non-null label/features "
                "— nothing to train on"
            )
        env = {k: float(v) for k, v in row.asDict().items()}
        for i in range(4):
            env[f"a{i}{i}"] = env[f"a{i}{i}"] + ridge
        d = eval(den, {"__builtins__": {}}, env)  # noqa: S307 — own exprs
        w = [
            w[k] + eval(nums[k], {"__builtins__": {}}, env) / d  # noqa: S307
            for k in range(4)
        ]
    return w


def score_logistic(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    threshold: float = 0.5,
    p_col: str = "p",
    keep_col: str = "keep",
) -> DataFrame:
    """Pure-projection scoring: p = sigmoid(w·x) rounded to 6 (the
    cross-engine replay contract), keep = rounded p >= threshold.  The
    weights are literals — whole-stage codegen, no lookup, no UDF."""
    p = F.round(_sigmoid(_z(weights, [F.col(c) for c in feature_cols])), 6)
    return df.withColumn(p_col, p).withColumn(
        keep_col, F.col(p_col) >= F.lit(threshold)
    )


def train_and_score(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 4,
    lr: float = 1.0,
    threshold: float = 0.5,
    cache: bool = True,
    optimizer: str = "gd",
    ridge: float = 1e-3,
) -> DataFrame:
    """Convenience: train on ``df`` then score the same frame.

    ``optimizer="irls"`` uses the ridge-IRLS trainer (``steps`` Newton
    iterations, one 14-double aggregate each) instead of per-step GD.

    ``cache=True`` persists the (slim — pass only id + features + label)
    feature frame so the ``steps`` epochs aggregate cached doubles instead
    of re-deriving features from raw text every pass (measured 7.6s -> ~2s
    for 24 steps over 5k docs).  The lifecycle is fully INTERNAL
    (try/finally, like ``corpus.percentile_keep``): training is eager, so
    the cache is released before returning and the lazy scorer re-derives
    the features exactly once at execution — the same single pass it would
    pay reading the cache, with no persisted state left behind (ADVICE r3:
    queries never unpersisted the old caller-owned cache).  At 10^12 rows
    the production analogue is checkpointing the feature table to storage
    once and reading it per epoch — memory-persist and GD-over-features
    have the same one-materialization shape."""
    if cache:
        df = df.persist()
    try:
        if optimizer == "irls":
            w = train_logistic_irls(df, feature_cols, label_col, steps, ridge)
        else:
            w = train_logistic(df, feature_cols, label_col, steps, lr)
    finally:
        if cache:
            df.unpersist()
    return score_logistic(df, w, feature_cols, threshold)
