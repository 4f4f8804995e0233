"""Distributed logistic-regression classifier (operators/classifier.py):
GD math vs an independent numpy twin, rule-distillation quality on the sf
corpus, and the pure-projection scoring plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import classifier

SF_DIR = "/root/testdata/sf0.01"


def _numpy_gd(X, y, steps, lr):
    """Independent reference: same rounding contract (round-9 gradients,
    exact update), numpy instead of Spark."""
    w = np.zeros(X.shape[1] + 1)
    for _ in range(steps):
        z = w[0] + X @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.array([round(float(err.mean()), 9)]
                     + [round(float((err * X[:, j]).mean()), 9)
                        for j in range(X.shape[1])])
        w = w - lr * g
    return w


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, 0.9, 0.1, 1.0),
        (2, 0.8, 0.3, 1.0),
        (3, 0.7, 0.2, 1.0),
        (4, 0.2, 0.8, 0.0),
        (5, 0.1, 0.9, 0.0),
        (6, 0.3, 0.7, 0.0),
    ]
    return spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")


def test_train_matches_numpy_reference(toy):
    w = classifier.train_logistic(toy, ["x1", "x2"], "y", steps=10, lr=4.0)
    rows = sorted(toy.collect(), key=lambda r: r.id)
    X = np.array([[r.x1, r.x2] for r in rows])
    y = np.array([r.y for r in rows])
    want = _numpy_gd(X, y, steps=10, lr=4.0)
    assert w == pytest.approx(list(want), abs=1e-12)


def test_score_separates_toy_classes(toy):
    out = classifier.train_and_score(toy, ["x1", "x2"], "y", steps=30, lr=8.0)
    got = {r.id: (r.p, r.keep) for r in out.collect()}
    assert all(got[i][1] for i in (1, 2, 3))
    assert not any(got[i][1] for i in (4, 5, 6))
    assert min(got[i][0] for i in (1, 2, 3)) > max(got[i][0] for i in (4, 5, 6))


def test_scoring_plan_is_pure_projection(toy):
    scored = classifier.score_logistic(toy, [0.1, 2.0, -1.0], ["x1", "x2"])
    plan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_distilled_rule_f1_on_corpus(spark):
    """The entry query's learned filter must track its teacher rule."""
    import __spark_entry__ as entry_mod

    pred = entry_mod.queries()["quality_classifier_docs"](spark, SF_DIR)
    truth = entry_mod.queries()["text_quality"](spark, SF_DIR).select(
        "doc_id", F.col("keep").alias("y")
    )
    j = pred.join(truth, "doc_id").collect()
    tp = sum(1 for r in j if r.keep and r.y)
    fp = sum(1 for r in j if r.keep and not r.y)
    fn = sum(1 for r in j if not r.keep and r.y)
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.9, (tp, fp, fn)
    assert fp == 0  # the learned filter never keeps a rule-dropped doc here


def test_train_on_empty_input_raises(spark):
    empty = spark.createDataFrame([], "x1 double, y double")
    with pytest.raises(ValueError, match="nothing to train"):
        classifier.train_logistic(empty, ["x1"], "y", steps=1)


def _numpy_irls(X, y, steps, ridge):
    """Independent IRLS reference: round-9 moments, ridge on the rounded
    diagonal, numpy linear solve (vs the engine's Cramer expressions)."""
    n, d = X.shape
    Xt = np.column_stack([np.ones(n), X])
    w = np.zeros(d + 1)
    for _ in range(steps):
        mu = 1.0 / (1.0 + np.exp(-(Xt @ w)))
        r = mu * (1.0 - mu)
        A = np.round((Xt[:, :, None] * Xt[:, None, :] * r[:, None, None]).mean(0), 9)
        A = A + ridge * np.eye(d + 1)
        b = np.round((Xt * (y - mu)[:, None]).mean(0), 9)
        w = w + np.linalg.solve(A, b)
    return w


@pytest.fixture(scope="module")
def toy3(spark):
    rows = [
        (1, 0.9, 0.1, 0.8, 1.0),
        (2, 0.8, 0.3, 0.7, 1.0),
        (3, 0.7, 0.2, 0.9, 1.0),
        (4, 0.2, 0.8, 0.3, 0.0),
        (5, 0.1, 0.9, 0.2, 0.0),
        (6, 0.3, 0.7, 0.1, 0.0),
    ]
    return spark.createDataFrame(
        rows, "id long, x1 double, x2 double, x3 double, y double"
    )


def test_irls_matches_numpy_reference(toy3):
    """Cramer-expression solve == numpy linalg.solve to float tolerance
    (the expressions are algebraically the same system; bit-exactness is
    only claimed across the Spark/SQL twins, which share the TEXT)."""
    w = classifier.train_logistic_irls(toy3, ["x1", "x2", "x3"], "y",
                                       steps=3, ridge=1e-3)
    rows = sorted(toy3.collect(), key=lambda r: r.id)
    X = np.array([[r.x1, r.x2, r.x3] for r in rows])
    y = np.array([r.y for r in rows])
    want = _numpy_irls(X, y, steps=3, ridge=1e-3)
    assert w == pytest.approx(list(want), rel=1e-9)


def test_irls_separates_toy_classes(toy3):
    out = classifier.train_and_score(
        toy3, ["x1", "x2", "x3"], "y", steps=4, optimizer="irls"
    )
    got = {r.id: (r.p, r.keep) for r in out.collect()}
    assert all(got[i][1] for i in (1, 2, 3))
    assert not any(got[i][1] for i in (4, 5, 6))


def test_irls_requires_three_features(toy3):
    with pytest.raises(ValueError, match="exactly 3 features"):
        classifier.train_logistic_irls(toy3, ["x1", "x2"], "y")


def test_irls_empty_input_raises(spark):
    empty = spark.createDataFrame([], "x1 double, x2 double, x3 double, y double")
    with pytest.raises(ValueError, match="nothing to train"):
        classifier.train_logistic_irls(empty, ["x1", "x2", "x3"], "y", steps=1)


def test_irls_update_exprs_shared_text_solves():
    """The expression strings, eval'd in Python, solve a known 4x4 system."""
    rng = np.random.default_rng(4)
    M = rng.normal(size=(4, 4)); A = M @ M.T + 0.5 * np.eye(4)
    b = rng.normal(size=4)
    env = {}
    for i in range(4):
        env[f"b{i}"] = float(b[i])
        for j in range(i, 4):
            env[f"a{i}{j}"] = float(A[i, j])
    nums, den = classifier.irls_update_exprs()
    d = eval(den, {"__builtins__": {}}, dict(env))
    got = [eval(nums[k], {"__builtins__": {}}, dict(env)) / d for k in range(4)]
    assert got == pytest.approx(list(np.linalg.solve(A, b)), rel=1e-9)
