"""Caption-image alignment (graft/alignment.py) and centroid outliers
(operators/similarity.py): correctness vs independent numpy/hashlib
reimplementations, NULL policy, and plan shape (pure projection, no UDF)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.graft import alignment
from dataqualitycontroltool_spark.operators import similarity


def _ref_caption_vec(text, dim=64, seed="s1"):
    # independent reimplementation: hashlib, not the Spark expression
    vec = [0] * dim
    for tok in text.strip().lower().split():
        m = hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()
        idx = int(m[:2], 16) % dim
        sgn = (int(m[2], 16) % 2) * 2 - 1
        vec[idx] += sgn
    return vec


def test_caption_embedding_matches_hashlib(spark):
    texts = [
        "the quick brown fox",
        "the the the",              # repeats accumulate
        "  Mixed CASE  tokens ",    # trim + lower
        "solo",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    out = df.select("i", alignment.caption_embedding(F.col("text")).alias("v"))
    got = {r.i: list(r.v) for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_caption_vec(t), t


def test_caption_embedding_null_and_dim_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \t ")], "i long, text string"
    )
    got = df.select(
        alignment.caption_embedding(F.col("text")).alias("v")
    ).collect()
    assert all(r.v is None for r in got)  # NULL and blank both unscorable
    with pytest.raises(ValueError):
        alignment.caption_embedding(F.col("text"), dim=0)
    with pytest.raises(ValueError):
        alignment.caption_embedding(F.col("text"), dim=257)


def test_alignment_score_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i, cap in enumerate(["a b c d", "x y z", "a a b"]):
        rows.append((i, cap, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "i long, caption string, image_vec array<double>")
    out = {r.i: r.alignment for r in alignment.alignment_scores(df).collect()}
    for i, cap, vec in rows:
        c = np.array(_ref_caption_vec(cap), dtype=float)
        e = np.array(vec)
        num = round(float(c @ e), 9)
        den = round(float(np.linalg.norm(c) * np.linalg.norm(e)), 9)
        assert out[i] == round(num / den, 6), i


def test_alignment_filter_null_policy(spark):
    # NULL caption, BLANK caption (split('') would fabricate one phantom
    # empty token that scores a real alignment) and zero-norm image vector
    # are all drops, not NULL keeps
    rows = [
        (1, "hello world", [1.0] * 64),
        (2, None, [1.0] * 64),
        (3, "hello world", [0.0] * 64),
        (4, "", [1.0] * 64),
        (5, "   \t ", [1.0] * 64),
    ]
    df = spark.createDataFrame(rows, "i long, caption string, image_vec array<double>")
    out = {r.i: (r.alignment, r.keep)
           for r in alignment.alignment_filter(df, threshold=-1.0).collect()}
    assert out[1][1] is True          # any finite score >= -1
    assert out[2] == (None, False)
    assert out[3] == (None, False)
    assert out[4] == (None, False)
    assert out[5] == (None, False)


def test_alignment_plan_is_pure_projection(spark):
    df = spark.createDataFrame(
        [(1, "a b", [1.0] * 64)], "i long, caption string, image_vec array<double>")
    plan = alignment.alignment_scores(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    # the md5 is let-bound: one md5 per token, not one per (slot, sign) ref
    assert plan.count("md5") == 1, plan


def test_centroid_outliers_matches_numpy(spark):
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for g in (0, 1):
        base = rng.normal(size=8)
        for _ in range(5):
            rows.append((vid, g, [float(x) for x in base + rng.normal(scale=0.1, size=8)]))
            vid += 1
    # one far-off vector in group 0, plus excluded rows
    rows.append((vid, 0, [float(-x) for x in rows[0][2]])); vid += 1
    rows.append((vid, None, [1.0] * 8)); vid += 1
    rows.append((vid, 1, None))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r.vec_id: r for r in
           similarity.centroid_outliers(df, "vec_id", "embedding", "label",
                                        threshold=0.5).collect()}
    # excluded rows get no score row at all
    assert vid - 1 not in out and vid not in out

    groups = {}
    for v, g, vec in rows:
        if g is not None and vec is not None:
            groups.setdefault(g, []).append((v, np.array(vec)))
    for g, members in groups.items():
        cent = np.round(np.mean([m for _, m in members], axis=0), 9)
        for v, m in members:
            num = round(float(m @ cent), 9)
            den = round(float(np.linalg.norm(m) * np.linalg.norm(cent)), 9)
            exp = round(num / den, 6) if den > 0 else None
            assert out[v].cos_centroid == exp, v
            assert out[v].is_outlier is (exp is None or exp < 0.5)
    # the anti-aligned vector is flagged, the in-cluster ones are not
    assert out[10].is_outlier is True
    assert all(not out[v].is_outlier for v in range(5))
