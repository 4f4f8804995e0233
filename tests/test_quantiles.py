"""Distributed exact-quantile operator: equivalence with Spark's exact
``percentile`` aggregate (and therefore with ``np.quantile`` linear
interpolation / DuckDB ``quantile_cont``) under adversarial shapes —
duplicates, tiny ranges, negatives, deep refinement, degenerate inputs."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import profiler
from dataqualitycontroltool_spark.operators.quantiles import exact_quantiles

PS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _ref(df, col, ps):
    arr = ",".join(f"{p}d" for p in ps)
    return list(df.agg(F.expr(f"percentile({col}, array({arr}))")).first()[0])


def _check(spark, values, ps=PS, **kw):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = exact_quantiles(df, "x", ps, **kw)
    want = _ref(df, "x", ps)
    np_want = list(np.quantile(np.array(values, dtype="float64"), ps))
    for g, w, nw in zip(got, want, np_want):
        assert g == w, (g, w, values[:10])
        assert g == pytest.approx(nw, rel=1e-12, abs=1e-300)


def test_uniform_doubles(spark):
    rng = random.Random(11)
    _check(spark, [rng.uniform(-1e6, 1e6) for _ in range(4000)])


def test_heavy_duplicates_terminate(spark):
    # one value holds 90% of mass — the candidate range collapses below 1 ulp
    # long before its row count drops under terminal_rows; the distinct-value
    # terminal pass must resolve it.
    rng = random.Random(5)
    vals = [42.000000001] * 9000 + [rng.uniform(0, 100) for _ in range(1000)]
    rng.shuffle(vals)
    _check(spark, vals, terminal_rows=8)


def test_deep_refinement_tiny_buckets(spark):
    # buckets=2, terminal_rows=1 forces maximum depth; still exact.
    rng = random.Random(3)
    _check(spark, [rng.gauss(0, 1) for _ in range(500)],
           ps=[0.1, 0.5, 0.9], buckets=2, terminal_rows=1)


def test_tight_value_cluster(spark):
    # values within a few ulps of each other around a large magnitude
    base = 1e15
    vals = [base + i * 0.125 for i in range(100)]
    _check(spark, vals, ps=[0.0, 0.33, 0.66, 1.0])


def test_single_and_two_values(spark):
    _check(spark, [7.5])
    _check(spark, [3.0, 9.0])
    _check(spark, [5.0] * 1000)  # min == max fast path


def test_nulls_ignored_empty_none(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,), (None,)], "x double")
    assert exact_quantiles(df, "x", [0.5]) == _ref(df.where("x is not null"), "x", [0.5])
    empty = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_quantiles(empty, "x", [0.25, 0.5]) == [None, None]
    assert exact_quantiles(empty.limit(0), "x", [0.5]) == [None]


def test_integer_column(spark):
    rng = random.Random(9)
    vals = [rng.randint(-50, 50) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = exact_quantiles(df, "x", PS, buckets=16, terminal_rows=32)
    assert got == _ref(df, "x", PS)


def test_nan_and_bad_p_rejected(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    with pytest.raises(ValueError, match="NaN"):
        exact_quantiles(df, "x", [0.5])
    ok = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="percentage"):
        exact_quantiles(ok, "x", [1.5])
    assert exact_quantiles(ok, "x", []) == []


def test_range_overflowing_double_width(spark):
    # hi - lo overflows to inf (values near both ±DBL_MAX): equi-width
    # bucketing is ill-defined, so refinement must degrade to exact midpoint
    # splits — NOT dump the full column on the terminal distinct-value pass.
    big = 1.7e308
    rng = random.Random(3)
    vals = (
        [-big + i * 1e300 for i in range(50)]
        + [big - i * 1e300 for i in range(50)]
        + [rng.uniform(-1e9, 1e9) for _ in range(2000)]
    )
    rng.shuffle(vals)
    _check(spark, vals, terminal_rows=64)


def test_randomized_equivalence(spark):
    rng = random.Random(123)
    for trial in range(6):
        n = rng.choice([3, 17, 400])
        scale = 10.0 ** rng.randint(-6, 6)
        dup = rng.random() < 0.5
        pool = [rng.uniform(-scale, scale) for _ in range(max(2, n // 10))]
        vals = [rng.choice(pool) if dup else rng.uniform(-scale, scale)
                for _ in range(n)]
        _check(spark, vals, ps=[0.0, 0.2, 0.5, 0.8, 1.0],
               buckets=rng.choice([2, 8, 8192]),
               terminal_rows=rng.choice([1, 64]))


def test_profile_numerical_distributed_matches_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = profiler.profile_numerical(li, "l_extendedprice", exact=True).first()
    b = profiler.profile_numerical(li, "l_extendedprice", exact="distributed").first()
    assert a.asDict() == b.asDict()


def test_profile_integer_distributed_matches_exact(spark):
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    a = profiler.profile_integer(part, "p_size", exact=True).first()
    b = profiler.profile_integer(part, "p_size", exact="distributed").first()
    assert a.asDict() == b.asDict()
