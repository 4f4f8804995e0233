"""Consensus-cascade tests: multi-column group modes, level chaining
(consensus-of-consensus), tie-breaks, and child-count buckets."""

import pytest

from dataqualitycontroltool_spark.operators import hierarchy


@pytest.fixture(scope="module")
def dicomish(spark):
    # (patient, study, series, protocol, manufacturer)
    rows = [
        ("p1", "s1", "a", "T1", "GE"),
        ("p1", "s1", "a", "T1", "GE"),
        ("p1", "s1", "a", "T2", "Siemens"),   # minority within series
        ("p1", "s1", "b", "T2", "GE"),
        ("p1", "s2", "c", "T2", "Philips"),
        ("p2", "s3", "d", "T1", "GE"),
    ]
    return spark.createDataFrame(
        rows, "patient string, study string, series string, protocol string, manufacturer string"
    )


def test_group_modes_multi_column(dicomish):
    out = {tuple(r[:3]): (r.protocol, r.manufacturer, r.n_rows)
           for r in hierarchy.group_modes(
               dicomish, ["patient", "study", "series"],
               ["protocol", "manufacturer"]).collect()}
    assert out[("p1", "s1", "a")] == ("T1", "GE", 3)   # 2-1 majority
    assert out[("p1", "s1", "b")] == ("T2", "GE", 1)


def test_cascade_levels(dicomish):
    lv = hierarchy.consensus_cascade(
        dicomish, ["patient", "study", "series"], ["protocol", "manufacturer"])
    assert set(lv) == {1, 2, 3}
    studies = {(r.patient, r.study): (r.protocol, r.n_children)
               for r in lv[2].collect()}
    # study s1 has 2 series with consensus T1 and T2 → tie → smallest = T1
    assert studies[("p1", "s1")] == ("T1", 2)
    patients = {r.patient: (r.protocol, r.n_children) for r in lv[1].collect()}
    # p1: studies consensus T1 (s1) and T2 (s2) → tie → T1; 2 studies
    assert patients["p1"] == ("T1", 2)
    assert patients["p2"] == ("T1", 1)


def test_children_distribution(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 4), ("d", 9)], "k string, n_children int")
    out = {r.bucket: r.n_parents
           for r in hierarchy.children_distribution(df).collect()}
    assert out == {"s1": 1, "s2": 1, "s3-s5": 1, "s6+": 1}
