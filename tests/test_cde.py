"""CDE matching tests — similarity-formula goldens (hand-computed from the
reference's documented math), suggestion thresholds, value replacements,
and the distributed broadcast-crossjoin matcher."""

import pytest

from dataqualitycontroltool_spark.cde import (
    CdeDict,
    CdeVariable,
    edit_distance,
    edit_distance_f1,
    match_columns_distributed,
)

RECORDS = [
    {"mip_code": "subjectage", "mip_type": "real", "conceptPath": "/demo/age",
     "mip_values": "0-130", "variable_lookup": "age, subject_age, age_years",
     "enum_lookup": None},
    {"mip_code": "gender", "mip_type": "nominal", "conceptPath": "/demo/gender",
     "mip_values": '{"M", male},{"F", female}',
     "variable_lookup": "sex, gender_type",
     "enum_lookup": '{"M", m, male, man},{"F", f, female, woman}'},
    {"mip_code": "visitdate", "mip_type": "date", "conceptPath": "/visit/date",
     "mip_values": None, "variable_lookup": "date_of_visit", "enum_lookup": None},
]


@pytest.fixture(scope="module")
def d():
    return CdeDict.from_records(RECORDS)


def test_edit_distance_basics():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("abc", "abc") == 0
    assert edit_distance_f1("abc", "abc") == 1.0
    # 'abcd' vs 'abc': ED=1, TP=3, p=3/3, r=3/4 → f1=6/7
    assert edit_distance_f1("abcd", "abc") == pytest.approx(6 / 7)
    assert edit_distance_f1("", "abc") == 0.0


def test_type_translation_and_parsing(d):
    age = d.get("subjectage")
    assert age.miptype == "numerical" and age.mipvalues == [0.0, 130.0]
    g = d.get("gender")
    assert g.miptype == "nominal" and g.mipvalues == ["M", "F"]
    # reference __to_dict_enums keeps the leading code token, unlowered
    assert g.enum_dict == {"M": ["M", "m", "male", "man"],
                           "F": ["F", "f", "female", "woman"]}
    assert d.get("visitdate").miptype == "date"


def test_range_score_arithmetic(d):
    age = d.get("subjectage")
    assert age.range_score([0, 130]) == pytest.approx(1.0)
    # [65, 195]: inside=130-65=65; p=65/130, r=65/130 → 0.5
    assert age.range_score([65, 195]) == pytest.approx(0.5)
    assert age.range_score([200, 300]) == 0.0


def test_range_score_nominal(d):
    g = d.get("gender")
    # ['m','f']: found 2 of 2 mipvalues, incoming 2 → p=r=1 → 1.0
    assert g.range_score(["m", "f"]) == pytest.approx(1.0)
    # ['m','x']: found=1; p=1/2, r=1/2 → 0.5
    assert g.range_score(["m", "x"]) == pytest.approx(0.5)


def test_suggest_cde(d):
    got = d.suggest_cde("subject_age", "numerical", [10, 90])
    assert got is not None and got.code == "subjectage"
    assert d.suggest_cde("qqqqqq", "numerical", [10, 90]) is None  # below 0.6
    assert d.suggest_cde("sex", "nominal", ["m", "f"]).code == "gender"
    assert d.suggest_cde("anything", "text") is None  # no text cdes


def test_suggest_cde_tie_breaks_code_ascending():
    # ADVICE r1: on a similarity tie, the SMALLEST code must win — the same
    # order match_columns_distributed pins with cde_code.asc()
    recs = [
        {"mip_code": code, "mip_type": "real", "conceptPath": f"/x/{code}",
         "mip_values": "0-10", "variable_lookup": "tievar", "enum_lookup": None}
        for code in ("zeta", "alpha", "mid")
    ]
    d2 = CdeDict.from_records(recs)
    # identical lookup lists → identical similarity for all three
    assert d2.suggest_cde("tievar", "numerical", [0, 10]).code == "alpha"


def test_suggest_replacements(d):
    repl = d.suggest_replacements("gender", ["Male", "WOMAN", "unknownthing"])
    assert ("Male", "M") in repl and ("WOMAN", "F") in repl
    assert all(src != "unknownthing" for src, _ in repl)
    assert d.suggest_replacements("subjectage", ["x"]) is None  # not nominal
    with pytest.raises(KeyError):
        d.suggest_replacements("nope", ["x"])


def test_lookup_name_beats_code(d):
    # exact lookup-name hit scores 1.0 even though code differs
    assert d.get("subjectage").name_score("age") == 1.0


def test_match_columns_distributed(spark, d):
    cols = spark.createDataFrame(
        [("subject_age", "numerical"), ("sex", "nominal"), ("zzz", "date")],
        "col_name string, miptype string",
    )
    out = {r.col_name: r.cde_code
           for r in match_columns_distributed(spark, cols, d).collect()}
    assert out == {"subject_age": "subjectage", "sex": "gender"}  # zzz below threshold


def test_distributed_f1_matches_driver(spark, d):
    cols = spark.createDataFrame([("subject_age", "numerical")],
                                 "col_name string, miptype string")
    r = match_columns_distributed(spark, cols, d).collect()[0]
    assert r.name_f1 == pytest.approx(d.get("subjectage").name_score("subject_age"), abs=1e-6)
