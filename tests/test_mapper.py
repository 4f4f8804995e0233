"""CDE-mapping wizard tests — the reference's flagship GUI workflow
(`controller/mipcdemapper.py:120-165` ``suggest_corr``) reproduced end to
end on a nominal fixture: schema inference → CDE match → enum-replacement
``ifstr`` recode → native Catalyst execution → MIPMap-XML round trip.

The fixture mirrors the reference's own wizard test shape
(`tests/qcfrictionless/test_cdedict.py` VARIABLE_10: 'gendre' with
femme/homme → gender_type → Replacement('femme','F'),('homme','M'))."""

import pytest

from dataqualitycontroltool_spark.cde import CdeDict
from dataqualitycontroltool_spark.mapper import (
    MappingError,
    MappingSuggestion,
    ifstr_expr,
    mipmap_header,
    suggest_mapping,
)

RECORDS = [
    {"mip_code": "gender_type", "mip_type": "nominal", "conceptPath": "/demo/gender",
     "mip_values": '{"M", male},{"F", female}',
     "variable_lookup": "gendre, sex",
     "enum_lookup": '{"M", m, male, homme},{"F", f, female, femme}'},
    {"mip_code": "subjectage", "mip_type": "real", "conceptPath": "/demo/age",
     "mip_values": "0-130", "variable_lookup": "age, age_years",
     "enum_lookup": None},
    {"mip_code": "visitdate", "mip_type": "date", "conceptPath": "/visit/date",
     "mip_values": None, "variable_lookup": "date_of_visit", "enum_lookup": None},
]


@pytest.fixture(scope="module")
def d():
    return CdeDict.from_records(RECORDS)


@pytest.fixture(scope="module")
def source(spark):
    # the reference wizard's source: raw CSV text (nominal.csv shape) — a
    # nominal column in a foreign vocabulary + a numeric + an unmatched col
    return spark.createDataFrame(
        [("1", "femme", "42.5", "zzz"),
         ("2", "homme", "61.0", "zzz"),
         ("3", "femme", "55.25", "zzz"),
         ("4", "autre", "17.0", "zzz")],
        "patient_id string, gendre string, age string, irrelevant string",
    )


def test_ifstr_expr_matches_reference_nesting():
    # golden vs the reference's ifstr output (model/mapping/functions.py:6-24)
    assert ifstr_expr("col", [("femme", "F")]) == \
        'if(col == "femme", "F", null())'
    assert ifstr_expr("gendre", [("femme", "F"), ("homme", "M")]) == \
        'if(gendre == "femme", "F", if(gendre == "homme", "M", null()))'
    with pytest.raises(ValueError):
        ifstr_expr("col", [])


def test_mipmap_header_sanitizer():
    # qctable.py:153-156 regex parity
    assert mipmap_header("a b.c(d)") == "a_b_c_d_"
    assert mipmap_header("plain_col1") == "plain_col1"


def test_suggest_mapping_end_to_end(spark, source, d):
    sugg = suggest_mapping(source, d, threshold=0.6)

    # gendre → gender_type with the ifstr recode, age → subjectage plain
    assert set(sugg.cde_mapped) == {"gender_type", "subjectage"}
    assert "visitdate" in sugg.cde_not_mapped

    g = sugg.correspondences["gender_type"]
    assert g.source_columns == ["gendre"]
    # enum order in the recode follows the inferred (sorted) category order
    assert g.expression == (
        'if(gendre == "femme", "F", if(gendre == "homme", "M", null()))'
    )
    assert g.replacements == [("femme", "F"), ("homme", "M")]
    assert sugg.correspondences["subjectage"].expression == "age"
    assert sugg.corr_sources["gender_type"] == "gendre"


def test_apply_executes_recode_natively(spark, source, d):
    sugg = suggest_mapping(source, d)
    out = sugg.apply(source).orderBy("subjectage").collect()
    assert [r.gender_type for r in out] == [None, "F", "F", "M"]
    assert [r.subjectage for r in out] == ["17.0", "42.5", "55.25", "61.0"]

    full = sugg.apply(source, include_unmapped=True)
    assert "visitdate" in full.columns
    assert full.select("visitdate").distinct().collect()[0][0] is None


def test_xml_round_trip(spark, source, d):
    from dataqualitycontroltool_spark.sources.mipmap import (
        apply_mipmap_xml, parse_mipmap_xml,
    )

    sugg = suggest_mapping(source, d)
    xml = sugg.to_xml(target_table="cde_dataset")
    parsed = parse_mipmap_xml(xml)
    assert set(parsed["mappings"]) == {"gender_type", "subjectage"}

    native = {tuple(r) for r in sugg.apply(source).collect()}
    via_xml = {tuple(r) for r in apply_mipmap_xml(source, xml).collect()}
    assert native == via_xml


def test_manual_edit_surface(spark, source, d):
    sugg = suggest_mapping(source, d)
    with pytest.raises(MappingError):
        sugg.add_corr("gender_type", ["gendre"], "gendre")  # duplicate
    with pytest.raises(MappingError):
        sugg.add_corr("not_a_cde", ["gendre"], "gendre")
    sugg.update_corr("subjectage", ["age"], "todouble(age) + 1")
    out = sugg.apply(source).orderBy("subjectage").collect()
    assert out[0].subjectage == 18.0
    sugg.remove_corr("subjectage")
    assert "subjectage" in sugg.cde_not_mapped
    with pytest.raises(MappingError):
        sugg.remove_corr("subjectage")


def test_contested_cde_first_column_wins(spark, d):
    # two columns both matching subjectage: the reference keeps the first
    # (mipcdemapper.py:136 `cde.code not in cde_sugg_dict`)
    df = spark.createDataFrame(
        [(f"{i}.5", f"{i}.25") for i in range(12)],
        "age string, age_years string",
    )
    sugg = suggest_mapping(df, d)
    assert sugg.correspondences["subjectage"].source_columns == ["age"]


def test_sanitized_headers_in_expressions(spark, d):
    df = spark.createDataFrame(
        [("42.5",), ("61.0",)], ["subject age"]
    )
    sugg = suggest_mapping(df, d)
    corr = sugg.correspondences["subjectage"]
    assert corr.expression == "subject_age"
    vals = sorted(r.subjectage for r in sugg.apply(df).collect())
    assert vals == ["42.5", "61.0"]
