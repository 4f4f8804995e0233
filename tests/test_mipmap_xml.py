"""MIPMap task-XML interop: import legacy files (incl. the reference's own
test fixtures, read from /root/reference at test time), export our
mappings in the reference's document shape, and the round trip."""

import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.sources import mipmap

REF_XML = "/root/reference/tests/test_mappings/xml/map.xml"


def _sample_xml() -> str:
    return mipmap.export_mipmap_xml(
        {
            "key2": "o_orderkey * 2",
            "pri_up": "toupper(o_orderpriority)",
            "is_big": 'if(o_totalprice > 100000, "yes", "no")',
            "label": 'append("order-", tostring(o_orderkey))',
        },
        source_table="orders",
        source_columns=[
            "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate",
        ],
        target_table="cdes",
    )


def test_export_document_shape():
    xml_text = _sample_xml()
    root = ET.fromstring(xml_text)
    assert root.tag == "mappingtask"
    # the reference's fixed config block (mapping.py:94-117)
    cfg = {e.tag: e.text for e in root.find("config")}
    assert cfg["rewriteSubsumptions"] == "true"
    assert cfg["rewriteEGDs"] == "false"
    assert cfg["sortStrategy"] == "-1"
    # CSV db sections with schema/instance paths (csvdb.py:129-176)
    assert root.find("./source/csv/csv-tables/csv-table/schema").text == (
        "source/orders.csv"
    )
    assert root.find("./target/type").text == "CSV"
    corrs = root.findall("./correspondences/correspondence")
    assert len(corrs) == 4
    # column references are rewritten to four-part paths; function names
    # and string literals are untouched
    fn = corrs[1].find("transformation-function").text
    assert fn == "toupper(sourcedb.orders.ordersTuple.o_orderpriority)"
    fn3 = corrs[3].find("transformation-function").text
    assert '"order-"' in fn3 and "tostring(" in fn3
    # source-paths list exactly the referenced columns
    sp = [e.text for e in corrs[2].findall("./source-paths/source-path")]
    assert sp == ["sourcedb.orders.ordersTuple.o_totalprice"]


def test_roundtrip_export_import(spark):
    xml_text = _sample_xml()
    task = mipmap.parse_mipmap_xml(xml_text)
    assert task["source_tables"] == ["orders"]
    assert task["target_tables"] == ["cdes"]
    assert task["mappings"]["key2"] == "o_orderkey * 2"
    assert task["source_columns"]["is_big"] == ["o_totalprice"]

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = mipmap.apply_mipmap_xml(orders, xml_text)
    assert out.columns == ["key2", "pri_up", "is_big", "label"]
    direct = orders.select(
        (F.col("o_orderkey") * 2).alias("key2"),
        F.upper("o_orderpriority").alias("pri_up"),
        F.when(F.col("o_totalprice") > 100000, "yes").otherwise("no").alias(
            "is_big"
        ),
        F.concat(F.lit("order-"), F.col("o_orderkey").cast("string")).alias(
            "label"
        ),
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_import_validates_columns(spark):
    xml_text = mipmap.export_mipmap_xml(
        {"x": "no_such_column + 1"},
        source_table="orders",
        source_columns=["no_such_column"],
        target_table="cdes",
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    with pytest.raises(Exception, match="no column named"):
        mipmap.apply_mipmap_xml(orders, xml_text)


def test_rejects_non_task_xml():
    with pytest.raises(ValueError, match="not a MIPMap task"):
        mipmap.parse_mipmap_xml("<foo/>")


def test_identifier_rewrite_is_token_safe():
    # a column named like a function must not hijack the call site, and a
    # column name inside a string literal must survive
    out = mipmap.export_mipmap_xml(
        {"y": 'append(round(round, 2), "round trip")'},
        source_table="t",
        source_columns=["round"],
        target_table="cdes",
    )
    fn = ET.fromstring(out).find(
        "./correspondences/correspondence/transformation-function"
    ).text
    assert fn == 'append(round(sourcedb.t.tTuple.round, 2), "round trip")'


@pytest.mark.skipif(
    not os.path.exists(REF_XML), reason="reference checkout not present"
)
def test_parse_reference_fixture():
    """The importer must read the reference repo's OWN shipped task files
    (tests/test_mappings/xml/map.xml — read here, never copied)."""
    task = mipmap.parse_mipmap_xml(open(REF_XML).read())
    assert task["source_tables"] == ["source_dataset"]
    assert task["target_tables"] == ["target_dataset"]
    m = task["mappings"]
    assert len(m) >= 10
    # four-part paths rewritten back to bare columns on both sides
    assert m["Ceiling"] == "ceil(Ceiling)"
    assert m["Append"] == 'append("appendedstring", Append)'
    assert m["Contains"] == 'if(contains(Contains, "pa"), "Yes", "No")'
    assert task["source_columns"]["Ceiling"] == ["Ceiling"]


@pytest.mark.skipif(
    not os.path.exists(REF_XML), reason="reference checkout not present"
)
def test_reference_fixture_executes(spark):
    """Every correspondence in the reference's fixture COMPILES through the
    engine's expression language (incl. the '&&' logical operator its
    'If' correspondence uses), and a typed representative subset executes
    with the expected values."""
    from dataqualitycontroltool_spark.functions.mapping_expr import (
        compile_expression,
    )

    task = mipmap.parse_mipmap_xml(open(REF_XML).read())
    cols = sorted({c for cs in task["source_columns"].values() for c in cs})
    for target, expr in task["mappings"].items():
        compile_expression(expr, columns=cols)  # must not raise

    df = spark.createDataFrame(
        [(2.1, "pa1.5", "tail", 1.0, None)],
        "Ceiling double, Contains string, Append string, "
        "If double, If2 double",
    )
    sub = {
        k: v
        for k, v in task["mappings"].items()
        if k in ("Ceiling", "Contains", "Append", "If")
    }
    sel = [
        compile_expression(v, columns=df.columns).alias(k)
        for k, v in sub.items()
    ]
    got = df.select(*sel).collect()[0].asDict()
    assert got["Ceiling"] == 3
    assert got["Contains"] == "Yes"
    assert got["Append"] == "appendedstringtail"
    # the && correspondence: if(isNull(If) && isNull(If2), ...) with only
    # If2 null must take the else branch
    assert got["If"] is not None


def test_cli_map_subcommand(spark, tmp_path):
    """`dqc-spark map <data> <task.xml> <out>` executes a task file
    end-to-end and writes the mapped parquet."""
    from dataqualitycontroltool_spark.cli import main

    xml_path = tmp_path / "task.xml"
    xml_path.write_text(_sample_xml())
    out = tmp_path / "mapped"
    rc = main([
        "--cpus", "2", "map",
        "/root/testdata/sf0.001/orders.parquet", str(xml_path), str(out),
    ])
    assert rc == 0
    got = spark.read.parquet(str(out))
    assert set(got.columns) == {"key2", "pri_up", "is_big", "label"}
    assert got.count() == spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()


# --- review-pass regressions (r4) ------------------------------------------

def test_and_binds_tighter_than_or(spark):
    """'a || b && c' must parse as 'a || (b && c)' (C-family precedence) —
    the flat left-fold would give (a || b) && c and silently flip rows."""
    from dataqualitycontroltool_spark.functions.mapping_expr import (
        compile_expression,
    )

    df = spark.createDataFrame([(None, 1.0, 1.0)], "x double, y double, z double")
    expr = 'if(isNull(x) || isNull(y) && isNull(z), "T", "F")'
    got = df.select(
        compile_expression(expr, columns=df.columns).alias("v")
    ).collect()[0].v
    assert got == "T"  # true || (false && false)


def test_export_no_phantom_source_paths():
    """A column whose name is a prefix of another must not be declared as
    a dependency by substring accident."""
    out = mipmap.export_mipmap_xml(
        {"y": "col2 + 1"},
        source_table="t",
        source_columns=["col", "col2"],
        target_table="cdes",
    )
    sp = [e.text for e in ET.fromstring(out).findall(
        "./correspondences/correspondence/source-paths/source-path")]
    assert sp == ["sourcedb.t.tTuple.col2"]


def test_out_of_scope_task_features_rejected():
    xml_text = _sample_xml().replace(
        "<selectionConditions/>",
        "<selectionConditions><c>t.x &gt; 1</c></selectionConditions>",
        1,
    )
    with pytest.raises(ValueError, match="selectionConditions"):
        mipmap.parse_mipmap_xml(xml_text)


def test_rewrite_skips_escaped_quotes_and_literal_paths():
    from dataqualitycontroltool_spark.sources.mipmap import _rewrite_tokens

    # escaped quote inside a literal must not end the string scan
    expr = r'append("a\"col\"b", col)'
    out, used = _rewrite_tokens(expr, {"col": "DB.t.tTuple.col"})
    assert out == r'append("a\"col\"b", DB.t.tTuple.col)'
    assert used == {"col"}
    # a path-shaped string literal survives the import rewrite
    expr2 = 'if(contains(db.t.tTuple.note, "db.t.tTuple.flag"), "Y", "N")'
    out2, _ = _rewrite_tokens(expr2, {
        "db.t.tTuple.note": "note", "db.t.tTuple.flag": "flag",
    })
    assert out2 == 'if(contains(note, "db.t.tTuple.flag"), "Y", "N")'
