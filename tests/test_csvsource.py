"""CSV source tests: dialect sniffing (S1), BOM handling, header
sanitization (P6), ragged rows, and validation-plan integration."""

import codecs

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.plans.compiler import ValidationPlan
from dataqualitycontroltool_spark.sources import csvsource
from dataqualitycontroltool_spark.specs import TableSpec


@pytest.fixture()
def write(tmp_path):
    def _w(name, content, bom=False):
        p = tmp_path / name
        data = content.encode("utf-8")
        if bom:
            data = codecs.BOM_UTF8 + data
        p.write_bytes(data)
        return str(p)
    return _w


def test_sniff_comma_and_semicolon(write):
    pc = write("a.csv", "id,name\n1,x\n2,y\n")
    ps = write("b.csv", "id;name\n1;x\n2;y\n")
    assert csvsource.sniff_dialect(pc)["delimiter"] == ","
    assert csvsource.sniff_dialect(ps)["delimiter"] == ";"


def test_bom_stripped_from_header(write):
    p = write("bom.csv", "id,name\n1,x\n", bom=True)
    d = csvsource.sniff_dialect(p)
    assert d["encoding"] == "utf-8-sig"
    assert csvsource.read_headers(p, d) == ["id", "name"]


def test_read_csv_sanitizes_headers(spark, write):
    p = write("dirty.csv", "Patient ID,eye-color(left),id\n1,blue,9\n2,green,8\n")
    df = csvsource.read_csv(spark, p)
    assert df.columns == ["Patient_ID", "eye_color_left_", "id"]
    assert df.count() == 2
    assert dict(df.dtypes) == {c: "string" for c in df.columns}


def test_read_csv_duplicate_headers_suffixed(spark, write):
    p = write("dup.csv", "a,a,a-b,a b\n1,2,3,4\n")
    df = csvsource.read_csv(spark, p)
    # Spark's reader itself suffixes byte-identical duplicates (a -> a0, a1);
    # our _dedupe handles the collisions sanitization introduces (a-b vs a b)
    assert df.columns == ["a0", "a1", "a_b", "a_b_1"]


def test_ragged_rows_permissive(spark, write):
    p = write("ragged.csv", "a,b,c\n1,2,3\n4,5\n6,7,8,9\n")
    df = csvsource.read_csv(spark, p)
    rows = [tuple(r) for r in df.orderBy("a").collect()]
    assert rows == [("1", "2", "3"), ("4", "5", None), ("6", "7", "8")]


def test_semicolon_csv_through_validation(spark, write):
    p = write("v.csv", "code;n\nAA;5\nZZ;999\n;\n")
    df = csvsource.read_csv(spark, p)
    spec = TableSpec.from_descriptor(
        {"fields": [
            {"name": "code", "type": "string", "MIPType": "nominal",
             "constraints": {"enum": ["AA", "BB"]}},
            {"name": "n", "type": "integer", "MIPType": "integer",
             "constraints": {"minimum": 0, "maximum": 100}},
        ], "missingValues": [""]}
    )
    out = ValidationPlan(spec).apply(df, derive=("status",))
    got = [(r["code__status"], r["n__status"]) for r in
           out.orderBy(F.col("code").asc_nulls_last()).collect()]
    assert got == [("valid", "valid"), ("constraint", "constraint"),
                   ("missing", "missing")]


def test_dcconnector_parse():
    """S10: pathologies/versions JSON parsing (offline half)."""
    from dataqualitycontroltool_spark.sources.dcconnector import parse_pathologies

    payload = [
        {"name": "dementia", "versions": [{"name": "v1"}, {"name": "v2"}]},
        {"name": "tbi", "versions": []},
        {"notname": "ignored"},
    ]
    assert parse_pathologies(payload) == {"dementia": ["v1", "v2"], "tbi": []}
    assert parse_pathologies('[{"name": "x", "versions": [{"name": "1"}]}]') == {"x": ["1"]}


def test_dc_tree_flattening(spark):
    """S3: Data-Catalogue tree (groups->variables) flattens to a frictionless
    descriptor that drives validation end to end."""
    from dataqualitycontroltool_spark.plans.compiler import ValidationPlan
    from dataqualitycontroltool_spark.specs import TableSpec, frictionless_from_dc

    dc = {
        "code": "root", "label": "Root",
        "variables": [
            {"code": "age", "label": "Age", "type": "int",
             "minValue": 0, "maxValue": 120},
        ],
        "groups": [
            {"code": "demo", "label": "Demographics",
             "variables": [
                 {"code": "gender", "label": "Gender", "type": "nominal",
                  "sql_type": "text",
                  "enumerations": [{"code": "M", "label": "male"},
                                   {"code": "F", "label": "female"}]},
             ],
             "groups": [
                 {"code": "inner",
                  "variables": [{"code": "score", "type": "real"}]},
             ]},
        ],
    }
    desc = frictionless_from_dc(dc)
    by_name = {f["name"]: f for f in desc["fields"]}
    assert set(by_name) == {"age", "gender", "score"}
    assert by_name["age"]["MIPType"] == "integer"
    assert by_name["age"]["constraints"] == {"minimum": 0, "maximum": 120}
    assert by_name["gender"]["constraints"]["enum"] == ["M", "F"]
    assert by_name["gender"]["conceptPath"] == "/root/demo/gender"
    assert by_name["score"]["conceptPath"] == "/root/demo/inner/score"

    spec = TableSpec.from_descriptor(desc)
    df = spark.createDataFrame(
        [("30", "M", "1.5"), ("200", "X", "bad")],
        "age string, gender string, score string",
    )
    out = ValidationPlan(spec).apply(df, derive=("status",)).collect()
    sts = [(r["age__status"], r["gender__status"], r["score__status"]) for r in out]
    assert ("valid", "valid", "valid") in sts
    assert ("constraint", "constraint", "dtype") in sts


def test_checkpoint_partition_pruning(spark, tmp_path):
    """The checkpoint orchestrator's per-partition read must prune at the
    file-listing level (PartitionFilters on part=) - at 10^12 rows reading
    the other partitions' files would dwarf the work."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    src = str(tmp_path / "p")
    spark.range(100).withColumn("part", (F.col("id") % 4).cast("int")) \
        .write.partitionBy("part").parquet(src)
    df = spark.read.parquet(src).where(F.col("part") == 2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "part" in plan.split("PartitionFilters")[1][:80]
    assert df.count() == 25
