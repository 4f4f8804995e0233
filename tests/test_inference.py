"""M3 schema-inference goldens — reproduced from the reference's own test
suite (`/root/reference/tests/qcfrictionless/test_qcschema.py:33-200`):
guesser tuples, resolver votes, end-to-end infer descriptors."""

import pytest

from dataqualitycontroltool_spark.inference import (
    guess_value,
    infer_descriptor,
    infer_table_spec,
    resolve_column,
)

# reference mocker result factories (tests/mocker.py:16-51)
GIVE = {
    "number": ("numerical", "d.", 2),
    "date": ("date", "%d/%m/%Y", 0),
    "integer": ("integer", "d", 3),
    "text": ("text", "text", 1),
    "nan": ("text", "nan", 1),
}


def results_from(counts: dict) -> list:
    return [GIVE[k] for k, n in counts.items() for _ in range(n)]


@pytest.mark.parametrize(
    "value, result",
    [
        ("13", ("integer", "d", 3)),
        ("12.2", ("numerical", "d.", 2)),
        ("123longsuffix1234", ("text", "text", 1)),
        ("N/A", ("text", "nan", 1)),
        ("12/12/2013", ("date", "%d/%m/%Y", 0)),
        ("", ("text", "nan", 1)),
        ("39y", ("integer", "dy", 3)),
        ("13(cm3)", ("integer", "d(cm3)", 3)),
        ("0.3 %", ("numerical", "d. %", 2)),
        ("1,5", ("numerical", "d,", 2)),
        ("2013-12-25", ("date", "%Y-%m-%d", 0)),
    ],
)
def test_guesser(value, result):
    assert guess_value(value) == result


@pytest.mark.parametrize(
    "counts, result",
    [
        ({"number": 6, "nan": 3},
         {"type": "number", "format": "default", "MIPType": "numerical",
          "decimalChar": ".", "bareNumber": True}),
        ({"date": 4, "number": 2, "integer": 2, "nan": 10},
         {"type": "date", "format": "%d/%m/%Y", "MIPType": "date"}),
        ({"number": 6, "date": 5, "nan": 15},
         {"type": "date", "format": "%d/%m/%Y", "MIPType": "date"}),
        ({"number": 8, "text": 10, "nan": 2200},
         {"type": "string", "format": "default", "MIPType": "text"}),
        ({"number": 8, "text": 11, "nan": 202},
         {"type": "string", "format": "default", "MIPType": "text"}),
        ({"integer": 10},
         {"type": "integer", "format": "default", "MIPType": "integer",
          "bareNumber": True}),
        ({"number": 1, "nan": 5200},
         {"type": "number", "format": "default", "MIPType": "numerical",
          "decimalChar": ".", "bareNumber": True}),
        ({"number": 1, "integer": 100},
         {"type": "number", "format": "default", "MIPType": "numerical",
          "decimalChar": ".", "bareNumber": True}),
    ],
)
def test_resolver(counts, result):
    uniques = {"1.2", "21.2", "12.3", "11.3"}
    assert resolve_column(results_from(counts), uniques, maxlevels=3) == result


DATA_FULL = [
    ["1", "39y", "Paul", "12/1/1945", "32.2", "1"],
    ["2", "23y", "Jimmy", "11/5/2001", "0.5", "0"],
    ["3", "36y", "Jane", "15/11/1955", "2.55", "1"],
    ["4", "NA", "Judy", "25/7/1961", "55.23", "1"],
    ["5", "41y", "NA", "11/12/1951", "3.1", "0"],
]
HEADERS = ["id", "age", "name", "birthdate", "iq", "gender"]

FIELDS_FULL = [
    {"format": "default", "name": "id", "type": "integer",
     "MIPType": "integer", "bareNumber": True},
    {"format": "default", "name": "age", "type": "integer",
     "MIPType": "integer", "bareNumber": False, "suffix": "y"},
    {"format": "default", "name": "name", "type": "string", "MIPType": "text"},
    {"format": "%d/%m/%Y", "name": "birthdate", "type": "date", "MIPType": "date"},
    {"format": "default", "name": "iq", "type": "number",
     "MIPType": "numerical", "decimalChar": ".", "bareNumber": True},
    {"format": "default", "name": "gender", "type": "boolean",
     "MIPType": "nominal", "trueValues": ["1"], "falseValues": ["0"]},
]


def _norm(desc):
    """Field-dict order-insensitive compare helper."""
    return {
        "fields": [dict(sorted(f.items())) for f in desc["fields"]],
        "missingValues": desc["missingValues"],
    }


def test_infer_full_table():
    got = infer_descriptor(DATA_FULL, HEADERS, maxlevels=3)
    assert _norm(got) == _norm({"fields": FIELDS_FULL, "missingValues": ["", "NA"]})


def test_infer_ragged_rows():
    data = [
        ["1", "39y", "Paul", "12/1/1945", "32.2", "1"],
        ["2", "23y", "Jimmy", "11/5/2001"],
        ["3", "36y", "Jane", "15/11/1955", "2.55", "1"],
        ["4", "37", "Judy", "25/7/1961", "55.23", "1"],
        ["5", "41y", "Lore", "11/12/1951", "3.1", "0"],
    ]
    fields = [dict(f) for f in FIELDS_FULL]
    fields[2] = {"format": "default", "name": "name", "type": "string",
                 "MIPType": "text"}
    got = infer_descriptor(data, HEADERS, maxlevels=3)
    assert _norm(got) == _norm({"fields": fields, "missingValues": [""]})


def test_infer_na_empty_strings_only():
    """na_empty_strings_only=True: 'NA' counts as text, flipping `age` and
    `name` to text (test_qcschema.py:163-196)."""
    fields = [dict(f) for f in FIELDS_FULL]
    fields[1] = {"format": "default", "name": "age", "type": "string",
                 "MIPType": "text"}
    fields[2] = {"format": "default", "name": "name", "type": "string",
                 "MIPType": "text"}
    got = infer_descriptor(DATA_FULL, HEADERS, maxlevels=3,
                           na_empty_strings_only=True)
    assert _norm(got) == _norm({"fields": fields, "missingValues": [""]})


def test_infer_truncates_long_rows():
    data = [
        ["1", "39y", "Paul", "12/1/1945", "32.2", "1"],
        ["2", "23y", "Jimmy", "11/5/2001"],
        ["3", "36y", "Jane", "15/11/1955", "2.55", "1"],
        ["4", "36", "Judy", "25/7/1961", "55.23", "1"],
        ["5", "41y", "NA", "11/12/1951", "3.1", "0"],
    ]
    got = infer_descriptor(data, ["id", "age"], maxlevels=3)
    assert _norm(got) == _norm(
        {"fields": FIELDS_FULL[:2], "missingValues": [""]}
    )


def test_infer_table_spec_spark(spark):
    df = spark.createDataFrame(
        [tuple(r) for r in DATA_FULL], schema=HEADERS
    )
    spec = infer_table_spec(df, limit=100, maxlevels=3)
    by_name = {f.name: f for f in spec.fields}
    assert by_name["id"].miptype == "integer"
    assert by_name["age"].suffix == "y"
    assert by_name["birthdate"].miptype == "date"
    assert by_name["birthdate"].fformat == "%d/%m/%Y"
    assert by_name["iq"].miptype == "numerical"
    assert by_name["gender"].miptype == "nominal"
    assert spec.missing_values == ("", "NA")
