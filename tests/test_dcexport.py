"""QCtoDC export (S-extra, r2 verdict missing #1): frictionless schema →
Data Catalogue variable table, CSV + xlsx, with reference-pinned rendering
(qctodc.py:42-100, config.py DC_HEADERS) and CDE conceptPath suggestions
(inferschema.py:55-73)."""

import csv
import io
import zipfile
import xml.etree.ElementTree as ET

from dataqualitycontroltool_spark.sinks import dcexport

DESC = {
    "fields": [
        {"name": "gender", "type": "string", "MIPType": "nominal",
         "constraints": {"enum": ["F", "M"]}},
        {"name": "stage", "type": "string", "MIPType": "ordinal",
         "constraints": {"enum": ["low", "mid", "high"]}},
        {"name": "age", "type": "integer", "MIPType": "integer",
         "constraints": {"minimum": 0, "maximum": 120}},
        {"name": "bmi", "type": "number", "MIPType": "numerical",
         "constraints": {"minimum": 10.5}},  # one bound only -> no values
        {"name": "visit", "type": "date", "MIPType": "date",
         "format": "%Y-%m-%d"},
        {"name": "notes", "type": "string", "MIPType": "text",
         "title": "Clinical notes", "description": "free text"},
    ],
    "missingValues": [""],
}


def _sheet_rows(path):
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in ws.findall(".//m:row", ns):
        cells = {}
        for c in row.findall("m:c", ns):
            ref = c.get("r")
            col = "".join(ch for ch in ref if ch.isalpha())
            t = c.find("m:is/m:t", ns)
            v = c.find("m:v", ns)
            cells[col] = t.text if t is not None else (v.text if v is not None else "")
        # missing cells (None values) read back as ''
        letters = [chr(65 + i) for i in range(len(dcexport.DC_HEADERS))]
        rows.append([cells.get(ltr, "") or "" for ltr in letters])
    return rows


def test_dc_rows_reference_rendering():
    # pinned against QctoDCVariable.info / __get_values / __get_dc_type
    rows = {r["code"]: r for r in dcexport.dc_rows(DESC, csvname="data.csv")}
    assert rows["gender"]["type"] == "nominal"
    assert rows["gender"]["values"] == '{"F","F"},{"M","M"}'
    assert rows["stage"]["values"] == '{"low","1"},{"mid","2"},{"high","3"}'
    assert rows["age"]["type"] == "integer" and rows["age"]["values"] == "0-120"
    assert rows["bmi"]["type"] == "real"       # numerical -> real
    assert rows["bmi"]["values"] is None       # single bound -> no range
    assert rows["visit"]["type"] == "date" and rows["visit"]["values"] is None
    assert rows["notes"]["name"] == "Clinical notes"   # title wins over name
    assert rows["notes"]["description"] == "free text"
    # defaults: conceptPath falls back to the field's own name
    assert all(r["conceptPath"] == code or code == "notes"
               for code, r in rows.items())
    assert all(r["csvFile"] == "data.csv" for r in rows.values())
    assert all(r["unit"] == "" and r["methodology"] == "" and r["canBeNull"] == ""
               for r in rows.values())


def test_dc_rows_with_cde_suggestions():
    sugg = {"gender": ["GENDER_CDE", "/demographics/gender"],
            "age": [None, None]}  # below-threshold suggestion
    rows = {r["code"]: r for r in dcexport.dc_rows(DESC, "d.csv", sugg)}
    assert rows["gender"]["conceptPath"] == "/demographics/gender"
    assert rows["age"]["conceptPath"] is None          # [None, None] pins None
    assert rows["bmi"]["conceptPath"] == "bmi"         # absent -> own name


def test_dc_csv_golden(tmp_path):
    out = tmp_path / "dc.csv"
    dcexport.export_dc_csv(DESC, str(out), csvname="data.csv")
    with open(out, newline="") as fh:
        got = list(csv.reader(fh))
    assert got[0] == dcexport.DC_HEADERS
    assert got[1] == ["data.csv", "gender", "gender", "nominal",
                      '{"F","F"},{"M","M"}', "", "", "", "gender", "", ""]
    assert got[3] == ["data.csv", "age", "age", "integer", "0-120",
                      "", "", "", "age", "", ""]
    assert len(got) == 1 + len(DESC["fields"])


def test_dc_xlsx_golden_sheet_rows(tmp_path):
    out = tmp_path / "dc.xlsx"
    dcexport.export_dc_xlsx(DESC, str(out), csvname="data.csv")
    rows = _sheet_rows(str(out))
    assert rows[0] == dcexport.DC_HEADERS
    by_code = {r[2]: r for r in rows[1:]}
    assert by_code["stage"][3:5] == ["ordinal", '{"low","1"},{"mid","2"},{"high","3"}']
    assert by_code["bmi"][3:5] == ["real", ""]
    assert by_code["notes"][1] == "Clinical notes"
    assert len(rows) == 1 + len(DESC["fields"])


def test_infer_to_dc_xlsx_end_to_end(spark, tmp_path):
    # the infercsv parity path: infer a schema from data, export the DC
    # workbook, spot-check the inferred types survive the rendering
    from dataqualitycontroltool_spark.inference import infer_table_spec

    # n needs > maxlevels uniques to resolve integer (few-unique integers
    # become nominal, reference semantics)
    df = spark.createDataFrame(
        [("AA" if i % 2 else "BB", str(i)) for i in range(15)],
        "code string, n string")
    spec = infer_table_spec(df, limit=15, maxlevels=5)
    out = tmp_path / "inferred.xlsx"
    dcexport.export_dc_xlsx(spec.to_descriptor(), str(out), csvname="t.csv")
    rows = _sheet_rows(str(out))
    by_code = {r[2]: r for r in rows[1:]}
    assert set(by_code) == {"code", "n"}
    assert by_code["code"][3] == "nominal"
    assert by_code["n"][3] == "integer"


def test_suggest_cdes_for_spec():
    from dataqualitycontroltool_spark.cde import CdeDict
    from dataqualitycontroltool_spark.specs import TableSpec

    cdedict = CdeDict.from_records([
        {"mip_code": "gender", "mip_type": "nominal",
         "conceptPath": "/demo/gender", "mip_values": '{"F","F"},{"M","M"}'},
    ])
    spec = TableSpec.from_descriptor(DESC)
    sugg = dcexport.suggest_cdes_for_spec(spec, cdedict, threshold=0.6)
    assert sugg["gender"] == ["gender", "/demo/gender"]
    assert sugg["age"] == [None, None]  # no integer CDE in the dictionary
