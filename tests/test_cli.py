"""CLI end-to-end tests: validate / infer / filter / pyfiles, driven the way
a user would run them (python -m … with local data)."""

import json
import zipfile

import pytest

from dataqualitycontroltool_spark import cli

SCHEMA = {
    "fields": [
        {"name": "code", "type": "string", "MIPType": "nominal",
         "constraints": {"enum": ["AA", "BB"]}},
        {"name": "n", "type": "integer", "MIPType": "integer",
         "constraints": {"minimum": 0, "maximum": 100}},
    ],
    "missingValues": [""],
}


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("code,n\nAA,5\nZZ,7\nBB,999\n")
    return str(p)


def test_validate_cmd(spark, csv_path, tmp_path):
    schema = tmp_path / "s.json"
    schema.write_text(json.dumps(SCHEMA))
    out = tmp_path / "rep"
    assert cli.main(["--cpus", "4", "validate", csv_path, str(schema),
                     str(out), "--clean"]) == 0
    cs = spark.read.parquet(str(out / "column_stats"))
    assert {r.field for r in cs.collect()} == {"code", "n"}
    assert (out / "corrected_csv").exists()


def test_infer_cmd(spark, csv_path, tmp_path):
    out = tmp_path / "schema.json"
    assert cli.main(["--cpus", "4", "infer", csv_path, str(out)]) == 0
    desc = json.loads(out.read_text())
    fields = {f["name"]: f for f in desc["fields"]}
    assert fields["n"]["MIPType"] in ("integer", "nominal")


def test_infer_suggest_mapping_cmd(spark, tmp_path, capsys):
    # the wizard CLI path (mipcdemapper.py suggest_corr + save_mapping):
    # nominal recode + task-XML emit, end to end from files on disk
    src = tmp_path / "hospital.csv"
    src.write_text("patient_id,gendre\n" + "".join(
        f"{i},{'femme' if i % 2 else 'homme'}\n" for i in range(8)))
    cdedict = tmp_path / "dict.csv"
    cdedict.write_text(
        "mip_code,mip_type,conceptPath,mip_values,variable_lookup,enum_lookup\n"
        'gender_type,nominal,/demo/gender,"{""M"", male},{""F"", female}",'
        '"gendre, sex","{""M"", m, male, homme},{""F"", f, female, femme}"\n')
    out = tmp_path / "schema.json"
    xml = tmp_path / "map.xml"
    assert cli.main(["--cpus", "4", "infer", str(src), str(out),
                     "--cde-dict", str(cdedict),
                     "--suggest-mapping", str(xml)]) == 0
    printed = capsys.readouterr().out
    assert "gender_type" in printed and xml.exists()

    from dataqualitycontroltool_spark.sources.mipmap import parse_mipmap_xml
    parsed = parse_mipmap_xml(xml.read_text())
    assert 'if(gendre == "femme", "F"' in parsed["mappings"]["gender_type"]


def test_filter_cmd(spark, tmp_path, capsys):
    from dataqualitycontroltool_spark.graft.synth import write_images

    src = str(tmp_path / "imgs")
    write_images(spark, src, 200, n_partitions=2)
    assert cli.main(["--cpus", "4", "filter", src, str(tmp_path / "out")]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["partitions_processed"] == 2
    assert stats["kept"] + stats["dropped"] == stats["rows_in"] == 200
    # resume: everything done → nothing reprocessed
    assert cli.main(["--cpus", "4", "filter", src, str(tmp_path / "out")]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["partitions_processed"] == 0


def test_pyfiles_cmd(capsys):
    assert cli.main(["pyfiles"]) == 0
    path = capsys.readouterr().out.strip()
    names = zipfile.ZipFile(path).namelist()
    assert "dataqualitycontroltool_spark/cli.py" in names
    assert "dataqualitycontroltool_spark/graft/pipeline.py" in names


def test_dicom_cmd(spark, tmp_path, capsys):
    import os

    from dataqualitycontroltool_spark.sources import dicom as dcm

    root = tmp_path / "dicoms" / "f1"
    os.makedirs(root)
    tags = {"PatientID": "P", "StudyID": "S", "SeriesNumber": 1,
            "InstanceNumber": 0, "SeriesDescription": "T1",
            "SliceLocation": "0.0", "SamplesPerPixel": 1, "Rows": 64,
            "Columns": 64, "PixelSpacing": ["1.0", "1.0"], "BitsAllocated": 16,
            "BitsStored": 12, "HighBit": 11, "SeriesDate": "20240101",
            "PatientAge": "040Y",
            "ImageOrientationPatient": ["1", "0", "0", "0", "1", "0"],
            "ImagePositionPatient": ["0", "0", "0"], "SliceThickness": "1.0"}
    (root / "a.dcm").write_bytes(dcm.encode_dicom(tags))
    (root / "junk.txt").write_bytes(b"not dicom")
    # a VALID 45-slice series -> exercises the LORIS reorganization too
    for i in range(45):
        t = dict(tags, SeriesNumber=2, InstanceNumber=i, SliceLocation=f"{i}.0")
        (root / f"v{i:03}.dcm").write_bytes(dcm.encode_dicom(t))
    rep = tmp_path / "report"
    loris = tmp_path / "loris"
    assert cli.main(["--cpus", "4", "dicom", str(tmp_path / "dicoms"), str(rep),
                     "--loris-out", str(loris)]) == 0
    assert (loris / "P" / "P_1" / "v000.dcm").exists()
    assert len(list((loris / "P" / "P_1").iterdir())) == 45
    names = {p.name for p in rep.iterdir()}
    assert names == {"validsequences.csv", "invalidsequences.csv",
                     "invaliddicoms.csv", "notprocessed.csv", "mri_visits.csv"}
    inv = (rep / "invalidsequences.csv").read_text()
    assert "minimum number of slices failure" in inv  # 1 slice < 40
    assert "junk.txt" in (rep / "notprocessed.csv").read_text()


def test_validate_cmd_report_formats(spark, csv_path, tmp_path):
    # reference -r/--report xls|pdf parity (+ html): rendered reports land
    # next to the parquet tables with the <dataset>_report.<fmt> name
    schema = tmp_path / "s.json"
    schema.write_text(json.dumps(SCHEMA))
    out = tmp_path / "rep"
    assert cli.main(["--cpus", "4", "validate", csv_path, str(schema),
                     str(out), "-r", "xlsx", "-r", "pdf", "-r", "html",
                     "--outlier", "2.5"]) == 0
    xl = out / "d_report.xlsx"
    assert zipfile.is_zipfile(xl)
    with zipfile.ZipFile(xl) as z:
        assert "xl/charts/chart1.xml" in z.namelist()
    pdf_bytes = (out / "d_report.pdf").read_bytes()
    assert pdf_bytes.startswith(b"%PDF-1.4") and b"d.csv" in pdf_bytes
    assert "Quality Control Report" in (out / "d_report.html").read_text()


def test_validate_cmd_releases_cache(spark, csv_path, tmp_path):
    # review fix: one validation pass shared across formats, and the
    # command releases its cached frames before returning
    schema = tmp_path / "s.json"
    schema.write_text(json.dumps(SCHEMA))

    def persistent_ids():
        # snapshot-compare, not isEmpty: other tests in the shared session
        # may hold localCheckpoint RDDs that clearCache() never touches
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().toList()
        return {it.apply(i)._1() for i in range(it.size())}

    before = persistent_ids()
    assert cli.main(["--cpus", "4", "validate", csv_path, str(schema),
                     str(tmp_path / "rep"), "-r", "pdf", "-r", "html"]) == 0
    assert persistent_ids() <= before
