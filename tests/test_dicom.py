"""DICOM ingest (S5) + report set (S9): the built-in header parser round-
trips the fixture writer; tag checks, sequence consensus/validation, and
the five report shapes match reference semantics (mridicom.py:100-121,
mrisequence.py:122-183, dicomreport.py:111-259) on a synthetic tree."""

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.sources import dicom as dcm


def _slice_tags(pid, study, series, inst, desc="T1 sagittal", px=("1.0", "1.0"),
                thick="1.0", drop=(), date="20240105"):
    tags = {
        "PatientID": pid, "StudyID": study, "SeriesNumber": series,
        "InstanceNumber": inst, "SeriesDescription": desc,
        "SliceLocation": f"{inst}.5", "SamplesPerPixel": 1,
        "Rows": 256, "Columns": 256, "PixelSpacing": list(px),
        "BitsAllocated": 16, "BitsStored": 12, "HighBit": 11,
        "SeriesDate": date, "PatientBirthDate": "19700101",
        "ImageOrientationPatient": ["1", "0", "0", "0", "1", "0"],
        "ImagePositionPatient": ["0", "0", str(inst)],
        "SliceThickness": thick, "Manufacturer": "TestScanner",
    }
    for t in drop:
        tags.pop(t, None)
    return tags


def test_parser_roundtrip_and_multivalue():
    data = dcm.encode_dicom(_slice_tags("p1", "s1", 3, 7))
    tags = dcm.parse_dicom_header(data)
    assert tags["PatientID"] == "p1"
    assert tags["SeriesNumber"] == "3"
    assert tags["InstanceNumber"] == "7"
    assert tags["Rows"] == "256"                    # binary US VR
    assert tags["PixelSpacing"] == "[1.0, 1.0]"     # pydicom-style multivalue
    assert tags["StudyDate"] == dcm.NOT_FOUND
    assert dcm.parse_dicom_header(b"not a dicom file at all") is None


def test_parser_implicit_vr_transfer_syntax():
    # implicit-VR little endian (the DICOM default syntax): the file meta
    # names it and the parser must switch modes — including the adversarial
    # case where an implicit 32-bit length has both low bytes in A-Z
    # (0x4142 = 16706), which a per-element "two uppercase bytes" guess
    # would misread as an explicit VR 'BA' and desync on
    tags = _slice_tags("p1", "s1", 3, 7)
    tags["StudyDescription"] = "A" * 16706
    data = dcm.encode_dicom(tags, implicit=True)
    parsed = dcm.parse_dicom_header(data)
    assert parsed["PatientID"] == "p1"
    assert parsed["Rows"] == "256"
    assert parsed["StudyDescription"] == "A" * 16706
    assert parsed["PixelSpacing"] == "[1.0, 1.0]"
    # explicit file (no meta group) still parses via the heuristic
    assert dcm.parse_dicom_header(dcm.encode_dicom(tags))["PatientID"] == "p1"


def test_dicm_magic_with_no_known_tags_is_still_dicom(spark):
    # a DICOMDIR-style file (DICM magic, none of our tags) must surface as
    # an invalid DICOM with missing tags — NOT land in notprocessed
    blob = b"\x00" * 128 + b"DICM"
    parsed = dcm.parse_dicom_header(blob)
    assert parsed is not None
    assert all(v == dcm.NOT_FOUND for v in parsed.values())
    df = spark.createDataFrame([("f", "DICOMDIR", bytearray(blob))],
                               "folder string, file string, content binary")
    h = dcm.decode_headers(df).collect()[0]
    assert h.is_dicom and not h.is_valid
    assert "PatientID" in h.missing_tags
    assert dcm.dicom_report_tables(dcm.decode_headers(df))["notprocessed"].count() == 0


def test_missing_tags_required_and_oneoftwo():
    full = dcm.parse_dicom_header(dcm.encode_dicom(_slice_tags("p", "s", 1, 1)))
    assert dcm._missing_tags(full) == []
    # drop a required tag
    nolo = dcm.parse_dicom_header(
        dcm.encode_dicom(_slice_tags("p", "s", 1, 1, drop=("SliceLocation",))))
    assert dcm._missing_tags(nolo) == ["SliceLocation"]
    # drop BOTH of a one-of-two pair -> both reported (mridicom.py:106-114)
    nodate = dcm.parse_dicom_header(dcm.encode_dicom(
        _slice_tags("p", "s", 1, 1, drop=("PatientBirthDate",))))
    assert dcm._missing_tags(nodate) == ["PatientAge", "PatientBirthDate"]
    # one of the pair present -> fine
    assert "SeriesDate" not in dcm._missing_tags(full)


@pytest.fixture(scope="module")
def tree(spark, tmp_path_factory):
    """folder1: seq1 valid (45 T1 slices), seq2 too-few-slices, a garbage
    file; folder2: seq with one invalid dicom, seq with bad resolution."""
    rows = []

    def add(folder, fname, tags):
        rows.append((folder, fname, bytearray(dcm.encode_dicom(tags))))

    for i in range(45):
        add("folder1", f"a{i:03}.dcm", _slice_tags("P1", "ST1", 1, i))
    for i in range(10):
        add("folder1", f"b{i:03}.dcm", _slice_tags("P1", "ST1", 2, i))
    rows.append(("folder1", "notes.txt", bytearray(b"just some text")))
    for i in range(45):
        drop = ("SliceLocation",) if i == 0 else ()
        add("folder2", f"c{i:03}.dcm", _slice_tags("P2", "ST2", 1, i, drop=drop))
    for i in range(45):
        add("folder2", f"d{i:03}.dcm",
            _slice_tags("P2", "ST2", 2, i, px=("2.0", "2.0")))
    return spark.createDataFrame(rows, "folder string, file string, content binary")


def test_sequence_table(spark, tree):
    seq = {(r.folder, r.PatientID, r.StudyID, r.SeriesNumber): r
           for r in dcm.sequence_table(dcm.decode_headers(tree)).collect()}
    ok = seq[("folder1", "P1", "ST1", "1")]
    assert ok.is_valid and ok.Slices == 45 and ok.errors == []
    assert ok.SeriesDescription == "T1 sagittal"
    assert ok.PixelSpacing == "[1.0, 1.0]"

    short = seq[("folder1", "P1", "ST1", "2")]
    assert not short.is_valid
    assert short.errors == ["minimum number of slices failure"]

    withbad = seq[("folder2", "P2", "ST2", "1")]
    assert withbad.Invalid_dicoms == 1
    assert withbad.errors == ["contains invalid dicom files"]

    lowres = seq[("folder2", "P2", "ST2", "2")]
    assert lowres.errors == ["maximum resolution failure"]


def test_report_tables(spark, tree):
    reps = dcm.dicom_report_tables(dcm.decode_headers(tree))

    vs = reps["validsequences"].collect()
    assert [r.asDict() for r in vs] == [{
        "PatientID": "P1", "StudyId": "ST1", "SeriesNumber": "1",
        "Slices": 45, "SeriesDescription": "T1 sagittal",
        "SeriesDate": "20240105"}]

    inv = {(r.PatientID, r.SeriesNumber): r
           for r in reps["invalidsequences"].collect()}
    assert set(inv) == {("P1", "2"), ("P2", "1"), ("P2", "2")}
    r = inv[("P1", "2")]
    assert r.Error_1 == "minimum number of slices failure" and r.Error_2 is None
    assert r.Invalid_dicoms == 0 and r.Slices == 10

    bad = reps["invaliddicoms"].collect()
    assert len(bad) == 1
    assert (bad[0].Folder, bad[0].File) == ("folder2", "c000.dcm")
    assert bad[0].MissingTags == "SliceLocation"
    assert bad[0].InstanceNumber == "0"

    notp = [(r.Folder, r.File) for r in reps["notprocessed"].collect()]
    assert notp == [("folder1", "notes.txt")]

    visits = [r.asDict() for r in reps["mri_visits"].collect()]
    assert visits == [{"PATIENT_ID": "P1", "VISIT_ID": "ST1",
                       "VISIT_DATE": "05/01/2024"}]


def test_consensus_falls_back_to_invalid_dicoms(spark):
    # a sequence whose every dicom is invalid still gets consensus data
    # from them (mrisequence.py:170-173)
    rows = [("f", f"x{i}.dcm",
             bytearray(dcm.encode_dicom(
                 _slice_tags("P9", "ST9", 1, i, drop=("SliceLocation",)))))
            for i in range(3)]
    df = spark.createDataFrame(rows, "folder string, file string, content binary")
    seq = dcm.sequence_table(dcm.decode_headers(df)).collect()
    assert len(seq) == 1
    assert seq[0].SeriesDescription == "T1 sagittal"
    assert seq[0].Invalid_dicoms == 3
    assert "contains invalid dicom files" in seq[0].errors


def test_consensus_tie_break_pinned(spark):
    # 2 vs 1 values -> majority wins; exact tie -> smallest value (the
    # reference's max(set, key=count) is insertion-order-dependent; we pin)
    rows = []
    for i, mfr in enumerate(["Aaa", "Bbb", "Bbb", "Ccc"]):
        t = _slice_tags("P", "S", 1, i)
        t["Manufacturer"] = mfr
        rows.append(("f", f"m{i}.dcm", bytearray(dcm.encode_dicom(t))))
    df = spark.createDataFrame(rows, "folder string, file string, content binary")
    seq = dcm.sequence_table(dcm.decode_headers(df)).collect()[0]
    assert seq.Manufacturer == "Bbb"


def test_parser_implicit_file_meta_group():
    # review r2: sloppy writers emit the file-meta group itself implicitly
    # (non-conformant but seen in the wild) — the parser must not force
    # explicit decoding on group 0002 when the bytes don't look explicit
    import struct

    tags = _slice_tags("p7", "s7", 2, 1)
    body = dcm.encode_dicom(tags, implicit=True)
    # rebuild with the (0002,0010) element ALSO implicit
    uid = b"1.2.840.10008.1.2\x00"
    meta_implicit = struct.pack("<HHI", 0x0002, 0x0010, len(uid)) + uid
    explicit_meta_len = 8 + len(uid)  # <HH2sH> + value
    dataset = body[132 + explicit_meta_len:]
    blob = body[:132] + meta_implicit + dataset
    parsed = dcm.parse_dicom_header(blob)
    assert parsed["PatientID"] == "p7"
    assert parsed["Rows"] == "256"


def test_parser_never_raises_on_arbitrary_bytes():
    # robustness net: truncated/corrupt/random input must yield None or a
    # complete tag dict — never an exception (the decode UDF would fail the
    # whole task otherwise)
    from hypothesis import given, settings, strategies as st

    valid = dcm.encode_dicom(_slice_tags("p", "s", 1, 1))

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=200, deadline=None)
    def random_bytes(data):
        out = dcm.parse_dicom_header(data)
        assert out is None or set(out) == set(dcm.ALL_TAGS)

    @given(st.integers(min_value=0, max_value=len(valid)),
           st.integers(min_value=0, max_value=255),
           st.integers(min_value=0, max_value=len(valid) - 1))
    @settings(max_examples=200, deadline=None)
    def mutated(cut, byte, pos):
        blob = bytearray(valid[:cut] if cut else valid)
        if blob:
            blob[min(pos, len(blob) - 1)] = byte
        out = dcm.parse_dicom_header(bytes(blob))
        assert out is None or set(out) == set(dcm.ALL_TAGS)

    random_bytes()
    mutated()


def test_parser_truncated_long_vr_header():
    # advice r3 (high): a file cut inside an explicit long-VR (OB/OW/OF/SQ/
    # UT/UN) element header satisfies the pos+8 loop guard but not the
    # 4-byte length read at pos+8 — must break out, never raise
    import struct

    blob = (b"\x00" * 128 + b"DICM"
            + struct.pack("<HH2sH", 0x0008, 0x0020, b"OB", 0))
    parsed = dcm.parse_dicom_header(blob)
    assert parsed is not None and set(parsed) == set(dcm.ALL_TAGS)
    # every prefix of a valid long-VR element is equally safe
    tags = _slice_tags("p8", "s8", 1, 1)
    full = dcm.encode_dicom(tags) + struct.pack(
        "<HH2sHI", 0x0008, 0x1030, b"UT", 0, 4) + b"desc"
    for cut in range(132, len(full)):
        out = dcm.parse_dicom_header(full[:cut])
        assert out is None or set(out) == set(dcm.ALL_TAGS)


def test_read_dicom_headers_root_relative_folder(spark, tmp_path):
    # advice r3 (medium): folder must be the ROOT-RELATIVE dirname
    # (dicomreport.py:399-406), so nested dirs with the same basename stay
    # distinct scopes and the Folder column locates the file; spaces in
    # path components must not come back percent-encoded
    root = tmp_path / "dicom root"
    for sub in ("siteA/ser1", "siteB/ser1"):
        d = root / sub
        d.mkdir(parents=True)
        (d / "x.dcm").write_bytes(
            dcm.encode_dicom(_slice_tags("P1", "ST1", 1, 1)))
    (root / "top.dcm").write_bytes(
        dcm.encode_dicom(_slice_tags("P2", "ST2", 1, 1)))
    headers = dcm.read_dicom_headers(spark, str(root))
    got = sorted((r.folder, r.file) for r in headers.collect())
    assert got == [("", "top.dcm"), ("siteA/ser1", "x.dcm"),
                   ("siteB/ser1", "x.dcm")]
    # the two same-basename dirs (identical PatientID/StudyID/SeriesNumber)
    # form two sequences, not one merged scope
    seqs = dcm.sequence_table(headers).collect()
    assert len(seqs) == 3
    assert sorted(s.folder for s in seqs) == ["", "siteA/ser1", "siteB/ser1"]


def test_loris_manifest_and_reorganize(spark, tmp_path):
    # r2 verdict missing #2 (dicomreport.py:161-184): every file of every
    # VALID sequence maps to <PatientID>/<PatientID>_<N>/<file>, N = the
    # patient's study number (pinned (folder, StudyID) ascending); invalid
    # sequences and non-dicoms never appear
    root = tmp_path / "in"
    out = tmp_path / "out"
    out.mkdir()

    def put(folder, fname, tags):
        d = root / folder if folder else root
        d.mkdir(parents=True, exist_ok=True)
        (d / fname).write_bytes(dcm.encode_dicom(tags))

    # patient P1: two valid studies (ST1, ST2) in one folder
    for st in ("ST1", "ST2"):
        for i in range(45):
            put("f1", f"{st}_{i:03}.dcm", _slice_tags("P1", st, 1, i))
    # patient P2: valid study in another folder
    for i in range(45):
        put("f2", f"x{i:03}.dcm", _slice_tags("P2", "ST9", 1, i))
    # invalid sequence (too few slices) — must not be copied
    for i in range(3):
        put("f1", f"short{i}.dcm", _slice_tags("P1", "ST3", 7, i))
    (root / "f1" / "junk.txt").write_bytes(b"not dicom")

    headers = dcm.read_dicom_headers(spark, str(root))
    man = dcm.loris_manifest(headers)
    rows = man.collect()
    assert len(rows) == 135  # 45 × 3 valid sequences
    dests = {r.dest_relpath for r in rows}
    assert "P1/P1_1/ST1_000.dcm" in dests          # ST1 -> study 1
    assert "P1/P1_2/ST2_000.dcm" in dests          # ST2 -> study 2
    assert "P2/P2_1/x000.dcm" in dests
    assert not any("ST3" in d or "short" in d for d in dests)
    assert all(r.src_relpath.startswith(("f1/", "f2/")) for r in rows)

    n = dcm.reorganize_files(man, str(root), str(out))
    assert n == 135
    assert (out / "P1" / "P1_1" / "ST1_000.dcm").read_bytes() == \
        (root / "f1" / "ST1_000.dcm").read_bytes()
    assert sorted(p.name for p in (out / "P1").iterdir()) == ["P1_1", "P1_2"]


def test_synth_dicom_frame_scales_and_reports(spark):
    # r2 verdict #9: the melt/consensus plan beyond the 146-file fixture —
    # 2000 synthetic files = 40 sequences of 50 slices; every 997th file
    # drops SliceLocation (3 invalid dicoms -> 3 invalid sequences)
    files = dcm.synth_dicom_frame(spark, 2000, invalid_every=997)
    assert files.rdd.getNumPartitions() == min(
        2000 // 64, spark.sparkContext.defaultParallelism)
    headers = dcm.decode_headers(files).localCheckpoint()
    reps = dcm.dicom_report_tables(headers)
    seq = dcm.sequence_table(headers)
    assert seq.count() == 40
    # files 0, 997, 1994 are invalid -> sequences 0, 19, 39 invalid
    assert reps["invalidsequences"].count() == 3
    assert reps["validsequences"].count() == 37
    assert reps["invaliddicoms"].count() == 3
    assert reps["notprocessed"].count() == 0
    one = seq.where((F.col("PatientID") == "P00001")
                    & (F.col("StudyID") == "ST000002")
                    & (F.col("SeriesNumber") == "1")).collect()[0]
    assert one.Slices == 50 and one.SeriesDescription == "T1 synthetic"


def test_read_dicom_headers_uri_root(spark, tmp_path):
    # review fix: a scheme-qualified root (file:/...) must produce the same
    # root-relative folder keys as the plain path form — the root is
    # qualified via Hadoop Path.makeQualified, exactly like binaryFile's
    # path column, instead of regex scheme-stripping (which mangled
    # authorities and broke the root-prefix strip)
    root = tmp_path / "tree"
    d = root / "siteA" / "ser1"
    d.mkdir(parents=True)
    (d / "x.dcm").write_bytes(dcm.encode_dicom(_slice_tags("P1", "ST1", 1, 1)))
    for uri in (str(root), f"file:{root}", f"file://{root}"):
        got = [(r.folder, r.file)
               for r in dcm.read_dicom_headers(spark, uri).collect()]
        assert got == [("siteA/ser1", "x.dcm")], uri
