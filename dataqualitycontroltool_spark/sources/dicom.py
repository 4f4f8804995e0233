"""DICOM directory ingest (S5) and the DICOM report set (S9) — the
reference's MRI pipeline (`/root/reference/mipqctool/controller/dicomreport.py`,
`model/mri/mridicom.py`, `model/mri/mrisequence.py`) re-expressed as a
Spark plan over a ``binaryFile`` scan:

* **scan** — ``spark.read.format("binaryFile")`` over the DICOM root
  (recursive), carrying (path, content) rows; at 10^12 files this is a
  plain distributed file scan, no driver ``os.walk``
  (vs ``dicomreport.py:391-406`` + multiprocessing ``Pool``).
* **header decode** — ``mapInPandas`` batch UDF reading ONLY the header
  (stop before pixel data, mirroring ``mridicom.py:33-45``
  ``stop_before_pixels=True``).  Uses pydicom when installed; otherwise a
  built-in minimal reader for explicit/implicit-VR little-endian files
  (the DICOM PS3.5 encoding is public).  Emits one flat row per file:
  tag values as strings ('Tag not found' when absent —
  ``mridicom.py:117-121``), the missing-tag set per the REQUIRED /
  one-of-two rules (``config.py:86-97``, ``mridicom.py:100-114``), and
  an ``is_dicom`` flag (non-DICOM files feed the notprocessed report).
* **sequence consensus** — group by (folder, PatientID, StudyID,
  SeriesNumber) (the reference scopes sequence grouping per folder,
  ``dicomreport.py:322-346``); per-tag consensus = modal value via
  :func:`hierarchy.group_modes` (``mrisequence.py:167-183``'s
  ``max(set(values), key=values.count)`` — ties pinned to (count desc,
  value asc) since Python's is insertion-order-dependent), taken over the
  VALID dicoms, falling back to the invalid ones for sequences with no
  valid file (``mrisequence.py:170-173``).
* **sequence validation** — pure column expressions implementing
  ``mrisequence.py:122-156``: invalid-files check, max-resolution 1.5mm,
  T1 protocol match, min 40 slices.
* **report set** — the five CSV shapes of ``dicomreport.py:111-259``
  (validsequences / invalidsequences / invaliddicoms / notprocessed /
  mri_visits) as DataFrames; write with ``df.write.csv`` or the generic
  report sinks.

Scale: the decode is the only Python stage (Arrow-batched, header bytes
only); everything after runs on ~40 small string columns per file — the
pixel payload never shuffles.  Consensus/validation are two hash
aggregates per level with map-side partial aggregation; a hot patient
reduces at the (keys, tag, value) aggregate first.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# --- MIP requirements, mirrored from reference config.py:80-131 ----------

ID_TAGS = ["PatientID", "StudyID", "SeriesNumber", "InstanceNumber"]
REQUIRED_TAGS = [
    "PatientID", "StudyID", "SeriesDescription", "SeriesNumber",
    "InstanceNumber", "SliceLocation", "SamplesPerPixel", "Rows", "Columns",
    "PixelSpacing", "BitsAllocated", "BitsStored", "HighBit",
]
ONEOFTWO_TAGS = [
    ("AcquisitionDate", "SeriesDate"),
    ("PatientAge", "PatientBirthDate"),
    ("ImageOrientation", "ImageOrientationPatient"),
    ("ImagePosition", "ImagePositionPatient"),
]
DATE_TAGS = ["AcquisitionDate", "SeriesDate", "StudyDate", "PatientAge",
             "PatientBirthDate"]
OPTIONAL_TAGS = [
    "MagneticFieldStrength", "PatientSex", "Manufacturer",
    "ManufacturerModelName", "InstitutionName", "StudyDescription",
    "SliceThickness", "RepetitionTime", "EchoTime", "SpacingBetweenSlices",
    "NumberOfPhaseEncodingSteps", "EchoTrainLength",
    "PercentPhaseFieldOfView", "PixelBandwidth", "FlipAngle",
    "PercentSampling", "EchoNumbers", "StudyDate",
    "ImagePosition", "ImagePositionPatient",
    "ImageOrientation", "ImageOrientationPatient",
]
# dict-dedup preserving first occurrence (reference fills a dict)
ALL_TAGS = list(dict.fromkeys(REQUIRED_TAGS + DATE_TAGS + OPTIONAL_TAGS))
SEQUENCE_TAGS = [
    "PatientID", "StudyID", "SeriesDescription", "SeriesNumber",
    "ImageOrientation", "ImageOrientationPatient", "SamplesPerPixel",
    "Rows", "Columns", "PixelSpacing", "BitsAllocated", "BitsStored",
    "HighBit", "AcquisitionDate", "SeriesDate", "PatientAge",
    "PatientBirthDate", "MagneticFieldStrength", "PatientSex",
    "Manufacturer", "ManufacturerModelName", "InstitutionName",
    "StudyDescription", "SliceThickness", "RepetitionTime", "EchoTime",
    "SpacingBetweenSlices", "NumberOfPhaseEncodingSteps", "EchoTrainLength",
    "PercentPhaseFieldOfView", "PixelBandwidth", "FlipAngle",
    "PercentSampling", "EchoNumbers",
]
MAX_RESOLUTION = 1.5
MIN_SLICES = 40
SCAN_TYPES = ["T1"]

NOT_FOUND = "Tag not found"

# --- minimal DICOM tag dictionary (standard PS3.6 numbers, public) --------

_TAG_NUMS: dict[str, tuple[int, int, str]] = {
    "PatientID": (0x0010, 0x0020, "LO"),
    "PatientSex": (0x0010, 0x0040, "CS"),
    "PatientAge": (0x0010, 0x1010, "AS"),
    "PatientBirthDate": (0x0010, 0x0030, "DA"),
    "StudyID": (0x0020, 0x0010, "SH"),
    "StudyDate": (0x0008, 0x0020, "DA"),
    "StudyDescription": (0x0008, 0x1030, "LO"),
    "SeriesNumber": (0x0020, 0x0011, "IS"),
    "SeriesDate": (0x0008, 0x0021, "DA"),
    "SeriesDescription": (0x0008, 0x103E, "LO"),
    "AcquisitionDate": (0x0008, 0x0022, "DA"),
    "InstanceNumber": (0x0020, 0x0013, "IS"),
    "SliceLocation": (0x0020, 0x1041, "DS"),
    "SamplesPerPixel": (0x0028, 0x0002, "US"),
    "Rows": (0x0028, 0x0010, "US"),
    "Columns": (0x0028, 0x0011, "US"),
    "PixelSpacing": (0x0028, 0x0030, "DS"),
    "BitsAllocated": (0x0028, 0x0100, "US"),
    "BitsStored": (0x0028, 0x0101, "US"),
    "HighBit": (0x0028, 0x0102, "US"),
    "SliceThickness": (0x0018, 0x0050, "DS"),
    "SpacingBetweenSlices": (0x0018, 0x0088, "DS"),
    "MagneticFieldStrength": (0x0018, 0x0087, "DS"),
    "RepetitionTime": (0x0018, 0x0080, "DS"),
    "EchoTime": (0x0018, 0x0081, "DS"),
    "EchoTrainLength": (0x0018, 0x0091, "IS"),
    "EchoNumbers": (0x0018, 0x0086, "IS"),
    "NumberOfPhaseEncodingSteps": (0x0018, 0x0089, "IS"),
    "PercentPhaseFieldOfView": (0x0018, 0x0094, "DS"),
    "PercentSampling": (0x0018, 0x0093, "DS"),
    "PixelBandwidth": (0x0018, 0x0095, "DS"),
    "FlipAngle": (0x0018, 0x1314, "DS"),
    "Manufacturer": (0x0008, 0x0070, "LO"),
    "ManufacturerModelName": (0x0008, 0x1090, "LO"),
    "InstitutionName": (0x0008, 0x0080, "LO"),
    # retired pair kept for backward compatibility (config.py:94-97)
    "ImagePosition": (0x0020, 0x0030, "DS"),
    "ImagePositionPatient": (0x0020, 0x0032, "DS"),
    "ImageOrientation": (0x0020, 0x0035, "DS"),
    "ImageOrientationPatient": (0x0020, 0x0037, "DS"),
}
_NUM_TO_NAME = {(g, e): (name, vr) for name, (g, e, vr) in _TAG_NUMS.items()}

_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}
_BINARY_VRS = {"US": "<H", "SS": "<h", "UL": "<I", "SL": "<i", "FL": "<f",
               "FD": "<d"}


def _decode_value(vr: str, raw: bytes) -> str:
    """String form of one element value, pydicom-style: binary VRs become
    their number; multi-valued string VRs render as '[a, b]' (the str() of
    a pydicom MultiValue, which the reference feeds to ast.literal_eval —
    mrisequence.py:128-131)."""
    if vr in _BINARY_VRS:
        fmt = _BINARY_VRS[vr]
        n = struct.calcsize(fmt)
        vals = [struct.unpack(fmt, raw[i:i + n])[0] for i in range(0, len(raw) - n + 1, n)]
        strs = [str(v) for v in vals]
    else:
        text = raw.decode("ascii", "replace").rstrip(" \x00")
        strs = text.split("\\")
    if len(strs) == 1:
        return strs[0]
    return "[" + ", ".join(strs) + "]"


def parse_dicom_header(data: bytes) -> dict[str, str] | None:
    """Header tags of one DICOM file as {name: value-string}, or None when
    the bytes are not a DICOM file.  Reads ONLY up to pixel data.

    Uses pydicom when available (same call shape as mridicom.py:35-36);
    otherwise a built-in parser for little-endian files: 128-byte preamble
    + 'DICM', then (group, element, [VR,] length, value) elements per
    DICOM PS3.5 — explicit VR detected by two uppercase-ASCII VR bytes,
    implicit VR resolved from the tag dictionary."""
    try:
        import pydicom  # noqa: F401  (optional, public)

        from io import BytesIO

        try:
            ds = pydicom.dcmread(BytesIO(data), stop_before_pixels=True)
        except Exception:
            return None
        out = {}
        for name in ALL_TAGS:
            try:
                el = ds.data_element(name)
                out[name] = str(el.value) if el is not None else NOT_FOUND
            except KeyError:
                out[name] = NOT_FOUND
        # a readable dataset with none of our ~40 tags (e.g. a DICOMDIR
        # directory record) is still a DICOM file — it must surface as an
        # invalid dicom with missing tags, not land in notprocessed
        return out
    except ImportError:
        pass

    if len(data) < 132 or data[128:132] != b"DICM":
        return None
    pos = 132
    found: dict[str, str] = {}
    n = len(data)
    # VR mode: the file-meta group (0002) is ALWAYS explicit VR little
    # endian and carries TransferSyntaxUID (0002,0010); once it names
    # implicit VR LE (1.2.840.10008.1.2 — the DICOM default syntax) the
    # dataset elements are parsed implicitly.  Guessing per element from
    # "two uppercase bytes" misreads implicit lengths whose low bytes both
    # fall in A-Z (16705..23130-byte values) and desyncs the stream.
    implicit_dataset = False
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", data, pos)
        if (group, elem) == (0x7FE0, 0x0010):  # pixel data — stop
            break
        vr_bytes = data[pos + 4:pos + 6]
        looks_explicit = all(0x41 <= b <= 0x5A for b in vr_bytes)
        if group == 0x0002:
            # the standard makes file meta explicit-VR, but sloppy writers
            # emit it implicitly — only force explicit when the VR bytes
            # actually look like one, else fall back to implicit decoding
            explicit = looks_explicit
        elif implicit_dataset:
            explicit = False
        else:
            explicit = looks_explicit
        if explicit:
            vr = vr_bytes.decode("ascii")
            if vr_bytes in _LONG_VRS:
                # the 12-byte long-VR header needs 4 more bytes than the
                # loop guard (pos+8) proved — a file truncated inside this
                # header must break out, not raise struct.error
                if pos + 12 > n:
                    break
                (length,) = struct.unpack_from("<I", data, pos + 8)
                vpos = pos + 12
            else:
                (length,) = struct.unpack_from("<H", data, pos + 6)
                vpos = pos + 8
        else:
            (length,) = struct.unpack_from("<I", data, pos + 4)
            vpos = pos + 8
            vr = _NUM_TO_NAME.get((group, elem), ("", "LO"))[1]
        if length == 0xFFFFFFFF:  # undefined-length sequence — bail out
            break
        if vpos + length > n:
            break
        if (group, elem) == (0x0002, 0x0010):  # TransferSyntaxUID
            uid = data[vpos:vpos + length].decode("ascii", "replace").rstrip(" \x00")
            implicit_dataset = uid == "1.2.840.10008.1.2"
        name_vr = _NUM_TO_NAME.get((group, elem))
        if name_vr is not None:
            found[name_vr[0]] = _decode_value(vr, data[vpos:vpos + length])
        pos = vpos + length
    # DICM magic at offset 128 already proves this is a DICOM file; zero
    # recognized tags just means everything required is missing
    return {t: found.get(t, NOT_FOUND) for t in ALL_TAGS}


def encode_dicom(tags: dict[str, object], implicit: bool = False) -> bytes:
    """Minimal little-endian DICOM writer for test fixtures: preamble +
    DICM + the given {tag-name: value} elements in tag order.  Multi-valued
    entries pass a list (joined with the DICOM '\\').  With ``implicit``,
    dataset elements use implicit-VR encoding and an explicit file-meta
    group names the default transfer syntax 1.2.840.10008.1.2."""
    elements = []
    for name, value in tags.items():
        group, elem, vr = _TAG_NUMS[name]
        if vr in _BINARY_VRS:
            raw = struct.pack(_BINARY_VRS[vr], int(value))
        else:
            s = "\\".join(str(v) for v in value) if isinstance(value, (list, tuple)) else str(value)
            raw = s.encode("ascii")
            if len(raw) % 2:
                raw += b" "
        if implicit:
            header = struct.pack("<HHI", group, elem, len(raw))
        elif vr.encode() in _LONG_VRS:
            header = struct.pack("<HH2sHI", group, elem, vr.encode(), 0, len(raw))
        else:
            header = struct.pack("<HH2sH", group, elem, vr.encode(), len(raw))
        elements.append(((group, elem), header + raw))
    meta = b""
    if implicit:
        uid = b"1.2.840.10008.1.2\x00"  # even length
        meta = struct.pack("<HH2sH", 0x0002, 0x0010, b"UI", len(uid)) + uid
    body = b"".join(e[1] for e in sorted(elements))
    return b"\x00" * 128 + b"DICM" + meta + body


# --- Spark surface --------------------------------------------------------

HEADER_SCHEMA = (
    "folder string, file string, is_dicom boolean, is_valid boolean, "
    "missing_tags string, "
    + ", ".join(f"{t} string" for t in ALL_TAGS)
)


def _missing_tags(tags: dict[str, str]) -> list[str]:
    """mridicom.py:100-114: required tags absent, plus BOTH of a one-of-two
    pair when neither is present (sorted — the reference joins a set)."""
    missing = {t for t in REQUIRED_TAGS if tags.get(t, NOT_FOUND) == NOT_FOUND}
    for pair in ONEOFTWO_TAGS:
        if all(tags.get(t, NOT_FOUND) == NOT_FOUND for t in pair):
            missing.update(pair)
    return sorted(missing)


def decode_headers(files_df: DataFrame) -> DataFrame:
    """(folder, file, content:binary) → one header row per file (see
    HEADER_SCHEMA).  ``is_dicom`` False rows keep only folder/file — they
    feed the notprocessed report (dicomreport.py:352-353)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for folder, fname, content in zip(pdf["folder"], pdf["file"], pdf["content"]):
                tags = parse_dicom_header(bytes(content))
                if tags is None:
                    rows.append({"folder": folder, "file": fname,
                                 "is_dicom": False, "is_valid": False,
                                 "missing_tags": None,
                                 **{t: None for t in ALL_TAGS}})
                else:
                    missing = _missing_tags(tags)
                    rows.append({"folder": folder, "file": fname,
                                 "is_dicom": True, "is_valid": not missing,
                                 "missing_tags": ",".join(missing),
                                 **tags})
            yield pd.DataFrame(rows)

    return files_df.mapInPandas(gen, HEADER_SCHEMA)


def read_dicom_headers(spark, root: str) -> DataFrame:
    """binaryFile scan of a DICOM root → header DataFrame.  The scan
    carries whole files; at scale bound split size with
    spark.sql.files.maxPartitionBytes (see graft/decode.py notes).

    ``folder`` is the ROOT-RELATIVE dirname ('' for files directly under
    the root), matching the reference's removeroot subfolder key
    (dicomreport.py:399-406 — ``os.path.dirname(os.path.relpath(f, root))``).
    Derived from binaryFile's ``path`` column (a plain Hadoop Path string),
    not ``input_file_name()`` which percent-encodes URIs: two nested
    directories with the same basename must stay distinct grouping scopes,
    and the Folder column of invaliddicoms/notprocessed must locate the
    file for the user."""
    import re

    # qualify the root EXACTLY the way binaryFile qualifies its `path`
    # column (Hadoop Path semantics: scheme + authority + absolute path,
    # e.g. file:/data, hdfs://nn/data) — string-prefix stripping then works
    # for any filesystem, URI or plain local path, instead of hand-rolled
    # scheme regexes that mangle authorities
    jpath = spark._jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    root_q = fs.makeQualified(jpath).toString().rstrip("/")
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
        .withColumn("_rel", F.regexp_replace("path", "^" + re.escape(root_q) + "/", ""))
        .select(
            F.regexp_extract("_rel", r"^(.*)/[^/]+$", 1).alias("folder"),
            F.regexp_extract("_rel", r"([^/]+)$", 1).alias("file"),
            F.col("content"),
        )
    )
    return decode_headers(files)


_SEQ_KEYS = ["folder", "PatientID", "StudyID", "SeriesNumber"]


def sequence_table(headers: DataFrame) -> DataFrame:
    """One row per MRI sequence: keys, Slices, Invalid_dicoms, consensus
    SEQUENCE_TAGS, errors array, is_valid — mrisequence.py's constructor +
    validate() as aggregates and column expressions."""
    dic = headers.where(F.col("is_dicom"))
    sizes = dic.groupBy(*_SEQ_KEYS).agg(
        F.count(F.lit(1)).cast("int").alias("Slices"),
        F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)).cast("int")
        .alias("Invalid_dicoms"),
    )
    # consensus over valid dicoms; sequences with none fall back to invalid
    # ones (mrisequence.py:170-173) — ONE melt + count + window pass: count
    # per (keys, tag, value, validity), keep only the preferred validity
    # tier (max over the partition), rank (count desc, value asc).  The id
    # tags are the grouping keys (constant per group) and need no mode.
    cons_tags = [t for t in SEQUENCE_TAGS if t not in _SEQ_KEYS]
    melted = dic.select(
        *_SEQ_KEYS,
        F.col("is_valid").cast("int").alias("_pref"),
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("_col"), F.col(t).alias("_val"))
                for t in cons_tags
            ])
        ).alias("_e"),
    ).select(*_SEQ_KEYS, "_pref", F.col("_e._col").alias("_col"),
             F.col("_e._val").alias("_val"))
    counts = melted.groupBy(*_SEQ_KEYS, "_col", "_val", "_pref").agg(
        F.count(F.lit(1)).alias("_n")
    )
    wp = Window.partitionBy(*_SEQ_KEYS, "_col")
    wr = Window.partitionBy(*_SEQ_KEYS, "_col").orderBy(
        F.col("_n").desc(), F.col("_val").asc()
    )
    top = (
        counts.withColumn("_hp", F.max("_pref").over(wp))
        .where(F.col("_pref") == F.col("_hp"))
        .withColumn("_rk", F.row_number().over(wr))
        .where(F.col("_rk") == 1)
    )
    cons = top.groupBy(*_SEQ_KEYS).agg(
        *[F.max(F.when(F.col("_col") == t, F.col("_val"))).alias(t)
          for t in cons_tags]
    )
    seq = sizes.join(cons, on=_SEQ_KEYS)

    # validate() — mrisequence.py:122-156, same error strings and order
    px = F.col("PixelSpacing")
    px_x = F.regexp_extract(px, r"\[?\s*([0-9.eE+-]+)", 1).cast("double")
    px_y = F.coalesce(
        F.nullif(F.regexp_extract(px, r",\s*([0-9.eE+-]+)", 1), F.lit("")),
        F.regexp_extract(px, r"\[?\s*([0-9.eE+-]+)", 1),
    ).cast("double")
    res_present = (px != NOT_FOUND) & (F.col("SliceThickness") != NOT_FOUND)
    desc = F.col("SeriesDescription")
    errors = F.array_compact(
        F.array(
            F.when(F.col("Invalid_dicoms") > 0, "contains invalid dicom files"),
            F.when(
                res_present & ((px_x >= MAX_RESOLUTION) | (px_y >= MAX_RESOLUTION)),
                "maximum resolution failure",
            ),
            F.when(~res_present, "resolution tags are missing"),
            F.when(
                (desc != NOT_FOUND) & ~desc.contains(SCAN_TYPES[0]),
                f"not a {SCAN_TYPES[0]} scan type",
            ),
            F.when(desc == NOT_FOUND, "SeriesDescription tag is missing"),
            F.when(F.col("Slices") < MIN_SLICES, "minimum number of slices failure"),
        )
    )
    return seq.withColumn("errors", errors).withColumn(
        "is_valid", F.size("errors") == 0
    )


def dicom_report_tables(headers: DataFrame) -> dict[str, DataFrame]:
    """The five report tables of dicomreport.py:111-259, keyed by the CSV
    basename the reference writes."""
    seq = sequence_table(headers)
    valid_seq = seq.where(F.col("is_valid"))
    invalid_seq = seq.where(~F.col("is_valid"))

    validsequences = valid_seq.select(
        "PatientID",
        F.col("StudyID").alias("StudyId"),  # sic — mrisequence.py:94
        "SeriesNumber", "Slices", "SeriesDescription", "SeriesDate",
    )
    invalidsequences = invalid_seq.select(
        "PatientID", "StudyID", "SeriesNumber", "Slices", "Invalid_dicoms",
        "SeriesDescription",
        # try_element_at: past-the-end is NULL (Error_i padding), not an
        # ANSI out-of-bounds error
        *[F.try_element_at("errors", F.lit(i + 1)).alias(f"Error_{i + 1}")
          for i in range(6)],
    )
    invaliddicoms = (
        headers.where(F.col("is_dicom") & ~F.col("is_valid"))
        .join(invalid_seq.select(*_SEQ_KEYS), on=_SEQ_KEYS)
        .select(
            F.col("folder").alias("Folder"), F.col("file").alias("File"),
            "PatientID", "StudyID", "SeriesNumber", "InstanceNumber",
            F.col("missing_tags").alias("MissingTags"),
        )
    )
    notprocessed = headers.where(~F.col("is_dicom")).select(
        F.col("folder").alias("Folder"), F.col("file").alias("File")
    )
    # mri_visits: study date = modal SeriesDate over the study's VALID
    # sequences (mristudy.py:25-29), rendered dd/MM/yyyy
    w = Window.partitionBy("folder", "PatientID", "StudyID", "SeriesDate")
    wrank = Window.partitionBy("folder", "PatientID", "StudyID").orderBy(
        F.col("_n").desc(), F.col("SeriesDate").asc()
    )
    mri_visits = (
        valid_seq.select("folder", "PatientID", "StudyID", "SeriesDate")
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_rk", F.row_number().over(wrank))
        .where(F.col("_rk") == 1)
        .select(
            F.col("PatientID").alias("PATIENT_ID"),
            F.col("StudyID").alias("VISIT_ID"),
            F.date_format(
                F.expr("try_to_date(SeriesDate, 'yyyyMMdd')"), "dd/MM/yyyy"
            ).alias("VISIT_DATE"),
        )
    )
    return {
        "validsequences": validsequences,
        "invalidsequences": invalidsequences,
        "invaliddicoms": invaliddicoms,
        "notprocessed": notprocessed,
        "mri_visits": mri_visits,
    }


def loris_manifest(headers: DataFrame) -> DataFrame:
    """(source, destination) copy manifest for the LORIS import layout —
    ``dicomreport.py:161-184`` ``reorganizefiles`` as a DataFrame instead
    of a driver ``shutil.copy`` loop over in-memory objects:

    every dcm file of every VALID sequence (only valid sequences reach
    ``self.patients`` — ``dicomreport.py:357-384``) lands at
    ``<PatientID>/<PatientID>_<N>/<file>`` where N numbers the patient's
    studies 1..n.  The reference numbers them in folder-scan insertion
    order (nondeterministic across runs); we pin (folder, StudyID)
    ascending.  Columns: the 4 sequence keys, file, ``src_relpath``
    (root-relative, '' folder = file directly under the root) and
    ``dest_relpath``.

    Scale: one join of headers against the valid-sequence keys plus a
    dense_rank window partitioned by PatientID — study counts per patient
    are tiny, so the window never hot-spots; the manifest shuffles ~3
    short strings per file, never pixel data."""
    seq_keys = sequence_table(headers).where(F.col("is_valid")).select(*_SEQ_KEYS)
    files = headers.where(F.col("is_dicom")).join(seq_keys, on=_SEQ_KEYS)
    w = Window.partitionBy("PatientID").orderBy("folder", "StudyID")
    return (
        files.withColumn("_study_n", F.dense_rank().over(w))
        .select(
            *_SEQ_KEYS,
            "file",
            F.when(F.col("folder") == "", F.col("file"))
            .otherwise(F.concat_ws("/", "folder", "file")).alias("src_relpath"),
            F.concat_ws(
                "/",
                F.col("PatientID"),
                F.concat_ws("_", F.col("PatientID"), F.col("_study_n")),
                F.col("file"),
            ).alias("dest_relpath"),
        )
    )


def synth_dicom_frame(
    spark,
    n_files: int,
    slices_per_seq: int = 50,
    seqs_per_study: int = 2,
    studies_per_patient: int = 2,
    invalid_every: int = 0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic (folder, file, content) DICOM tree at ANY
    scale, generated EXECUTOR-side (``spark.range`` → ``mapInPandas`` over
    :func:`encode_dicom`): file i belongs to sequence i//slices_per_seq,
    rolling up to studies/patients/folders by integer arithmetic — no
    driver-side blob list, so a 10^7-file tree costs the driver nothing.
    ``invalid_every`` > 0 drops SliceLocation from every k-th file
    (invalid-dicom rows for the reports).  Partition count defaults to
    ~64 files per task, the same sizing the fixture queries use."""
    if n_partitions is None:
        n_partitions = max(1, min(n_files // 64, spark.sparkContext.defaultParallelism))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                seq = i // slices_per_seq
                inst = i % slices_per_seq
                study = seq // seqs_per_study
                patient = study // studies_per_patient
                tags = {
                    "PatientID": f"P{patient:05}",
                    "StudyID": f"ST{study:06}",
                    "SeriesNumber": seq % seqs_per_study + 1,
                    "InstanceNumber": inst,
                    "SeriesDescription": "T1 synthetic",
                    "SliceLocation": f"{inst}.0",
                    "SamplesPerPixel": 1, "Rows": 256, "Columns": 256,
                    "PixelSpacing": ["1.0", "1.0"],
                    "BitsAllocated": 16, "BitsStored": 12, "HighBit": 11,
                    "SeriesDate": "20240105", "PatientBirthDate": "19700101",
                    "ImageOrientationPatient": ["1", "0", "0", "0", "1", "0"],
                    "ImagePositionPatient": ["0", "0", str(inst)],
                    "SliceThickness": "1.0",
                }
                if invalid_every and i % invalid_every == 0:
                    tags.pop("SliceLocation")
                rows.append({
                    "folder": f"site{patient % 4}/p{patient:05}",
                    "file": f"s{seq:07}_{inst:03}.dcm",
                    "content": encode_dicom(tags),
                })
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_files, numPartitions=n_partitions)
        .mapInPandas(gen, "folder string, file string, content binary")
    )


def reorganize_files(manifest: DataFrame, root: str, output: str) -> int:
    """Execute a :func:`loris_manifest` — copy each file from ``root`` into
    the LORIS layout under ``output``; returns the number of files copied.

    The copy loop streams the manifest through the driver
    (``toLocalIterator`` — no full collect) because the test/posix target
    is a local filesystem, mirroring the reference's serial ``shutil.copy``;
    on a distributed store run the same manifest through a
    ``foreachPartition`` copier instead."""
    import os
    import shutil

    n = 0
    for row in manifest.toLocalIterator():
        dest = os.path.join(output, row.dest_relpath)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy(os.path.join(root, row.src_relpath), dest)
        n += 1
    return n
