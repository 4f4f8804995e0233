"""CSV source — dialect sniffing + header sanitization + raw-string schema.

Reference behavior re-expressed (`/root/reference/mipqctool/model/
qcfrictionless/qctable.py:29-49`): open as utf-8-sig (BOM stripped),
``csv.Sniffer`` dialect detection on a bounded head sample, header row
extraction; headers sanitized to identifier-safe names
(`qctable.py:153-156`, `qcschema.py:189-198` → specs.sanitize_header).

Spark split of responsibilities: the SNIFF is driver-side on a few KB (the
reference reads the same head sample), while the SCAN is the distributed
``spark.read.csv`` with the sniffed dialect — Spark's parallel CSV reader
splits the file by byte ranges, so a 100TB CSV ingests wide.  All columns
load as raw strings (the reference's semantics — validation/inference are
defined on raw cells); the validation plan or ``TableSpec`` casting decides
types downstream."""

from __future__ import annotations

import codecs as _codecs
import csv as _csv
import io

from pyspark.sql import DataFrame, SparkSession

from dataqualitycontroltool_spark.specs import sanitize_header

_SNIFF_BYTES = 64 * 1024


def _head_file(path: str) -> str:
    """Resolve a direct file, a directory (Spark CSV output), or a glob to
    one representative part file for driver-side sniffing."""
    import glob
    import os

    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.csv"))) or sorted(
            glob.glob(os.path.join(path, "part-*"))
        )
    else:
        cands = sorted(glob.glob(path))
    if not cands:
        raise FileNotFoundError(path)
    return cands[0]


def sniff_dialect(path: str, sample_bytes: int = _SNIFF_BYTES) -> dict:
    """Driver-side dialect detection on the file head.

    Returns {delimiter, quotechar, has_header, encoding} — falls back to
    comma/doublequote when the sniffer can't decide (single-column files)."""
    with open(_head_file(path), "rb") as f:
        head = f.read(sample_bytes)
    encoding = "utf-8-sig" if head.startswith(_codecs.BOM_UTF8) else "utf-8"
    text = head.decode(encoding, errors="replace")
    # drop a possibly-truncated last line so the sniffer sees whole rows
    sample = text[: text.rfind("\n") + 1] or text
    try:
        dialect = _csv.Sniffer().sniff(sample, delimiters=",;\t|")
        delim, quote = dialect.delimiter, dialect.quotechar or '"'
    except _csv.Error:
        delim, quote = ",", '"'
    try:
        has_header = _csv.Sniffer().has_header(sample)
    except _csv.Error:
        has_header = True
    return {
        "delimiter": delim,
        "quotechar": quote,
        "has_header": has_header,
        "encoding": encoding,
    }


def read_headers(path: str, dialect: dict) -> list[str]:
    """Raw header row (driver-side, first line only)."""
    with open(path, encoding=dialect["encoding"], newline="") as f:
        reader = _csv.reader(
            io.StringIO(f.readline()),
            delimiter=dialect["delimiter"],
            quotechar=dialect["quotechar"],
        )
        return next(reader)


def read_csv(
    spark: SparkSession,
    path: str,
    sanitize_headers: bool = True,
    multiline: bool = False,
    header: bool = True,
) -> DataFrame:
    """Distributed CSV scan with the sniffed dialect; every column is a raw
    string (reference semantics).  ``PERMISSIVE`` mode pads/truncates ragged
    rows like the reference's row-length normalization (`qcschema.py:92-100`).

    The first row is the header by default — the reference always reads one
    (`qctable.py:40-44`); the sniffer's has_header guess is exposed via
    :func:`sniff_dialect` for callers handling headerless exports.  Note
    Spark's reader itself suffixes byte-identical duplicate headers (a→a0,
    a1); :func:`_dedupe` handles the collisions *sanitization* introduces."""
    d = sniff_dialect(path)
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", d["delimiter"])
        .option("quote", d["quotechar"])
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .option("multiLine", str(multiline).lower())
    )
    df = reader.csv(path)
    if header and sanitize_headers:
        clean = _dedupe([sanitize_header(c) for c in df.columns])
        df = df.toDF(*clean)
    return df


def _dedupe(names: list[str]) -> list[str]:
    """Suffix duplicate sanitized names (a_1, a_2, ...) — Spark rejects
    duplicate column names where the reference tolerated them."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out
