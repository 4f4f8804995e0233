"""Minimal XLSX sink (S7) — the reference's Excel report workbook
(`/root/reference/mipqctool/controller/tablereport.py:183-320` printexcel:
General / Row Statistics / Column Statistics / Cleaning suggestions
sheets) written WITHOUT openpyxl: an .xlsx file is a zip of OOXML parts
(ECMA-376, public), and the metric tables are tiny driver-side rows, so a
~100-line writer covers the whole contract.  Charts remain presentation
(out of scope per SURVEY §2.1 S7); the sheet *data* is the contract.

Like the HTML sink, this is driver-side by design: the inputs are
already-aggregated metric tables (O(fields) rows regardless of corpus
size); the distributed work happened in ``report_tables``.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

from dataqualitycontroltool_spark.sinks.reports import report_tables
from dataqualitycontroltool_spark.specs import TableSpec

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>
"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>
"""


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    # inline strings avoid a sharedStrings part
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(value))}</t></is></c>'


def _sheet_xml(rows: list[list]) -> str:
    body = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )


def write_xlsx(sheets: dict[str, list[list]], path: str) -> None:
    """Write {sheet name: rows} as a valid .xlsx (zip of OOXML parts)."""
    sheet_entries, sheet_rels, overrides = [], [], []
    for i, name in enumerate(sheets, start=1):
        # quoteattr, not escape: sheet names land in an XML attribute, and
        # escape() leaves double quotes alone (a name with '"' would emit
        # malformed workbook.xml)
        sheet_entries.append(
            f'<sheet name={quoteattr(name)} sheetId="{i}" r:id="rId{i}"/>'
        )
        sheet_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_entries)}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{''.join(sheet_rels)}</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml",
                   _CONTENT_TYPES.format(sheet_overrides="".join(overrides)))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(rows))


def write_xlsx_report(df: DataFrame, spec: TableSpec, path: str,
                      dataset: str = "") -> None:
    """Validate + aggregate + write the four-sheet Excel report
    (tablereport.py:183-320 sheet set, charts excluded)."""
    t = report_tables(df, spec)
    g = t["general"].collect()[0].asDict()
    general_rows = [["Dataset file", dataset]] + [[k, v] for k, v in g.items()]
    row_stats = sorted(
        (r.asDict() for r in t["row_stats"].collect()),
        key=lambda r: (r["kind"], str(r["key"])),
    )
    col_df = t["column_stats"]
    col_stats = sorted((r.asDict() for r in col_df.collect()),
                       key=lambda r: str(r.get("field")))
    corr = sorted((r.asDict() for r in t["corrections"].collect()),
                  key=lambda r: (r["field"], str(r["value"])))
    sheets = {
        "General": general_rows,
        "Row Statistics": [["kind", "key", "rows"]]
        + [[r["kind"], r["key"], r["rows"]] for r in row_stats],
        "Column Statistics": [col_df.columns]
        + [[r[c] for c in col_df.columns] for r in col_stats],
        "Cleaning suggestions":
        [["field", "value", "suggestion", "violation", "n_occurrences"]]
        + [[r["field"], r["value"], r["suggestion"], r["violation"],
            r["n_occurrences"]] for r in corr],
    }
    write_xlsx(sheets, path)
