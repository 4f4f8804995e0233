"""Minimal XLSX sink (S7) — the reference's Excel report workbook
(`/root/reference/mipqctool/controller/tablereport.py:183-320` printexcel:
General / Row Statistics / Column Statistics / Cleaning suggestions
sheets + the two Row-Statistics bar charts) written WITHOUT openpyxl: an
.xlsx file is a zip of OOXML parts (ECMA-376, public), and the metric
tables are tiny driver-side rows, so a small writer covers the whole
contract.  Charts are DrawingML chart parts (`xl/charts/chartN.xml`)
anchored through a per-sheet drawing part, mirroring the reference's two
``BarChart`` objects (tablereport.py:239-260).

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


def _sheet_xml(rows: list[list], with_drawing: bool = False) -> str:
    body = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r}">{cells}</row>')
    drawing = '<drawing r:id="rIdD1"/>' if with_drawing else ""
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheetData>{''.join(body)}</sheetData>{drawing}</worksheet>"
    )


# ---------------------------------------------------------------------------
# DrawingML chart parts (ECMA-376 part 1, §21.2) — bar chart only, which is
# all the reference emits.
# ---------------------------------------------------------------------------

_NS_C = "http://schemas.openxmlformats.org/drawingml/2006/chart"
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_XDR = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"


def _chart_xml(title: str, y_title: str, cat_ref: str, val_ref: str) -> str:
    """A horizontal clustered bar chart over one series — the analogue of
    the reference's ``BarChart(type='bar')`` with a y-axis title
    (tablereport.py:239-246)."""
    def rich(text: str) -> str:
        return (f"<c:tx><c:rich><a:bodyPr/><a:p><a:r><a:t>{escape(text)}"
                "</a:t></a:r></a:p></c:rich></c:tx><c:overlay val=\"0\"/>")
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<c:chartSpace xmlns:c="{_NS_C}" xmlns:a="{_NS_A}" xmlns:r="{_NS_R}">'
        "<c:chart>"
        f"<c:title>{rich(title)}</c:title>"
        '<c:autoTitleDeleted val="0"/>'
        "<c:plotArea><c:layout/>"
        '<c:barChart><c:barDir val="bar"/><c:grouping val="clustered"/>'
        '<c:varyColors val="0"/>'
        '<c:ser><c:idx val="0"/><c:order val="0"/>'
        f"<c:cat><c:strRef><c:f>{escape(cat_ref)}</c:f></c:strRef></c:cat>"
        f"<c:val><c:numRef><c:f>{escape(val_ref)}</c:f></c:numRef></c:val>"
        "</c:ser>"
        '<c:axId val="111000001"/><c:axId val="111000002"/>'
        "</c:barChart>"
        '<c:catAx><c:axId val="111000001"/>'
        '<c:scaling><c:orientation val="minMax"/></c:scaling>'
        '<c:delete val="0"/><c:axPos val="l"/>'
        '<c:crossAx val="111000002"/></c:catAx>'
        '<c:valAx><c:axId val="111000002"/>'
        '<c:scaling><c:orientation val="minMax"/></c:scaling>'
        '<c:delete val="0"/><c:axPos val="b"/>'
        f"<c:title>{rich(y_title)}</c:title>"
        '<c:crossAx val="111000001"/></c:valAx>'
        "</c:plotArea><c:plotVisOnly val=\"1\"/>"
        "</c:chart></c:chartSpace>"
    )


def _drawing_xml(n_charts: int) -> str:
    """One twoCellAnchor + graphicFrame per chart, stacked vertically
    (the reference anchors at D1 and D20 — same 8-col × 15-row footprint)."""
    anchors = []
    for k in range(n_charts):
        r0, r1 = k * 16, k * 16 + 15
        anchors.append(
            "<xdr:twoCellAnchor>"
            f"<xdr:from><xdr:col>3</xdr:col><xdr:colOff>0</xdr:colOff>"
            f"<xdr:row>{r0}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>"
            f"<xdr:to><xdr:col>11</xdr:col><xdr:colOff>0</xdr:colOff>"
            f"<xdr:row>{r1}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>"
            '<xdr:graphicFrame macro="">'
            "<xdr:nvGraphicFramePr>"
            f'<xdr:cNvPr id="{k + 1}" name="Chart {k + 1}"/>'
            "<xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>"
            '<xdr:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/></xdr:xfrm>'
            "<a:graphic>"
            f'<a:graphicData uri="{_NS_C}">'
            f'<c:chart xmlns:c="{_NS_C}" xmlns:r="{_NS_R}" r:id="rId{k + 1}"/>'
            "</a:graphicData></a:graphic>"
            "</xdr:graphicFrame><xdr:clientData/></xdr:twoCellAnchor>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<xdr:wsDr xmlns:xdr="{_NS_XDR}" xmlns:a="{_NS_A}">'
        f"{''.join(anchors)}</xdr:wsDr>"
    )


def write_xlsx(
    sheets: dict[str, list[list]],
    path: str,
    charts: dict[str, list[dict]] | None = None,
) -> None:
    """Write {sheet name: rows} as a valid .xlsx (zip of OOXML parts).

    ``charts`` maps a sheet name to bar-chart specs, each a dict with keys
    ``title``, ``y_title``, ``cat_ref``, ``val_ref`` (A1-style absolute
    range formulas, e.g. ``'Row Statistics'!$B$2:$B$6``)."""
    charts = charts or {}
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
    chart_parts: list[tuple[str, str]] = []  # (part path, xml)
    drawing_parts: list[tuple[int, str, str]] = []  # (sheet idx, drawing xml, rels)
    n_chart = 0
    for i, name in enumerate(sheets, start=1):
        specs = charts.get(name)
        if not specs:
            continue
        rel_entries = []
        for k, c in enumerate(specs, start=1):
            n_chart += 1
            chart_parts.append((
                f"xl/charts/chart{n_chart}.xml",
                _chart_xml(c["title"], c["y_title"], c["cat_ref"], c["val_ref"]),
            ))
            overrides.append(
                f'<Override PartName="/xl/charts/chart{n_chart}.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.drawingml.chart+xml"/>'
            )
            rel_entries.append(
                f'<Relationship Id="rId{k}" Type="{_NS_R}/chart" '
                f'Target="../charts/chart{n_chart}.xml"/>'
            )
        d = len(drawing_parts) + 1
        drawing_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{''.join(rel_entries)}</Relationships>"
        )
        drawing_parts.append((i, _drawing_xml(len(specs)), drawing_rels))
        overrides.append(
            f'<Override PartName="/xl/drawings/drawing{d}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.drawing+xml"/>'
        )
    sheets_with_drawing = {i for i, _, _ in drawing_parts}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml",
                   _CONTENT_TYPES.format(sheet_overrides="".join(overrides)))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml",
                       _sheet_xml(rows, with_drawing=i in sheets_with_drawing))
        for part, xml in chart_parts:
            z.writestr(part, xml)
        for d, (i, drawing_xml, drawing_rels) in enumerate(drawing_parts, start=1):
            z.writestr(f"xl/drawings/drawing{d}.xml", drawing_xml)
            z.writestr(f"xl/drawings/_rels/drawing{d}.xml.rels", drawing_rels)
            z.writestr(
                f"xl/worksheets/_rels/sheet{i}.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                f'<Relationship Id="rIdD1" Type="{_NS_R}/drawing" '
                f'Target="../drawings/drawing{d}.xml"/></Relationships>',
            )


def write_xlsx_report(df: DataFrame, spec: TableSpec, path: str,
                      dataset: str = "",
                      tables: dict[str, DataFrame] | None = None) -> None:
    """Validate + aggregate + write the four-sheet Excel report
    (tablereport.py:183-320 sheet set) with the two Row-Statistics bar
    charts (tablereport.py:239-260: rows-per-filled and rows-per-valid;
    here rows-per-valid-count and rows-per-valid-percentage-band, the
    engine's two row-completeness breakdowns).  Pass precomputed
    ``tables`` to reuse one validation pass across several formats."""
    from dataqualitycontroltool_spark.sinks.reports import row_stats_sort_key

    t = tables or report_tables(df, spec)
    g = t["general"].collect()[0].asDict()
    general_rows = [["Dataset file", dataset]] + [[k, v] for k, v in g.items()]
    row_stats = sorted(
        (r.asDict() for r in t["row_stats"].collect()),
        key=row_stats_sort_key,
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
    # chart ranges over the Row Statistics sheet (header = row 1; rows are
    # sorted by (kind, key), and "rows_per_valid_count" < "valid_pct_band")
    n_hist = sum(1 for r in row_stats if r["kind"] == "rows_per_valid_count")
    n_band = len(row_stats) - n_hist
    rs = "'Row Statistics'"
    chart_specs = []
    if n_hist:
        chart_specs.append({
            "title": "Number of rows per valid-column count",
            "y_title": "# of rows",
            "cat_ref": f"{rs}!$B$2:$B${1 + n_hist}",
            "val_ref": f"{rs}!$C$2:$C${1 + n_hist}",
        })
    if n_band:
        chart_specs.append({
            "title": "Number of rows per valid-percentage band",
            "y_title": "# of rows",
            "cat_ref": f"{rs}!$B${2 + n_hist}:$B${1 + n_hist + n_band}",
            "val_ref": f"{rs}!$C${2 + n_hist}:$C${1 + n_hist + n_band}",
        })
    write_xlsx(sheets, path,
               charts={"Row Statistics": chart_specs} if chart_specs else None)
