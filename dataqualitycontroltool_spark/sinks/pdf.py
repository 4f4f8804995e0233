"""S8 — PDF report sink, written WITHOUT weasyprint.

The reference renders its jinja2 HTML report to PDF via weasyprint
(`/root/reference/mipqctool/controller/tablereport.py:161-181` ``printpdf``:
dataset report + per-column reports concatenated into one document).  No
HTML-to-PDF engine exists in this environment, so this module emits the
same report *content* (the sections of ``render_html_report``) directly as
a PDF 1.4 file — the format is public (ISO 32000 / Adobe PDF Reference):
a header, numbered objects, uncompressed text content streams using the
built-in Helvetica / Helvetica-Bold Type1 fonts, a byte-offset xref table
and a trailer.

Driver-side by design, like the HTML/XLSX sinks: the inputs are the
already-aggregated metric tables (O(fields) rows regardless of corpus
size); the distributed work happened in ``report_tables``.

Content streams are left uncompressed on purpose: the report is a few KB,
and tests (and humans with ``strings``) can assert on the text directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataqualitycontroltool_spark.sinks.reports import report_tables
from dataqualitycontroltool_spark.specs import TableSpec

# A4 in points; generous margins for a data-table document.
_PAGE_W, _PAGE_H = 595, 842
_MARGIN = 50
_LINE_H = 14

# Rough Helvetica advance width as a fraction of font size — enough to
# budget characters per table column without shipping a full AFM table.
_CHAR_W = 0.55


def _esc(text: str) -> bytes:
    """Escape a string for a PDF literal string ``(...)``."""
    out = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    # PDF literal strings in this writer are Latin-1 (WinAnsi-compatible
    # for the characters we emit); anything outside is replaced.
    return out.encode("latin-1", errors="replace")


class _PdfDoc:
    """Accumulates numbered PDF objects and serializes header + objects +
    xref + trailer with correct byte offsets."""

    def __init__(self) -> None:
        self._objects: list[bytes] = []

    def add(self, body: bytes) -> int:
        """Add an object body (without ``N 0 obj``/``endobj``); return its
        1-based object number."""
        self._objects.append(body)
        return len(self._objects)

    def reserve(self) -> int:
        """Reserve an object number to be filled in later (for the Pages
        node, which must be referenced by pages created before it is
        complete)."""
        self._objects.append(b"")
        return len(self._objects)

    def fill(self, num: int, body: bytes) -> None:
        self._objects[num - 1] = body

    def build(self, root: int) -> bytes:
        buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = []
        for i, body in enumerate(self._objects, start=1):
            offsets.append(len(buf))
            buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        xref_at = len(buf)
        n = len(self._objects) + 1
        buf += b"xref\n0 %d\n0000000000 65535 f \n" % n
        for off in offsets:
            buf += b"%010d 00000 n \n" % off
        buf += (
            b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, root, xref_at)
        )
        return bytes(buf)


class _ReportLayout:
    """Line-oriented layout: headings, text lines and fixed-column tables
    over A4 pages, emitting PDF text-object operators."""

    def __init__(self) -> None:
        self.pages: list[list[bytes]] = []
        self._ops: list[bytes] = []
        self._y = 0.0
        self._new_page()

    def _new_page(self) -> None:
        self._ops = []
        self.pages.append(self._ops)
        self._y = _PAGE_H - _MARGIN

    def _ensure(self, height: float) -> None:
        if self._y - height < _MARGIN:
            self._new_page()

    def _line(self, text: str, size: float, bold: bool, x: float = _MARGIN) -> None:
        font = b"/F2" if bold else b"/F1"
        self._ops.append(
            b"BT %s %.1f Tf %.1f %.1f Td (%s) Tj ET"
            % (font, size, x, self._y - size, _esc(text))
        )

    def heading(self, text: str, size: float = 14) -> None:
        self._ensure(size * 2)
        self._y -= size * 0.6
        self._line(text, size, bold=True)
        self._y -= size * 1.4

    def text(self, text: str, size: float = 10, bold: bool = False) -> None:
        self._ensure(_LINE_H)
        self._line(text, size, bold)
        self._y -= _LINE_H

    def table(self, headers: list[str], rows: list[list], size: float = 9) -> None:
        """Fixed-width columns sized evenly across the text area; cell text
        is truncated to its column budget (the metric tables are narrow —
        this is a report, not a spreadsheet)."""
        ncol = max(1, len(headers))
        width = (_PAGE_W - 2 * _MARGIN) / ncol
        budget = max(4, int(width / (size * _CHAR_W)) - 1)

        def emit(cells: list, bold: bool) -> None:
            self._ensure(_LINE_H)
            for c, v in enumerate(cells):
                s = "" if v is None else str(v)
                if len(s) > budget:
                    s = s[: budget - 1] + "~"
                self._line(s, size, bold, x=_MARGIN + c * width)
            self._y -= _LINE_H

        emit(headers, bold=True)
        for row in rows:
            emit(list(row), bold=False)
        self._y -= _LINE_H * 0.5


def _build_pdf(layout: _ReportLayout) -> bytes:
    doc = _PdfDoc()
    pages_num = doc.reserve()
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    f2 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
                 b"/Encoding /WinAnsiEncoding >>")
    kids = []
    for ops in layout.pages:
        stream = b"\n".join(ops)
        content = doc.add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page = doc.add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> "
            b"/Contents %d 0 R >>"
            % (pages_num, _PAGE_W, _PAGE_H, f1, f2, content)
        )
        kids.append(b"%d 0 R" % page)
    doc.fill(
        pages_num,
        b"<< /Type /Pages /Kids [%s] /Count %d >>"
        % (b" ".join(kids), len(kids)),
    )
    root = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    return doc.build(root)


def render_pdf_report(
    tables: dict[str, DataFrame],
    dataset: str,
    source: str = "",
    date_run: str | None = None,
) -> bytes:
    """Render the report tables as a PDF document — the same sections, in
    the same order, as ``render_html_report`` (which mirrors the
    reference's dataset_report template): header/run info, row statistics
    with percentages, per-column statistics, cleaning suggestions.

    ``date_run`` is caller-injected so default renders are deterministic
    and byte-diffable (same contract as the HTML sink)."""
    from dataqualitycontroltool_spark.sinks.reports import row_stats_sort_key

    general = tables["general"].collect()[0].asDict()
    row_stats = sorted(
        (r.asDict() for r in tables["row_stats"].collect()),
        key=row_stats_sort_key,
    )
    total = general.get("total_rows") or 0
    for r in row_stats:
        r["pct"] = f"{100.0 * r['rows'] / total:.2f}" if total else "0.00"
    column_df = tables["column_stats"]
    column_stats = sorted(
        (r.asDict() for r in column_df.collect()),
        key=lambda r: str(r.get("field")),
    )
    corrections = sorted(
        (r.asDict() for r in tables["corrections"].collect()),
        key=lambda r: (r["field"], str(r["value"])),
    )

    lay = _ReportLayout()
    lay.heading("Quality Control Report", size=16)
    lay.text(f"Dataset: {dataset}" + (f" ({source})" if source else ""), bold=True)
    if date_run:
        lay.text(f"Run: {date_run}")
    lay.text(
        f"Total rows: {general.get('total_rows')} - "
        f"columns: {general.get('total_columns')} - "
        f"fields checked: {general.get('fields_checked')} - "
        f"total violations: {general.get('total_violations')}"
    )

    lay.heading("Row statistics")
    lay.table(
        ["kind", "key", "rows", "%"],
        [[r["kind"], r["key"], r["rows"], r["pct"]] for r in row_stats],
    )

    lay.heading("Column statistics")
    lay.table(
        column_df.columns,
        [[r[c] for c in column_df.columns] for r in column_stats],
    )

    lay.heading("Cleaning suggestions")
    lay.table(
        ["field", "value", "suggestion", "violation", "n"],
        [
            [r["field"], r["value"], r["suggestion"], r["violation"],
             r["n_occurrences"]]
            for r in corrections
        ],
    )
    return _build_pdf(lay)


def write_pdf_report(
    df: DataFrame,
    spec: TableSpec,
    path: str,
    dataset: str,
    source: str = "",
    date_run: str | None = None,
    tables: dict[str, DataFrame] | None = None,
) -> None:
    """Validate + aggregate + render + write the PDF report to ``path``
    (``printpdf`` parity: one document; the per-column detail lives in the
    Column statistics table).  Pass precomputed ``tables`` to reuse one
    validation pass across several report formats."""
    pdf = render_pdf_report(tables or report_tables(df, spec),
                            dataset, source, date_run)
    with open(path, "wb") as fh:
        fh.write(pdf)
