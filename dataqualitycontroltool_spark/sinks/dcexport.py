"""QCtoDC — export an (inferred) frictionless schema as a Data Catalogue
variable table, as CSV or Excel (reference:
``mipqctool/model/qcfrictionless/qctodc.py:8-100`` + the ``infercsv``
controller hook ``controller/inferschema.py:71-73``).

The DC format is one row per variable with the fixed header set
``DC_HEADERS`` (``config.py:71-75``); ``values`` renders per MIPType:

* nominal  — ``{"v","v"}`` per enum entry, comma-joined
* ordinal  — ``{"v","1"}``, order = 1-based enum position
* integer/real — ``min-max`` when BOTH bounds exist, else empty

``numerical`` maps to DC type ``real``; every other MIPType passes through.
CDE suggestions (``{field: [cde_code, conceptpath]}`` from
``InferSchema.suggest_cdes``) fill ``conceptPath``; a field with no entry
defaults its conceptPath to its own name, exactly like the reference's
``suggestions.get(name, [None, name])``.

Driver-side by design: the input is a schema descriptor — O(fields) rows —
never the data.  The Excel writer is the repo's own OOXML writer
(:mod:`dataqualitycontroltool_spark.sinks.xlsx`), no openpyxl/pandas."""

from __future__ import annotations

import csv

DC_HEADERS = [
    "csvFile", "name", "code", "type", "values",
    "unit", "description", "comments", "conceptPath",
    "methodology", "canBeNull",
]

_SHEET_NAME = "Sheet1"  # pandas.to_excel default, what the reference emits


def _dc_type(miptype: str) -> str:
    return "real" if miptype == "numerical" else miptype


def _dc_values(dctype: str, constraints: dict | None) -> str | None:
    if not constraints:
        return None
    if dctype == "nominal":
        enum = constraints.get("enum", [])
        return ",".join('{{"{}","{}"}}'.format(v, v) for v in enum)
    if dctype == "ordinal":
        enum = constraints.get("enum", [])
        return ",".join(
            '{{"{}","{}"}}'.format(v, order) for order, v in enumerate(enum, start=1)
        )
    if dctype in ("integer", "real"):
        minimum, maximum = constraints.get("minimum"), constraints.get("maximum")
        if str(minimum) != "None" and str(maximum) != "None":
            return "-".join([str(minimum), str(maximum)])
    return None


def dc_variable_row(
    field_desc: dict,
    csvname: str | None = None,
    suggestion: list | tuple | None = None,
) -> dict:
    """One DC variable dict from one frictionless field descriptor
    (``QctoDCVariable.info``, qctodc.py:42-100)."""
    name = field_desc.get("name")
    conceptpath = suggestion[1] if suggestion is not None else name
    dctype = _dc_type(field_desc.get("MIPType", "text"))
    return {
        "csvFile": csvname,
        "name": field_desc.get("title", name),
        "code": name,
        "type": dctype,
        "values": _dc_values(dctype, field_desc.get("constraints")),
        "unit": "",
        "description": field_desc.get("description"),
        "comments": "",
        "conceptPath": conceptpath,
        "methodology": "",
        "canBeNull": "",
    }


def dc_rows(
    descriptor: dict,
    csvname: str | None = None,
    cde_suggestions: dict | None = None,
) -> list[dict]:
    """DC variable rows for a whole schema descriptor, in field order."""
    suggestions = cde_suggestions or {}
    return [
        dc_variable_row(fd, csvname, suggestions.get(fd.get("name"), [None, fd.get("name")]))
        for fd in descriptor.get("fields", [])
    ]


def export_dc_csv(
    descriptor: dict,
    path: str,
    csvname: str | None = None,
    cde_suggestions: dict | None = None,
) -> None:
    """``QCtoDC.export2csv`` parity: DC_HEADERS header row + one row per
    field (csv.DictWriter renders None as an empty cell)."""
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=DC_HEADERS)
        writer.writeheader()
        for row in dc_rows(descriptor, csvname, cde_suggestions):
            writer.writerow(row)


def export_dc_xlsx(
    descriptor: dict,
    path: str,
    csvname: str | None = None,
    cde_suggestions: dict | None = None,
) -> None:
    """``QCtoDC.export2excel`` parity on the repo's OOXML writer: one
    sheet, DC_HEADERS as row 1, None rendered as empty (pandas' NaN)."""
    from dataqualitycontroltool_spark.sinks.xlsx import write_xlsx

    rows = [DC_HEADERS] + [
        ["" if r[h] is None else r[h] for h in DC_HEADERS]
        for r in dc_rows(descriptor, csvname, cde_suggestions)
    ]
    write_xlsx({_SHEET_NAME: rows}, path)


def suggest_cdes_for_spec(spec, cdedict, threshold: float = 0.6) -> dict:
    """``InferSchema.suggest_cdes`` (inferschema.py:55-69): best CDE per
    field by the dictionary's similarity formula → {name: [code,
    conceptpath]}, [None, None] when nothing clears the threshold."""
    out = {}
    for f in spec.fields:
        cde = cdedict.suggest_cde(f.name, f.miptype, threshold=threshold)
        out[f.name] = [cde.code, cde.conceptpath] if cde else [None, None]
    return out
