"""Rule-spec data model: the engine's only metadata artifact.

The reference carries column metadata as frictionless table-schema descriptors
(``mipqctool/model/qcfrictionless/qcschema.py:22-41``, ``qcfield.py:22-49``) with
a MIP extension: every field has a ``MIPType`` in {integer, numerical, nominal,
date, text} (default 'text', ``mipqctool/config.py:61``,
``mipqctool/helpers/__init__.py:69-73``).  We keep that descriptor JSON as the
*interchange* format but compile it once, on the driver, into an immutable
:class:`TableSpec` that the expression compiler (plans/compiler.py) turns into
Catalyst ``Column`` expressions — no per-value Python at execution time.

Also includes the Data-Catalogue tree flattener
(``mipqctool/model/dcatalogue/node.py:12-89``, ``dcvariable.py:50-91``,
``qcfrictionless/frictionlessfromdc.py:22-44``): a pure driver-side JSON→JSON
metadata transform.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from typing import Any

DEFAULT_MISSING_VALUES = [""]
DEFAULT_DATE_FORMAT = "%Y-%m-%d"
# pandas NaN tokens the reference treats as missing when inferring schemas
# (mipqctool/config.py:66-68)
PANDAS_NANS = [
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "N/A", "NA", "NULL", "NaN", "n/a", "nan", "null",
]

MIPTYPES = ("integer", "numerical", "nominal", "date", "text")

_IDENTIFIER_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")
# characters replaced by '_' when sanitizing headers (qctable.py:153-156)
_HEADER_SANITIZE_RE = re.compile(r"[`~!@#$%^*&\-+=\s{}\[\]<>./\\:;?()']")


@dataclass(frozen=True)
class FieldSpec:
    """One column's validation metadata (reference: QcField descriptor)."""

    name: str
    miptype: str = "text"              # MIPType (config.py:61 default)
    ftype: str = "string"              # frictionless `type`
    fformat: str = "default"           # e.g. '%d/%m/%Y' for dates
    constraints: dict = dc_field(default_factory=dict)
    missing_values: tuple = ("",)
    suffix: str | None = None          # unit suffix like '(cm3)' (integer.py:149-154)
    decimal_char: str = "."            # numerical decimalChar
    true_values: tuple = ("1",)        # boolean-nominal (integer.py:54-61)
    false_values: tuple = ("0",)

    @property
    def enum(self) -> list:
        return list(self.constraints.get("enum", []))

    @property
    def required(self) -> bool:
        return bool(self.constraints.get("required", False))

    @property
    def unique(self) -> bool:
        return bool(self.constraints.get("unique", False))

    @property
    def minimum(self):
        return self.constraints.get("minimum")

    @property
    def maximum(self):
        return self.constraints.get("maximum")

    @classmethod
    def from_descriptor(cls, desc: dict, missing_values: list[str] | None = None) -> "FieldSpec":
        """Build from a frictionless/QcField descriptor dict.

        Mirrors ``expand_qcfield_descriptor`` (helpers/__init__.py:69-73):
        MIPType defaults to 'text'.
        """
        mvs = tuple(desc.get("missingValues", missing_values or DEFAULT_MISSING_VALUES))
        return cls(
            name=desc["name"],
            miptype=desc.get("MIPType", "text"),
            ftype=desc.get("type", "string"),
            fformat=desc.get("format", "default"),
            constraints=dict(desc.get("constraints", {})),
            missing_values=mvs,
            suffix=desc.get("suffix"),
            decimal_char=desc.get("decimalChar", "."),
            true_values=tuple(desc.get("trueValues", ["1"])),
            false_values=tuple(desc.get("falseValues", ["0"])),
        )

    def to_descriptor(self) -> dict:
        d: dict[str, Any] = {
            "name": self.name,
            "type": self.ftype,
            "format": self.fformat,
            "MIPType": self.miptype,
        }
        if self.constraints:
            d["constraints"] = dict(self.constraints)
        if self.suffix:
            d["suffix"] = self.suffix
        if self.decimal_char != ".":
            d["decimalChar"] = self.decimal_char
        return d


@dataclass(frozen=True)
class TableSpec:
    """Whole-table validation metadata (reference: QcSchema)."""

    fields: tuple
    primary_key: tuple = ()
    missing_values: tuple = ("",)

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    @classmethod
    def from_descriptor(cls, desc: dict) -> "TableSpec":
        mvs = list(desc.get("missingValues", DEFAULT_MISSING_VALUES))
        pk = desc.get("primaryKey", [])
        if isinstance(pk, str):
            pk = [pk]
        fields = tuple(
            FieldSpec.from_descriptor(fd, missing_values=mvs) for fd in desc.get("fields", [])
        )
        return cls(fields=fields, primary_key=tuple(pk), missing_values=tuple(mvs))

    @classmethod
    def from_json(cls, path: str) -> "TableSpec":
        with open(path, encoding="utf-8-sig") as fh:
            desc = json.load(fh)
        if _is_data_catalogue(desc):
            desc = frictionless_from_dc(desc)
        return cls.from_descriptor(desc)

    def to_descriptor(self) -> dict:
        d: dict[str, Any] = {
            "fields": [f.to_descriptor() for f in self.fields],
            "missingValues": list(self.missing_values),
        }
        if self.primary_key:
            d["primaryKey"] = list(self.primary_key)
        return d

    # -- header validation (tablereport.py:483-502): pure set ops on metadata
    def validate_headers(self, actual: list[str]) -> dict:
        expected = set(self.field_names)
        got = set(actual)
        return {
            "valid": sorted(expected & got),
            "missing": sorted(expected - got),
            "invalid": sorted(got - expected),
        }


def sanitize_header(name: str) -> str:
    """Replace punctuation/whitespace with '_' (qctable.py:153-156)."""
    return _HEADER_SANITIZE_RE.sub("_", name)


def is_valid_identifier(name: str) -> bool:
    """SQL-identifier validity check (qcschema.py:189-198)."""
    return bool(_IDENTIFIER_RE.match(name))


# ---------------------------------------------------------------------------
# Data Catalogue tree → frictionless flat field list
# (node.py:12-89, dcvariable.py:50-91, frictionlessfromdc.py:22-44)
# ---------------------------------------------------------------------------

def _is_data_catalogue(desc: dict) -> bool:
    return "fields" not in desc and ("variables" in desc or "groups" in desc)


def _dc_variable_to_field(var: dict, concept_path: str) -> dict:
    """DC variable dict → frictionless field descriptor (dcvariable.py:50-91)."""
    constraints: dict[str, Any] = {}
    fdict: dict[str, Any] = {
        "name": var.get("code"),
        "title": var.get("label", ""),
        "description": var.get("description", ""),
        "format": "default",
        "conceptPath": f"{concept_path}/{var.get('code')}",
    }
    vtype = (var.get("type") or "text").lower()
    sql_type = (var.get("sql_type") or "").lower()
    if vtype in ("real", "numeric"):
        fdict["type"] = "number"
        fdict["MIPType"] = "numerical"
    elif vtype in ("int", "integer"):
        fdict["type"] = "integer"
        fdict["MIPType"] = "nominal" if var.get("isCategorical") else "integer"
    elif vtype in ("nominal", "binominal", "multinominal"):
        fdict["MIPType"] = "nominal"
        fdict["type"] = "integer" if sql_type == "int" else "string"
    else:  # 'text' and anything unknown
        fdict["MIPType"] = "text"
        fdict["type"] = "string"

    if var.get("enumerations"):
        constraints["enum"] = [e["code"] for e in var["enumerations"]]
    if var.get("maxValue") not in (None, ""):
        constraints["maximum"] = int(var["maxValue"])
    if var.get("minValue") not in (None, ""):
        constraints["minimum"] = int(var["minValue"])
    if constraints:
        fdict["constraints"] = constraints
    return fdict


def _walk_dc_node(node: dict, concept_path: str, out: list[dict]) -> None:
    path = f"{concept_path}/{node.get('code', '')}".rstrip("/")
    for var in node.get("variables", []) or []:
        out.append(_dc_variable_to_field(var, path))
    for group in node.get("groups", []) or []:
        _walk_dc_node(group, path, out)


def frictionless_from_dc(dcjson: dict) -> dict:
    """Flatten a Data-Catalogue tree (groups→variables) to a frictionless
    descriptor (frictionlessfromdc.py:40-44)."""
    fields: list[dict] = []
    _walk_dc_node(dcjson, "", fields)
    return {"fields": fields, "missingValues": list(DEFAULT_MISSING_VALUES)}


# ---------------------------------------------------------------------------
# P7: enum-value sanity lint (qcschema.py:166-187) — a nominal enum value is
# flagged when it collides with a SQL reserved word or starts with a digit
# (either breaks the downstream mapping engine's generated SQL).  The list
# is the standard ANSI SQL reserved words (public standard vocabulary).
# ---------------------------------------------------------------------------

SQL_RESERVED_WORDS = frozenset("""
ABS ALL ALLOCATE ALTER AND ANY ARE ARRAY AS ASENSITIVE ASYMMETRIC AT ATOMIC
AUTHORIZATION AVG BEGIN BETWEEN BIGINT BINARY BLOB BOOLEAN BOTH BY CALL
CALLED CASCADED CASE CAST CEIL CEILING CHAR CHARACTER CHECK CLOB CLOSE
COALESCE COLLATE COLUMN COMMIT CONDITION CONNECT CONSTRAINT CONVERT CORR
COUNT CREATE CROSS CUBE CURRENT CURSOR CYCLE DATE DAY DEALLOCATE DEC DECIMAL
DECLARE DEFAULT DELETE DENSE_RANK DEREF DESCRIBE DETERMINISTIC DISCONNECT
DISTINCT DOUBLE DROP DYNAMIC EACH ELEMENT ELSE END ESCAPE EVERY EXCEPT EXEC
EXECUTE EXISTS EXP EXTERNAL EXTRACT FALSE FETCH FILTER FLOAT FLOOR FOR
FOREIGN FREE FROM FULL FUNCTION FUSION GET GLOBAL GRANT GROUP GROUPING
HAVING HOLD HOUR IDENTITY IN INDICATOR INNER INOUT INSENSITIVE INSERT INT
INTEGER INTERSECT INTERVAL INTO IS JOIN LANGUAGE LARGE LATERAL LEADING LEFT
LIKE LN LOCAL LOWER MATCH MAX MEMBER MERGE METHOD MIN MINUTE MOD MODIFIES
MODULE MONTH MULTISET NATIONAL NATURAL NCHAR NCLOB NEW NO NONE NORMALIZE
NOT NULL NULLIF NUMERIC OF OLD ON ONLY OPEN OR ORDER OUT OUTER OVER OVERLAPS
OVERLAY PARAMETER PARTITION POSITION POWER PRECISION PREPARE PRIMARY
PROCEDURE RANGE RANK READS REAL RECURSIVE REF REFERENCES REFERENCING
RELEASE RESULT RETURN RETURNS REVOKE RIGHT ROLLBACK ROLLUP ROW ROWS ROW_NUMBER
SAVEPOINT SCOPE SCROLL SEARCH SECOND SELECT SENSITIVE SESSION SET SIMILAR
SMALLINT SOME SPECIFIC SQL SQLEXCEPTION SQLSTATE SQLWARNING SQRT START
STATIC STDDEV_POP STDDEV_SAMP SUBMULTISET SUBSTRING SUM SYMMETRIC SYSTEM
TABLE TABLESAMPLE THEN TIME TIMESTAMP TIMEZONE_HOUR TIMEZONE_MINUTE TO
TRAILING TRANSLATE TREAT TRIGGER TRIM TRUE UESCAPE UNION UNIQUE UNKNOWN
UNNEST UPDATE UPPER USER USING VALUE VALUES VARCHAR VARYING VAR_POP
VAR_SAMP WHEN WHENEVER WHERE WIDTH_BUCKET WINDOW WITH WITHIN WITHOUT YEAR
""".split())


def lint_enums(spec: "TableSpec") -> dict[str, list[str]]:
    """P7 (qcschema.py:166-187): per nominal field, the enum values that are
    SQL reserved words or start with a digit — invalid as mapping
    identifiers.  Driver-side rule-spec lint; empty dict = clean."""
    out: dict[str, list[str]] = {}
    for f in spec.fields:
        if f.miptype != "nominal":
            continue
        bad = [
            str(e)
            for e in f.enum
            if str(e).upper() in SQL_RESERVED_WORDS or str(e)[:1].isdigit()
        ]
        if bad:
            out[f.name] = bad
    return out
