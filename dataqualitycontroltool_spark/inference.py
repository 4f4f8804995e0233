"""Schema inference (M3): sampled guesser → resolver vote → rule spec.

Re-expression of the reference's inference pipeline
(`/root/reference/mipqctool/model/qcfrictionless/qcschema.py:64-145`
``QcSchema.infer``, guesser `:236-247`, resolver `:249-304`; per-type
``infer_*``/``describe_*`` in `model/qctypes/{integer,numerical,date,text}.py`).

Inference always runs on a BOUNDED sample (the reference default is 100
rows, `qctable.py:111`), so the vote itself is driver-side by design:
``df.limit(n)`` is pushed down by Catalyst (LocalLimit → scan stops early),
the collected sample is ≤ n×cols short strings, and the per-value regex
cascade + vote is exactly the reference's — no Java-regex translation risk
(SURVEY §7 risk 5).  Nothing here ever scans the full table.

Outputs a :class:`~dataqualitycontroltool_spark.specs.TableSpec`, which the
expression compiler (plans/compiler.py) turns into the Catalyst validation
plan — inference → validation is the same metadata → expressions flow as a
user-supplied schema.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

from dataqualitycontroltool_spark import datefmt
from dataqualitycontroltool_spark.specs import (
    DEFAULT_MISSING_VALUES,
    PANDAS_NANS,
    TableSpec,
)

# resolve priority: smaller = more specific wins the final tie-break
# (qcschema.py:227-232: date=0 < text=1 < numerical=2 < integer=3)
RESOLVE_PRIORITY = {"date": 0, "text": 1, "numerical": 2, "integer": 3}

# value-shape regexes, re-expressed from integer.py:149-150 / numerical.py:119-120:
# optional sign, digits, optional unit suffix of 1-5 (int) / 1-10 (num) letters
# with an optional trailing digit group and ')'.
_INT_RE = re.compile(
    r"^(?P<sign>[+-])?\d+"
    r"(?P<suffix>(\s?[^0-9\s^&!*\-_+=~,.`@\"'\\/]{1,5}\d?)\)?)?$",
    flags=re.UNICODE,
)
_NUM_RE = re.compile(
    r"^(?P<sign>[+-])?\d+(?P<decpart>(?P<decchar>[,.])\d*)"
    r"(?P<suffix>(\s?[^0-9\s^&!*\-+=~,.`@\"'\\/]{1,10}\d{0,3})\)?)?$",
    flags=re.UNICODE,
)


def guess_value(
    value: str, na_empty_strings_only: bool = False
) -> tuple[str, str, int]:
    """(miptype, pattern, resolve_priority) for one raw string value.

    Infer order date → integer → numerical → text (qcschema.py:220-225);
    the date patterns come from datefmt.DATE_PATTERNS (same 7-regex cascade).
    """
    v = str(value)
    fmt = datefmt.infer_date_format(v)
    if fmt is not None:
        return ("date", fmt, RESOLVE_PRIORITY["date"])
    m = _INT_RE.match(v)
    if m:
        pattern = "d" + (m.group("suffix") or "")
        return ("integer", pattern, RESOLVE_PRIORITY["integer"])
    m = _NUM_RE.match(v)
    if m:
        pattern = "d" + m.group("decchar") + (m.group("suffix") or "")
        return ("numerical", pattern, RESOLVE_PRIORITY["numerical"])
    nans = DEFAULT_MISSING_VALUES if na_empty_strings_only else PANDAS_NANS
    if v in nans:
        return ("text", "nan", RESOLVE_PRIORITY["text"])
    return ("text", "text", RESOLVE_PRIORITY["text"])


# -- describe_* (integer.py:33-94, numerical.py:36-61, date.py:52-67,
#    text.py:31-59): pattern + uniques → field descriptor ----------------------

def _describe_integer(pattern: str, uniques: set, maxlevels: int) -> dict:
    suffix = pattern[1:].rstrip() if len(pattern) > 1 else ""
    if suffix:
        return {"type": "integer", "format": "default", "MIPType": "integer",
                "bareNumber": False, "suffix": pattern[1:]}
    if uniques == {"0", "1"}:
        return {"type": "boolean", "format": "default", "MIPType": "nominal",
                "trueValues": ["1"], "falseValues": ["0"]}
    if len(uniques) <= maxlevels:
        levels = sorted(uniques)
        try:
            [int(e) for e in levels]
            return {"type": "integer", "format": "default", "MIPType": "nominal",
                    "constraints": {"enum": levels}}
        except ValueError:
            return {"type": "string", "format": "default", "MIPType": "nominal",
                    "constraints": {"enum": levels}}
    return {"type": "integer", "format": "default", "MIPType": "integer",
            "bareNumber": True}


def _describe_numerical(pattern: str, uniques: set, maxlevels: int) -> dict:
    decchar = pattern[1]
    suffix = pattern[2:]
    d = {"type": "number", "format": "default", "MIPType": "numerical",
         "decimalChar": decchar, "bareNumber": not suffix}
    if suffix:
        d["suffix"] = suffix
    return d


def _describe_date(pattern: str, uniques: set, maxlevels: int) -> dict:
    return {"type": "date", "format": pattern, "MIPType": "date"}


def _describe_text(pattern: str, uniques: set, maxlevels: int) -> dict:
    if len(uniques) <= maxlevels:
        return {"type": "string", "format": "default", "MIPType": "nominal",
                "constraints": {"enum": sorted(uniques)}}
    return {"type": "string", "format": "default", "MIPType": "text"}


_DESCRIBE = {
    "integer": _describe_integer,
    "numerical": _describe_numerical,
    "date": _describe_date,
    "text": _describe_text,
}


def resolve_column(
    results: list[tuple[str, str, int]], uniques: set, maxlevels: int = 10
) -> dict:
    """Vote over per-value guesses → field descriptor (qcschema.py:249-304):
    drop NaN guesses, take the top-2 by count (stable on first occurrence),
    then the most specific (lowest resolve priority) wins."""
    variants = set(results)
    if len(variants) == 1:
        name, pattern, _p = results[0]
        if pattern == "nan":  # all-missing column → plain text (qcschema.py:262-268)
            return _describe_text("text", set(), -100)
        return _DESCRIBE[name](pattern, uniques, maxlevels)
    counts: Counter = Counter()
    for r in results:
        if r[1] != "nan":
            counts[r] += 1
    top2 = sorted(counts.items(), key=lambda kv: kv[1], reverse=True)[:2]
    top2 = sorted(top2, key=lambda kv: kv[0][2])  # most specific first
    name, pattern, _p = top2[0][0]
    return _DESCRIBE[name](pattern, uniques, maxlevels)


def infer_descriptor(
    rows: list[list[str]],
    headers: list[str],
    maxlevels: int = 10,
    na_empty_strings_only: bool = False,
) -> dict:
    """Pure-Python inference over sampled raw rows (qcschema.py:64-145):
    ragged rows truncated/padded, values stripped, uniques collected for
    text/integer candidates, NaN tokens accumulated into missingValues."""
    n = len(headers)
    results: dict[int, list] = {i: [] for i in range(n)}
    uniques: dict[int, set] = {i: set() for i in range(n)}
    missing: set[str] = set()
    for row in rows:
        row = list(row[:n]) + [""] * (n - len(row))
        for i, value in enumerate(row):
            v = ("" if value is None else str(value)).strip()
            name, pattern, prio = guess_value(v, na_empty_strings_only)
            if pattern == "text" or name == "integer":
                uniques[i].add(v)
            elif pattern == "nan":
                missing.add(v)
            results[i].append((name, pattern, prio))
    fields = []
    for i, header in enumerate(headers):
        desc = {"name": header}
        desc.update(resolve_column(results[i], uniques[i], maxlevels))
        fields.append(desc)
    if missing:
        missing.update(DEFAULT_MISSING_VALUES)
        mvs = sorted(missing)
    else:
        mvs = list(DEFAULT_MISSING_VALUES)
    return {"fields": fields, "missingValues": mvs}


def infer_table_spec(
    df: DataFrame,
    limit: int = 100,
    maxlevels: int = 10,
    na_empty_strings_only: bool = False,
) -> TableSpec:
    """Spark entry point: bounded-sample scan (LocalLimit pushdown) → vote.

    Non-string columns are stringified first — the reference always sees raw
    CSV text, and inference semantics are defined on strings.
    """
    import pandas as pd

    sample = df.limit(limit).toPandas()
    rows = [
        ["" if v is None or (not isinstance(v, str) and pd.isna(v)) else str(v)
         for v in row]
        for row in sample.itertuples(index=False, name=None)
    ]
    desc = infer_descriptor(rows, list(sample.columns), maxlevels, na_empty_strings_only)
    return TableSpec.from_descriptor(desc)
