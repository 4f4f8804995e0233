"""CDE dictionary matching (S4/J6/J7) — suggest the closest Common Data
Element for each dataset column, and value replacements for nominal enums.

Re-expression of `/root/reference/mipqctool/model/qcfrictionless/cde.py`
(CdeDict/CdeVariable) and the similarity measure in
`helpers/__init__.py:77-106` (edit-distance "f1": TP = max(l1,l2) - ED,
precision TP/min, recall TP/max), with the same weighting
0.8·name_f1 + 0.2·range_f1 and threshold 0.6 (`cde.py:43-69`).

Execution split: the dictionary is SMALL (hundreds of CDEs) and the column
set per table is small, so matching is driver-side like the reference —
but :func:`match_columns_distributed` provides the broadcast-crossjoin +
window-rank plan (SURVEY §2.6 J6) for matching MANY tables' columns at
once (schema-matching over a lake).

Sources: xlsx via openpyxl when available (import-try — the reference's
format, `cde.py:19-37`), CSV with the same header names, or plain records.
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass, field

try:
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False

# cde-dictionary type tokens → MIPType (cde.py:11-14)
_TYPE_MAP = {
    **{t: "numerical" for t in ("numerical", "numeric", "real")},
    **{t: "integer" for t in ("integer", "int")},
    **{t: "nominal" for t in ("nominal", "ordinal", "binomial", "polynomial")},
    "date": "date",
}

_ENUM_RE = re.compile(r"{(?P<list>[^{]*)}")


def edit_distance(s1: str, s2: str) -> int:
    """Plain Levenshtein (substitution cost 1, no transpositions) — the
    reference uses nltk.edit_distance with the same defaults."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def edit_distance_f1(s1: str, s2: str) -> float:
    """helpers/__init__.py:77-106: TP = max(l1,l2) - ED; precision TP/min,
    recall TP/max; f1 = harmonic mean (0 on degenerate cases)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    found = max(l1, l2) - edit_distance(s1, s2)
    precision = found / min(l1, l2)
    recall = found / max(l1, l2)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


@dataclass
class CdeVariable:
    """One dictionary entry (cde.py:100-163 semantics)."""

    code: str
    cdetype: str
    conceptpath: str = ""
    mipvalues_raw: str | None = None
    variable_lookup_raw: str | None = None
    enum_lookup_raw: str | None = None

    miptype: str = field(init=False)
    mipvalues: list | None = field(init=False)
    variable_lookup: list[str] | None = field(init=False)
    enum_lookup: list[str] | None = field(init=False)
    enum_dict: dict | None = field(init=False)

    def __post_init__(self):
        self.code = self.code.strip()
        self.miptype = _TYPE_MAP.get(self.cdetype.lower().strip(), "text")
        arithmetic = self.miptype in ("integer", "numerical")

        if self.variable_lookup_raw:
            names = self.variable_lookup_raw.replace('"', "").split(",")
            self.variable_lookup = sorted({n.strip().lower() for n in names})
        else:
            self.variable_lookup = None

        self.mipvalues = None
        if self.mipvalues_raw:
            if arithmetic:
                try:
                    vals = [float(x) for x in self.mipvalues_raw.split("-")]
                    self.mipvalues = vals[:2]
                except ValueError:
                    self.mipvalues = None
            elif self.miptype == "nominal":
                # '{code, desc},{code, desc}' → [code, ...] (first item each)
                self.mipvalues = [
                    m.replace('"', "").split(",")[0].strip()
                    for m in _ENUM_RE.findall(self.mipvalues_raw)
                ]

        self.enum_lookup, self.enum_dict = None, None
        if self.enum_lookup_raw and self.mipvalues:
            groups = [
                [x.strip() for x in m.replace('"', "").split(",")]
                for m in _ENUM_RE.findall(self.enum_lookup_raw)
            ]
            self.enum_lookup = sorted({x.lower() for g in groups for x in g})
            self.enum_dict = dict(zip(self.mipvalues, groups))

    # -- scoring (cde.py:190-290) ------------------------------------------

    def name_score(self, name: str) -> float:
        low = name.lower()
        best = edit_distance_f1(low, self.code.lower())
        if self.variable_lookup:
            best = max(best, max(edit_distance_f1(low, x) for x in self.variable_lookup))
        return best

    def range_score(self, valrange: list) -> float:
        if self.miptype == "nominal" and self.mipvalues:
            enums = self.enum_lookup or [x.lower() for x in self.mipvalues]
            found = sum(str(v).lower() in enums for v in valrange)
            precision = found / len(self.mipvalues)
            recall = found / len(valrange) if valrange else 0
            if precision + recall == 0:
                return 0.0
            return 2 * precision * recall / (precision + recall)
        if self.miptype in ("integer", "numerical") and self.mipvalues:
            cde_min, cde_max = self.mipvalues
            lo, hi = float(valrange[0]), float(valrange[1])
            inside = max(0.0, min(hi, cde_max) - max(lo, cde_min))
            if cde_max - cde_min == 0 or hi - lo == 0:
                return 0.0
            precision = inside / (cde_max - cde_min)
            recall = inside / (hi - lo)
            if precision + recall == 0:
                return 0.0
            return 2 * precision * recall / (precision + recall)
        return 0.0

    def similarity(self, name: str, valrange: list | None = None) -> float:
        ns = self.name_score(name)
        if valrange:
            return 0.8 * ns + 0.2 * self.range_score(valrange)
        return ns

    def suggest_value(self, value, threshold: float = 0.6) -> str | None:
        """Best enum replacement for a categorical value (cde.py:205-219)."""
        if not (self.enum_dict and self.mipvalues):
            return None
        low = str(value).lower()
        scores = {
            cdeval: max(edit_distance_f1(e.lower(), low) for e in enums)
            for cdeval, enums in self.enum_dict.items()
        }
        best = max(scores, key=scores.get)
        return best if scores[best] >= threshold else None


_COLUMNS = ("mip_code", "mip_type", "conceptPath", "mip_values",
            "variable_lookup", "enum_lookup")


class CdeDict:
    """Dictionary of CDE variables with column-match suggestion."""

    def __init__(self, variables: list[CdeVariable]):
        self._cdes = {v.code: v for v in variables}

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_records(cls, records: list[dict]) -> "CdeDict":
        return cls([
            CdeVariable(
                code=r["mip_code"],
                cdetype=r["mip_type"],
                conceptpath=r.get("conceptPath") or "",
                mipvalues_raw=r.get("mip_values"),
                variable_lookup_raw=r.get("variable_lookup"),
                enum_lookup_raw=r.get("enum_lookup"),
            )
            for r in records
        ])

    @classmethod
    def from_csv(cls, path: str) -> "CdeDict":
        with open(path, encoding="utf-8-sig", newline="") as f:
            return cls.from_records(list(csv.DictReader(f)))

    @classmethod
    def from_xlsx(cls, path: str) -> "CdeDict":
        if not HAVE_OPENPYXL:
            raise ImportError("openpyxl not installed — use from_csv/from_records")
        wb = openpyxl.load_workbook(path)
        ws = wb.active
        rows = ws.iter_rows(values_only=True)
        headers = list(next(rows))
        return cls.from_records([dict(zip(headers, r)) for r in rows])

    # -- api ---------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._cdes)

    def get(self, code: str) -> CdeVariable | None:
        return self._cdes.get(code)

    def suggest_cde(
        self, name: str, miptype: str, valrange: list | None = None,
        threshold: float = 0.6,
    ) -> CdeVariable | None:
        """Best same-MIPType CDE by 0.8·name + 0.2·range similarity; None
        below threshold (cde.py:43-69).  Ties broken by code ascending
        (the reference's sort is stable on insertion order — we pin it)."""
        cands = [c for c in self._cdes.values() if c.miptype == miptype]
        if not cands:
            return None
        # min over (-sim, code): highest similarity, ties by SMALLEST code —
        # the same order match_columns_distributed pins with cde_code.asc()
        best = min(cands, key=lambda c: (-c.similarity(name, valrange), c.code))
        return best if best.similarity(name, valrange) >= threshold else None

    def suggest_replacements(
        self, cdecode: str, categories: list, threshold: float = 0.6
    ) -> list[tuple[str, str]] | None:
        """(source, target) value replacements for a nominal column against
        a nominal CDE (cde.py:71-98); None when types/lookups don't allow."""
        cde = self._cdes.get(cdecode)
        if cde is None:
            raise KeyError(f"cde {cdecode!r} not in dictionary")
        if not (cde.miptype == "nominal" and cde.mipvalues and cde.enum_lookup):
            return None
        out = []
        for v in categories:
            s = cde.suggest_value(v, threshold)
            if s:
                out.append((v, s))
        return out


def match_columns_distributed(spark, columns_df, cdedict: CdeDict, threshold: float = 0.6):
    """J6 at scale: match MANY columns (e.g. a whole lake's schemas) against
    the dictionary in one Spark job — broadcast the (small) dictionary's
    (code, lookup_name, miptype) rows, equi-join on miptype, score name
    similarity with the engine-side ``levenshtein``-based f1, rank per
    column with a window.  Range scoring stays driver-side per match (it
    needs per-column value ranges; apply on the top-k survivors).

    ``columns_df``: (col_name string, miptype string).
    Returns (col_name, cde_code, name_f1, rank<=1)."""
    from pyspark.sql import Window, functions as F

    rows = []
    for c in cdedict._cdes.values():
        for alt in {c.code.lower(), *(c.variable_lookup or [])}:
            rows.append((c.code, alt, c.miptype))
    dim = spark.createDataFrame(rows, "cde_code string, lookup string, cde_miptype string")

    lo = F.lower(F.col("col_name"))
    l1, l2 = F.length(lo), F.length(F.col("lookup"))
    ed = F.levenshtein(lo, F.col("lookup"))
    found = F.greatest(l1, l2) - ed
    precision = found / F.least(l1, l2)
    recall = found / F.greatest(l1, l2)
    f1 = F.when(precision + recall > 0, 2 * precision * recall / (precision + recall)).otherwise(0.0)

    scored = (
        columns_df.join(F.broadcast(dim), F.col("miptype") == F.col("cde_miptype"))
        .select("col_name", "cde_code", F.round(f1, 6).alias("name_f1"))
        .groupBy("col_name", "cde_code")
        .agg(F.max("name_f1").alias("name_f1"))
    )
    w = Window.partitionBy("col_name").orderBy(F.col("name_f1").desc(), F.col("cde_code").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") == 1) & (F.col("name_f1") >= threshold))
        .select("col_name", "cde_code", "name_f1")
    )
