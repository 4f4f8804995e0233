"""CDE-mapping wizard: the reference GUI's flagship one-to-one mapping flow
(`controller/mipcdemapper.py:16-283`, `controller/cdescontroller.py:10-65`)
composed from the engine's existing pieces — infer the source schema, match
each column to a CDE, auto-generate correspondences (including nested-if
nominal recodes from ``suggest_value`` replacements, `mipcdemapper.py:150-153`
+ `model/mapping/functions.py:6-24` ``ifstr``), then execute the mapping
natively in Catalyst or export it as a MIPMap task XML a legacy deployment
can run.

Differences from the reference, by design:

* The reference writes target-header CSVs, xlsx reports, and a mapping
  directory under ``$HOME/.mipqctool`` as side effects of constructing the
  wizard (`mipcdemapper.py:36-86`); here suggestion is a pure function over
  (DataFrame, CdeDict) and report/export sinks are explicit calls.
* The reference executes the finished mapping by shelling out to a
  dockerized MIPMap+Postgres (`dockermipmap.py:10-56`); here
  :meth:`MappingSuggestion.apply` compiles every correspondence expression
  straight to Catalyst columns (one projection, whole-stage codegen, no
  external engine), and :meth:`MappingSuggestion.to_xml` emits the same
  task-XML document shape for interop.
* Schema inference reads a bounded ``limit`` sample (LocalLimit pushdown);
  numeric value ranges come from ONE Spark aggregate over the full table
  (min/max per numeric column — map-side combinable, scale-safe), where the
  reference loads the whole CSV into a driver-side TableReport.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from dataqualitycontroltool_spark.cde import CdeDict
from dataqualitycontroltool_spark.functions.mapping_expr import (
    ExpressionError,
    compile_expression,
)
from dataqualitycontroltool_spark.inference import infer_table_spec

__all__ = [
    "Correspondence",
    "MappingError",
    "MappingSuggestion",
    "ifstr_expr",
    "mipmap_header",
    "suggest_mapping",
]


class MappingError(ValueError):
    """Duplicate / unknown correspondence (model/mapping exceptions)."""


# the reference's mipmap header sanitizer (qctable.py:153-156): every
# character MIPMap's path grammar can't carry becomes an underscore
_MIPMAP_BAD = re.compile(r"[`~!@#$%^*&\-+=\s{}\[\]<>./\\:;?()']")


def mipmap_header(name: str) -> str:
    """``headers4mipmap`` (qctable.py:153-156)."""
    return _MIPMAP_BAD.sub("_", name)


def ifstr_expr(column: str, replacements: list[tuple[str, str]]) -> str:
    """The reference's ``ifstr`` (model/mapping/functions.py:6-24): a
    nested-if recode expression string, one branch per (source, target)
    replacement in order, ``null()`` for anything unmatched."""
    if not replacements:
        raise ValueError("ifstr needs at least one replacement")
    src, tgt = replacements[0]
    tail = (
        ifstr_expr(column, replacements[1:])
        if len(replacements) > 1
        else "null()"
    )
    return f'if({column} == "{src}", "{tgt}", {tail})'


@dataclass
class Correspondence:
    """One target-CDE correspondence (model/mapping/correspondence.py)."""

    cde_code: str
    source_columns: list[str]
    expression: str
    replacements: list[tuple[str, str]] | None = None


@dataclass
class MappingSuggestion:
    """A suggested one-to-one mapping task: editable correspondence set +
    the wizard bookkeeping the reference GUI surfaces (`mipcdemapper.py:
    265-283` ``__update_cde_mapped``)."""

    correspondences: dict[str, Correspondence] = field(default_factory=dict)
    cde_headers: list[str] = field(default_factory=list)
    source_table: str = "source"
    #: original header -> sanitized mipmap header used in expressions
    header_map: dict[str, str] = field(default_factory=dict)

    # -- wizard bookkeeping -------------------------------------------------

    @property
    def cde_mapped(self) -> list[str]:
        return list(self.correspondences.keys())

    @property
    def cde_not_mapped(self) -> list[str]:
        return [c for c in self.cde_headers if c not in self.correspondences]

    @property
    def corr_sources(self) -> dict[str, str]:
        """cde -> comma-joined source columns (mipcdemapper.py:272-280)."""
        return {
            cde: ", ".join(c.source_columns)
            for cde, c in self.correspondences.items()
        }

    # -- manual edits (mipcdemapper.py:167-183) -----------------------------

    def add_corr(self, cde: str, source_cols: list[str], expression: str):
        if cde in self.correspondences:
            raise MappingError(f"correspondence for cde {cde!r} already exists")
        if self.cde_headers and cde not in self.cde_headers:
            raise MappingError(f"cde {cde!r} not in the target dataset")
        self.correspondences[cde] = Correspondence(cde, list(source_cols), expression)

    def update_corr(self, cde: str, source_cols: list[str], expression: str):
        if cde not in self.correspondences:
            raise MappingError(f"no correspondence for cde {cde!r}")
        self.correspondences[cde] = Correspondence(cde, list(source_cols), expression)

    def remove_corr(self, cde: str):
        if cde not in self.correspondences:
            raise MappingError(f"no correspondence for cde {cde!r}")
        del self.correspondences[cde]

    # -- execution / export --------------------------------------------------

    def expressions(self) -> dict[str, str]:
        return {cde: c.expression for cde, c in self.correspondences.items()}

    def apply(self, df: DataFrame, include_unmapped: bool = False) -> DataFrame:
        """Execute the mapping natively: ONE Catalyst projection with every
        correspondence expression compiled to a Column (the reference runs
        dockerized MIPMap for this step — `mipcdemapper.py:240-246`).

        ``include_unmapped=True`` adds null columns for unmapped CDE headers
        so the output has the full target-table shape (the reference's
        target CSV always carries every CDE header)."""
        renames = [
            F.col(orig).alias(clean)
            for orig, clean in self.header_map.items()
        ] or [F.col(c) for c in df.columns]
        src = df.select(*renames)
        cols = [
            compile_expression(c.expression, columns=src.columns).alias(cde)
            for cde, c in self.correspondences.items()
        ]
        if include_unmapped:
            cols += [
                F.lit(None).cast("string").alias(cde)
                for cde in self.cde_not_mapped
            ]
        return src.select(*cols)

    def to_xml(self, target_table: str = "cde_dataset") -> str:
        """MIPMap task XML for legacy execution (mipcdemapper.py:240-249
        ``run_mapping``/``save_mapping`` document shape)."""
        from dataqualitycontroltool_spark.sources.mipmap import export_mipmap_xml

        return export_mipmap_xml(
            self.expressions(),
            source_table=self.source_table,
            source_columns=list(self.header_map.values()),
            target_table=target_table,
        )


def suggest_mapping(
    df: DataFrame,
    cdedict: CdeDict,
    threshold: float = 0.6,
    sample_rows: int = 100,
    maxlevels: int = 10,
    na_empty_strings_only: bool = False,
    source_table: str = "source",
) -> MappingSuggestion:
    """The wizard's auto-suggestion pass (`mipcdemapper.py:120-165`
    ``suggest_corr``): for each source column in order, pick the best
    same-MIPType CDE above ``threshold`` (first column wins a contested CDE
    — the reference's ``cde.code not in cde_sugg_dict`` guard); when both
    sides are nominal and the dictionary carries enum lookups, the
    correspondence expression is the nested-if ``ifstr`` recode built from
    per-category ``suggest_value`` replacements, else the bare column.

    Scale shape: one bounded-sample inference scan + ONE min/max aggregate
    for every numeric column's value range (the reference computes ranges
    from a full driver-side load).  The suggestion loop itself is
    O(columns × dictionary) driver work on schema metadata only.
    """
    spec = infer_table_spec(
        df,
        limit=sample_rows,
        maxlevels=maxlevels,
        na_empty_strings_only=na_empty_strings_only,
    )

    # one wide aggregate: numeric value ranges for range_score
    num_fields = [f.name for f in spec.fields if f.miptype in ("integer", "numerical")]
    ranges: dict[str, list[float]] = {}
    if num_fields:
        aggs = []
        for name in num_fields:
            c = F.col(name).cast("double")
            aggs += [F.min(c).alias(f"__min_{name}"), F.max(c).alias(f"__max_{name}")]
        row = df.agg(*aggs).first()
        for name in num_fields:
            lo, hi = row[f"__min_{name}"], row[f"__max_{name}"]
            if lo is not None and hi is not None:
                ranges[name] = [lo, hi]

    header_map = {f.name: mipmap_header(f.name) for f in spec.fields}
    out = MappingSuggestion(
        cde_headers=[c.code for c in cdedict._cdes.values()],
        source_table=source_table,
        header_map=header_map,
    )

    for f in spec.fields:
        if f.miptype == "nominal":
            valrange = f.enum or None
        else:
            valrange = ranges.get(f.name)
        cde = cdedict.suggest_cde(f.name, f.miptype, valrange, threshold=threshold)
        if cde is None or cde.code in out.correspondences:
            continue
        column_token = header_map[f.name]
        repls = None
        if f.miptype == "nominal" and f.enum:
            repls = cdedict.suggest_replacements(cde.code, f.enum, threshold=threshold)
        if repls:
            expression = ifstr_expr(column_token, repls)
        else:
            expression = column_token
        try:
            compile_expression(expression, columns=list(header_map.values()))
        except ExpressionError:
            # a sanitized header can still collide with a function name or
            # start with a digit — the reference would emit it and fail at
            # MIPMap run time; we skip and leave the CDE unmapped instead
            continue
        out.correspondences[cde.code] = Correspondence(
            cde.code, [f.name], expression, replacements=repls or None
        )

    return out
