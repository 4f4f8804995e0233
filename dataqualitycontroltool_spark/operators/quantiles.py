"""Distributed EXACT quantiles by iterative histogram rank-selection.

Why this exists (reference parity + scale): the reference computes quantiles
by materializing the whole column in the driver (``model/qctypes/numerical.py:73-102``
→ ``np.quantile``).  Spark's built-in exact ``percentile`` aggregate is
semantically right but buffers a value→count map through a SINGLE final
reducer — the one profiler path in this repo that cannot survive a
high-cardinality 10^12-row column.  ``approx_percentile`` scales but is not
exact, so it can't answer the reference's contract.

This operator is exact AND scale-correct:

* **No data shuffle.**  Each refinement level is one scan + one map-side-
  combined histogram aggregate of at most ``len(groups) × buckets`` rows.
  The value column itself never enters an exchange.
* **Bounded driver state.**  The driver sees only histogram counts
  (≤ R·B rows per level) and one terminal distinct-value table bounded by
  ``terminal_rows`` per rank-group.
* **Few levels.**  The histogram aggregate carries per-bucket min/max, and
  a child group's range is the ACTUAL value span inside its bucket — not
  the nominal bucket boundaries — so each level shrinks a range to at most
  1/B of the parent (default B = 8192 = 13 bits) and immediately snaps to
  where the data lives.  For value distributions whose magnitude matches
  their span, sub-ulp width (≤2 distinct values → terminal pass) is
  reached in ≤ ⌈52/13⌉+1 = 5 levels.  The worst case is adversarial
  geometric data spread across the full double exponent range with >
  ``terminal_rows`` values per magnitude band, which can take
  O(log(span/ulp)/13) ≈ up to ~160 levels — each still a single bounded
  scan; ``max_levels`` (256) raises rather than ever falling back to an
  unbounded collect.

Exactness argument: bucket assignment is
``clamp(floor((cast(v as double) - lo) / width), 0, B-1)`` with ``lo``/
``width`` embedded as literals.  The next level's path predicate is built
from the SAME Column expression (``bucket_expr == k``), so whatever
IEEE-754 rounding the bucket assignment performs, the refinement filter
performs identically and selects EXACTLY the rows that were counted — no
boundary slippage between the histogram and the refinement filter.  The
expression is monotone non-decreasing in ``v`` (subtraction, division by
a positive constant, floor, clamp, and long→double cast are all
monotone), so buckets are order-contiguous and rank arithmetic over their
counts is exact.  The scan pre-filter needs no slippage allowance: a
group's [lo, hi] is the min/max of precisely the rows its predicate
selects (per-bucket min/max from the histogram), so
``between(lo, hi)`` never excludes a predicate row.

Interpolation mirrors Spark's ``Percentile`` (and ``np.quantile`` /
DuckDB ``quantile_cont``): ``pos = p·(n-1)``;
``result = v[floor(pos)]·(1-frac) + v[ceil(pos)]·frac``.

NaN / ±inf are rejected (ValueError) — the profilers run on cast-validated
values where non-finite floats are already invalid.  NULLs are ignored, an
empty column yields ``None`` per requested percentage (same as
``percentile``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


def _bucket_expr(col: Column, lo: float, width: float, buckets: int) -> Column:
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), raw))


def _geometry(g: "_Group", buckets: int) -> Column:
    """Bucket expression for one group.  When the group's range itself
    overflows a double (``hi - lo == inf``, possible only for ranges
    spanning most of ±DBL_MAX), equi-width bucketing is ill-defined, so the
    level degrades to ONE exact midpoint comparison (``v >= lo/2 + hi/2``);
    each such split halves the range, so finite widths return within two
    levels and refinement still terminates instead of dumping the full
    group on the terminal distinct-value pass."""
    width = (g.hi - g.lo) / buckets
    if math.isfinite(width):
        return _bucket_expr(F.col("_v"), g.lo, width, buckets)
    mid = g.lo / 2 + g.hi / 2
    return (F.col("_v") >= F.lit(mid)).cast("bigint")


@dataclass
class _Group:
    """One contiguous candidate range still holding unresolved rank indices."""

    pred: Column | None  # conjunction of bucket-equality literals (root: None)
    lo: float  # exact min of the values this group's predicate selects
    hi: float  # exact max of the values this group's predicate selects
    offset: int  # number of column values strictly before this range
    count: int  # number of column values inside this range
    indices: list[int] = field(default_factory=list)  # 0-based sorted ranks


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    buckets: int = 8192,
    terminal_rows: int = 65536,
    max_levels: int = 256,
) -> list[float | None]:
    """Exact linear-interpolation quantiles of ``df[col]`` at probabilities
    ``ps`` — same answers as ``percentile(col, array(ps))`` but computed by
    distributed rank selection instead of a single-reducer value buffer.

    Runs eagerly (1 + levels + 1 scans of the single column, each with a
    push-down-able range pre-filter); returns driver-side floats.
    """
    if not ps:
        return []
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentage out of [0,1]: {p}")

    v = F.col(col).cast("double")
    vals = df.select(v.alias("_v")).where(F.col("_v").isNotNull())
    head = vals.agg(
        F.count("_v").alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
        F.max(F.isnan("_v").cast("int")).alias("has_nan"),
    ).collect()[0]
    n = head["n"]
    if n == 0:
        return [None] * len(ps)
    if head["has_nan"]:
        raise ValueError(f"{col} contains NaN — profile validated values")
    gmin, gmax = float(head["lo"]), float(head["hi"])
    if not (math.isfinite(gmin) and math.isfinite(gmax)):
        raise ValueError(f"{col} contains non-finite values")

    # 0-based sorted-position indices needed for interpolation.
    needed: set[int] = set()
    for p in ps:
        pos = p * (n - 1)
        needed.add(math.floor(pos))
        needed.add(math.ceil(pos))
    resolved: dict[int, float] = {}

    if gmin == gmax:
        resolved = {i: gmin for i in needed}
    else:
        groups = [_Group(None, gmin, gmax, 0, n, sorted(needed))]
        terminal: list[_Group] = []
        level = 0
        while groups:
            level += 1
            if level > max_levels:
                # unreachable outside adversarial full-exponent-range data;
                # raising beats silently handing an unbounded group to the
                # terminal distinct-value collect
                raise AssertionError(
                    f"quantile refinement of {col} did not converge in "
                    f"{max_levels} levels"
                )
            refine: list[_Group] = []
            for g in groups:
                width = (g.hi - g.lo) / buckets
                if (
                    g.count <= terminal_rows
                    or width <= 0.0
                    or g.lo + width == g.lo  # below ulp: ≤2 distinct values
                ):
                    terminal.append(g)
                else:
                    refine.append(g)
            if not refine:
                break

            # ONE scan for every group at this level: per-(group, bucket)
            # count + value min/max.  Children adopt the ACTUAL value span of
            # their bucket, so the range snaps to where the data lives.
            case = None
            pre_lo = min(g.lo for g in refine)
            pre_hi = max(g.hi for g in refine)
            for gi, g in enumerate(refine):
                be = _geometry(g, buckets)
                branch = F.struct(F.lit(gi).alias("g"), be.alias("b"))
                cond = F.lit(True) if g.pred is None else g.pred
                case = F.when(cond, branch) if case is None else case.when(cond, branch)
            hist = (
                vals.where(F.col("_v").between(pre_lo, pre_hi))
                .select(case.alias("gb"), "_v")
                .where(F.col("gb").isNotNull())
                .groupBy(F.col("gb.g").alias("g"), F.col("gb.b").alias("b"))
                .agg(
                    F.count("_v").alias("cnt"),
                    F.min("_v").alias("vmin"),
                    F.max("_v").alias("vmax"),
                )
                .collect()
            )
            by_group: dict[int, list[tuple[int, int, float, float]]] = {}
            for row in hist:
                by_group.setdefault(row["g"], []).append(
                    (row["b"], row["cnt"], row["vmin"], row["vmax"])
                )

            nxt: list[_Group] = []
            for gi, g in enumerate(refine):
                be = _geometry(g, buckets)
                cum = g.offset
                children: dict[int, _Group] = {}
                want = iter(g.indices)
                idx = next(want, None)
                for b, cnt, vmin, vmax in sorted(by_group.get(gi, [])):
                    while idx is not None and cum <= idx < cum + cnt:
                        child = children.get(b)
                        if child is None:
                            pred = be == F.lit(b)
                            if g.pred is not None:
                                pred = g.pred & pred
                            child = _Group(pred, vmin, vmax, cum, cnt)
                            children[b] = child
                        child.indices.append(idx)
                        idx = next(want, None)
                    cum += cnt
                if idx is not None:  # histogram lost rows — must never happen
                    raise AssertionError(
                        f"rank {idx} not covered by histogram of {col}"
                    )
                nxt.extend(children.values())
            groups = nxt

        if terminal:
            # ONE scan: distinct values + counts per terminal group (each
            # bounded by terminal_rows rows or by a sub-ulp value range).
            case = None
            pre_lo = min(g.lo for g in terminal)
            pre_hi = max(g.hi for g in terminal)
            for gi, g in enumerate(terminal):
                cond = F.lit(True) if g.pred is None else g.pred
                case = (
                    F.when(cond, F.lit(gi)) if case is None else case.when(cond, F.lit(gi))
                )
            rows = (
                vals.where(F.col("_v").between(pre_lo, pre_hi))
                .select(case.alias("g"), F.col("_v"))
                .where(F.col("g").isNotNull())
                .groupBy("g", "_v")
                .count()
                .collect()
            )
            by_group2: dict[int, list[tuple[float, int]]] = {}
            for row in rows:
                by_group2.setdefault(row["g"], []).append((row["_v"], row["count"]))
            for gi, g in enumerate(terminal):
                cum = g.offset
                want = iter(g.indices)
                idx = next(want, None)
                for value, cnt in sorted(by_group2.get(gi, [])):
                    while idx is not None and cum <= idx < cum + cnt:
                        resolved[idx] = value
                        idx = next(want, None)
                    cum += cnt
                if idx is not None:
                    raise AssertionError(
                        f"rank {idx} not covered by terminal pass of {col}"
                    )

    out: list[float | None] = []
    for p in ps:
        pos = p * (n - 1)
        lo_i, hi_i = math.floor(pos), math.ceil(pos)
        if lo_i == hi_i or resolved[lo_i] == resolved[hi_i]:
            # Spark Percentile.getPercentile short-circuits equal neighbor
            # values (interpolating would drift by 1 ulp).
            out.append(resolved[lo_i])
        else:
            # mirror Spark Percentile.getPercentile bit-for-bit: the weights
            # are (higher - pos) / (pos - lower) computed DIRECTLY — folding
            # them to 1-frac/frac can differ by 1 ulp on duplicate values.
            out.append(
                resolved[lo_i] * (hi_i - pos) + resolved[hi_i] * (pos - lo_i)
            )
    return out
