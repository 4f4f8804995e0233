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
* **Provably few levels.**  Each level shrinks a candidate range by ×B
  (default 8192 = 13 bits).  An IEEE double has 52 mantissa bits, so after
  ≤ ⌈52/13⌉+1 = 5 levels the range width is below 1 ulp and at most two
  distinct values remain — heavy duplicates therefore terminate via the
  tiny distinct-value pass no matter how large their row count.

Exactness argument: bucket assignment is
``clamp(floor((cast(v as double) - lo) / width), 0, B-1)`` with ``lo``/
``width`` embedded as literals.  The same IEEE-754 expression is evaluated
driver-side, so the next level's path predicate (``bucket_expr == k``)
selects EXACTLY the rows that were counted — no boundary slippage between
the histogram and the refinement filter.  The expression is monotone
non-decreasing in ``v`` (subtraction, division by a positive constant,
floor, clamp, and long→double cast are all monotone), so buckets are
order-contiguous and rank arithmetic over their counts is exact.

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


def _bucket_of(v: float, lo: float, width: float, buckets: int) -> int:
    """Driver-side mirror of :func:`_bucket_expr` (same IEEE-754 ops)."""
    return max(0, min(buckets - 1, math.floor((v - lo) / width)))


@dataclass
class _Group:
    """One contiguous candidate range still holding unresolved rank indices."""

    pred: Column | None  # conjunction of bucket-equality literals (root: None)
    lo: float
    hi: float
    offset: int  # number of column values strictly before this range
    count: int  # number of column values inside this range
    margin: float  # fp-slippage allowance for the (advisory) scan pre-filter
    indices: list[int] = field(default_factory=list)  # 0-based sorted ranks


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    buckets: int = 8192,
    terminal_rows: int = 65536,
    max_levels: int = 64,
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
        groups = [_Group(None, gmin, gmax, 0, n, 0.0, sorted(needed))]
        terminal: list[_Group] = []
        level = 0
        while groups:
            level += 1
            if level > max_levels:  # unreachable for IEEE doubles; belt+braces
                terminal.extend(groups)
                break
            refine: list[_Group] = []
            for g in groups:
                width = (g.hi - g.lo) / buckets
                if (
                    g.count <= terminal_rows
                    or width <= 0.0
                    or not math.isfinite(width)
                    or g.lo + width == g.lo  # below ulp: ≤2 distinct values
                ):
                    terminal.append(g)
                else:
                    refine.append(g)
            if not refine:
                break

            # ONE scan for every group at this level: histogram per (g, bucket).
            case = None
            pre_lo = min(g.lo - g.margin for g in refine)
            pre_hi = max(g.hi + g.margin for g in refine)
            for gi, g in enumerate(refine):
                width = (g.hi - g.lo) / buckets
                be = _bucket_expr(F.col("_v"), g.lo, width, buckets)
                branch = F.struct(F.lit(gi).alias("g"), be.alias("b"))
                cond = F.lit(True) if g.pred is None else g.pred
                case = F.when(cond, branch) if case is None else case.when(cond, branch)
            hist = (
                vals.where(F.col("_v").between(pre_lo, pre_hi))
                .select(case.alias("gb"))
                .where(F.col("gb").isNotNull())
                .groupBy(F.col("gb.g").alias("g"), F.col("gb.b").alias("b"))
                .count()
                .collect()
            )
            by_group: dict[int, list[tuple[int, int]]] = {}
            for row in hist:
                by_group.setdefault(row["g"], []).append((row["b"], row["count"]))

            nxt: list[_Group] = []
            for gi, g in enumerate(refine):
                width = (g.hi - g.lo) / buckets
                be = _bucket_expr(F.col("_v"), g.lo, width, buckets)
                cum = g.offset
                children: dict[int, _Group] = {}
                want = iter(g.indices)
                idx = next(want, None)
                for b, cnt in sorted(by_group.get(gi, [])):
                    while idx is not None and cum <= idx < cum + cnt:
                        child = children.get(b)
                        if child is None:
                            lo_b = g.lo if b == 0 else g.lo + b * width
                            hi_b = g.hi if b == buckets - 1 else g.lo + (b + 1) * width
                            pred = be == F.lit(b)
                            if g.pred is not None:
                                pred = g.pred & pred
                            child = _Group(
                                pred, lo_b, hi_b, cum, cnt, g.margin + width
                            )
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
            pre_lo = min(g.lo - g.margin for g in terminal)
            pre_hi = max(g.hi + g.margin for g in terminal)
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
