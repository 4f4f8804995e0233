"""Caption–image alignment scoring (CLIP-score-style quality filtering).

LAION-style corpora keep an image+caption pair only when a cross-modal
similarity score clears a threshold.  The real encoder is a neural model;
this sandbox has none, so the CAPTION side uses **feature hashing** (a real,
published technique — Weinberger et al. 2009 — not a stub): each token is
md5-hashed into one of ``dim`` slots with a ±1 sign, giving a sparse
bag-of-words embedding that is deterministic and replayable in any engine.
The IMAGE side is whatever ``dim``-wide vector column the caller provides —
the block-mean features of ``operators/multimodal.py``, a stored CLIP
embedding, or anything else of the same width.  A production deployment
swaps the hashing expression for a model-backed pandas UDF with the SAME
column contract; every join/filter/threshold downstream is unchanged.

Scale shape: the caption embedding is ONE pure-Catalyst projection (no UDF,
no shuffle, no Python) — `split` → per-token md5 slot/sign (let-bound so the
hash runs once per token) → a ``dim``-slot fold.  The cosine is a
`zip_with`/`aggregate` fold over the two vectors.  At 10^12 rows the whole
score is map-side work inside whole-stage codegen; only the caller's join
(caption table × embedding table, co-partitioned on the pair id) shuffles.

Float determinism contract (same as the rest of the package): the dot
product and the norm product are rounded to 9 decimals BEFORE the divide and
the final score to 6, so Spark's left-to-right dense fold and an engine
summing the sparse terms in any order agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dataqualitycontroltool_spark.operators.dedup import let

HEX = "0123456789abcdef"


def caption_embedding(
    text: Column, dim: int = 64, seed: str = "s1"
) -> Column:
    """``array<bigint>`` feature-hashed bag-of-words embedding of ``text``.

    Slot ``conv(md5(seed:token)[0:2], 16, 10) % dim`` (dim <= 256), sign
    ``±1`` from hex digit 3's low bit; repeated tokens accumulate.  NULL
    and blank (empty / whitespace-only) text yield NULL — ``split('')``
    would otherwise produce one phantom empty-string token whose one-hot
    vector could score a real alignment and let an empty caption pass the
    quality filter.  Pure Catalyst — the md5 is let-bound so it runs once
    per token, not once per (slot, sign) reference.
    """
    if not 1 <= dim <= 256:
        raise ValueError(f"dim must be in [1, 256], got {dim}")
    toks = F.split(F.trim(F.lower(text)), r"\s+")

    def slot_sign(t: Column) -> Column:
        return let(
            F.md5(F.concat(F.lit(seed + ":"), t)),
            lambda m: F.struct(
                (F.conv(F.substring(m, 1, 2), 16, 10).cast("int") % dim).alias(
                    "idx"
                ),
                (
                    F.conv(F.substring(m, 3, 1), 16, 10).cast("int") % 2 * 2 - 1
                ).alias("sgn"),
            ),
        )

    def fold(hs: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.aggregate(
                hs,
                F.lit(0).cast("bigint"),
                lambda acc, x: acc
                + F.when(x["idx"] == d, x["sgn"].cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                ),
            ),
        )

    # rlike, not trim() == '': Spark's trim strips only U+0020, so a
    # tab/newline-only caption would still fabricate the phantom token
    return F.when(
        text.isNotNull() & text.rlike(r"\S"),
        let(F.transform(toks, slot_sign), fold),
    )


def cosine(a: Column, b: Column) -> Column:
    """round-6 cosine of two equal-width numeric arrays with the round-9
    pre-divide contract; NULL when either norm is 0 (or either side NULL).

    Every operand is let-bound: CollapseProject would otherwise re-inline
    ``a`` into all 5 reference sites (num + the two self-products in den +
    the CASE duplicate) — measured 5 copies of the caption-hash expression
    in the executed plan before the binding."""

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def score(av: Column, bv: Column) -> Column:
        nd = F.struct(
            F.round(dot(av, bv), 9).alias("n"),
            F.round(F.sqrt(dot(av, av)) * F.sqrt(dot(bv, bv)), 9).alias("d"),
        )
        return let(
            nd, lambda x: F.when(x["d"] > 0, F.round(x["n"] / x["d"], 6))
        )

    return let(a, lambda av: let(b, lambda bv: score(av, bv)))


def alignment_scores(
    df: DataFrame,
    caption_col: str = "caption",
    image_vec_col: str = "image_vec",
    dim: int = 64,
    seed: str = "s1",
    out_col: str = "alignment",
) -> DataFrame:
    """Adds ``out_col`` = cosine(feature-hashed caption, image vector).
    ``image_vec_col`` must be an ``array`` of width ``dim``.  Pure
    projection — compose with a threshold filter for the keep decision."""
    return df.withColumn(
        out_col,
        cosine(
            caption_embedding(F.col(caption_col), dim=dim, seed=seed),
            F.col(image_vec_col),
        ),
    )


def alignment_filter(
    df: DataFrame,
    threshold: float,
    caption_col: str = "caption",
    image_vec_col: str = "image_vec",
    dim: int = 64,
    seed: str = "s1",
) -> DataFrame:
    """Keep/drop on the alignment score: adds ``alignment`` and boolean
    ``keep`` (NULL score — NULL caption, zero norm — is a drop, matching the
    package-wide treat-unscorable-as-invalid policy)."""
    scored = alignment_scores(
        df, caption_col=caption_col, image_vec_col=image_vec_col,
        dim=dim, seed=seed,
    )
    return scored.withColumn(
        "keep", F.coalesce(F.col("alignment") >= threshold, F.lit(False))
    )
