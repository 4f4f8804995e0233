"""Distributed n-gram language-model training + perplexity scoring.

CCNet (Wenzek et al. 2020) filters a crawl by the perplexity of a KenLM
model trained on a trusted corpus (Wikipedia).  The graft's pandas-UDF
scorer (graft/perplexity.py) plays that role with a DRIVER-BUILT byte-bigram
table — fine for a fixed reference model, but a real pipeline trains the LM
on the corpus itself (or a trusted slice of it), and at 10^12 documents the
count tables cannot be built on a driver.  This module is the distributed
twin:

* :func:`train_bigram_lm` — token-bigram counts as a DataFrame
  ``(context, token, n)``: ONE explode + ONE hash aggregate (map-side
  partial reduces each task to its distinct bigrams before the exchange).
  The model IS a table — write it as parquet, version it, join it: no
  binary artifact, no driver memory, any engine can replay it.
* :func:`score_perplexity` — add-one-smoothed conditional log-probs and
  per-document perplexity ``exp(-mean(ln P(t|c)))`` as PURE Catalyst: the
  corpus's bigrams left-join the count table on (context, token), then the
  context totals on (context); unseen pairs back off to ``1/(n_c + V)``,
  unseen contexts to ``1/V`` (uniform over the vocabulary).  V and the
  per-context totals are computed IN-PLAN from the model table (1-row /
  per-context aggregates, cross-join + equi-join) — no driver scalar, no
  second pass over the corpus (the profile_numerical bounds pattern).

Scale shape: the expensive side is the corpus-bigram explode (Σ tokens
rows).  Both joins key on uniform token text; the model side has one row
per DISTINCT (context, token) — Zipf-hot contexts ("the") are one build
row each, and the probe side is AQE-skew-splittable.  No UDF anywhere: the
scorer runs inside whole-stage codegen, in contrast to the pandas-UDF path
that an external (KenLM/fastText) model needs.

Determinism contract (package-wide): each bigram's log-prob is a pure
function of integer counts, rounded to 9 decimals; the per-doc mean of
round-9 terms is stable to well below the final ``round(ppl, 6)``.

Reference tie-in: the perplexity score is the graft analogue of the
reference's numerical outlier bounds (mipqctool/model/qctypes/
numerical.py:73-102) — a scalar quality signal thresholded by the rule
engine; this module makes the signal trainable at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dataqualitycontroltool_spark.operators.dedup import let

# virtual start-of-document context.  The sentinel contains interior
# spaces, so it can NEVER collide with a real token: tokens come from a
# \s+ split and thus cannot contain whitespace (a literal "<s>" in HTML
# text WOULD survive tokenization and merge with document-start counts).
BOS = "< s >"


def _token_arr(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, context, token) — one row per bigram, BOS-prefixed; documents
    with NULL/blank text contribute nothing (split('') would fabricate a
    phantom empty token — same guard as graft/alignment.py)."""
    scorable = F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S")

    def pairs(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(t) - 1),
            lambda i: F.struct(
                F.when(i == 0, F.lit(BOS))
                .otherwise(F.element_at(t, i))  # element_at is 1-based
                .alias("context"),
                F.element_at(t, i + 1).alias("token"),
            ),
        )

    return (
        df.where(scorable)
        .select(
            F.col(id_col),
            F.explode(let(_token_arr(F.col(text_col)), pairs)).alias("bg"),
        )
        .select(id_col, F.col("bg.context").alias("context"),
                F.col("bg.token").alias("token"))
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Token-bigram count table ``(context, token, n)`` over the training
    corpus — the model-as-a-table artifact.  One explode + one map-side-
    combined hash aggregate; nothing touches the driver."""
    return (
        _bigram_rows(df, id_col, text_col)
        .groupBy("context", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def score_perplexity(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document add-one-smoothed bigram perplexity against ``lm``
    (a :func:`train_bigram_lm` table): (id, n_bigrams, ppl).

    ``P(t|c) = (n_ct + 1) / (n_c + V)`` when context ``c`` is known
    (``n_ct = 0`` for an unseen pair), else ``1 / V`` — V = the model's
    distinct successor-token vocabulary.  ``ppl = round(exp(-mean(round(
    ln P, 9))), 6)``.  Documents with no scorable text get NULL ``ppl``
    and 0 bigrams (treat-unscorable-as-invalid is the caller's rule).
    """
    ctx = lm.groupBy("context").agg(F.sum("n").alias("n_ctx"))
    vocab = lm.agg(F.countDistinct("token").alias("v"))

    bg = _bigram_rows(df, id_col, text_col)
    joined = (
        bg.join(lm, ["context", "token"], "left")
        .join(ctx, ["context"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.round(
        F.when(
            F.col("n_ctx").isNotNull(),
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + 1)
                / (F.col("n_ctx") + F.col("v")).cast("double")
            ),
        ).otherwise(-F.log(F.col("v").cast("double"))),
        9,
    )
    scored = (
        joined.select(id_col, logp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg("_lp")), 6).alias("ppl"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "ppl",
        )
    )


def _trigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, c2, c1, token) — one row per token with its two-token left
    context, double-BOS-padded so every token occurrence yields exactly one
    trigram (which is what lets lower orders derive by summation)."""
    scorable = F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S")

    def triples(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(t) - 1),
            lambda i: F.struct(
                F.when(i <= 1, F.lit(BOS)).otherwise(F.element_at(t, i - 1)).alias("c2"),
                F.when(i == 0, F.lit(BOS)).otherwise(F.element_at(t, i)).alias("c1"),
                F.element_at(t, i + 1).alias("token"),
            ),
        )

    return (
        df.where(scorable)
        .select(
            F.col(id_col),
            F.explode(let(_token_arr(F.col(text_col)), triples)).alias("tg"),
        )
        .select(id_col, "tg.c2", "tg.c1", F.col("tg.token").alias("token"))
    )


def train_backoff_lm(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Trigram count table ``(c2, c1, token, n)`` — the ONLY artifact a
    stupid-backoff model needs: because double-BOS padding gives every
    token occurrence exactly one trigram, bigram counts are the sum over
    ``c2`` and unigram counts the sum over ``(c2, c1)`` — the scorer
    derives both in-plan, so the persisted/versioned model stays one
    table.  One explode + one map-side-combined hash aggregate."""
    return (
        _trigram_rows(df, id_col, text_col)
        .groupBy("c2", "c1", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def score_perplexity_backoff(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    cache: bool = True,
) -> DataFrame:
    """Stupid-backoff (Brants et al. 2007, "Large Language Models in
    Machine Translation") trigram perplexity — the web-scale scheme:
    score S(t|c2,c1) = n3/n_ctx3 when the trigram is seen, else
    alpha * n2/n_ctx2 (bigram), else alpha^2 * n1/N (unigram MLE), else
    alpha^2 / (N + V) for OOV tokens; no discounting, no normalization —
    cheap and, at corpus scale, as good as Kneser-Ney.  Returns
    (id, n_trigrams, ppl) with ``ppl = round(exp(-mean(round(ln S, 9))),
    6)`` (round-9 term contract); unscorable docs get NULL ppl.

    Plan: the four model tables (trigram + derived bigram/unigram/context
    totals) are aggregates OF ``lm``; ``cache=True`` persists ``lm`` so
    they share one materialization instead of re-deriving a corpus-built
    model four times (caller owns unpersist — pass ``cache=False`` for a
    parquet-backed model table, where the scan is already cheap).  The
    probe side is one corpus explode + four left equi-joins on token
    text, all inside whole-stage codegen — no UDF."""
    if cache:
        lm = lm.persist()
    bi = lm.groupBy("c1", "token").agg(F.sum("n").alias("n2"))
    ctx3 = lm.groupBy("c2", "c1").agg(F.sum("n").alias("n_ctx3"))
    ctx2 = bi.groupBy("c1").agg(F.sum("n2").alias("n_ctx2"))
    uni = lm.groupBy("token").agg(F.sum("n").alias("n1"))
    tot = lm.agg(
        F.sum("n").alias("big_n"), F.countDistinct("token").alias("v")
    )

    tg = _trigram_rows(df, id_col, text_col)
    joined = (
        tg.join(lm.withColumnRenamed("n", "n3"), ["c2", "c1", "token"], "left")
        .join(ctx3, ["c2", "c1"], "left")
        .join(bi, ["c1", "token"], "left")
        .join(ctx2, ["c1"], "left")
        .join(uni, ["token"], "left")
        .crossJoin(F.broadcast(tot))
    )
    a = F.lit(float(alpha))
    score = (
        F.when(F.col("n3").isNotNull(), F.col("n3") / F.col("n_ctx3"))
        .when(F.col("n2").isNotNull(), a * F.col("n2") / F.col("n_ctx2"))
        .when(F.col("n1").isNotNull(), a * a * F.col("n1") / F.col("big_n"))
        .otherwise(a * a / (F.col("big_n") + F.col("v")))
    )
    scored = (
        joined.select(F.col(id_col), F.round(F.log(score), 9).alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.exp(-F.avg("_lp")), 6).alias("ppl"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            "ppl",
        )
    )
