"""Text-corpus curation — the documents twin of the image quality-filter
pipeline (graft/pipeline.py): one declarative plan producing per-document
keep/drop decisions with pinned drop reasons and lineage counts.

Stages (all composable operators from this package):
1. exact dedup     — md5 content fingerprint, survivor = smallest id;
2. near dedup      — MinHash+LSH verified Jaccard >= threshold; the LARGER
                     id of every near-dup pair is dropped (greedy pairwise
                     keep-smallest — deterministic and engine-replayable;
                     full connected-components resolution is an iterative
                     refinement left to the orchestrator when clusters
                     chain, documented trade);
3. quality         — Gopher/C4-style signals (textstats.quality_keep);
4. language        — marker language-ID ∈ allowed set.

Drop reason is the FIRST failing stage in the order above (same pinned-
precedence contract as the image rule engine, graft/rules.py); NULL text
short-circuits everything with its own reason (a null/unparseable doc must
never pass the gate by predicate-NULL fallthrough).

Scale shape: stages 3-4 are pure projections; stage 1 is one hash
aggregate joined back on the fingerprint (no per-group id arrays — a
boilerplate fingerprint with millions of members stays a 1-row aggregate,
never a giant collect_list row); stage 2 is the banded-LSH plan.  The
loser sets join back to the corpus as PLAIN equi-joins on uniform keys —
no broadcast hints: on a duplicate-heavy crawl (30-50% losers is normal
for web corpora) the loser sets are O(corpus), and AQE will still pick a
broadcast join at runtime when they happen to be small."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataqualitycontroltool_spark.operators import dedup, textstats

DEFAULT_ALLOWED_LANGS = ("en", "es", "de", "fr")


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    allowed_langs: tuple = DEFAULT_ALLOWED_LANGS,
) -> DataFrame:
    """(id, keep, drop_reason) per document; drop_reason ∈
    {null_text, exact_duplicate, near_duplicate, low_quality, bad_language,
    null}."""
    c = F.col(text_col)

    # stage 1: exact-dup groups (fingerprint, survivor) joined back on the
    # fingerprint — a doc is a loser iff its group has >1 member and it is
    # not the survivor.  NULL fingerprints (null text) never join, so null
    # docs fall through to the null_text reason below.
    fp = dedup.content_fingerprint(c)
    groups = dedup.exact_duplicate_groups(df, id_col, text_col).select(
        F.col("fingerprint").alias("_fp"), F.col("survivor_id").alias("_keep_id")
    )

    # stage 2: near-dup losers (larger id of each verified pair)
    near = (
        dedup.minhash_lsh_pairs(df, id_col, text_col, threshold=jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_near_loser", F.lit(True))
    )

    quality = textstats.quality_keep(c)
    lang = textstats.lang_marker_id(c)

    out = (
        df.select(
            F.col(id_col),
            fp.alias("_fp"),
            c.isNull().alias("_null_text"),
            quality.alias("_q"),
            lang.alias("_lang"),
        )
        .join(groups, on="_fp", how="left")
        .join(near, on=id_col, how="left")
    )
    reason = (
        F.when(F.col("_null_text"), "null_text")
        .when(F.col("_keep_id").isNotNull() & (F.col(id_col) != F.col("_keep_id")),
              "exact_duplicate")
        .when(F.col("_near_loser"), "near_duplicate")
        .when(~F.col("_q"), "low_quality")
        .when(~F.col("_lang").isin(*allowed_langs), "bad_language")
    )
    return out.select(
        id_col,
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def curation_lineage(curated: DataFrame) -> DataFrame:
    """Corpus-level lineage row: totals per drop reason + kept count."""
    return (
        curated.groupBy(F.coalesce("drop_reason", F.lit("kept")).alias("outcome"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
