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
precedence contract as the image rule engine, graft/rules.py).

Scale shape: stages 3-4 are pure projections; stage 1 is one hash
aggregate; stage 2 is the banded-LSH plan; the final assembly joins two
SMALL id sets (exact-dup losers, near-dup losers) back to the corpus —
both broadcast, so the `text` payload itself is scanned but never
shuffled."""

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
    {exact_duplicate, near_duplicate, low_quality, bad_language, null}."""
    c = F.col(text_col)

    # stage 1: exact-dup losers (everything but the smallest id per group)
    fp = dedup.content_fingerprint(c)
    groups = (
        df.select(fp.alias("_fp"), F.col(id_col))
        .groupBy("_fp")
        .agg(F.min(id_col).alias("_keep_id"), F.collect_list(id_col).alias("_ids"))
        .select(F.explode("_ids").alias(id_col), "_keep_id")
        .where(F.col(id_col) != F.col("_keep_id"))
        .select(id_col)
        .withColumn("_exact_loser", F.lit(True))
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
        df.select(F.col(id_col), quality.alias("_q"), lang.alias("_lang"))
        .join(F.broadcast(groups), on=id_col, how="left")
        .join(F.broadcast(near), on=id_col, how="left")
    )
    reason = (
        F.when(F.col("_exact_loser"), "exact_duplicate")
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
