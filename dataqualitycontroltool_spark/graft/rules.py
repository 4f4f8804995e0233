"""Keep/drop heuristic rule engine — pure Catalyst column expressions.

The reference's per-column constraint checks
(`/root/reference/mipqctool/model/qcfrictionless/qcfield.py:51-62`, value
domains and min/max from `model/qctypes/*.py`) re-expressed over the image
table: every rule is one boolean ``Column``; the drop reason is the FIRST
failing rule in a pinned order (deterministic, like the reference's
missing → dtype → constraint bucketing in
`controller/columnreport.py:264-278`).

No UDF here — langid/perplexity/decode arrive as already-computed columns;
the rule engine itself is whole-stage-codegen ``when`` chains, so Catalyst
can push the cheap metadata rules (fmt/w/h/caption) below the expensive
UDF stages where legal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from dataqualitycontroltool_spark.graft.decode import MIN_PSNR_DB
from dataqualitycontroltool_spark.graft.synth import ALLOWED_LANGS


@dataclass(frozen=True)
class KeepDropConfig:
    """Thresholds of the quality filter (defaults match BENCH + tests)."""

    min_w: int = 16
    max_w: int = 4096
    min_h: int = 16
    max_h: int = 4096
    formats: tuple = ("png", "jpeg", "webp")
    lossy_formats: tuple = ("jpeg", "webp")
    min_caption_chars: int = 12
    max_caption_chars: int = 2000
    allowed_langs: tuple = tuple(ALLOWED_LANGS)
    # in-domain captions score ~37-55 under the bigram LM, gibberish ~150+
    max_perplexity: float = 80.0
    min_psnr_db: float = MIN_PSNR_DB
    dedupe_on: str = "phash"  # exact-duplicate key; '' disables
    # >0: merge phash values within this hamming distance into one duplicate
    # group (pipeline.hamming_dedup_index) — near-dup images share a
    # perceptual hash only up to a few flipped bits; 0 = exact equality
    dedupe_hamming: int = 0

    missing_values: tuple = ("",)


# pinned evaluation order → deterministic drop_reason
RULE_ORDER = (
    "missing_caption",
    "bad_format",
    "bad_dims",
    "decode_failed",
    "dim_mismatch",
    "low_psnr",
    "caption_length",
    "bad_language",
    "high_perplexity",
    "duplicate",
)


def rule_columns(cfg: KeepDropConfig) -> dict[str, Column]:
    """rule name → 'row violates this rule' boolean.

    Expects columns: w h fmt caption phash lang ppl decode_ok dec_w dec_h
    psnr_db is_dup (is_dup present only when dedupe is enabled).
    """
    cap = F.col("caption")
    cap_missing = cap.isNull() | cap.isin(*cfg.missing_values)
    rules: dict[str, Column] = {
        "missing_caption": cap_missing,
        "bad_format": ~F.col("fmt").isin(*cfg.formats) | F.col("fmt").isNull(),
        "bad_dims": (
            F.col("w").isNull() | F.col("h").isNull()
            | (F.col("w") < cfg.min_w) | (F.col("w") > cfg.max_w)
            | (F.col("h") < cfg.min_h) | (F.col("h") > cfg.max_h)
        ),
        "decode_failed": ~F.coalesce(F.col("decode_ok"), F.lit(False)),
        "dim_mismatch": (F.col("dec_w") != F.col("w")) | (F.col("dec_h") != F.col("h")),
        "low_psnr": F.col("fmt").isin(*cfg.lossy_formats)
        & (F.coalesce(F.col("psnr_db"), F.lit(0.0)) < cfg.min_psnr_db),
        "caption_length": ~cap_missing
        & (
            (F.length(cap) < cfg.min_caption_chars)
            | (F.length(cap) > cfg.max_caption_chars)
        ),
        "bad_language": ~F.col("lang").isin(*cfg.allowed_langs),
        "high_perplexity": F.coalesce(F.col("ppl"), F.lit(float("inf")))
        > cfg.max_perplexity,
    }
    if cfg.dedupe_on:
        rules["duplicate"] = F.coalesce(F.col("is_dup"), F.lit(False))
    return rules


def apply_rules(df: DataFrame, cfg: KeepDropConfig) -> DataFrame:
    """Adds ``keep`` (bool) and ``drop_reason`` (first failing rule or NULL)."""
    rules = rule_columns(cfg)
    reason = F.lit(None).cast("string")
    for name in reversed([r for r in RULE_ORDER if r in rules]):
        reason = F.when(rules[name], F.lit(name)).otherwise(reason)
    return df.withColumns({"drop_reason": reason, "keep": reason.isNull()})
