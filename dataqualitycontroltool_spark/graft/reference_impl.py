"""Independent row-at-a-time pandas implementation of the quality filter.

This is the TEST ORACLE for the north_rule's keep/drop F1 ≥ 0.99 and
scrubbed-caption exact-equality targets: a deliberately naive, sequential
re-statement of the pipeline semantics in the style of the reference tool's
per-value Python loops (`/root/reference/mipqctool/controller/
columnreport.py:264-278`).  It shares the deterministic models (codecs,
trigram langid, bigram LM, scrub regex list) but NONE of the Spark plan:
rule ordering, dedup semantics, short-circuiting and null handling are all
re-derived here independently, so any assembly bug in the Spark pipeline
shows up as an F1/equality miss.
"""

from __future__ import annotations

import pandas as pd

from dataqualitycontroltool_spark.graft import scrub
from dataqualitycontroltool_spark.graft.decode import check_bytes
from dataqualitycontroltool_spark.graft.langid import get_model
from dataqualitycontroltool_spark.graft.perplexity import get_lm
from dataqualitycontroltool_spark.graft.rules import RULE_ORDER, KeepDropConfig


def reference_labels(pdf: pd.DataFrame, cfg: KeepDropConfig | None = None) -> pd.DataFrame:
    """(image_id, keep, drop_reason, caption_scrubbed) computed row by row."""
    cfg = cfg or KeepDropConfig()
    langid_model = get_model()
    lm = get_lm()

    # global exact-dup keeper map (min image_id per phash)
    keeper: dict[int, str] = {}
    if cfg.dedupe_on:
        for _, r in pdf.iterrows():
            k = r[cfg.dedupe_on]
            if k not in keeper or r["image_id"] < keeper[k]:
                keeper[k] = r["image_id"]

    out = []
    for _, r in pdf.iterrows():
        cap = r["caption"]
        cap_missing = cap is None or (isinstance(cap, float) and pd.isna(cap)) or cap in cfg.missing_values
        failures = {}

        failures["missing_caption"] = cap_missing
        failures["bad_format"] = r["fmt"] not in cfg.formats
        failures["bad_dims"] = (
            r["w"] is None or r["h"] is None
            or not (cfg.min_w <= r["w"] <= cfg.max_w)
            or not (cfg.min_h <= r["h"] <= cfg.max_h)
        )
        ok, dw, dh, p = check_bytes(r["bytes"], r["fmt"])
        failures["decode_failed"] = not ok
        failures["dim_mismatch"] = ok and (dw != r["w"] or dh != r["h"])
        failures["low_psnr"] = (
            r["fmt"] in cfg.lossy_formats and (p is None or p < cfg.min_psnr_db)
        )
        failures["caption_length"] = not cap_missing and not (
            cfg.min_caption_chars <= len(cap) <= cfg.max_caption_chars
        )
        lang = langid_model.predict(None if cap_missing else cap)
        failures["bad_language"] = lang not in cfg.allowed_langs
        ppl = lm.perplexity(None if cap_missing else cap)
        failures["high_perplexity"] = ppl > cfg.max_perplexity
        if cfg.dedupe_on:
            failures["duplicate"] = keeper[r[cfg.dedupe_on]] != r["image_id"]

        reason = next((name for name in RULE_ORDER if failures.get(name)), None)
        out.append(
            {
                "image_id": r["image_id"],
                "keep": reason is None,
                "drop_reason": reason,
                "caption_scrubbed": None if cap_missing else scrub.scrub_text(cap),
            }
        )
    return pd.DataFrame(out)


def f1_score(expected: pd.Series, actual: pd.Series) -> float:
    """F1 of the keep class (BASELINE.json metric)."""
    tp = int(((expected) & (actual)).sum())
    fp = int((~expected & actual).sum())
    fn = int((expected & ~actual).sum())
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)
