"""Text analysis for training-data pipelines — token counting, quality
scoring, marker-based language ID, document fingerprinting — all pure
Catalyst column expressions (zero shuffle, zero Python, whole-stage codegen).

Reference lineage: these are the text-column analogues of the per-column
profilers (``model/qctypes/text.py:62-78``) and the heuristic rule engine the
graft re-expresses (``controller/columnreport.py:264-278`` keep/drop
bucketing) — per-row derived metrics plus a boolean keep decision, exactly
the C4/Gopher-style quality-filter shape.

Everything here is a deterministic function of the text value, so every
output is DuckDB-oracle-checkable; the trigram langid pandas-UDF
(``graft/langid.py``) remains the model-based scale path for real corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dataqualitycontroltool_spark.operators.dedup import content_fingerprint, shingles, tokens

# BPE-ish word/number/symbol split — conservative regex that parses
# identically under Java regex (Spark) and RE2-flavored engines (DuckDB).
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

STOPWORDS = ("a", "an", "the", "of", "and", "in", "to", "is", "it", "on")

# function-word markers per language; scores are hit-counts of whole tokens
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "de", "que"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
}


def token_count_ws(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank."""
    t = tokens(text)
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(t))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: runs of letters / digits / other symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), F.lit(0)))


def _count_in(t: Column, words: tuple[str, ...]) -> Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(t, lambda x: F.array_contains(lst, x)))


def quality_struct(text: Column) -> Column:
    """ALL quality signals as ONE struct from ONE let-bound tokenization —
    at 10^12 rows the naive form re-runs the regex split once per metric
    (CollapseProject re-inlines it; see dedup.let)."""
    from dataqualitycontroltool_spark.operators.dedup import let

    def build(t: Column) -> Column:
        n = F.size(t)
        total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
        alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
        return F.struct(
            F.length(text).alias("n_chars"),
            F.when(F.trim(text) == "", F.lit(0)).otherwise(n).alias("n_tokens"),
            token_count_bpe(text).alias("n_tokens_bpe"),
            F.round(total_len / n, 6).alias("mean_token_len"),
            F.round(alpha / F.length(text), 6).alias("alpha_ratio"),
            F.round(_count_in(t, STOPWORDS) / n, 6).alias("stopword_ratio"),
        )

    return let(tokens(text), build)


QUALITY_FIELDS = ("n_chars", "n_tokens", "n_tokens_bpe", "mean_token_len",
                  "alpha_ratio", "stopword_ratio")


def quality_metrics(text: Column) -> dict[str, Column]:
    """Per-document quality signals (all double/int, 6-decimal rounded).
    Convenience view over :func:`quality_struct`; when selecting SEVERAL
    metrics, select the struct once instead (each dict entry re-evaluates
    the struct expression per reference)."""
    s = quality_struct(text)
    return {name: s[name] for name in QUALITY_FIELDS}


def quality_keep(
    text: Column,
    min_tokens: int = 30,
    max_tokens: int = 1000,
    min_mean_len: float = 2.5,
    max_mean_len: float = 8.0,
    min_alpha: float = 0.6,
) -> Column:
    """Gopher/C4-style keep decision from the quality signals."""
    from dataqualitycontroltool_spark.operators.dedup import let

    def decide(s: Column) -> Column:
        return (
            s["n_tokens"].between(min_tokens, max_tokens)
            & s["mean_token_len"].between(min_mean_len, max_mean_len)
            & (s["alpha_ratio"] >= min_alpha)
        )

    return let(quality_struct(text), decide)


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality table: (id, n_chars, n_tokens, n_tokens_bpe,
    mean_token_len, alpha_ratio, stopword_ratio, keep) — a single projection
    over ONE let-bound struct (one tokenization per row), no shuffle; at
    10^12 rows this is a pure map stage over the scan."""
    from dataqualitycontroltool_spark.operators.dedup import let

    def expand(s: Column) -> Column:
        keep = (
            s["n_tokens"].between(30, 1000)
            & s["mean_token_len"].between(2.5, 8.0)
            & (s["alpha_ratio"] >= 0.6)
        )
        return F.struct(*[s[n].alias(n) for n in QUALITY_FIELDS], keep.alias("keep"))

    out = let(quality_struct(F.col(text_col)), expand)
    return df.select(F.col(id_col), out.alias("_m")).select(
        id_col, *[F.col(f"_m.{n}") for n in (*QUALITY_FIELDS, "keep")]
    )


def lang_marker_id(text: Column) -> Column:
    """Deterministic function-word language ID: hit-count per language's
    marker list, argmax with ties broken by language code ascending; zero
    hits → 'und'.  (A heuristic stand-in for fastText, chosen because it is
    exactly replayable in SQL; the trigram pandas-UDF in graft/langid.py is
    the model path.)  Compiles to the same CASE chain as the oracle:
    lang L wins iff score_L > 0 and score_L >= score of every later lang."""
    t = tokens(text)
    scores = {lang: _count_in(t, words) for lang, words in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    expr = F.lit("und")
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for later in langs:
            if later > lang:
                cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_marker_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, score) — per-doc marker language ID with its score."""
    t = tokens(F.col(text_col))
    scores = {lang: _count_in(t, words) for lang, words in LANG_MARKERS.items()}
    return df.select(
        F.col(id_col),
        lang_marker_id(F.col(text_col)).alias("lang_pred"),
        F.greatest(*scores.values()).alias("score"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf:
    (id, term, tf, score, rank).

    Formula pinned for cross-engine replay: idf = ln(N / df_t) (no
    smoothing), score = round(tf · idf, 6); ties by term ascending.

    Plan: token explode → (doc, term) count [1 shuffle, partial agg] →
    document frequency per term [aggregates the previous result — terms are
    already reduced] → broadcast-join idf (distinct-term table is small
    relative to the corpus) → per-doc window top-k.  Hot terms are pre-
    reduced before the window, so skewed vocabularies don't hot-spot.

    N (the idf numerator) is computed INSIDE the plan as a 1-row
    countDistinct aggregate broadcast-cross-joined into the term table —
    not a driver ``.count()``, which would be a second full corpus scan
    plus an eager action at plan-construction time (r2 verdict #3; same
    pattern as profile_numerical's bounds)."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("_n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term", F.log(F.col("_n_docs") / F.col("df_t")).alias("idf")
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        id_col, "term", "tf", F.round(F.col("tf") * F.col("idf"), 6).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def fingerprint_table(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Document fingerprints: (id, content_fp, min_shingle_fp).

    ``content_fp`` is the exact-dedup key (md5 of normalized text);
    ``min_shingle_fp`` is a winnowing-style 1-perm MinHash (min md5 over
    k-token shingles) — a cheap near-dup prefilter key.  Pure map stage."""
    c = F.col(text_col)
    sh = shingles(c, k)
    min_fp = F.array_min(F.transform(sh, lambda x: F.md5(x)))
    return df.select(
        F.col(id_col),
        content_fingerprint(c).alias("content_fp"),
        min_fp.alias("min_shingle_fp"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: (id, n_lines,
    dup_line_frac, top_bigram_frac) — repetitious web text (boilerplate,
    listicles, SEO spam) shows high duplicate-line and top-n-gram mass
    even when the length/alpha quality gates pass.

    * ``dup_line_frac`` — 1 - distinct/total over non-blank lines; pure
      per-row Catalyst (no shuffle).
    * ``top_bigram_frac`` — occurrences of the most frequent token bigram
      / total bigram occurrences; one explode + hash-aggregate per
      (doc, bigram), max/sum recombined in the same aggregate pass over
      the doc — the count table is pre-reduced map-side, so a skewed doc
      (millions of tokens) shuffles one row per DISTINCT bigram, not per
      token.
    """
    from dataqualitycontroltool_spark.operators.dedup import let, shingles

    def line_stats(lines: Column) -> Column:
        n = F.size(lines)
        frac = F.round(
            1.0 - F.size(F.array_distinct(lines)) / n, 6
        )
        return F.struct(
            n.alias("n_lines"),
            F.when(n > 0, frac).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        )

    nonblank = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != ""
    )
    base = df.select(F.col(id_col), let(nonblank, line_stats).alias("_ls"))

    grams = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), 2)).alias("_g")
    )
    per_gram = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_n"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.round(F.max("_n") / F.sum("_n"), 6).alias("top_bigram_frac")
    )
    return (
        base.join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.col("_ls.n_lines").alias("n_lines"),
            F.col("_ls.dup_line_frac").alias("dup_line_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def hygiene_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Encoding-damage signals — the C4-style 'drop pages with broken
    text' rule: per doc the count of C0 + DEL + C1 control characters
    (tab, LF and CR excluded — they are structure, not damage; C1
    U+0080-U+009F is the archetypal CP-1252-mojibake residue), of U+FFFD
    replacement characters (the residue of a bad charset transcode), and
    a ``clean`` flag when both are zero.  Pure let-free Catalyst
    projection (two regexp_replace length deltas), one scan, no shuffle.

    Counts are char-length deltas so the cost is two regex passes per
    row regardless of damage density; ``printable_ratio`` rounds to 6 for
    cross-engine replay."""
    n = F.length(F.col(text_col))
    ctrl = n - F.length(
        F.regexp_replace(
            F.col(text_col),
            "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-]",
            "",
        )
    )
    repl = n - F.length(F.regexp_replace(F.col(text_col), "�", ""))
    return df.select(
        F.col(id_col),
        ctrl.cast("bigint").alias("n_control"),
        repl.cast("bigint").alias("n_replacement"),
        F.round(
            F.lit(1.0) - (ctrl + repl) / F.greatest(n, F.lit(1)), 6
        ).alias("printable_ratio"),
        ((ctrl == 0) & (repl == 0)).alias("clean"),
    )
