"""Distributed bigram LM (operators/ngram_lm.py): counts and smoothed
perplexity vs an independent pure-Python reimplementation, backoff cases,
unscorable-text policy, and plan shape (no UDF)."""

import math

from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import ngram_lm


def _ref_bigrams(text):
    toks = text.strip().lower().split()
    return [(ngram_lm.BOS if i == 0 else toks[i - 1], toks[i])
            for i in range(len(toks))]


def _ref_score(text, lm_counts):
    ctx = {}
    vocab = set()
    for (c, t), n in lm_counts.items():
        ctx[c] = ctx.get(c, 0) + n
        vocab.add(t)
    v = len(vocab)
    lps = []
    for c, t in _ref_bigrams(text):
        if c in ctx:
            lps.append(round(math.log((lm_counts.get((c, t), 0) + 1)
                                      / (ctx[c] + v)), 9))
        else:
            lps.append(round(-math.log(v), 9))
    return round(math.exp(-sum(lps) / len(lps)), 6)


def test_train_counts_match_reference(spark):
    train = ["the cat sat", "the cat ran", "a dog sat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(train)],
                               "doc_id long, text string")
    lm = ngram_lm.train_bigram_lm(df)
    got = {(r.context, r.token): r.n for r in lm.collect()}
    ref = {}
    for t in train:
        for pair in _ref_bigrams(t):
            ref[pair] = ref.get(pair, 0) + 1
    assert got == ref
    assert got[(ngram_lm.BOS, "the")] == 2 and got[("the", "cat")] == 2


def test_score_matches_reference_incl_backoff(spark):
    train = ["the cat sat on the mat", "the dog sat"]
    tdf = spark.createDataFrame([(i, t) for i, t in enumerate(train)],
                                "doc_id long, text string")
    lm = ngram_lm.train_bigram_lm(tdf)
    lm_counts = {(r.context, r.token): r.n for r in lm.collect()}
    score_texts = [
        "the cat sat",          # all pairs seen
        "the mat ran",          # seen context, unseen pair
        "zebra quantum flux",   # unseen contexts -> 1/V backoff
        "sat",                  # single token: one (<s>, sat) bigram
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_texts)] + [(90, None), (91, " \t ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           ngram_lm.score_perplexity(sdf, lm).collect()}
    for i, t in enumerate(score_texts):
        assert out[i].n_bigrams == len(_ref_bigrams(t)), t
        assert out[i].ppl == _ref_score(t, lm_counts), t
    # NULL and blank text: unscorable -> 0 bigrams, NULL ppl
    assert (out[90].n_bigrams, out[90].ppl) == (0, None)
    assert (out[91].n_bigrams, out[91].ppl) == (0, None)
    # sanity: in-domain text is less perplexing than the uniform backoff
    assert out[0].ppl < out[2].ppl


def test_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "b c d")],
                               "doc_id long, text string")
    lm = ngram_lm.train_bigram_lm(df)
    plan = (ngram_lm.score_perplexity(df, lm)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan  # no UDF: the model is a table, joins score it


# --------------------------------------------------------------------------
# trigram stupid backoff
# --------------------------------------------------------------------------


def _ref_trigrams(text):
    toks = text.strip().lower().split()
    out = []
    for i in range(len(toks)):
        c2 = ngram_lm.BOS if i <= 1 else toks[i - 2]
        c1 = ngram_lm.BOS if i == 0 else toks[i - 1]
        out.append((c2, c1, toks[i]))
    return out


def _ref_backoff_score(text, tri_counts, alpha=0.4):
    bi, ctx3, ctx2, uni = {}, {}, {}, {}
    big_n, vocab = 0, set()
    for (c2, c1, t), n in tri_counts.items():
        bi[(c1, t)] = bi.get((c1, t), 0) + n
        ctx3[(c2, c1)] = ctx3.get((c2, c1), 0) + n
        ctx2[c1] = ctx2.get(c1, 0) + n
        uni[t] = uni.get(t, 0) + n
        big_n += n
        vocab.add(t)
    v = len(vocab)
    lps = []
    for c2, c1, t in _ref_trigrams(text):
        if (c2, c1, t) in tri_counts:
            s = tri_counts[(c2, c1, t)] / ctx3[(c2, c1)]
        elif (c1, t) in bi:
            s = alpha * bi[(c1, t)] / ctx2[c1]
        elif t in uni:
            s = alpha * alpha * uni[t] / big_n
        else:
            s = alpha * alpha / (big_n + v)
        lps.append(round(math.log(s), 9))
    return round(math.exp(-sum(lps) / len(lps)), 6)


def test_backoff_train_counts_match_reference(spark):
    train = ["the cat sat on the mat", "the cat ran away", "a dog sat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(train)],
                               "doc_id long, text string")
    lm = ngram_lm.train_backoff_lm(df)
    got = {(r.c2, r.c1, r.token): r.n for r in lm.collect()}
    ref = {}
    for t in train:
        for tri in _ref_trigrams(t):
            ref[tri] = ref.get(tri, 0) + 1
    assert got == ref
    assert got[(ngram_lm.BOS, ngram_lm.BOS, "the")] == 2 and got[(ngram_lm.BOS, "the", "cat")] == 2


def test_backoff_score_matches_reference_all_levels(spark):
    train = ["the cat sat on the mat", "the dog sat"]
    tdf = spark.createDataFrame([(i, t) for i, t in enumerate(train)],
                                "doc_id long, text string")
    lm = ngram_lm.train_backoff_lm(tdf)
    tri_counts = {(r.c2, r.c1, r.token): r.n for r in lm.collect()}
    score_texts = [
        "the cat sat on the mat",  # every trigram seen
        "a cat sat",               # trigram unseen, bigram (cat,sat) seen
        "mat dog the",             # only unigrams seen
        "zebra quantum flux",      # full OOV floor
    ]
    # unscorable shapes: whitespace-only, empty string, NULL
    rows = [(i, t) for i, t in enumerate(score_texts)] + [
        (4, "   "), (5, ""), (6, None)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           ngram_lm.score_perplexity_backoff(sdf, lm, cache=False).collect()}
    for i, t in enumerate(score_texts):
        assert out[i].ppl == _ref_backoff_score(t, tri_counts), t
        assert out[i].n_trigrams == len(t.split())
    for i in (4, 5, 6):
        assert out[i].ppl is None and out[i].n_trigrams == 0
    # seen text scores lower perplexity than the OOV one
    assert out[0].ppl < out[3].ppl


def test_backoff_scorer_plan_has_no_udf(spark):
    tdf = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    lm = ngram_lm.train_backoff_lm(tdf)
    out = ngram_lm.score_perplexity_backoff(tdf, lm, cache=False)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_literal_s_token_does_not_collide_with_bos(spark):
    """ADVICE r3: a literal '<s>' token in corpus text (e.g. an HTML tag
    surviving whitespace tokenization) must stay a REAL token, distinct
    from the document-start sentinel."""
    df = spark.createDataFrame([(0, "<s> the <s>")], "doc_id long, text string")
    got = {(r.context, r.token): r.n
           for r in ngram_lm.train_bigram_lm(df).collect()}
    assert got == {
        (ngram_lm.BOS, "<s>"): 1,
        ("<s>", "the"): 1,
        ("the", "<s>"): 1,
    }
    assert " " in ngram_lm.BOS  # unreachable via a \s+ split by construction
