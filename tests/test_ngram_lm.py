"""Distributed bigram LM (operators/ngram_lm.py): counts and smoothed
perplexity vs an independent pure-Python reimplementation, backoff cases,
unscorable-text policy, and plan shape (no UDF)."""

import math

from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import ngram_lm


def _ref_bigrams(text):
    toks = text.strip().lower().split()
    return [("<s>" if i == 0 else toks[i - 1], toks[i])
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
    assert got[("<s>", "the")] == 2 and got[("the", "cat")] == 2


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
