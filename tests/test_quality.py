"""Repetition-quality signals + decontamination (operators/quality.py).

Hand-computed expectations on tiny corpora, edge cases (blank text,
docs shorter than n), and partitioning invariance — the signals are
per-document, so the answer must not depend on physical layout.
"""

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rep_map(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_token_frac"],
            r["dup_ngram_frac"],
            r["top_ngram_frac"],
        )
        for r in df.collect()
    }


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        docs = _docs(
            spark,
            [
                # "a a a a": 4 tokens, 1 distinct -> dup_token 0.75;
                # 2-grams = ["a a"]x3, all duplicated -> dup 1.0, top 1.0
                (1, "a a a a"),
                # all-distinct tokens: 2-grams all unique -> 0.0 / x
                # top gram count 1 of 3 positions -> 1/3
                (2, "w x y z"),
                # "a b a b a": grams [ab, ba, ab, ba] -> dup 1.0,
                # top = 2/4; tokens 5, distinct 2 -> dup_token 0.6
                (3, "a b a b a"),
            ],
        )
        got = _rep_map(Q.repetition_signals(docs, n=2))
        assert got[1] == (4, 0.75, 1.0, 1.0)
        assert got[2] == (4, 0.0, 0.0, 0.333333)
        assert got[3] == (5, 0.6, 1.0, 0.5)

    def test_short_and_blank_docs_survive(self, spark):
        docs = _docs(spark, [(1, "solo"), (2, ""), (3, "   ")])
        got = _rep_map(Q.repetition_signals(docs, n=2))
        # no n-grams at all -> zero fractions, rows still present
        assert got[1] == (1, 0.0, 0.0, 0.0)
        assert got[2] == (0, 0.0, 0.0, 0.0)
        assert got[3] == (0, 0.0, 0.0, 0.0)

    def test_partitioning_invariant(self, spark):
        rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 7} tok{i % 5}") for i in range(40)]
        docs = _docs(spark, rows)
        one = sorted(Q.repetition_signals(docs.repartition(1), n=2).collect())
        many = sorted(Q.repetition_signals(docs.repartition(8), n=2).collect())
        assert one == many


class TestDecontaminate:
    def test_known_overlap(self, spark):
        ev = _docs(spark, [(100, "the quick brown fox")])
        tr = _docs(
            spark,
            [
                # contains eval 3-gram "quick brown fox" (1 of 3 positions)
                (1, "a quick brown fox ran"),
                # no 3-gram overlap
                (2, "a slow red fox ran"),
                # two overlapping positions out of 4
                (3, "the quick brown fox jumps x"),
            ],
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contamination_frac"])
            for r in Q.decontaminate(tr, ev, n=3).collect()
        }
        assert got == {1: (3, 1, 0.333333), 3: (4, 2, 0.5)}

    def test_short_train_doc_excluded(self, spark):
        ev = _docs(spark, [(100, "a b c")])
        tr = _docs(spark, [(1, "a b")])  # shorter than n -> no grams
        assert Q.decontaminate(tr, ev, n=3).count() == 0

    def test_plan_broadcasts_eval_side(self, spark):
        ev = _docs(spark, [(100, "a b c d")])
        tr = _docs(spark, [(1, "a b c d e")])
        plan = Q.decontaminate(tr, ev, n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_ngram_sequence_guard(self, spark):
        # word_ngrams must not emit descending sequences for short docs
        df = _docs(spark, [(1, "a")]).select(
            Q.word_ngrams(F.col("text"), 3).alias("g")
        )
        assert df.collect()[0]["g"] == []



class TestPropertyOracle:
    """Property check: repetition_signals and decontaminate agree with
    independent pure-Python references on randomized corpora."""

    def test_rep_signals_vs_python_reference(self, spark):
        import random as rnd
        from collections import Counter

        r = rnd.Random(77)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (i, " ".join(r.choice(vocab) for _ in range(r.randint(0, 30))))
            for i in range(60)
        ]
        got = {
            row["doc_id"]: row
            for row in Q.repetition_signals(
                spark.createDataFrame(rows, "doc_id long, text string"), n=2
            ).collect()
        }
        for doc_id, text in rows:
            toks = text.lower().split() if text.strip() else []
            grams = [
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            ]
            cnt = Counter(grams)
            total = len(grams)
            dup = sum(c for c in cnt.values() if c > 1)
            top = max(cnt.values()) if cnt else 0
            g = got[doc_id]
            assert g["n_tokens"] == len(toks)
            assert g["dup_token_frac"] == round(
                0.0 if not toks else 1 - len(set(toks)) / len(toks), 6
            )
            assert g["dup_ngram_frac"] == round(dup / max(total, 1), 6)
            assert g["top_ngram_frac"] == round(top / max(total, 1), 6)

    def test_decontaminate_vs_python_reference(self, spark):
        import random as rnd

        r = rnd.Random(99)
        vocab = [f"t{i}" for i in range(8)]
        rows = [
            (i, " ".join(r.choice(vocab) for _ in range(r.randint(3, 20))))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ev = df.filter(F.col("doc_id") % 10 == 0)
        tr = df.filter(F.col("doc_id") % 10 != 0)
        got = {
            row["doc_id"]: (row["n_grams"], row["n_contaminated"])
            for row in Q.decontaminate(tr, ev, n=3).collect()
        }

        def grams(text):
            toks = text.lower().split()
            return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]

        eval_set = {
            g for doc_id, text in rows if doc_id % 10 == 0 for g in grams(text)
        }
        expected = {}
        for doc_id, text in rows:
            if doc_id % 10 == 0:
                continue
            gs = grams(text)
            hits = sum(1 for g in gs if g in eval_set)
            if hits:
                expected[doc_id] = (len(gs), hits)
        assert got == expected

if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_unigram_logprob_score_orders_docs_by_typicality(spark):
    """Docs of frequent tokens score higher (closer to 0) than docs of
    rare tokens; empty docs are absent; math matches the closed form."""
    import math

    from aml_entity_resolution_assignment_spark.operators.quality import (
        unigram_logprob_score,
    )

    rows = [
        (1, "the the the the"),          # only frequent token
        (2, "the zyzzyva"),              # one rare token
        (3, "zyzzyva qwfp"),             # all rare
        (4, ""),                         # empty -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["logprob"] > got[2]["logprob"] > got[3]["logprob"]
    # closed form: counts the=5, zyzzyva=2, qwfp=1; total=8, vocab=3
    lp = lambda c: math.log((c + 1.0) / (8 + 3.0))  # noqa: E731
    assert abs(got[1]["logprob"] - lp(5)) < 1e-12
    assert abs(got[3]["logprob"] - (lp(2) + lp(1)) / 2) < 1e-12


def test_unigram_logprob_external_lm_counts(spark):
    """A supplied (token, cnt) reference LM replaces the self-fit;
    out-of-vocabulary tokens get the smoothed floor."""
    import math

    from aml_entity_resolution_assignment_spark.operators.quality import (
        unigram_logprob_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    lm = spark.createDataFrame(
        [("alpha", 9), ("beta", 1)], "t string, cnt long"
    )
    got = {r["doc_id"]: r for r in unigram_logprob_score(docs, lm_counts=lm).collect()}
    total, vocab = 10, 2
    lp = lambda c: math.log((c + 1.0) / (total + vocab))  # noqa: E731
    assert abs(got[1]["logprob"] - (lp(9) + lp(1)) / 2) < 1e-12
    assert abs(got[2]["logprob"] - lp(0)) < 1e-12  # OOV floor


# ---------------------------------------------------------- trigram LM


def _ref_backoff(texts_lm, text, alpha=0.4):
    """Pure-python stupid backoff twin (whitespace lower tokens)."""
    import math
    from collections import Counter

    uni, big, tri = Counter(), Counter(), Counter()
    for t in texts_lm:
        w = t.strip().lower().split()
        uni.update(w)
        big.update(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
        tri.update(" ".join(w[i : i + 3]) for i in range(len(w) - 2))
    n, v = sum(uni.values()), len(uni)
    w = text.strip().lower().split()
    out = []
    for i in range(2, len(w)):
        t3 = " ".join(w[i - 2 : i + 1])
        b2 = " ".join(w[i - 1 : i + 1])
        if tri[t3]:
            s = tri[t3] / big[" ".join(w[i - 2 : i])]
        elif big[b2]:
            s = alpha * big[b2] / uni[w[i - 1]]
        else:
            s = alpha * alpha * (uni[w[i]] + 1) / (n + v)
        out.append(math.log(s))
    return len(out), sum(out) / len(out) if out else None


def test_trigram_backoff_matches_reference(spark):
    from aml_entity_resolution_assignment_spark.operators.quality import (
        trigram_backoff_score,
    )

    lm_texts = [
        "the cat sat on the mat",
        "the cat ran over the hill",
        "a dog sat on a log",
        "the dog and the cat",
    ]
    score_texts = {
        1: "the cat sat on the mat",          # all trigrams in LM
        2: "the cat sat on a log",            # mixes: backoff to bigrams
        3: "a zebra jumped over the moon",    # OOV: unigram floor fires
        4: "cat dog",                         # < 3 tokens: absent
        5: "  the   cat\tsat on the mat  ",   # whitespace-normalized
    }
    lm = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(lm_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        list(score_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_scored"], r["lm_score"])
        for r in trigram_backoff_score(docs, lm_docs=lm).collect()
    }
    assert 4 not in got
    for did, text in score_texts.items():
        if did == 4:
            continue
        n, want = _ref_backoff(lm_texts, text)
        assert got[did][0] == n
        assert abs(got[did][1] - want) < 1e-9, did
    # ordering sanity: in-LM prose scores higher than OOV gibberish
    assert got[1][1] > got[3][1]


def test_trigram_backoff_self_trained_no_backoff(spark):
    """Self-trained: every scored trigram was observed, so scores are
    pure trigram MLE — and deterministic across partitioning."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        trigram_backoff_score,
    )

    texts = [(i, f"alpha beta gamma delta epsilon token{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    a = {
        (r["doc_id"], r["n_scored"], round(r["lm_score"], 9))
        for r in trigram_backoff_score(docs.repartition(1)).collect()
    }
    b = {
        (r["doc_id"], r["n_scored"], round(r["lm_score"], 9))
        for r in trigram_backoff_score(docs.repartition(8)).collect()
    }
    assert a == b and len(a) == 12


# -------------------------------------------------------- collocations


def test_pmi_collocations_reference(spark):
    import math
    from collections import Counter

    from aml_entity_resolution_assignment_spark.operators.quality import (
        pmi_collocations,
    )

    texts = (
        ["new york is a big city"] * 6
        + ["the new deal and the big apple"] * 4
        + ["york new haven line"] * 3
        + ["a a a a"] * 2
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["bigram"], r["n"], r["pmi"])
        for r in pmi_collocations(docs, min_count=3, k=5).collect()
    ]
    uni, big = Counter(), Counter()
    for t in texts:
        w = t.split()
        uni.update(w)
        big.update(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
    n = sum(uni.values())
    want = []
    for g, c in big.items():
        if c >= 3:
            a, b = g.split(" ", 1)
            want.append((g, c, round(math.log(n * c / (uni[a] * uni[b])), 6)))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert got == want[:5]
    # the top collocation is a phrase whose words are exclusive to it
    # (maximal PMI), not a generic function-word pair
    assert got[0][0] in ("haven line", "york new")


# ------------------------------------------------------------ sentences


def test_sentence_split(spark):
    from pyspark.sql import functions as F

    from aml_entity_resolution_assignment_spark.functions.text import (
        sentence_split,
        sentences_table,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello world. This is fine! Is it? Yes."),
            (2, 'He said "Stop!" Then left. (Really.) End'),
            (3, "No terminal punctuation here"),
            (4, "Trailing. "),
            (5, ""),
            (6, "Multi...   dots?! Mixed.Attached stays together."),
        ],
        "doc_id long, t string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", sentence_split(F.col("t")).alias("s")
        ).collect()
    }
    assert got[1] == ["Hello world.", "This is fine!", "Is it?", "Yes."]
    assert got[2] == ['He said "Stop!"', "Then left.", "(Really.)", "End"]
    assert got[3] == ["No terminal punctuation here"]
    assert got[4] == ["Trailing."]
    assert got[5] == []
    # punctuation runs split once; no-whitespace boundary does NOT split
    assert got[6] == ["Multi...", "dots?!", "Mixed.Attached stays together."]
    t = sentences_table(df, text_col="t")
    rows = [tuple(r) for r in t.where("doc_id = 1").collect()]
    assert rows == [
        (1, 0, "Hello world.", 12),
        (1, 1, "This is fine!", 13),
        (1, 2, "Is it?", 6),
        (1, 3, "Yes.", 4),
    ]


# ------------------------------------------------------- score buckets


def _ref_cuts(vals, fracs, lo, hi, bins):
    """Replay the closed-form histogram cut points in plain Python."""
    import math

    width = (hi - lo) / bins
    hist = {}
    for v in vals:
        b = min(bins - 1, max(0, int(math.floor((v - lo) / width))))
        hist[b] = hist.get(b, 0) + 1
    n = len(vals)
    cuts = []
    for q in fracs:
        target = max(math.ceil(q * n), 1)
        cum = 0
        for b in sorted(hist):
            if cum < target <= cum + hist[b]:
                cuts.append(lo + width * (b + (target - cum) / hist[b]))
                break
            cum += hist[b]
    return cuts


def test_score_buckets_matches_closed_form(spark):
    from aml_entity_resolution_assignment_spark.operators.quality import (
        score_buckets,
    )

    rows = []
    for g, base in (("en", -9.0), ("de", -5.0)):
        rows += [(g, i, base + (i * 7 % 30) / 10.0) for i in range(30)]
    df = spark.createDataFrame(rows, "lang string, i long, s double")
    out = score_buckets(
        df, "s", "lang", lo=-16.0, hi=0.0, bins=64
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["lang"], []).append(r)
    for g, base in (("en", -9.0), ("de", -5.0)):
        vals = [base + (i * 7 % 30) / 10.0 for i in range(30)]
        c1, c2 = _ref_cuts(vals, [1 / 3, 2 / 3], -16.0, 0.0, 64)
        for r in by_g[g]:
            want = "head" if r["s"] > c2 else ("middle" if r["s"] > c1 else "tail")
            assert r["bucket"] == want, (g, r["s"], c1, c2)
    # roughly-equal thirds per group
    from collections import Counter

    for g in ("en", "de"):
        counts = Counter(r["bucket"] for r in by_g[g])
        assert set(counts) == {"head", "middle", "tail"}
        assert max(counts.values()) - min(counts.values()) <= 4


def test_score_buckets_null_and_invariance(spark):
    from aml_entity_resolution_assignment_spark.operators.quality import (
        score_buckets,
    )

    rows = [("en", i, float(-i % 11) - 1.0) for i in range(40)] + [
        ("en", 99, None)
    ]
    df = spark.createDataFrame(rows, "lang string, i long, s double")
    a = {
        (r["i"], r["bucket"])
        for r in score_buckets(df.repartition(1), "s", "lang").collect()
    }
    b = {
        (r["i"], r["bucket"])
        for r in score_buckets(df.repartition(8), "s", "lang").collect()
    }
    assert a == b
    assert (99, None) in a


# ------------------------------------------------------ script profile


def test_script_counts_and_dominant(spark):
    from pyspark.sql import functions as F

    from aml_entity_resolution_assignment_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    rows = [
        (1, "hello world"),          # Latin 10
        (2, "привет мир hi"),        # Cyrillic 9 > Latin 2
        (3, "你好世界"),              # Han
        (4, "안녕하세요 world"),       # tie 5/5 -> Latin (SCRIPTS order)
        (5, "1234 ... !!"),          # no script -> Zzzz
        (6, "مرحبا"),                # Arabic
        (7, "γειά"),                 # Greek
        (8, "नमस्ते"),                # Devanagari
        (9, "שלום"),                 # Hebrew
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    sc = script_counts(F.col("t"))
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            dominant_script(F.col("t")).alias("s"),
            *[v.alias(k) for k, v in sc.items()],
        ).collect()
    }
    assert out[1]["s"] == "Latin" and out[1]["Latin"] == 10
    assert out[2]["s"] == "Cyrillic" and out[2]["Cyrillic"] == 9
    assert out[3]["s"] == "Han" and out[3]["Han"] == 4
    assert out[4]["s"] == "Latin" and out[4]["Hangul"] == 5  # tie -> order
    assert out[5]["s"] == "Zzzz"
    for i, name in ((6, "Arabic"), (7, "Greek"), (8, "Devanagari"), (9, "Hebrew")):
        assert out[i]["s"] == name and out[i][name] > 0


def test_score_buckets_null_group_gets_own_cuts(spark):
    """A NULL group is a real group: its docs must be bucketed by its
    own cut points, not dumped into labels[0]."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        score_buckets,
    )

    rows = [(None, i, -15.0 + i * 0.5) for i in range(30)]
    df = spark.createDataFrame(rows, "lang string, i long, s double")
    out = score_buckets(df, "s", "lang", lo=-16.0, hi=0.0, bins=64).collect()
    labels = {r["bucket"] for r in out}
    assert labels == {"head", "middle", "tail"}  # not all 'tail'
    top = max(out, key=lambda r: r["s"])
    assert top["bucket"] == "head"


class TestGopherRules:
    def _run(self, spark, texts):
        from aml_entity_resolution_assignment_spark.operators.quality import (
            gopher_rules,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r.asDict()
            for r in gopher_rules(df).orderBy("doc_id").collect()
        }

    def test_hand_computed_signals(self, spark):
        # 60 words, all alphabetic, two stop words -> keeps
        good = " ".join(["the", "with"] + ["word"] * 58)
        rows = self._run(spark, [good])
        r = rows[0]
        assert r["n_words"] == 60
        assert r["stop_hits"] == 2
        assert r["alpha_word_frac"] == 1.0
        assert r["symbol_word_ratio"] == 0.0
        assert r["gopher_keep"] is True

    def test_each_rule_vetoes(self, spark):
        base = ["the", "with"] + ["word"] * 58
        texts = [
            " ".join(base),                             # 0: keep
            " ".join(base[:30]),                        # 1: too few words
            " ".join(["the", "with"] + ["ab"] * 58),    # 2: mean len < 3
            " ".join(base) + " " + "# " * 20,           # 3: symbol ratio
            "\n".join("- " + w for w in base),          # 4: all bullets
            "\n".join(w + "..." for w in base),         # 5: all ellipsis
            " ".join(["the", "with"] + ["42"] * 58),    # 6: non-alpha words
            " ".join(["word"] * 60),                    # 7: no stop words
        ]
        rows = self._run(spark, texts)
        assert rows[0]["gopher_keep"] is True
        for i in range(1, 8):
            assert rows[i]["gopher_keep"] is False, (i, rows[i])

    def test_blank_doc(self, spark):
        r = self._run(spark, ["   "])[0]
        assert r["n_words"] == 0
        assert r["gopher_keep"] is False


class TestC4LineFilter:
    def _run(self, spark, texts):
        from aml_entity_resolution_assignment_spark.operators.quality import (
            c4_line_filter,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r.asDict()
            for r in c4_line_filter(df).orderBy("doc_id").collect()
        }

    def test_line_rules(self, spark):
        good = "this line has five words."
        doc = "\n".join(
            [
                good,                              # kept
                "no terminal punctuation here",    # dropped: no punct
                "too short.",                      # dropped: < 5 words
                "please enable javascript right now.",  # dropped: js
                good + "!",                        # kept
                good + "?",                        # kept
            ]
        )
        r = self._run(spark, [doc])[0]
        assert r["n_lines"] == 6
        assert r["n_kept"] == 3
        assert r["c4_keep"] is True
        assert r["clean_text"].split("\n") == [good, good + "!", good + "?"]

    def test_page_level_drops(self, spark):
        good = "this line has five words."
        three = "\n".join([good] * 3)
        rows = self._run(
            spark,
            [
                three,                          # 0: keep
                "\n".join([good] * 2),          # 1: < 3 surviving lines
                three + "\nlorem ipsum dolor.", # 2: lorem ipsum
                three + " {",                   # 3: curly brace
            ],
        )
        assert rows[0]["c4_keep"] is True
        for i in (1, 2, 3):
            assert rows[i]["c4_keep"] is False, (i, rows[i])

    def test_blank_doc(self, spark):
        r = self._run(spark, [""])[0]
        assert r["n_lines"] == 0 and r["n_kept"] == 0
        assert r["c4_keep"] is False
        assert r["clean_text"] == ""
