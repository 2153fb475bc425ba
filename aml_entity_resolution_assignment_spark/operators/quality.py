"""Repetition-quality signals and benchmark decontamination.

Two training-data curation operators a 100 TB web-text pipeline needs
beyond near-dup removal (no analog in the reference — these extend the
engine's LLM-data surface, same spirit as dedup.py / text.py):

* ``repetition_signals`` — Gopher-style per-document repetition
  fractions (Rae et al. 2021, "Scaling Language Models", Table A1):
  documents dominated by a few repeated phrases are low-quality
  boilerplate.  Computed with one explode + two doc_id-keyed
  aggregations — partial (map-side) aggregation applies and the
  shuffle key is the document id, so the plan is skew-free and scales
  linearly with corpus size.

* ``decontaminate`` — flag training documents that share any word
  n-gram with a held-out evaluation set (the standard n-gram-overlap
  decontamination used for LLM training corpora, e.g. GPT-3 appendix C
  / PaLM).  The join key is ``md5(gram)`` — a 32-hex digest both Spark
  and DuckDB compute identically, so the oracle pins the production
  join exactly while the shuffle never carries raw n-gram text.  The
  eval side is ``distinct`` (tiny: benchmarks are MBs, corpora are
  TBs) and broadcast; the training side streams through map-side
  partial aggregation keyed on doc_id.

Both operators are pure built-in column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(c: Column) -> Column:
    """Lowercased whitespace word array; empty array for blank text."""
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(c)), r"\s+")
    )


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Space-joined n-grams of an ALREADY-TOKENIZED array column
    (empty array for fewer than ``n`` tokens).

    The token array is bound ONCE per row through a single-element
    ``transform`` so the per-position lambda references a lambda
    VARIABLE, not the token-array expression tree.  Higher-order
    functions evaluate interpreted (CodegenFallback), and an outer
    expression referenced inside the lambda is re-evaluated per
    element — with ``toks = split(lower(trim(text)))`` that was one
    full regex split per gram POSITION, O(tokens²) per document
    (confirmed in the physical plan: the split subtree appeared inside
    the lambdafunction).  Guide §1.2/§4: fix per-task work."""

    def _grams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )

    return F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.when(F.size(t) >= n, _grams(t)).otherwise(
                F.array().cast("array<string>")
            ),
        ),
        1,
    )


def word_ngrams(c: Column, n: int) -> Column:
    """Space-joined word n-grams of ``c`` (empty array when the text
    has fewer than ``n`` tokens).  Pure higher-order-function
    expression — no UDF; the tokenization is evaluated once per row
    (see ngrams_of_tokens)."""
    return ngrams_of_tokens(word_tokens(c), n)


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Per-document repetition-quality fractions (Gopher rules, adapted
    to word streams):

    * ``dup_token_frac``  — 1 - distinct_tokens / total_tokens
    * ``dup_ngram_frac``  — fraction of n-gram positions whose n-gram
      occurs more than once in the document
    * ``top_ngram_frac``  — fraction of n-gram positions taken by the
      single most frequent n-gram (only the max count matters, so ties
      need no ordering)

    Plan shape: explode n-grams → groupBy(doc_id, gram) with map-side
    partial counts → groupBy(doc_id).  Both shuffles key on doc_id (+
    gram), near-uniform at web scale; no collect, no UDF.  Documents
    shorter than ``n`` tokens report 0.0 n-gram fractions.
    """
    # tokenize ONCE into a column, then derive sizes and grams from the
    # materialized array attribute (three independent split()s per row
    # otherwise — guide §2.3 project-early applied to expressions)
    base = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.size("_toks").alias("_n_tok"),
        F.size(F.array_distinct("_toks")).alias("_n_tok_d"),
        ngrams_of_tokens(F.col("_toks"), n).alias("_grams"),
    )
    per_gram = (
        base.select(id_col, "_n_tok", "_n_tok_d", F.explode_outer("_grams").alias("_g"))
        .groupBy(id_col, "_n_tok", "_n_tok_d", "_g")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    agg = per_gram.groupBy(id_col, "_n_tok", "_n_tok_d").agg(
        F.sum(F.when(F.col("_g").isNotNull(), F.col("_cnt")).otherwise(0)).alias(
            "_total"
        ),
        F.sum(
            F.when((F.col("_g").isNotNull()) & (F.col("_cnt") > 1), F.col("_cnt"))
            .otherwise(0)
        ).alias("_dup"),
        F.max(
            F.when(F.col("_g").isNotNull(), F.col("_cnt")).otherwise(0)
        ).alias("_top"),
    )
    safe = F.greatest(F.col("_total"), F.lit(1)).cast("double")
    return agg.select(
        F.col(id_col),
        F.col("_n_tok").alias("n_tokens"),
        F.round(
            F.when(F.col("_n_tok") == 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.col("_n_tok_d") / F.col("_n_tok").cast("double")
            ),
            6,
        ).alias("dup_token_frac"),
        F.round(F.col("_dup") / safe, 6).alias("dup_ngram_frac"),
        F.round(F.col("_top") / safe, 6).alias("top_ngram_frac"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-training-document benchmark contamination: for each train
    doc, the number of n-gram positions whose n-gram also appears
    anywhere in ``eval_df``, and that count as a fraction of the doc's
    n-gram positions.  Returns (id_col, n_grams, n_contaminated,
    contamination_frac) for contaminated docs only (frac > 0).

    Scale shape: the eval side collapses to its DISTINCT grams
    (benchmark sets are tiny next to a crawl) and is broadcast; the
    training side explodes once and probes the broadcast, then
    re-aggregates on doc_id with partial counts.  The train side is
    never shuffled by gram — the broadcast probe hashes each gram
    once in the JVM, so no per-gram digest (the former md5 over every
    exploded train gram was pure CPU overhead on top of the probe's
    own hash; guide §4.1: prefer the built-in path).
    """
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("_g"))
        .distinct()
        .select("_g", F.lit(1).alias("_hit"))
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
    )
    # ONE doc_id aggregation over the flagged stream (map-side partial
    # combine), instead of totals + hits aggregations joined after
    flagged = train_grams.join(F.broadcast(eval_grams), "_g", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            F.col(id_col),
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_grams").cast("double"), 6
            ).alias("contamination_frac"),
        )
    )


def unigram_logprob_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm_counts: DataFrame | None = None,
    smoothing: float = 1.0,
) -> DataFrame:
    """CCNet-style unigram language-model quality score: per document,
    the mean token log-probability under a unigram LM estimated from
    the corpus itself (or a supplied (token, cnt) table — at a real
    deployment the LM table is fitted once on a reference corpus like
    Wikipedia and broadcast). Documents full of common tokens score
    high (close to 0); rare-token/gibberish documents score low — the
    standard cheap perplexity proxy for pretraining-data filtering.

    score(d) = mean_{t in d} log( (cnt(t) + smoothing)
                                  / (total + smoothing * vocab) )

    Distributed shape: one explode -> (a) token counts via a key-grouped
    aggregation (or the provided table), (b) re-join tokens to their
    counts by token key, (c) per-doc mean — three shuffles, all
    key-grouped; the LM table is vocabulary-sized, so on a cluster it
    broadcasts. No UDF anywhere; every step is codegen'd.

    Returns (id_col, n_tokens, logprob) — logprob NULL for empty docs."""
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("_t")
    ).where(F.col("_t") != "")
    if lm_counts is None:
        lm_counts = toks.groupBy("_t").agg(F.count("*").alias("_cnt"))
    else:
        lm_counts = lm_counts.select(
            F.col(lm_counts.columns[0]).alias("_t"),
            F.col(lm_counts.columns[1]).cast("long").alias("_cnt"),
        )
    totals = lm_counts.agg(
        F.sum("_cnt").alias("_total"), F.count("*").alias("_vocab")
    )
    scored = (
        toks.join(lm_counts, "_t", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("_total") + F.lit(smoothing) * F.col("_vocab"))
                )
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("_lp").alias("logprob"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic salient-term
    extractor for corpus exploration/labeling. Smoothed IDF
    ln((N+1)/(df+1)) + 1; TF = in-doc count. Explode -> per-(doc,term)
    counts -> per-term document frequency -> one window for the top-k;
    all key-grouped, no UDF. Ties break lexicographically for
    determinism. Returns (id_col, term, rank, tfidf)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("_t")
    ).where(F.col("_t") != "")
    tf = toks.groupBy(id_col, "_t").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    n_docs = docs.select(id_col).distinct().count()
    scored = tf.join(dfreq, "_t").select(
        id_col,
        F.col("_t").alias("term"),
        (
            F.col("_tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("_df") + 1.0)) + 1.0)
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", F.col("rank").cast("long"), "tfidf")
    )


def trigram_backoff_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Stupid-backoff trigram LM score (Brants et al. 2007, the
    web-scale LM used for exactly this corpus-filtering job) — the
    n-gram upgrade of unigram_logprob_score: per document, the mean
    log-score of every token position i >= 2 under

        S(w | u v) = c(uvw) / c(uv)                  if c(uvw) > 0
                   = alpha * c(vw) / c(v)            elif c(vw) > 0
                   = alpha^2 * (c(w) + 1) / (N + V)  otherwise

    (add-1 smoothing on the unigram floor keeps S total when the LM
    counts come from an external reference corpus that misses vocab).
    Counts are estimated from `lm_docs` (default: the scored corpus
    itself — in which case every scored trigram was observed and the
    backoff never fires); at a deployment lm_docs is the reference
    corpus (Wikipedia in CCNet) fitted once, and the backoff chain is
    what scores out-of-reference text.

    Distributed shape: every backoff key (trigram, bigram prefix,
    bigram, unigram prefix, target word) is a pure function of the
    trigram string, so the position-scale data shuffles exactly ONCE —
    a (doc, trigram) count aggregation — and the five left equi-joins
    against the count tables run over the far smaller DISTINCT-trigram
    table (Zipf: distinct grams ≪ positions at corpus scale). Per-doc
    scores come back through one equi-join on the trigram key plus a
    weighted mean — the standard MapReduce n-gram-LM plan, skew-free
    because gram keys fan out. No UDF anywhere.

    Returns (id_col, n_scored, lm_score) — docs with < 3 tokens have
    no scorable position and are absent."""
    toks = word_tokens(F.col(text_col))
    per_doc = (
        docs.where(F.size(toks) >= 3)
        .select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), 3)).alias("tri"),
        )
        .groupBy(id_col, "tri")
        .agg(F.count("*").alias("_k"))
    )
    parts = F.split(F.col("tri"), " ")
    pos = per_doc.select("tri").distinct().select(
        "tri",
        F.array_join(F.slice(parts, 1, 2), " ").alias("bigp"),
        F.array_join(F.slice(parts, 2, 2), " ").alias("big"),
        parts.getItem(1).alias("unip"),
        parts.getItem(2).alias("w"),
    )
    lm = lm_docs if lm_docs is not None else docs
    uni = (
        lm.select(F.explode(word_tokens(F.col(text_col))).alias("g"))
        .where(F.col("g") != "")
        .groupBy("g")
        .agg(F.count("*").alias("c1"))
    )
    big = (
        lm.select(F.explode(word_ngrams(F.col(text_col), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c2"))
    )
    tri = (
        lm.select(F.explode(word_ngrams(F.col(text_col), 3)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c3"))
    )
    totals = uni.agg(
        F.sum("c1").alias("_n"), F.count("*").alias("_v")
    )
    j = (
        pos.join(tri.withColumnRenamed("g", "tri"), "tri", "left")
        .join(
            big.select(F.col("g").alias("bigp"), F.col("c2").alias("c2p")),
            "bigp", "left",
        )
        .join(big.withColumnRenamed("g", "big"), "big", "left")
        .join(
            uni.select(F.col("g").alias("unip"), F.col("c1").alias("c1p")),
            "unip", "left",
        )
        .join(uni.withColumnRenamed("g", "w"), "w", "left")
        .crossJoin(F.broadcast(totals))
    )
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3") / F.col("c2p"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(alpha) * F.col("c2") / F.col("c1p"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(1))
            / (F.col("_n") + F.col("_v"))
        )
    )
    scored = j.select("tri", F.log(s).alias("_ls"))
    return (
        per_doc.join(scored, "tri")
        .groupBy(id_col)
        .agg(
            F.sum("_k").alias("n_scored"),
            (F.sum(F.col("_k") * F.col("_ls")) / F.sum("_k")).alias(
                "lm_score"
            ),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    word2phrase-style phrase miner (Mikolov et al. 2013) used to build
    phrase vocabularies for tokenizers and to surface multi-word
    entities:  pmi(a b) = ln( N * c(ab) / (c(a) * c(b)) )  over corpus
    bigrams with c(ab) >= min_count, N = total token count.

    Distributed shape: two key-grouped gram counts, two equi-joins of
    the bigram table to its component unigram counts, then a global
    top-k that Spark executes as TakeOrdered (per-partition heads
    merged on the driver — no single-reducer sort). Ordering is
    (round(pmi, 6) desc, bigram asc) so ties are deterministic and the
    SQL twin reproduces the exact row set.

    Returns (bigram, n, pmi) — pmi rounded to 6 decimals."""
    uni = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("g"))
        .where(F.col("g") != "")
        .groupBy("g")
        .agg(F.count("*").alias("c1"))
    )
    big = (
        docs.select(F.explode(word_ngrams(F.col(text_col), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c2"))
        .where(F.col("c2") >= min_count)
    )
    total = uni.agg(F.sum("c1").alias("_n"))
    parts = F.split(F.col("g"), " ", 2)
    j = (
        big.select("g", "c2", parts.getItem(0).alias("_a"),
                   parts.getItem(1).alias("_b"))
        .join(uni.select(F.col("g").alias("_a"), F.col("c1").alias("ca")),
              "_a")
        .join(uni.select(F.col("g").alias("_b"), F.col("c1").alias("cb")),
              "_b")
        .crossJoin(F.broadcast(total))
    )
    pmi = F.round(
        F.log(
            F.col("_n").cast("double") * F.col("c2")
            / (F.col("ca") * F.col("cb"))
        ),
        6,
    )
    return (
        j.select(F.col("g").alias("bigram"), F.col("c2").alias("n"),
                 pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("bigram"))
        .limit(k)
    )


def score_buckets(
    docs: DataFrame,
    score_col: str,
    group_col: str,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    lo: float = -16.0,
    hi: float = 0.0,
    bins: int = 256,
    labels: tuple[str, ...] = ("tail", "middle", "head"),
) -> DataFrame:
    """CCNet-style per-group quality buckets (Wenzek et al. 2019):
    split each group (language, in CCNet) into quantile buckets of a
    quality score — the classic head/middle/tail partition that
    downstream training mixes sample from at different rates. Higher
    score = better = later label; a document whose score exceeds the
    group's q-th cut point lands in the bucket above it (strict >, so
    ties go down — fixed, and replayed identically by the SQL twin).

    Cut points come from the same deterministic equi-width histogram
    closed form as sketches.histogram_quantiles, computed PER GROUP:
    target rank = max(ceil(q*n), 1); cut = lo + width * (bucket +
    (target - cum_before)/cnt) inside the first bucket whose
    cumulative count reaches the target. Deterministic and mergeable,
    unlike approx_percentile. Scores outside [lo, hi] clamp into the
    edge buckets, so no row is dropped; NULL scores get a NULL bucket.

    Distributed shape: ONE groupBy(group, bucket) aggregation (<= bins
    rows per group — the whole histogram table is tiny), per-group
    cumulative windows over those <= bins rows, and a BROADCAST join
    of the per-group cut points back onto the corpus — the group
    column must be low-cardinality (languages, sources, shards; ~10^2
    values), which is exactly the CCNet setting. The corpus itself
    never shuffles."""
    from pyspark.sql.window import Window

    if sorted(fractions) != list(fractions) or len(labels) != len(
        fractions
    ) + 1:
        raise ValueError("fractions must be sorted; need len(labels) == "
                         "len(fractions) + 1")
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    width = (hi - lo) / bins
    s = F.col(score_col).cast("double")
    b = F.floor((s - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b)).cast("int")
    hist = (
        docs.where(s.isNotNull())
        .groupBy(F.col(group_col).alias("_g"), b.alias("_b"))
        .agg(F.count("*").alias("_cnt"))
    )
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        hist.withColumn("_cum", F.sum("_cnt").over(wcum))
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy("_g")))
        .withColumn("_before", F.col("_cum") - F.col("_cnt"))
    )
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(i, float(q)) for i, q in enumerate(fractions)], "_qi int, _q double"
    )
    target = F.greatest(F.ceil(F.col("_q") * F.col("_n")), F.lit(1))
    cutv = F.lit(lo) + F.lit(width) * (
        F.col("_b") + (target - F.col("_before")) / F.col("_cnt")
    )
    cuts = (
        F.broadcast(qdf)
        .join(cum, (target > F.col("_before")) & (target <= F.col("_cum")))
        .groupBy("_g")
        .agg(
            *[
                F.max(F.when(F.col("_qi") == i, cutv)).alias(f"_cut{i}")
                for i in range(len(fractions))
            ]
        )
    )
    # null-safe equality: a NULL group is a real group (the histogram
    # kept it), so its docs must see their own cut points instead of
    # falling through the join into labels[0]
    out = docs.join(
        F.broadcast(cuts), docs[group_col].eqNullSafe(cuts["_g"]), "left"
    ).drop("_g")
    label = F.lit(labels[0])
    for i in range(len(fractions)):
        label = F.when(s > F.col(f"_cut{i}"), F.lit(labels[i + 1])).otherwise(
            label
        )
    label = F.when(s.isNull(), F.lit(None).cast("string")).otherwise(label)
    return out.withColumn("bucket", label).drop(
        *[f"_cut{i}" for i in range(len(fractions))]
    )


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher quality-filter signals and verdict (Rae et
    al. 2021, "Scaling Language Models: Methods, Analysis & Insights
    from Training Gopher", Table A1 — the document-level rule set,
    distinct from the repetition fractions in ``repetition_signals``):

    * word count in [50, 100000]
    * mean word length in [3, 10] characters
    * symbol-to-word ratio (``#`` and ellipsis) <= 0.1
    * <= 90% of lines start with a bullet character
    * <= 30% of lines end with an ellipsis
    * >= 80% of words contain at least one alphabetic character
    * at least 2 of the 8 Gopher stop words appear

    One narrow projection per document — every signal is a built-in
    column expression over the token/line arrays (size/filter/
    aggregate higher-order functions), so the whole operator is a
    single whole-stage-codegen map with NO shuffle and NO UDF: at
    100 TB it runs at parquet-scan speed, column-pruned to
    (id, text).  Counts use non-overlapping left-to-right literal
    replace semantics, identical across engines, so the DuckDB twin
    pins every ratio exactly.
    """
    t = F.col(text_col)
    words = word_tokens(t)
    n_words = F.size(words)
    wdiv = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = sum_len / wdiv
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#")))
    n_ell3 = (F.length(t) - F.length(F.replace(t, F.lit("...")))) / F.lit(3)
    n_ellu = F.length(t) - F.length(F.replace(t, F.lit("…")))
    symbol_ratio = (n_hash + n_ell3 + n_ellu) / wdiv
    lines = F.filter(
        F.transform(F.split(t, "\n"), F.trim), lambda x: x != ""
    )
    n_lines = F.size(lines)
    ldiv = F.greatest(n_lines, F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike("^[-*•]"))) / ldiv
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda x: x.rlike("(\\.\\.\\.|…)$"))
        )
        / ldiv
    )
    stops = F.array(
        *[
            F.lit(w)
            for w in ("the", "be", "to", "of", "and", "that", "have", "with")
        ]
    )
    stop_hits = F.size(F.array_intersect(words, stops))
    keep = (
        n_words.between(50, 100_000)
        & ((sum_len / wdiv).between(3.0, 10.0))
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & ((n_alpha / wdiv) >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(n_alpha / wdiv, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("gopher_keep"),
    )


def c4_line_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning", §2.2): keep only lines that end in a terminal
    punctuation mark, contain >= 5 words, and do not mention
    "javascript"; drop the whole page when fewer than 3 lines survive,
    or when the page contains "lorem ipsum" or a curly brace.

    Returns (id, n_lines, n_kept, c4_keep, clean_text) where
    ``clean_text`` is the surviving lines re-joined with newlines —
    the exact text a downstream tokenization stage would consume.

    Same scale shape as ``gopher_rules``: one codegen'd projection,
    no shuffle, no UDF; line filtering happens inside array
    higher-order functions so the 100 TB plan is scan-bound.
    """
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), F.trim), lambda x: x != ""
    )
    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (F.size(F.split(x, "\\s+")) >= 5)
        & ~F.contains(F.lower(x), F.lit("javascript")),
    )
    n_kept = F.size(kept)
    keep = (
        (n_kept >= 3)
        & ~F.contains(F.lower(t), F.lit("lorem ipsum"))
        & ~F.contains(t, F.lit("{"))
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        keep.alias("c4_keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
