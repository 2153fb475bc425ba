"""Mergeable distinct-count sketches (HyperLogLog) with a
deterministic, SQL-reproducible hash — the cardinality primitive of
every 10^12-row pipeline (distinct urls per host, vocabulary sizes,
dedup-rate monitoring) where exact COUNT(DISTINCT) would shuffle the
full key set.

Spark ships approx_count_distinct (HLL++), but its sketch bytes are
engine-internal; this operator keeps the REGISTERS as a plain
(register, max_rho) DataFrame, which makes the sketch

  * mergeable: union + groupBy(register).max(rho) merges sketches from
    partitions, days, or tables — the property that lets 100k segment
    files each carry a 512-row sketch instead of their key sets, and
  * auditable: the md5-based hash and the estimate arithmetic are
    plain integer/float SQL, so DuckDB recomputes the IDENTICAL
    estimate (the hll_distinct oracle row) — a correctness property no
    engine-internal sketch offers.

Construction (Flajolet et al. 2007): h = 60-bit hash (first 15 hex
chars of md5 — byte-identical in Spark's conv() and DuckDB's hex
cast), register = h mod m with m = 2^p, rho = leading zeros of the
remaining 60-p bits + 1 (via the exact integer identity
rho = (60 - p) + 1 - bitlen(w), bitlen via base-2 string length —
no float logs). Estimate = alpha_m * m^2 / sum(2^-M_j) with the
standard small-range linear-counting correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 9  # 512 registers, ~4.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """(register int, max_rho int) sketch rows for the distinct values
    of `col` — at most 2^p rows regardless of input size; merge two
    sketches with unionByName + groupBy(register).max(max_rho).
    Delegates to hll_registers_by with no group — ONE implementation
    of the hash/rho identity keeps grouped and ungrouped sketches
    bit-compatible for merges."""
    return hll_registers_by(df, col, [], p)


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """Sketch rows -> one row (n_registers_set, estimate double).
    Registers absent from the sketch count as rho=0 (2^0 = 1 each);
    small-range correction: linear counting when E <= 2.5m and empty
    registers exist. Delegates to hll_estimate_by (same estimator,
    one implementation)."""
    return hll_estimate_by(registers, [], p)


def hll_distinct(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """One-shot estimate: (n_registers_set, estimate)."""
    return hll_estimate(hll_registers(df, col, p), p)


# ---------------------------------------------------------------------------
# Count-min sketch: the frequency companion to HLL — bounded-size,
# mergeable-by-sum, deterministic (seeded md5 row hashes), and fully
# SQL-reproducible. At 10^12 tokens the exact frequency table is
# vocabulary-sized but the ROLLUP pipeline (per-segment sketches
# merged upward) carries d*w counters per segment instead.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512


def _cm_hash(col, row: int, w: int):
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), F.col(col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
        F.lit(w),
    ).cast("int")


def cm_sketch(
    df: DataFrame, col: str, d: int = CM_DEPTH, w: int = CM_WIDTH
) -> DataFrame:
    """(row int, bucket int, cnt long) counters — at most d*w rows.
    Merge sketches with unionByName + groupBy(row, bucket).sum(cnt)."""
    parts = [
        df.where(F.col(col).isNotNull()).select(
            F.lit(i).alias("row"), _cm_hash(col, i, w).alias("bucket")
        )
        for i in range(d)
    ]
    tall = parts[0]
    for p in parts[1:]:
        tall = tall.unionByName(p)
    return tall.groupBy("row", "bucket").agg(
        F.count("*").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str,
    d: int = CM_DEPTH, w: int = CM_WIDTH,
) -> DataFrame:
    """Point-query a set of items: estimate = min over the d rows of
    the item's counter (the classic overestimate-only bound). The
    items table is tiny (a vocabulary/watchlist) -> its hashed probe
    rows broadcast into an equi-join with the sketch."""
    probes = [
        items.select(
            F.col(item_col).alias("item"),
            F.lit(i).alias("row"),
            _cm_hash(item_col, i, w).alias("bucket"),
        )
        for i in range(d)
    ]
    tall = probes[0]
    for p in probes[1:]:
        tall = tall.unionByName(p)
    joined = F.broadcast(tall).join(sketch, ["row", "bucket"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("estimate")
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch
# ---------------------------------------------------------------------------

def histogram_sketch(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """(bucket int, cnt long) equi-width histogram over [lo, hi] —
    the quantile primitive of segment-level stats rollups (doc length,
    quality score, token count distributions). At most `bins` rows
    regardless of input size; MERGE sketches from partitions/days/
    tables with unionByName + groupBy(bucket).sum(cnt). Values outside
    [lo, hi] clamp into the edge buckets (bucket 0 / bins-1), so the
    sketch never drops rows. Deterministic — no sampling, unlike
    approx_percentile whose GK sketch is engine-internal and
    merge-order-dependent."""
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    width = (hi - lo) / bins
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b)).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """(q double, value double) quantile estimates from a histogram
    sketch: target rank = ceil(q * N) clamped to >= 1; the answer is a
    linear interpolation inside the first bucket whose cumulative
    count reaches the target — value = lo + width * (bucket +
    (target - cum_before) / cnt). Exact same closed form as the SQL
    twin; max error = one bucket width. The sketch is <= `bins` rows,
    so the cumulative window and the per-q probe join are
    driver-trivial yet stay DataFrame-shaped (mergeable upstream)."""
    from pyspark.sql.window import Window

    width = (hi - lo) / bins
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy()))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
    )
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    probe = F.broadcast(qdf).join(
        cum,
        (F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)) > F.col("cum_before"))
        & (F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)) <= F.col("cum")),
    )
    target = F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
    value = (
        F.lit(lo)
        + F.lit(width)
        * (
            F.col("bucket")
            + (target - F.col("cum_before")) / F.col("cnt")
        )
    )
    return probe.select("q", value.alias("value"))


# ---------------------------------------------------------------------------
# Bloom filter: the membership companion to HLL (distinct) and
# count-min (frequency). Same register-table contract — the filter is
# a plain (word_idx, bits) DataFrame of m/64 rows, mergeable with
# union + groupBy(word_idx).bit_or(bits), and the seeded md5 probe
# hashes are byte-identical in DuckDB SQL, so membership (INCLUDING
# each false positive) is exactly reproducible by the oracle twin.
#
# The 100 TB shape this serves: broadcast-decontamination and
# seen-before gates where the blocklist is too big to broadcast as
# values (10^9 test-set n-grams ~ 50 GB of strings) but its bloom at
# 10 bits/key is ~1 GB — the filter rides the executor heap, the
# corpus never shuffles, and false positives only ever over-drop
# (never leak contamination), the safe direction.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 14  # bits; 256 long words
BLOOM_K = 4


def _bloom_probes(col: str, m: int, k: int):
    """k (word_idx, bit) probe pairs as an array-of-structs column:
    h_j = first-15-hex-chars(md5("j:" || value)) mod m — the same
    seeded-row idiom as the count-min hashes."""
    probes = []
    for j in range(k):
        h = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col(col).cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(m),
        )
        probes.append(
            F.struct(
                F.shiftright(h, 6).cast("int").alias("word_idx"),
                h.bitwiseAND(F.lit(63)).cast("int").alias("bit"),
            )
        )
    return F.array(*probes)


def bloom_build(
    df: DataFrame, col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(word_idx int, bits long) filter rows over the non-null values
    of `col` — at most m/64 rows regardless of input size (unset words
    are simply absent). shiftleft(1L, 63) wraps to the sign bit, which
    is exactly the two's-complement encoding the probe side reads
    back, so all 64 bits of each word are usable."""
    if m % 64 != 0:
        raise ValueError("m must be a multiple of 64")
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(_bloom_probes(col, m, k)).alias("p"))
        .select("p.word_idx", "p.bit")
        .distinct()
        .select(
            "word_idx",
            F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("_w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_w").alias("bits"))
    )


def bloom_contains(
    df: DataFrame, col: str, bloom: DataFrame,
    m: int = BLOOM_M, k: int = BLOOM_K,
) -> DataFrame:
    """Distinct probe values -> (value, maybe_member boolean). The
    filter is broadcast (<= m/64 rows); a value is maybe-member iff
    all k probed bits are set — no false negatives, false positives at
    the standard (1 - e^{-kn/m})^k rate and deterministic (the oracle
    reproduces them bit-for-bit). Probing is explode + broadcast join
    + groupBy(value).min(hit): the corpus-side table never shuffles
    by anything but its own distinct values."""
    vals = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
    )
    probes = vals.select(
        "value", F.explode(_bloom_probes("value", m, k)).alias("p")
    ).select("value", "p.word_idx", "p.bit")
    joined = probes.join(F.broadcast(bloom), "word_idx", "left")
    hit = (
        F.when(F.col("bits").isNull(), F.lit(0))
        .otherwise(
            F.expr("shiftrightunsigned(bits, bit)")
            .bitwiseAND(F.lit(1))
            .cast("int")
        )
    )
    return (
        joined.select("value", hit.alias("_hit"))
        .groupBy("value")
        .agg((F.min("_hit") == 1).alias("maybe_member"))
    )


def profile_columns(df: DataFrame, cols: list[str], p: int = HLL_P) -> DataFrame:
    """One-stop column profiling — the data-quality report every
    ingestion run files per partition: (column, n_rows, n_nulls,
    n_distinct_est, min_str, max_str). Distinct counts come from the
    deterministic HLL above, so the profile of a 10^12-row table costs
    one scan + k tiny aggregations and the numbers are reproducible in
    SQL (including the estimate). min/max are string-cast so one
    schema fits every column type."""
    spark = df.sparkSession
    out = None
    for c in cols:
        base = df.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.min(F.col(c)).cast("string").alias("min_str"),
            F.max(F.col(c)).cast("string").alias("max_str"),
        )
        est = hll_distinct(df, c, p).select(
            F.round("estimate", 6).alias("n_distinct_est")
        )
        row = (
            base.crossJoin(F.broadcast(est))
            .select(
                F.lit(c).alias("column"),
                "n_rows", "n_nulls", "n_distinct_est",
                "min_str", "max_str",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def hll_registers_by(
    df: DataFrame, col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Grouped HLL sketches: (*group_cols, register, max_rho), at most
    2^p register rows PER GROUP. Same hash/rho identity as
    hll_registers; merge sketches for the same group (across days,
    shards, tables) with unionByName + groupBy(group, register)
    .max(max_rho) — the rollup dimension the 100k-segment warehouse
    shape needs (per-day distinct users merging into per-month with no
    rescan)."""
    m = 1 << p
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, p)
    bitlen = F.when(
        w > 0, F.length(F.conv(w.cast("string"), 10, 2))
    ).otherwise(F.lit(0))
    rho = F.when(w > 0, F.lit(60 - p + 1) - bitlen).otherwise(
        F.lit(60 - p + 1)
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(
            *group_cols,
            F.pmod(h, F.lit(m)).cast("int").alias("register"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("_rho").cast("int").alias("max_rho"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Grouped sketch rows -> one row per group (*group_cols,
    n_registers_set, estimate). Identical estimator to hll_estimate
    (bias alpha, absent-register completion, linear-counting
    small-range correction), applied per group."""
    m = 1 << p
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
    )
    alpha = _alpha(m)
    raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_set")))
    zeros = F.lit(m) - F.col("_set")
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("_set").cast("long").alias("n_registers_set"),
        corrected.alias("estimate"),
    )


def hll_set_estimates(
    a: DataFrame, b: DataFrame, p: int = HLL_P
) -> DataFrame:
    """Set-operation estimates from two HLL register sketches
    (hll_registers output): |A|, |B|, |A ∪ B| (the lossless
    union-by-max merge), and |A ∩ B| by inclusion-exclusion
    (max(0, |A| + |B| - |A∪B|)) — the audience-overlap / segment-
    intersection primitive. Everything stays sketch-sized: the merge
    is a <= 2^(p+1)-row groupBy, estimates are scalar aggregates, and
    the same register tables roll up from per-segment sketches
    without rescanning the corpus. One output row
    (est_a, est_b, est_union, est_intersection)."""
    u = (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )

    def est(df: DataFrame, name: str) -> DataFrame:
        return hll_estimate(df, p).select(
            F.col("estimate").alias(name)
        )

    out = (
        est(a, "est_a")
        .crossJoin(est(b, "est_b"))
        .crossJoin(est(u, "est_union"))
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0.0),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters via Misra-Gries candidates + recount
# ---------------------------------------------------------------------------

def _misra_gries_partition(items, k: int):
    """Classic Misra-Gries frequent-items summary over one partition's
    item stream: at most k counters; any item with partition frequency
    > n_part/(k+1) is guaranteed a counter. Returns the surviving
    candidate items (counter values are NOT usable as counts — the
    recount pass supplies exact ones)."""
    counters: dict = {}
    for it in items:
        if it is None:
            continue
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return list(counters)


def heavy_hitters(
    df: DataFrame, col: str, phi: float, k: int | None = None
) -> DataFrame:
    """EXACT frequent items above a relative threshold — every item
    whose count >= ceil(phi * N) over an item stream of N rows —
    without shuffling the full distinct-item space (the groupBy-
    count-filter plan shuffles one row per DISTINCT item: at web
    vocabulary sizes that is billions of rows for a query whose
    answer has a few hundred).

    Two passes, the standard distributed frequent-items recipe:

    1. candidate pass — per-partition Misra-Gries summaries with
       k = ceil(1/phi) counters (mapInPandas; the dict spans the whole
       partition, not one Arrow batch). Merging MG summaries preserves
       the MG guarantee (Agarwal et al., "Mergeable Summaries", PODS
       2012), so EVERY item with global count >= N/(k+1) < ceil(phi*N)
       survives in at least one partition's summary: the union of
       summaries is a superset of the answer. At most k rows per
       partition flow out — candidate volume is partitions x k,
       independent of N and of vocabulary size.
    2. recount pass — exact counts for candidate items only, via a
       broadcast semi-join against the stream, then a LITERAL
       threshold filter: N comes free from the candidate pass (each
       partition also emits its item count), read back as one
       aggregate-sized scalar from the checkpointed summary — the
       same scalar-read convention as the CC convergence check; the
       alternative (joining a 1-row total) plans as a
       BroadcastNestedLoopJoin, which this repo's plan gate forbids.

    Output (item, cnt) is byte-identical to the naive exact plan —
    the MG bound makes the candidate set lossless for this threshold —
    which is what the DuckDB twin checks.
    """
    import math

    import pandas as pd

    if not (0.0 < phi < 1.0):
        raise ValueError(f"heavy_hitters: phi must be in (0,1), got {phi}")
    k_min = int(math.ceil(1.0 / phi))
    if k is None:
        k = k_min
    elif k < k_min:
        # fewer counters than 1/phi voids the superset guarantee: an
        # answer item could be evicted and the output silently wrong
        raise ValueError(
            f"heavy_hitters: k={k} < ceil(1/phi)={k_min} breaks exactness"
        )
    items = (
        df.select(F.col(col).cast("string").alias("item"))
        .where(F.col("item").isNotNull())
    )

    def mg(batches):
        seen = 0

        def stream():
            nonlocal seen
            for pdf in batches:
                for it in pdf["item"]:
                    if it is not None:
                        seen += 1
                    yield it

        cands = _misra_gries_partition(stream(), k)
        yield pd.DataFrame(
            {
                "item": pd.array(cands + [None], dtype="object"),
                "part_n": [0] * len(cands) + [seen],
            }
        )

    # partitions x (k+1) rows; checkpoint so the scalar read below and
    # the candidate join don't re-run the MG scan
    summary = items.mapInPandas(mg, "item string, part_n long")
    summary = summary.localCheckpoint(eager=True)
    total = summary.agg(F.sum("part_n")).collect()[0][0] or 0
    thr = math.ceil(phi * total)
    candidates = summary.where(F.col("item").isNotNull()).select("item").distinct()
    return (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= F.lit(thr))
    )
