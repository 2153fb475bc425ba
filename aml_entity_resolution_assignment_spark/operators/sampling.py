"""Deterministic sampling for training-data mixtures.

A 100 TB corpus is never trained on uniformly: each source/domain gets
a mixture weight (e.g. Wikipedia up-weighted, raw crawl down-weighted)
and the sampler must be DETERMINISTIC (same row set on every run,
every partitioning, every cluster size — re-runs of a failed stage
must not change the corpus) and CHEAP (a filter the parquet scan can
evaluate, no shuffle, no RNG state).

The standard construction: hash the row id to a uniform 64-bit value
and keep the row iff hash < rate * 2^64. We use the last-8-bytes-of-
MD5 little-endian hash (exactly DuckDB's `md5_number_lower`, the same
convention as functions/minhash._token_hash64) so every sampling
decision is reproducible in ANSI SQL for oracle checks — and, unlike
`DataFrame.sample`, is stable under partition reordering, speculative
retries, and cluster resizing, because it depends on row CONTENT
only.

Everything here is pure `pyspark.sql.functions` column algebra — one
whole-stage-codegen'd filter, pushable to the scan, zero UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FULL = 1 << 64


def hash_u64(col: Column, seed: int | str = 17) -> Column:
    """Uniform u64 per row as decimal(20,0): md5(value||'|'||seed),
    last 8 digest bytes, little-endian — DuckDB:
    md5_number_lower(value || '|' || seed)::UBIGINT."""
    hx = F.md5(F.concat_ws("|", col.cast("string"), F.lit(str(seed))))
    # digest bytes 8..15 little-endian = hex char pairs (31,32),(29,30),
    # ...,(17,18) concatenated most-significant-first
    le = F.concat(
        *[F.substring(hx, 1 + 2 * i, 2) for i in range(15, 7, -1)]
    )
    return F.conv(le, 16, 10).cast("decimal(20,0)")


def threshold(rate: float) -> int:
    """The exact integer keep-threshold for a rate — public so oracle
    twins inline the SAME integer instead of re-deriving it from a
    float."""
    return int(round(float(rate) * _FULL))


def _keep(col: Column, rate: float, seed: int | str) -> Column:
    thr = threshold(rate)
    if thr <= 0:
        return F.lit(False)
    if thr >= _FULL:
        return F.lit(True)
    return hash_u64(col, seed) < F.lit(str(thr)).cast("decimal(20,0)")


def sample_fraction(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    seed: int | str = 17,
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, by id hash."""
    return df.where(_keep(F.col(id_col), rate, seed))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int | str = 17,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source mixture sampling: keep a row iff its id hash clears
    its source's rate threshold. `rates` maps source value -> keep
    fraction in [0, 1]; unlisted sources get `default_rate`. Rates
    above 1.0 are clamped (up-sampling is repetition, not selection —
    use `mixture_repeat` for that).

    The rate table is a when()-chain (mixture configs are dozens of
    sources, not millions) — the whole predicate stays inside one
    codegen span and pushes to the scan."""
    keep = _keep(F.col(id_col), min(default_rate, 1.0), seed)
    for src, rate in sorted(rates.items()):
        keep = F.when(
            F.col(source_col) == F.lit(src),
            _keep(F.col(id_col), min(float(rate), 1.0), seed),
        ).otherwise(keep)
    return df.where(keep)


def mixture_repeat(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int | str = 17,
) -> DataFrame:
    """Mixture weights > 1: emit floor(rate) deterministic copies of
    every row plus one more iff the id hash clears the fractional
    part (so E[copies] = rate exactly, per-row deterministic). Adds
    `epoch` (0-based copy index) — downstream shuffles spread copies;
    identical text in distinct epochs is intentional repetition.
    Sources absent from `rates` default to 1.0 (keep once)."""
    epoch = F.lit(1)
    frac_keep = F.lit(False)
    for src, rate in sorted(rates.items()):
        r = float(rate)
        whole, frac = int(r), r - int(r)
        epoch = F.when(
            F.col(source_col) == F.lit(src), F.lit(whole)
        ).otherwise(epoch)
        frac_keep = F.when(
            F.col(source_col) == F.lit(src),
            _keep(F.col(id_col), frac, seed),
        ).otherwise(frac_keep)
    n_copies = epoch + frac_keep.cast("int")
    return (
        df.withColumn("_n", n_copies)
        .where(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )
