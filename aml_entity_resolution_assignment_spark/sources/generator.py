"""Deterministic synthetic web-page generator with ground truth.

Analog of the reference's seeded Faker generator
(/root/reference/src/generation.py:149-305: seeded entities + 0-3 noisy
duplicate records each + ~5% doppelgängers), transposed to the graft's
web-page domain (FIXTURES.md §1) and to Spark's execution model:

* `spark.range(n_entities)` partitions the entity space;
* every attribute of every record is a pure function of
  (seed, entity_index, dup_index) via per-entity `random.Random`
  instances — **no partition-dependent state**, so output is
  byte-identical across runs and parallelism levels (required for the
  scaling-efficiency evidence and the extracted-text invariant);
* record synthesis runs inside `mapInPandas` (Arrow batches).

Each entity is a "site": a hostname, a page title, and a body text of
vocabulary words. Duplicate records are re-crawls / mirrors / url
variants with token-level noise (analog of generation.py:53-76 string
noise). Doppelgängers share the title but live on a different host with
~45% token overlap — candidates that blocking WILL produce and the
classifier must reject.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
LANGS = ["en", "pl", "es", "de"]
TLDS = ["com", "org", "net", "io", "pl", "de", "es", "info"]

# Deterministic vocabulary: syllable products, no external data.
_SYL_A = ["ta", "re", "mo", "li", "ka", "so", "ve", "nu", "pi", "da", "fo", "ge"]
_SYL_B = ["ran", "bel", "mir", "ton", "las", "ker", "von", "dul", "pex", "gor"]
_SYL_C = ["a", "is", "or", "en", "um", "ix", ""]
VOCAB = [a + b + c for a in _SYL_A for b in _SYL_B for c in _SYL_C]  # 840 words

_BASE_TS = datetime(2024, 1, 1)


def _entity_rng(seed: int, i: int) -> random.Random:
    return random.Random((seed << 20) ^ (i * 2654435761 % (1 << 31)))


def _words(rng: random.Random, n: int) -> list[str]:
    return [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n)]


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_html(title: str, text: str) -> bytes:
    """Canonical page HTML; functions.normalize.extract_text inverts it."""
    return (
        "<html><head><title>"
        + _escape(title)
        + "</title></head><body><p>"
        + _escape(text)
        + "</p></body></html>"
    ).encode("utf-8")


def _noise_tokens(rng: random.Random, tokens: list[str], rate: float) -> list[str]:
    """Token-level noise: drop / duplicate / swap / one-char typo
    (analog of generation.py:53-76, applied per-token)."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if rng.random() < rate:
            op = rng.choice(["drop", "dup", "swap", "typo"])
            if op == "drop":
                i += 1
                continue
            if op == "dup":
                out.append(t)
                out.append(t)
                i += 1
                continue
            if op == "swap" and i + 1 < len(tokens):
                out.append(tokens[i + 1])
                out.append(t)
                i += 2
                continue
            # typo: replace one char
            if len(t) >= 2:
                pos = rng.randrange(len(t))
                ch = chr(ord("a") + rng.randrange(26))
                t = t[:pos] + ch + t[pos + 1 :]
        out.append(t)
        i += 1
    return out


def _make_entity(seed: int, i: int) -> dict:
    rng = _entity_rng(seed, i)
    host_words = _words(rng, 2)
    tld = TLDS[rng.randrange(len(TLDS))]
    host = f"{host_words[0]}{host_words[1]}.{tld}"
    title = " ".join(w.capitalize() for w in _words(rng, rng.randint(3, 6)))
    body = _words(rng, rng.randint(50, 120))
    lang = LANGS[rng.randrange(len(LANGS))]
    path = "/".join(_words(rng, 2))
    return {
        "host": host,
        "title": title,
        "body": body,
        "lang": lang,
        "path": path,
        "n_dups": rng.randint(0, 3),  # generation.py:240 noise_multiplier
        "rng_state": rng,
    }


def _records_for_entity(
    seed: int, i: int, entity_id: str, ent: dict, noise_rate: float
) -> list[dict]:
    rng = ent["rng_state"]
    records = []
    for j in range(ent["n_dups"] + 1):
        mirror = j > 0 and rng.random() < 0.15
        if mirror:
            # mirror site: same content, different host — only the
            # text/minhash blocking keys can catch these
            mw = _words(rng, 1)[0]
            host = f"{mw}{ent['host']}"
        else:
            host = ent["host"]
        scheme = "https" if rng.random() < 0.7 else "http"
        www = "www." if rng.random() < 0.4 else ""
        tracking = f"?utm_source=s{rng.randrange(10)}" if rng.random() < 0.3 else ""
        suffix = f"/v{j}" if j > 0 and rng.random() < 0.5 else ""
        url = f"{scheme}://{www}{host}/{ent['path']}{suffix}{tracking}"

        if j == 0:
            tokens = list(ent["body"])
            title = ent["title"]
        else:
            tokens = _noise_tokens(rng, ent["body"], noise_rate)
            title = ent["title"]
            if rng.random() < 0.2:  # light title noise
                tt = title.split()
                pos = rng.randrange(len(tt))
                w = tt[pos]
                if len(w) >= 3:
                    p = rng.randrange(len(w) - 1)
                    tt[pos] = w[:p] + w[p + 1] + w[p] + w[p + 2 :]
                title = " ".join(tt)
        text = " ".join(tokens)
        ts = _BASE_TS + timedelta(
            days=rng.randrange(365), seconds=rng.randrange(86400)
        )
        records.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": render_html(title, text),
                "text": text,
                "lang": ent["lang"],
                "entity_id": entity_id,
            }
        )
    return records


def _doppelganger(seed: int, i: int, ent: dict) -> dict:
    """A different real-world entity that shares the title and ~45% of
    body tokens but lives on another host (generation.py:157-166 analog:
    same name, different identifiers)."""
    rng = random.Random((seed << 21) ^ (i * 40503 % (1 << 31)))
    host_words = _words(rng, 2)
    tld = TLDS[rng.randrange(len(TLDS))]
    keep = [t for t in ent["body"] if rng.random() < 0.45]
    fresh = _words(rng, max(1, len(ent["body"]) - len(keep)))
    body = keep + fresh
    rng.shuffle(body)
    return {
        "host": f"{host_words[0]}{host_words[1]}.{tld}",
        "title": ent["title"],
        "body": body,
        "lang": ent["lang"],
        "path": "/".join(_words(rng, 2)),
        "n_dups": rng.randint(0, 1),
        "rng_state": rng,
    }


def generate_pages(
    spark: SparkSession,
    n_entities: int = 1000,
    seed: int = SEED,
    noise_rate: float = 0.08,
    doppel_rate: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Pages + ground-truth entity_id as one DataFrame.

    Column `entity_id` is the hidden truth label — callers split it off
    (`.drop("entity_id")` for the pipeline input, `.select("url",
    "entity_id")` for pages_truth). Deterministic for a given
    (n_entities, seed, noise_rate, doppel_rate) regardless of
    partitioning.
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"].tolist():
                i = int(i)
                ent = _make_entity(seed, i)
                rows.extend(
                    _records_for_entity(seed, i, f"E{i:08d}", ent, noise_rate)
                )
                drng = random.Random((seed << 22) ^ i)
                if drng.random() < doppel_rate:
                    twin = _doppelganger(seed, i, ent)
                    rows.extend(
                        _records_for_entity(
                            seed, i, f"E{i:08d}D", twin, noise_rate
                        )
                    )
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "entity_id"],
            )
            yield out

    schema = (
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, entity_id string"
    )
    df = (
        spark.range(0, n_entities, numPartitions=partitions)
        .mapInPandas(gen, schema=schema)
        # urls can collide across entities only if hosts+paths collide;
        # drop such accidental collisions deterministically
        .dropDuplicates(["url"])
    )
    return df
