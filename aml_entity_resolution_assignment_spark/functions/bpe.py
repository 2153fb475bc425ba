"""Byte-pair encoding: learned merges, not the regex proxy.

The reference has no tokenizer (text.py's word_token_count is the
cheap estimator); a training-data pipeline budgeting tokens needs the
real thing. This is the Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units") algorithm:

  train — whitespace pre-tokenize, represent each word as a symbol
          sequence ending in an end-of-word marker, then repeatedly
          merge the most frequent adjacent symbol pair until
          `num_merges` merges are learned. Runs DRIVER-SIDE on a
          deterministic bounded sample (the merges table is
          vocabulary-sized model state, exactly like the MinHash
          permutations and the IVF/PQ codebooks in this engine —
          production tokenizers are trained the same way: once, on a
          sample, then shipped to every worker).
  encode — apply the merges in learned order to each word. Arrow
          pandas_udf with a per-batch word memo: web text repeats
          words heavily, so each distinct word is encoded once per
          batch regardless of its frequency.

Determinism: the sample is id-ordered, pair counting uses plain
dict arithmetic, and ties on count break lexicographically — the same
corpus yields byte-identical merge tables at any partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

EOW = "▁"  # end-of-word marker (SentencePiece's U+2581, visible)


def _pre_tokenize(text: str) -> list[str]:
    return text.lower().split()


def _word_freqs(texts) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        if not t:
            continue
        for w in _pre_tokenize(t):
            key = tuple(w) + (EOW,)
            freqs[key] = freqs.get(key, 0) + 1
    return freqs


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    sample: int = 2048,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a deterministic id-ordered
    sample. Returns the ordered merge list (the model)."""
    rows = df.select(text_col).orderBy(id_col).limit(sample).toPandas()[
        text_col
    ]
    freqs = _word_freqs(rows)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # max by count, ties lexicographic — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, n in freqs.items():
            out = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], memo: dict[str, list[str]]
) -> list[str]:
    got = memo.get(word)
    if got is not None:
        return got
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    memo[word] = syms
    return syms


def bpe_encode_udf(merges: list[tuple[str, str]]) -> Column:
    """text -> array<string> of BPE subword tokens (merge table in the
    closure; one dict lookup per adjacent pair per merge step, word
    results memoized per batch)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _f(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            toks: list[str] = []
            for w in _pre_tokenize(t):
                toks.extend(_encode_word(w, ranks, memo))
            out.append(toks)
        return pd.Series(out, index=texts.index, dtype="object")

    return F.pandas_udf(_f, ArrayType(StringType()))


def bpe_token_count_udf(merges: list[tuple[str, str]]) -> Column:
    """text -> BPE token count (same walk, no token materialization)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _f(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            n = 0
            for w in _pre_tokenize(t):
                n += len(_encode_word(w, ranks, memo))
            out.append(n)
        return pd.Series(out, index=texts.index, dtype="int32")

    return F.pandas_udf(_f, IntegerType())


def bpe_decode(tokens: list[str]) -> str:
    """Inverse of encode for a token list: concatenate and split words
    at the end-of-word marker (lossless for lowercase whitespace-
    normalized input — the exactness the roundtrip test pins)."""
    return "".join(tokens).replace(EOW, " ").strip()
