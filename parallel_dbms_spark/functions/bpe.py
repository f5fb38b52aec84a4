"""Byte-pair-encoding subword tokenizer — learned on the corpus,
applied distributed.

The reference engine's text surface stops at whitespace tokens; an LLM
data pipeline needs *subword* token counts (context-window budgeting,
pricing, packing) from a tokenizer learned on the corpus itself. This
is the classic BPE of Sennrich et al. 2016 (arXiv:1508.07909), split
the way every production trainer splits it:

- **model building is driver-side on a bounded word-frequency table**
  — BPE's training input is not the corpus, it is the (word, freq)
  vocabulary, which is orders of magnitude smaller and capped here at
  ``vocab_cap`` rows (TakeOrdered, not a sort). This is the same
  sanctioned pattern as IVF centroid / PQ codebook training: only
  model-sized data reaches the driver.
- **application is one Arrow-batched corpus pass** — the learned
  merge ranks ship to executors inside the pandas-UDF closure (model
  parameters, broadcast by task serialization); each batch memoizes
  encodings per distinct word, so hot words cost one encode per
  batch. No shuffle at all: tokenization is scan-fused.

Word model: lowercase whitespace words, split to characters with a
``</w>`` end-of-word marker (so merges can't cross word boundaries
and the original text is reconstructable by stripping markers).
Deterministic: pair counts tie-break lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_freq_table(
    df: DataFrame,
    text_col: str = "text",
    vocab_cap: int = 50_000,
) -> DataFrame:
    """(word, freq) for the ``vocab_cap`` most frequent whitespace
    words — one map-side-combined aggregation + TakeOrdered; ties
    break on the word so the table (and everything trained on it) is
    deterministic."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(vocab_cap)
    )


EOW = "</w>"


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    a, b = pair
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_bpe_from_vocab(vocab: list, n_merges: int = 200) -> list:
    """Sennrich BPE on a (word, freq) list: repeatedly merge the
    most frequent adjacent symbol pair (ties: lexicographic pair).
    Pure driver-side function over the bounded vocabulary; returns the
    ordered merge list [(left, right), ...]."""
    words = {}
    for word, freq in vocab:
        sym = tuple(word) + (EOW,)
        words[sym] = words.get(sym, 0) + freq
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, freq in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest (left, right) pair
        best_count = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        if best_count < 2:
            break  # nothing repeats; further merges are noise
        merges.append(best_pair)
        words = {
            _merge_word(sym, best_pair): freq for sym, freq in words.items()
        }
    return merges


def learn_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    vocab_cap: int = 50_000,
) -> list:
    """Distributed word counting + driver-side merge learning."""
    vocab = [
        (r["word"], r["freq"]) for r in word_freq_table(df, text_col, vocab_cap).collect()
    ]
    return learn_bpe_from_vocab(vocab, n_merges)


def encode_word(word: str, ranks: dict) -> list:
    """Encode ONE word with learned merge ranks (lowest rank first) —
    the standard greedy BPE apply."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — one Arrow-batched
    pass; the merge table rides in the closure, encodings memoized per
    distinct word per batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    # no annotations: future-annotations mode stringifies them, which
    # pandas_udf signature introspection rejects (module convention)
    @pandas_udf("array<string>")
    def bpe(s):
        cache = {}

        def enc(text):
            out = []
            for w in (text or "").lower().split():
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return s.map(enc)

    return df.select(
        F.col(doc_id),
        bpe(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
