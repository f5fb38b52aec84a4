"""Text-analysis operators for training-data pipelines (extension
surface beyond the reference — SURVEY §7 phase 4).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen); no Python UDFs. Every helper returns Columns or
a narrow DataFrame transform so filters/projections still push into the
scan. Designed over the ``documents`` table (doc_id, text, lang,
source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small embedded stopword list (public, ubiquitous words) — enough for
# quality ratios without external assets.
EN_STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if"
).split()

# Marker words per language for the n-gram/keyword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "et"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por"),
}

TOKEN_PATTERN = r"\S+"
# BPE-ish word/number/punctuation splitter: runs of letters, runs of
# digits, or single non-space symbols — a cheap stand-in for a real
# tokenizer's pre-tokenization.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Whitespace (or BPE-ish) token count, entirely JVM-side."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def tokens(text: Column, lowercase: bool = True, pattern: str = TOKEN_PATTERN) -> Column:
    t = F.lower(text) if lowercase else text
    return F.regexp_extract_all(t, F.lit(pattern), F.lit(0))


def punct_ratio(text: Column) -> Column:
    # single-char class count by LENGTH DIFFERENCE after regexp_replace
    # (r13): the same value as size(regexp_extract_all(...)) — each
    # match is exactly one char — without allocating a one-string-per-
    # char match array per row (guide §1.2 per-task work).
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s]", "")
    )
    return n_punct / F.greatest(F.length(text), F.lit(1))


def digit_ratio(text: Column) -> Column:
    n = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return n / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(
    text: Column,
    stopwords: list[str] | None = None,
    toks: Column | None = None,
) -> Column:
    """``toks``: optionally pass an already-computed ``tokens(text)``
    array so a multi-metric projection (text_stats) tokenizes once."""
    sw = stopwords or EN_STOPWORDS
    toks = tokens(text) if toks is None else toks
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: long enough, mostly words, some
    stopwords, not digit/punct soup. Weights are arbitrary but fixed —
    the point is a deterministic, scan-fused scoring pass."""
    len_ok = F.least(F.length(text) / F.lit(400.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_ok
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0)))
        + F.lit(0.2) * F.least(stopword_ratio(text, toks=toks) * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio(text) * 5, F.lit(1.0)))
    )


def language_id(text: Column, toks: Column | None = None) -> Column:
    """Keyword-marker language ID: score = count of per-language marker
    words among the tokens; argmax wins, 'und' (undetermined) on zero.
    Expressed as a CASE over greatest() so it stays in codegen."""
    toks = tokens(text) if toks is None else toks

    def has_marker(markers):
        # Factory closure: the HOF callback must have exactly one
        # parameter — a default-arg capture would make PySpark treat it
        # as the 2-arg (element, index) form.
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, has_marker(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # fixed dict order = deterministic tie-break
        out = out.when(scores[lang] == best, F.lit(lang))
    return out


# PII patterns kept RE2-compatible (no lookarounds) so the same regex
# runs identically in Spark (Java regex) and the DuckDB oracle (RE2).
# Order matters: SSN before PHONE (the phone pattern's digit/dash run
# would otherwise consume SSN-shaped tokens first).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Replace emails, URLs, phone-like digit runs, and SSN-shaped
    tokens with typed placeholders — the standard first scrub pass of a
    training-data pipeline. Chained regexp_replace stays fully inside
    whole-stage codegen (one scan, no UDF).

    Deliberately recall-biased: the phone pattern also captures other
    long digit/dash runs (e.g. ISO dates) — over-scrubbing is the safe
    direction for PII; tighten patterns per-corpus if dates matter."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


FP_MOD = 1_000_000_007
FP_BASE = 31


def fingerprint(text: Column) -> Column:
    """Polynomial rolling-hash document fingerprint:
    h = sum(code(c_i) * 31^i) mod 1e9+7, folded left-to-right as
    h = (h*31 + code) % M via a higher-order aggregate — no UDF, stays
    inside int64 (M*31 + 0x10FFFF << 2^63)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One scan-fused pass computing the whole text-analysis surface.

    r13: the lowered token array is projected ONCE as a bound column
    and shared by every token-consuming metric (n_tokens, stopword
    ratio, quality's stopword term, language-ID) — the previous shape
    re-ran the tokenizing regex up to 5x per row. ``\\S+`` token count
    is case-insensitive, so counting the lowered array is identical.
    """
    t = F.col(text_col)
    # function-unique internal name so an input frame carrying a
    # same-named column can never make the reference ambiguous
    bound = df.select(
        "doc_id", t.alias(text_col), tokens(t).alias("__ts_toks")
    )
    toks = F.col("__ts_toks")
    return bound.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        token_count(t, BPE_ISH_PATTERN).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        digit_ratio(t).alias("digit_ratio"),
        stopword_ratio(t, toks=toks).alias("stopword_ratio"),
        quality_score(t, toks=toks).alias("quality"),
        language_id(t, toks=toks).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    Whitespace tokenization (matches the jaccard-shingle oracle
    convention); score = tf * ln(N / df). Output carries only integer
    columns (tf, df, rank) — the float score orders the rank but never
    reaches the output, so the result is exactly oracle-comparable.

    Scale notes: two hash aggregations (doc×term, then term) and one
    term-keyed join — all map-side-combinable; the corpus size N joins
    in as a broadcast scalar. The per-doc top-k is a bounded window
    (rank ≤ k filter collapses to a running-rank scan, no full sort of
    the corpus).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(doc_id),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "__score",
            F.col("tf")
            * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(doc_id).orderBy(
        F.col("__score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(doc_id, "term", "tf", "df", "rk")
    )


def _ws_tokens(text_col: str) -> F.Column:
    """Whitespace tokens of a trimmed, lowercased doc (oracle-matching
    convention shared with the jaccard/TF-IDF surface)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document.

    - ``top_token_frac``: most frequent token's share of all tokens
    - ``top_bigram_frac``: most frequent bigram's share of all bigrams
    - ``dup_token_frac``: share of tokens whose token appears >1 time

    High values flag boilerplate/spam for corpus filtering. Each
    fraction is one exact-integer division, so results are
    bit-identical to the SQL oracle.

    Scale notes: explode → two hash aggregations (doc×token then doc),
    both map-side combinable; no windows, no self-joins.
    """
    # Tokenize once per row; both explode paths read the materialized
    # array instead of re-running the regex split 3x.
    base = df.select("doc_id", _ws_tokens(text_col).alias("__w"))
    toks = base.select(
        "doc_id", F.explode(F.col("__w")).alias("term")
    ).filter(F.col("term") != "")
    tok_counts = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("__max_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
            "__dup_c"
        ),
    )
    big = base.select(
        "doc_id",
        F.explode(
            # slice length must keep start+length within int32 (ANSI
            # overflow nulls the result) — size(__w) is always enough.
            F.zip_with(
                F.col("__w"),
                F.slice(F.col("__w"), 2, F.size(F.col("__w"))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    ).filter(F.col("bg").contains(" "))
    # zip_with pads the tail with null; concat_ws drops nulls, leaving a
    # lone final token with no space — the contains-space filter drops it.
    bg_counts = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum("c").alias("__n_bg"), F.max("c").alias("__max_bg")
    )
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__max_c").cast("double") / F.col("n_tokens")).alias(
                "top_token_frac"
            ),
            (
                F.col("__max_bg").cast("double") / F.col("__n_bg")
            ).alias("top_bigram_frac"),
            (F.col("__dup_c").cast("double") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    The embedding-pipeline front door: every chunk carries its parent
    ``doc_id``, a 0-based ``chunk_idx``, its token count, and the chunk
    text. Stride = chunk_tokens - overlap; the final chunk may be
    shorter. Pure generator expressions (sequence/posexplode/slice) —
    rows fan out executor-side with no shuffle at all until the caller
    aggregates.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # Tokenize once, then derive starts from the materialized array —
    # the regex split runs one time per row, not per reference.
    base = df.select("doc_id", _ws_tokens(text_col).alias("__toks"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(F.col("__toks")), F.lit(1)),
        F.lit(stride),
    )
    chunked = base.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_idx", "start"),
        F.col("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("start"), chunk_tokens)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def sentence_udtf():
    """Python UDTF (user-defined TABLE function, Spark 4): one text in,
    a row per sentence out — the UDTF extension point of SURVEY §2.3's
    UDF/UDAF/UDTF row. Returns the class for registration:

        spark.udtf.register("split_sentences", sentence_udtf())
        spark.sql("SELECT d.doc_id, s.* FROM documents d, "
                  "LATERAL split_sentences(d.text) s")

    For this segmentation the generator built-ins (posexplode of a
    split) are the fast JVM path — tested equivalent; the UDTF form is
    the escape hatch for logic that genuinely needs Python per row
    (model-based segmenters, tokenizer libraries).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(". ")):
                s = raw.strip()
                if s:
                    yield i, s

    return SplitSentences


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 relevance for a fixed query-term set.

    Lucene-style BM25: idf = ln(1 + (N - df + .5)/(df + .5)), tf norm
    with k1/b length normalization (avgdl expressed as dl*N/sumdl so
    every factor derives from integer aggregates). Per-(doc,term)
    scores are floor-quantized to 1e-6 BEFORE the per-doc sum, so the
    aggregate is an integer sum — immune to float accumulation order —
    and the result is exactly oracle-comparable; ln's ≤1-ulp
    cross-engine wobble is 10 orders of magnitude below the quantum.

    Scale notes: one tokenize pass feeds both the per-doc length and
    the (doc,term) tf aggregation; df/N/sumdl are broadcast scalars;
    the final top-k is a TakeOrdered, never a full sort.
    """

    toks = df.select(
        F.col(doc_id),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy(doc_id).agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy(doc_id, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    sumdl = dl.agg(F.sum("dl").cast("double").alias("__sumdl"))

    n, sd = F.col("__n"), F.col("__sumdl")
    idf = F.log(F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    norm = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") * n / sd)))
    )
    per = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, doc_id)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(sumdl))
        .select(
            F.col(doc_id),
            F.floor(idf * norm * F.lit(1_000_000.0)).cast("long").alias("__s_e6"),
        )
    )
    agg = per.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("__s_e6").alias("score_e6")
    )
    # Top-k via orderBy().limit(k) -> TakeOrderedAndProject: each
    # partition keeps its k best, the driver merges k*P rows. An
    # unpartitioned row_number window here would instead drag EVERY
    # scoring doc into one partition (WindowExec "No Partition
    # Defined") — the pattern that dies at corpus scale. Ranks are
    # derived AFTER the limit, over exactly k rows, window-free
    # (operators.relational.rank_small_result).
    from ..operators.relational import rank_small_result

    top = agg.orderBy(F.col("score_e6").desc(), F.col(doc_id).asc()).limit(k)
    return rank_small_result(top, "score_e6", doc_id, rank_col="rk").select(
        doc_id, "n_terms", "score_e6", "rk"
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      doc_id: str = "doc_id") -> DataFrame:
    """Per-document zlib compression ratio — a classic corpus-quality
    signal: highly compressible text (ratio << 1 relative to prose) is
    boilerplate/repetition; near-incompressible text is noise/binary
    junk. Both tails get filtered in pretraining pipelines.

    zlib is CPU-bound Python, so this is an Arrow-batched pandas UDF
    (the sanctioned slow path); level 6 matches the common default.
    Ratio = deflated bytes / raw utf-8 bytes, 1.0 for empty docs.
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: the module's future-annotations mode stringifies
    # them, which pandas_udf's signature introspection rejects
    @pandas_udf("double")
    def zratio(s):
        def one(t):
            b = (t or "").encode("utf-8")
            if not b:
                return 1.0
            return len(zlib.compress(b, 6)) / len(b)

        return s.map(one)

    return df.select(F.col(doc_id), zratio(F.col(text_col)).alias("z_ratio"))


def unigram_surprisal(
    df: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model surprisal per document — the classic
    LM-based corpus quality filter (CCNet-style): documents whose
    tokens are improbable under the corpus's own unigram model are
    noise/junk candidates; improbably LOW surprisal means boilerplate.

    The model IS the corpus term-frequency table: s(t) = -ln(tf_t /
    total_tokens). Per-token surprisal quantizes to 1e-6 ints BEFORE
    the per-doc sum (order-invariant integer aggregation, exactly
    oracle-comparable); the mean divides two exact ints at the end.

    Scale: one tokenize pass; the (doc,term) and term aggregations are
    map-side combinable; the vocabulary rides into the per-doc join on
    its natural term key (no broadcast assumption: vocab can be huge).
    """
    toks = df.select(
        F.col(doc_id),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    doc_tf = toks.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("tf_doc"))
    vocab = doc_tf.groupBy("term").agg(F.sum("tf_doc").alias("tf"))
    total = vocab.agg(F.sum("tf").cast("double").alias("__total"))
    s_e6 = F.floor(
        -F.log(F.col("tf").cast("double") / F.col("__total")) * F.lit(1_000_000.0)
    ).cast("long")
    scored = (
        doc_tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(F.col(doc_id), F.col("tf_doc"), s_e6.alias("__s_e6"))
    )
    return scored.groupBy(doc_id).agg(
        F.sum("tf_doc").cast("long").alias("n_tokens"),
        F.sum(F.col("tf_doc") * F.col("__s_e6")).alias("surprisal_e6"),
        (
            F.sum(F.col("tf_doc") * F.col("__s_e6")).cast("double")
            / F.sum("tf_doc").cast("double")
        ).alias("avg_surprisal_e6"),
    )


def bigram_surprisal(
    df: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram language-model surprisal per document — one order up from
    ``unigram_surprisal``: the corpus's own conditional model
    P(w2|w1) = c(w1,w2)/c(w1) scores every adjacent token pair, so
    repeated boilerplate *phrases* (not just common words) read as
    improbably low surprisal and junk token sequences as improbably
    high. This is the KenLM-style filter of CCNet/Gopher pipelines,
    restricted to order 2 so the model stays a plain aggregate table.

    Same exactness contract as the unigram pass: per-bigram surprisal
    quantizes to 1e-6 ints BEFORE the per-doc sum (order-invariant
    integer aggregation, oracle-comparable bit-for-bit); the mean is
    one division of exact ints at the end. Documents with fewer than
    two tokens have no bigrams and drop out — same on both engines.

    Scale: tokens stay put — pairing is a positional self-lookup
    inside the exploded array (F.get, no self-join); the (w1,w2) and
    (w1) model aggregations are map-side combinable, and the model
    joins back on its natural (w1,w2) key — no broadcast assumption,
    the bigram table can be arbitrarily large.
    """
    t = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    ex = df.select(F.col(doc_id), t.alias("__t")).select(
        F.col(doc_id),
        F.col("__t"),
        F.posexplode("__t").alias("__pos", "w1"),
    )
    # F.get is 0-based and NULL-safe past the end (no ANSI throw); the
    # filter keeps only positions with a successor.
    bi = ex.filter(F.col("__pos") < F.size("__t") - 1).select(
        F.col(doc_id),
        F.col("w1"),
        F.get("__t", F.col("__pos") + 1).alias("w2"),
    )
    doc_bi = bi.groupBy(doc_id, "w1", "w2").agg(F.count(F.lit(1)).alias("tf_doc"))
    c2 = doc_bi.groupBy("w1", "w2").agg(F.sum("tf_doc").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    s_e6 = F.floor(
        -F.log(F.col("n2").cast("double") / F.col("n1").cast("double"))
        * F.lit(1_000_000.0)
    ).cast("long")
    model = c2.join(c1, "w1").select("w1", "w2", s_e6.alias("__s_e6"))
    scored = doc_bi.join(model, ["w1", "w2"])
    return scored.groupBy(doc_id).agg(
        F.sum("tf_doc").cast("long").alias("n_bigrams"),
        F.sum(F.col("tf_doc") * F.col("__s_e6")).alias("surprisal_e6"),
        (
            F.sum(F.col("tf_doc") * F.col("__s_e6")).cast("double")
            / F.sum("tf_doc").cast("double")
        ).alias("avg_surprisal_e6"),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    form: str = "NFKC",
) -> DataFrame:
    """Unicode normalization (default NFKC) + whitespace collapse — the
    standard first normalization pass of an LLM data pipeline
    (fullwidth forms, ligatures, compatibility characters all fold to
    canonical text before tokenization/dedup, so visually-identical
    strings hash identically).

    unicodedata is stdlib-but-Python, so this is an Arrow-batched
    pandas UDF (the sanctioned slow path, like compression_ratio); the
    whitespace collapse afterwards runs as a codegen regexp. Returns
    (id, norm_text, changed).
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    # no annotations: future-annotations mode stringifies them, which
    # pandas_udf signature introspection rejects (module convention)
    @pandas_udf("string")
    def norm(s):
        return s.map(lambda t: unicodedata.normalize(form, t or ""))

    out = df.select(
        F.col(doc_id),
        F.col(text_col).alias("__raw"),
        F.regexp_replace(
            F.trim(norm(F.col(text_col))), r"\s+", " "
        ).alias("norm_text"),
    )
    return out.select(
        doc_id,
        "norm_text",
        # coalesce: NULL text normalizes to '' (a change), but the
        # null-propagating != would report changed = NULL and the row
        # would vanish from both filter(changed) and filter(~changed)
        F.coalesce(
            F.col("norm_text")
            != F.regexp_replace(F.trim(F.col("__raw")), r"\s+", " "),
            F.lit(True),
        ).alias("changed"),
    )
