"""Tests for repetition stats, decontamination, and document chunking."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parallel_dbms_spark.functions.dedup import decontaminate
from parallel_dbms_spark.functions.text import chunk_documents, repetition_stats


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam"),
            Row(doc_id=2, text="all four tokens differ"),
        ]
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # doc 1: one token repeated 4x -> every fraction maxes out
    assert got[1].n_tokens == 4
    assert got[1].top_token_frac == 1.0
    assert got[1].top_bigram_frac == 1.0  # "spam spam" x3
    assert got[1].dup_token_frac == 1.0
    # doc 2: all distinct -> no repetition, no duplicate mass
    assert got[2].top_token_frac == 0.25
    assert got[2].top_bigram_frac == 1.0 / 3.0
    assert got[2].dup_token_frac == 0.0


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta theta")]
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's full 8-gram verbatim
            Row(doc_id=1, text="intro alpha beta gamma delta epsilon zeta eta theta outro"),
            # shares 7 tokens but never a full 8-token run
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta eta DIFFERENT theta"),
            Row(doc_id=3, text="completely unrelated words here padding more tokens now"),
        ]
    )
    got = {r.doc_id: r.n_hits for r in decontaminate(corpus, bench, n=8).collect()}
    assert got == {1: 1}


def test_chunk_documents_shapes(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10)))]
    )
    chunks = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    )
    # stride 2 over 10 tokens -> starts 0,2,4,6,8; last chunk truncated
    assert [c[0] for c in chunks] == [0, 1, 2, 3, 4]
    assert [c[1] for c in chunks] == [4, 4, 4, 4, 2]
    assert chunks[0][2] == "t0 t1 t2 t3"
    assert chunks[4][2] == "t8 t9"
    # consecutive chunks overlap by exactly `overlap` tokens
    assert chunks[0][2].split()[-2:] == chunks[1][2].split()[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_sentence_udtf_matches_explode(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.text import sentence_udtf

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="First one. Second two. Third"),
            Row(doc_id=2, text="Only sentence"),
        ]
    )
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_sentences", sentence_udtf())
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, s.sent_idx, s.sentence "
                "FROM udtf_docs d, LATERAL split_sentences(d.text) s"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.posexplode(F.split("text", r"\. ")).alias("sent_idx", "sentence"),
            )
            .filter(F.trim("sentence") != "")
            .select("doc_id", "sent_idx", F.trim("sentence").alias("sentence"))
            .collect(),
        )
    )
    assert got == want


def test_weighted_mean_udaf_matches_exact(spark):
    from pyspark.sql import functions as F

    from conftest import SF_SMOKE
    from parallel_dbms_spark.catalog import load_table
    from parallel_dbms_spark.functions.pandas_ops import weighted_mean_by_group

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {
        r[0]: r.weighted_mean
        for r in weighted_mean_by_group(
            li, "l_returnflag", "l_extendedprice", "l_quantity"
        ).collect()
    }
    exact = {
        r[0]: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_quantity").cast("decimal(18,2)")
                ).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            ).alias("wm")
        )
        .collect()
    }
    for k in exact:
        assert abs(got[k] - exact[k]) <= 1e-9 * abs(exact[k])


def test_bm25_ranks_planted_relevant_doc_first(spark):
    from parallel_dbms_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark join filter"),
            Row(doc_id=2, text="spark appears once in a much longer document "
                               "with many other words diluting its relevance"),
            Row(doc_id=3, text="nothing relevant here at all"),
            Row(doc_id=4, text="join filter"),
        ]
    )
    got = bm25_topk(docs, terms=("spark", "join", "filter"), k=10).collect()
    by_id = {r.doc_id: r for r in got}
    # doc 3 matches no query term -> absent
    assert 3 not in by_id
    # doc 1 hits all three terms with high tf in a short doc -> rank 1
    assert by_id[1].rk == 1 and by_id[1].n_terms == 3
    # ranks are dense, ordered by the quantized score
    ordered = sorted(got, key=lambda r: r.rk)
    scores = [r.score_e6 for r in ordered]
    assert scores == sorted(scores, reverse=True)
    assert [r.rk for r in ordered] == list(range(1, len(got) + 1))
    # length normalization: doc 2's single diluted hit scores below
    # doc 4's two exact hits
    assert by_id[4].score_e6 > by_id[2].score_e6


def test_compression_ratio_separates_repetitive_from_varied(spark):
    from parallel_dbms_spark.functions.text import compression_ratio

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam " * 200),
            Row(doc_id=2, text=" ".join(f"w{i}x{i * 7 % 97}" for i in range(200))),
            Row(doc_id=3, text=""),
        ]
    )
    got = {r.doc_id: r.z_ratio for r in compression_ratio(docs).collect()}
    assert got[1] < 0.1            # pure repetition deflates to almost nothing
    assert got[2] > got[1] * 3     # varied text compresses far less
    assert got[3] == 1.0           # empty doc convention
    # deterministic across partitionings
    again = {r.doc_id: r.z_ratio
             for r in compression_ratio(docs.repartition(3)).collect()}
    assert again == got


def test_bigram_surprisal_semantics_planted(spark):
    # Corpus: the phrase "a b" dominates, so P(b|a) is high and a doc
    # made of it scores LOW avg surprisal; a doc whose bigrams are all
    # unique scores HIGH. Docs under 2 tokens produce no row.
    from parallel_dbms_spark.functions.text import bigram_surprisal

    rows = [
        (1, "a b a b a b a b"),     # the dominant phrase: P(b|a) high
        (2, "a c a d a e a f"),     # same context 'a', rare successors
        (3, "a b a b"),             # more of the phrase
        (4, "solo"),                # 1 token -> no bigrams -> no row
        (5, ""),                    # empty -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 7
    assert out[2]["n_bigrams"] == 7
    # predictable phrase scores lower than rare continuations
    assert out[1]["avg_surprisal_e6"] < out[2]["avg_surprisal_e6"]
    # exactness: c(a)=10 total a-contexts, c(a,b)=6 -> P(b|a)=0.6;
    # (b,a) is b's only successor -> P=1 -> surprisal 0
    import math

    s_ab = math.floor(-math.log(6 / 10) * 1e6)
    assert out[3]["surprisal_e6"] == 2 * s_ab  # (a,b)x2 + (b,a)x1 at 0


def test_bpe_learns_sennrich_example_merges(spark):
    # The canonical BPE walkthrough (Sennrich et al. 2016 §3.2 style):
    # with 'low' x5 and 'lower' x2 etc the first merges fuse the most
    # frequent adjacent pairs, deterministically.
    from parallel_dbms_spark.functions.bpe import (
        learn_bpe_from_vocab,
        encode_word,
    )

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_from_vocab(vocab, n_merges=10)
    # 'es' (9), then 'est' (9), then 'est</w>' (9) are the classic
    # first merges of this vocabulary
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # with only the first 3 merges applied, 'newest' keeps the est</w>
    # suffix as its learned subword
    ranks3 = {tuple(p): i for i, p in enumerate(merges[:3])}
    toks = encode_word("newest", ranks3)
    assert "".join(toks) == "newest</w>"
    assert "est</w>" in toks
    # with all 10 merges this frequent word fuses completely
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest</w>"]
    # an unseen word still encodes (falls back to learned pieces/chars)
    unseen = encode_word("lowest", ranks)
    assert "".join(unseen) == "lowest</w>"


def test_bpe_distributed_learn_apply_roundtrip(spark):
    from parallel_dbms_spark.functions.bpe import apply_bpe, learn_bpe

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat on the mats"),
        (3, "a cat and a mat and a hat"),
    ] * 5
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    merges = learn_bpe(df, n_merges=50)
    assert merges  # something repeated, so something merged
    out = apply_bpe(df, merges).collect()
    assert len(out) == df.count()
    by_id = {r["doc_id"]: r for r in out}
    src = {i: t for i, (_, t) in enumerate(rows)}
    for i, r in by_id.items():
        # stripping the end-of-word markers reconstructs the text
        joined = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        assert joined == " ".join(src[i].lower().split())
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
    # merges learned => fewer BPE tokens than characters
    chars = sum(len(t.replace(" ", "")) for t in src.values())
    n_toks = sum(r["n_bpe_tokens"] for r in out)
    assert n_toks < chars


def test_heavy_hitters_exact_vs_full_groupby(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.frequency import heavy_hitters

    # Zipf-ish corpus: term_i appears ~N/i times, plus long-tail noise
    rows = []
    doc = 0
    for i in range(1, 40):
        for _ in range(200 // i):
            rows.append((doc, f"term{i} filler{doc % 97} junk{doc % 31}"))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    hh = heavy_hitters(df, k=10, cap=64).collect()
    full = (
        df.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(10)
        .collect()
    )
    assert [(r["term"], r["n"]) for r in hh] == [
        (r["term"], r["n"]) for r in full
    ]


def test_heavy_hitters_small_cap_still_superset_of_head(spark):
    # Even a tiny cap must keep the single dominant term (MG bound).
    from parallel_dbms_spark.functions.frequency import heavy_hitters

    rows = [(i, "dominant " + f"rare{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    hh = heavy_hitters(df, k=1, cap=8).collect()
    assert hh[0]["term"] == "dominant"
    assert hh[0]["n"] == 500


# ------------------------------------------------------------------ CMS
def _zipf_terms(spark):
    # term_i appears ~1000/i times: t1 x1000, t2 x500, t3 x333, ...
    rows = []
    for i in range(1, 40):
        rows.extend([Row(term=f"t{i}")] * (1000 // i))
    return spark.createDataFrame(rows)


def test_cms_never_undercounts_and_is_tight_on_heavy_terms(spark):
    from parallel_dbms_spark.functions.frequency import cms_build, cms_estimate

    terms = _zipf_terms(spark)
    true = {r.term: r.n for r in
            terms.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = cms_build(terms, depth=4, width=2048)
    probes = terms.select("term").distinct()
    est = {r.term: r.est for r in
           cms_estimate(sk, probes, depth=4, width=2048).collect()}
    assert set(est) == set(true)
    n_total = sum(true.values())
    for t, n in true.items():
        assert est[t] >= n, (t, est[t], n)  # one-sided error guarantee
        # standard CMS bound: overcount <= e*n/width w.h.p.; at this
        # width/corpus it is ~0-5 counts
        assert est[t] - n <= max(8, 3 * n_total // 2048), (t, est[t], n)
    # heavy head is exact at this width with high probability
    assert est["t1"] == true["t1"]


def test_cms_absent_term_estimates_near_zero(spark):
    from parallel_dbms_spark.functions.frequency import cms_build, cms_estimate

    terms = _zipf_terms(spark)
    sk = cms_build(terms, depth=4, width=2048)
    ghosts = spark.createDataFrame([Row(term="never-seen-xyz"), Row(term="ghost2")])
    est = {r.term: r.est for r in
           cms_estimate(sk, ghosts, depth=4, width=2048).collect()}
    assert est["never-seen-xyz"] <= 8 and est["ghost2"] <= 8


def test_cms_merge_is_exactly_linear(spark):
    from parallel_dbms_spark.functions.frequency import cms_build, cms_merge

    terms = _zipf_terms(spark).withColumn(
        "half", F.xxhash64("term", F.lit(99)) % 2 == 0
    )
    a, b = terms.filter("half"), terms.filter("not half")
    merged = {(r.d, r.w): r.cnt for r in
              cms_merge(cms_build(a), cms_build(b)).collect()}
    whole = {(r.d, r.w): r.cnt for r in cms_build(terms).collect()}
    assert merged == whole  # counters are sums -> merge is EXACT


def test_cms_md5_mode_matches_reference_placement(spark):
    """The oracle-checkable md5 cell mode places cells EXACTLY where
    an independent md5 implementation says (5-hex prefix of the
    seeded digest, pmod width) — the cross-engine determinism the
    DuckDB oracle of freq_cms_estimates relies on — and keeps the
    one-sided estimate guarantee."""
    import hashlib

    from parallel_dbms_spark.functions.frequency import (
        cms_build,
        cms_estimate,
    )

    terms = _zipf_terms(spark)
    sk = {(r.d, r.w): r.cnt for r in
          cms_build(terms, depth=4, width=512, hash_fn="md5").collect()}
    true = {r.term: r.n for r in
            terms.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    ref: dict = {}
    for t, n in true.items():
        for d in range(4):
            hx = hashlib.md5(f"{d}:{t}".encode()).hexdigest()
            cell = (d, int(hx[:5], 16) % 512)
            ref[cell] = ref.get(cell, 0) + n
    assert sk == ref
    sketch = cms_build(terms, depth=4, width=512, hash_fn="md5")
    est = {r.term: r.est for r in
           cms_estimate(sketch, terms.select("term").distinct(),
                        depth=4, width=512, hash_fn="md5").collect()}
    assert all(est[t] >= n for t, n in true.items())


def test_cms_inner_product_bounds_join_cardinality(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.frequency import cms_build, cms_inner_product

    # two multisets over a small key domain with known join size
    a = spark.createDataFrame(
        [Row(term=f"k{i % 17}") for i in range(800)]
    )
    b = spark.createDataFrame(
        [Row(term=f"k{i % 23}") for i in range(600)]
    )
    true = a.join(b, on="term").count()
    est = cms_inner_product(
        cms_build(a, width=2048), cms_build(b, width=2048)
    ).head().est
    assert est >= true  # one-sided, like point estimates
    # with 17/23 distinct keys in 2048 cells collisions are rare ->
    # tight (allow a generous 5% + additive slack)
    assert est - true <= max(64, true // 20), (est, true)


def test_cms_inner_product_disjoint_keys_near_zero(spark):
    from parallel_dbms_spark.functions.frequency import cms_build, cms_inner_product

    a = spark.createDataFrame([Row(term=f"a{i}") for i in range(300)])
    b = spark.createDataFrame([Row(term=f"b{i}") for i in range(300)])
    est = cms_inner_product(
        cms_build(a, width=4096), cms_build(b, width=4096)
    ).head().est
    assert est <= 300  # true join size is 0; collisions only


def test_ewma_matches_recursion_and_is_partition_invariant(spark):
    import datetime as dt

    from parallel_dbms_spark.functions.pandas_ops import ewma_by_key

    rows = [
        Row(k=1, ts=dt.datetime(2024, 1, d), v=float(x))
        for d, x in [(1, 10.0), (2, 20.0), (3, 10.0), (4, 0.0)]
    ] + [Row(k=2, ts=dt.datetime(2024, 1, 1), v=5.0)]
    df = spark.createDataFrame(rows)
    out = {(r.k, r.ts.day): r.ewma for r in
           ewma_by_key(df, "k", "ts", "v", alpha=0.5).collect()}
    # hand recursion, adjust=False: s1=10, s2=15, s3=12.5, s4=6.25
    assert out[(1, 1)] == 10.0
    assert out[(1, 2)] == 15.0
    assert out[(1, 3)] == 12.5
    assert out[(1, 4)] == 6.25
    assert out[(2, 1)] == 5.0
    # partition layout must not change the smoothing
    out13 = {(r.k, r.ts.day): r.ewma for r in
             ewma_by_key(df.repartition(13), "k", "ts", "v", alpha=0.5).collect()}
    assert out13 == out
