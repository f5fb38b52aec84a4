"""Differential tests for functions/stats.py: every statistic is
recomputed with plain numpy on the collected inputs (pair-counting
AUC, textbook Welch/chi-square/KL/Gini formulas) and must agree with
the distributed result to quantization precision.

The DuckDB bit-equality of the registered queries is covered by the
oracle gate (scripts/check_oracles.py / tests/test_correctness.py);
these tests pin the MATH against an independent formulation, on data
small enough to brute-force.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from parallel_dbms_spark.functions import stats


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_auc_matches_pair_counting(spark):
    rng = np.random.default_rng(7)
    scores = rng.integers(0, 40, size=300).tolist()  # heavy ties
    labels = (rng.random(300) < 0.4).tolist()
    rows = [
        (int(i), int(s), bool(y))
        for i, (s, y) in enumerate(zip(scores, labels))
    ]
    df = _df(spark, rows, "id long, score long, y boolean")
    out = stats.mann_whitney_auc(df, "score", "y", "id").collect()[0]

    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert out.n_pos == len(pos) and out.n_neg == len(neg)
    assert out.auc_e6 == math.floor(auc * 1e6)


def test_auc_perfect_separation(spark):
    rows = [(i, i, i >= 50) for i in range(100)]
    df = _df(spark, rows, "id long, score long, y boolean")
    out = stats.mann_whitney_auc(df, "score", "y", "id").collect()[0]
    assert out.auc_e6 == 1_000_000


def test_chi2_cells_match_numpy(spark):
    rng = np.random.default_rng(11)
    rows = [
        (f"r{rng.integers(0, 3)}", int(rng.integers(0, 4)))
        for _ in range(500)
    ]
    df = _df(spark, rows, "k string, b int")
    got = {
        (r.row_key, r.col_key): r
        for r in stats.contingency_chi2(df, "k", "b").collect()
    }

    obs: dict[tuple, int] = {}
    for k, b in rows:
        obs[(k, b)] = obs.get((k, b), 0) + 1
    n = len(rows)
    rt = {k: sum(v for (kk, _), v in obs.items() if kk == k) for k, _ in obs}
    ct = {b: sum(v for (_, bb), v in obs.items() if bb == b) for _, b in obs}
    assert set(got) == set(obs)
    chi2 = 0.0
    for cell, o in obs.items():
        exp = rt[cell[0]] * ct[cell[1]] / n
        contrib = (o - exp) ** 2 / exp
        chi2 += contrib
        assert got[cell].obs == o
        assert abs(got[cell].exp_e6 - math.floor(exp * 1e6)) <= 1
        assert abs(got[cell].contrib_e6 - math.floor(contrib * 1e6)) <= 1
    # the quantized cells SUM to the statistic (order-independent)
    total = sum(r.contrib_e6 for r in got.values()) / 1e6
    assert abs(total - chi2) < 1e-3


def test_welch_t_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.normal(10.0, 2.0, 400)
    b = rng.normal(9.2, 3.5, 250)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = _df(spark, rows, "g string, v double")
    out = stats.welch_ttest(df, "v", "g", "a", "b").collect()[0]

    # reference on the SAME e6-quantized values the engine uses
    qa = np.floor(a * 1e6)
    qb = np.floor(b * 1e6)
    va, vb = qa.var(ddof=1), qb.var(ddof=1)
    se = va / len(qa) + vb / len(qb)
    t = (qa.mean() - qb.mean()) / math.sqrt(se)
    dfw = se**2 / (
        (va / len(qa)) ** 2 / (len(qa) - 1)
        + (vb / len(qb)) ** 2 / (len(qb) - 1)
    )
    assert out.n_a == 400 and out.n_b == 250
    assert abs(out.t_e6 / 1e6 - t) < 1e-4
    assert abs(out.df_e3 / 1e3 - dfw) < 1e-2
    assert abs(out.mean_a_e6 - qa.mean()) <= 1
    assert abs(out.mean_b_e6 - qb.mean()) <= 1


def test_kl_divergence_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for g, skew in (("s1", 1.0), ("s2", 2.5)):
        weights = np.array([1 / (i + 1) ** skew for i in range(30)])
        weights /= weights.sum()
        for t in rng.choice(vocab, size=2000, p=weights):
            rows.append((g, str(t)))
    df = _df(spark, rows, "g string, term string")
    got = {
        r.grp: r
        for r in stats.kl_divergence_by_group(df, "g", "term").collect()
    }

    from collections import Counter

    all_c = Counter(t for _, t in rows)
    tot = sum(all_c.values())
    for g in ("s1", "s2"):
        gc = Counter(t for gg, t in rows if gg == g)
        gt = sum(gc.values())
        kl = sum(
            (c / gt) * math.log((c / gt) / (all_c[t] / tot))
            for t, c in gc.items()
        )
        assert got[g].n_tokens == gt
        assert got[g].n_terms == len(gc)
        # per-term floor-quantization undershoots by < n_terms ulps
        assert abs(got[g].kl_e9 / 1e9 - kl) < len(gc) * 1e-9 + 1e-9


def test_gini_known_values(spark):
    # perfectly equal values -> G = 0 (up to the (n+1)/n finite-n term)
    rows = [(i, 10.0) for i in range(1000)]
    df = _df(spark, rows, "id long, v double")
    out = stats.gini_coefficient(df, "v", "id").collect()[0]
    assert out.n == 1000
    assert abs(out.gini_e6) < 1500  # 0 within finite-n bias

    # one customer owns everything -> G -> (n-1)/n
    rows = [(i, 0.000001) for i in range(999)] + [(999, 1e6)]
    df = _df(spark, rows, "id long, v double")
    out = stats.gini_coefficient(df, "v", "id").collect()[0]
    assert out.gini_e6 > 990_000


def test_gini_matches_numpy(spark):
    rng = np.random.default_rng(13)
    v = rng.lognormal(3.0, 1.2, 800)
    rows = [(int(i), float(x)) for i, x in enumerate(v)]
    df = _df(spark, rows, "id long, v double")
    out = stats.gini_coefficient(df, "v", "id").collect()[0]

    q = np.floor(v * 1e6)  # the engine's quantized values
    x = np.sort(q)
    n = len(x)
    gini = 2.0 * np.sum((np.arange(1, n + 1)) * x) / (n * x.sum()) - (
        n + 1
    ) / n
    assert abs(out.gini_e6 / 1e6 - gini) < 1e-5


def test_benford_digits_exact_extraction(spark):
    # crafted values that the float-log method misclassifies
    rows = [(1000.0,), (999.99,), (1.0,), (9.99,), (100.0,), (0.01,)]
    df = _df(spark, rows, "v double")
    got = {r.digit: r.n for r in stats.benford_digits(df, "v").collect()}
    assert got == {1: 4, 9: 2}  # 1000, 1, 100, 0.01 -> 1; 999.99, 9.99 -> 9


def test_benford_on_benford_data(spark):
    # data sampled FROM Benford's law -> small deviations
    rng = np.random.default_rng(17)
    v = np.power(10.0, rng.random(5000) * 3)  # log-uniform over 3 decades
    rows = [(float(x),) for x in v]
    df = _df(spark, rows, "v double")
    out = stats.benford_digits(df, "v").collect()
    assert {r.digit for r in out} == set(range(1, 10))
    assert sum(r.n for r in out) == 5000
    for r in out:
        assert r.dev_e6 < 25_000  # within 2.5pp of Benford at n=5000


def test_bootstrap_replicates_deterministic_and_plausible(spark):
    rng = np.random.default_rng(29)
    v = rng.normal(100.0, 10.0, 4000)
    rows = [(int(i), float(x)) for i, x in enumerate(v)]
    df = _df(spark, rows, "id long, v double")
    out = stats.bootstrap_replicate_means(df, "v", "id", n_replicates=16)
    a = sorted((r.replicate, r.n, r.mean_e6) for r in out.collect())
    b = sorted((r.replicate, r.n, r.mean_e6) for r in out.collect())
    assert a == b and len(a) == 16  # pure hash function of (id, r)
    ns = [n for _, n, _ in a]
    means = [m / 1e6 for _, _, m in a]
    # half-sampling: ~2000 +- 4 sigma
    assert all(abs(n - 2000) < 4 * (4000 * 0.25) ** 0.5 + 1 for n in ns)
    # replicate means scatter around the grand mean like sigma/sqrt(m)
    gm = float(np.mean(v))
    se = 10.0 / (2000**0.5)
    assert all(abs(m - gm) < 6 * se for m in means)
    assert np.std(means) < 4 * se


def test_bootstrap_replicates_differ_across_r(spark):
    df = _df(spark, [(i, 1.0 * i) for i in range(500)], "id long, v double")
    out = stats.bootstrap_replicate_means(df, "v", "id", n_replicates=8)
    got = {r.replicate: (r.n, r.mean_e6) for r in out.collect()}
    assert len({v for v in got.values()}) > 1, "replicates must differ"


def test_covariance_matrix_matches_numpy(spark):
    rng = np.random.default_rng(31)
    x = rng.normal(0, 3, 1000)
    y = 2.0 * x + rng.normal(0, 1, 1000)
    z = rng.normal(5, 2, 1000)
    rows = [
        (float(a), float(b), float(c)) for a, b, c in zip(x, y, z)
    ]
    df = _df(spark, rows, "x double, y double, z double")
    out = {
        (r.col_a, r.col_b): r.cov_e6 / 1e6
        for r in stats.covariance_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(out) == {
        ("x", "x"), ("x", "y"), ("x", "z"), ("y", "y"), ("y", "z"),
        ("z", "z"),
    }
    q = np.floor(np.stack([x, y, z]) * 1e6) / 1e6  # engine quantization
    ref = np.cov(q)  # ddof=1 sample covariance
    names = ["x", "y", "z"]
    for i, a in enumerate(names):
        for j in range(i, 3):
            assert abs(out[(a, names[j])] - ref[i, j]) < 2e-5
