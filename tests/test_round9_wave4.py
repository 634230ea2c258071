"""Round-9 fourth-wave hand-checks: every new operator recomputed
independently (NumPy / pure Python) from the same fixture at
sf0.001, plus the structural invariants the oracles can't see
(no-false-negative guarantees, decomposition identities, boundary
uniqueness)."""

import math

import numpy as np

SF = "/root/testdata/sf0.001"


def _docs_pdf(spark):
    from ecom_churn_lakehouse_spark.sources import load_table

    return load_table(spark, SF, "documents").toPandas()


def test_gopher_rules_match_python(spark):
    """Per-document rule flags recomputed in pure Python."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_gopher_quality_rules,
    )

    rows = {
        r["doc_id"]: r.asDict()
        for r in q_gopher_quality_rules(spark, SF).collect()
    }
    pdf = _docs_pdf(spark)
    stop = {"the", "a", "and", "of", "to", "in"}
    assert len(rows) == len(pdf)
    for _, doc in pdf.iterrows():
        toks = doc.text.split()
        r = rows[doc.doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["sum_len"] == sum(len(t) for t in toks)
        assert r["n_stop"] == sum(1 for t in toks if t in stop)
        assert r["n_distinct"] == len(set(toks))
        assert r["max_tok_len"] == max(len(t) for t in toks)
        assert r["n_single"] == sum(1 for t in toks if len(t) == 1)
        flags = [
            25 <= len(toks) <= 90,
            4 * len(toks) <= r["sum_len"] <= 6 * len(toks),
            r["n_stop"] >= 2,
            r["n_distinct"] * 2 >= len(toks),
            r["max_tok_len"] <= 7,
            r["n_single"] * 1_000_000 <= 100_000 * len(toks),
        ]
        got = [
            r["rule_word_count"],
            r["rule_mean_word_len"],
            r["rule_stopwords"],
            r["rule_distinct_ratio"],
            r["rule_max_word_len"],
            r["rule_single_char"],
        ]
        assert got == flags, doc.doc_id
        assert r["n_rules_passed"] == sum(flags)
        assert r["keep"] == all(flags)


def test_temperature_mixture_isqrt_and_flags(spark):
    """isqrt must be the exact integer sqrt; upweighted must mean the
    temperature weight exceeds the proportional one (in exact
    rationals, not the floored ppm)."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_mixture_temperature_allocation,
    )

    rows = [
        r.asDict()
        for r in q_mixture_temperature_allocation(spark, SF).collect()
    ]
    assert rows
    corpus = sum(r["avail_tokens"] for r in rows)
    denom = sum(r["isqrt_tokens"] for r in rows)
    for r in rows:
        assert r["isqrt_tokens"] == math.isqrt(r["avail_tokens"])
        assert r["weight_ppm"] == r["isqrt_tokens"] * 1_000_000 // denom
        assert r["prop_ppm"] == r["avail_tokens"] * 1_000_000 // corpus
        assert r["upweighted"] == (
            r["isqrt_tokens"] * corpus > r["avail_tokens"] * denom
        )
    # temperature must compress the spread: every below-average source
    # is upweighted, every above-average one downweighted
    assert any(r["upweighted"] for r in rows)
    assert any(not r["upweighted"] for r in rows)


def _daily_revenue(spark, grain=100_000):
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    pdf = (
        load_table(spark, SF, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                f" AS BIGINT)) AS BIGINT) DIV {grain}"
            ).alias("y")
        )
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    return pdf


def test_adf_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_adf_unit_root_screen,
    )

    r = q_adf_unit_root_screen(spark, SF).collect()[0]
    pdf = _daily_revenue(spark)
    d = pdf.d.to_numpy()
    y = pdf.y.to_numpy(dtype=np.int64)
    nxt = {di: i for i, di in enumerate(d)}
    import datetime

    x, dy = [], []
    for i, di in enumerate(d):
        j = nxt.get(di + datetime.timedelta(days=1))
        if j is not None:
            x.append(y[i])
            dy.append(y[j] - y[i])
    x = np.array(x, dtype=float)
    dy = np.array(dy, dtype=float)
    n = len(x)
    assert r["n"] == n
    sxx = n * (x * x).sum() - x.sum() ** 2
    gamma = (n * (x * dy).sum() - x.sum() * dy.sum()) / sxx
    cx = (x * x).sum() - x.sum() ** 2 / n
    cxy = (x * dy).sum() - x.sum() * dy.sum() / n
    cyy = (dy * dy).sum() - dy.sum() ** 2 / n
    sse = cyy - gamma * cxy
    t = gamma / math.sqrt((sse / (n - 2)) / cx)
    assert abs(r["gamma_micro"] - math.floor(gamma * 1e6)) <= 1
    assert abs(r["t_milli"] - math.floor(t * 1000)) <= 1
    assert r["stationary_at_05"] == (r["t_milli"] < -2860)


def test_variance_ratio_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_variance_ratio_random_walk,
    )

    rows = {
        r["q"]: r.asDict()
        for r in q_variance_ratio_random_walk(spark, SF).collect()
    }
    assert sorted(rows) == [2, 4, 8]
    pdf = _daily_revenue(spark)
    import datetime

    idx = {di: i for i, di in enumerate(pdf.d)}
    y = pdf.y.to_numpy(dtype=float)

    def var_of_lag(q):
        diffs = []
        for di, i in idx.items():
            j = idx.get(di + datetime.timedelta(days=q))
            if j is not None:
                diffs.append(y[j] - y[i])
        a = np.array(diffs)
        return a.size, (a * a).mean() - a.mean() ** 2

    n1, v1 = var_of_lag(1)
    for q in (2, 4, 8):
        nq, vq = var_of_lag(q)
        vr = vq / (q * v1)
        z = (vr - 1.0) * math.sqrt(nq) / math.sqrt(
            2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)
        )
        assert rows[q]["nq"] == nq
        assert abs(rows[q]["vr_milli"] - math.floor(vr * 1000)) <= 1
        assert abs(rows[q]["z_milli"] - math.floor(z * 1000)) <= 1


def test_assortativity_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.graph_queries import (
        q_copurchase_degree_assortativity,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    r = q_copurchase_degree_assortativity(spark, SF).collect()[0]
    op = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    from collections import Counter, defaultdict

    by_order = defaultdict(list)
    for _, row in op.iterrows():
        by_order[row.l_orderkey].append(row.l_partkey)
    pair_counts = Counter()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    pair_counts[(a, b)] += 1
    edges = [p for p, c in pair_counts.items() if c >= 2]
    deg = Counter(src for src, _ in edges)
    dx = np.array([deg[a] for a, b in edges], dtype=float)
    dy = np.array([deg[b] for a, b in edges], dtype=float)
    m = len(edges)
    num = m * (dx * dy).sum() - dx.sum() * dy.sum()
    den = math.sqrt(
        (m * (dx * dx).sum() - dx.sum() ** 2)
        * (m * (dy * dy).sum() - dy.sum() ** 2)
    )
    assert r["n_directed_edges"] == m
    assert r["n_nodes"] == len(deg)
    assert abs(r["assortativity_milli"] - math.floor(num / den * 1000)) <= 1


def test_dp_advisor_thresholds(spark):
    from ecom_churn_lakehouse_spark.queries.governance_queries import (
        q_dp_laplace_release_advisor,
    )

    rows = [
        r.asDict() for r in q_dp_laplace_release_advisor(spark, SF).collect()
    ]
    assert rows and len(rows) % 3 == 0
    ln_const = math.log(1.0 / (2.0 * 1e-6))
    for r in rows:
        b = r["scale_b"]
        assert b == {100: 10, 500: 2, 1000: 1}[r["eps_milli"]]
        assert r["rel_err_ppm"] == b * 1_000_000 // r["n"]
        assert r["snr"] == r["n"] // b
        assert r["tau_threshold"] == 1 + math.ceil(b * ln_const)
        assert r["passes_threshold"] == (r["n"] > r["tau_threshold"])
        # tighter epsilon (smaller) => larger scale => never easier
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    for seg_rows in by_seg.values():
        seg_rows.sort(key=lambda r: r["eps_milli"])
        errs = [r["rel_err_ppm"] for r in seg_rows]
        assert errs == sorted(errs, reverse=True)


def test_grid_range_join_no_false_negatives(spark):
    """The grid plan must find EXACTLY the brute-force pair set."""
    from ecom_churn_lakehouse_spark.queries.similarity_queries import (
        _GRID_EPS_MICRO,
        _GRID_SHIFT,
        q_embedding_grid_range_join,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    got = {
        (r["vec_id_a"], r["vec_id_b"]): r["dist_sq"]
        for r in q_embedding_grid_range_join(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").toPandas()
    q = {
        row.vec_id: (
            math.floor(float(row.embedding[0]) * 1e6) + _GRID_SHIFT,
            math.floor(float(row.embedding[1]) * 1e6) + _GRID_SHIFT,
        )
        for _, row in emb.iterrows()
    }
    ids = sorted(q)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = (q[a][0] - q[b][0]) ** 2 + (q[a][1] - q[b][1]) ** 2
            if d <= _GRID_EPS_MICRO * _GRID_EPS_MICRO:
                want[(a, b)] = d
    assert got == want
    assert want  # non-vacuous


def test_brier_murphy_identity_and_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        q_brier_murphy_decomposition,
    )

    r = q_brier_murphy_decomposition(spark, SF).collect()[0]
    # the two-step floored normalizations (DIV n then DIV n / n^2)
    # each lose at most one unit of their intermediate grain, so the
    # identity gap is bounded by ~2e6/N ppm — tight at scale, loose
    # only on tiny fixtures
    assert abs(r["identity_gap_ppm"]) <= 2_000_000 // r["n"] + 2
    assert 0 <= r["reliability_ppm"]
    assert 0 <= r["resolution_ppm"]
    assert 0 < r["uncertainty_ppm"] <= 250_000  # y(1-y) <= 1/4
    assert r["skillful"] == (r["resolution_ppm"] > r["reliability_ppm"])
    assert r["n_bins"] >= 2
    assert r["brier_ppm"] >= 0


def test_obf_monitor_boundaries(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_group_sequential_obf_monitor,
    )

    rows = [
        r.asDict()
        for r in q_group_sequential_obf_monitor(spark, SF)
        .orderBy("look")
        .collect()
    ]
    assert [r["look"] for r in rows] == [1, 2, 3, 4]
    assert [r["bound_milli"] for r in rows] == [4049, 2863, 2337, 2024]
    # cumulative counts are monotone and end at the full population
    ns = [r["n_cum"] for r in rows]
    assert ns == sorted(ns)
    # z recomputation
    for r in rows:
        z = ((r["x_cum"] - 0.30 * r["n_cum"]))
        z = z / math.sqrt(r["n_cum"] * 0.21)
        assert abs(r["z_milli"] - math.floor(z * 1000)) <= 1
        assert r["crossed"] == (abs(r["z_milli"]) > r["bound_milli"])
    # at most one first_crossing, and it is the earliest crossed look
    firsts = [r["look"] for r in rows if r["first_crossing"]]
    crossed = [r["look"] for r in rows if r["crossed"]]
    if crossed:
        assert firsts == [min(crossed)]
    else:
        assert firsts == []


def test_markov_entropy_bounds_and_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_markov_entropy_rate,
    )
    from ecom_churn_lakehouse_spark.sources import load_events
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = q_markov_entropy_rate(spark, SF).collect()[0]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pdf = (
        load_events(spark, SF)
        .select("event_type", F.lag("event_type").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .count()
        .toPandas()
    )
    ctot = pdf["count"].sum()
    ci = pdf.groupby("prev")["count"].sum().to_dict()
    h = sum(
        (row["count"] / ctot) * math.log(ci[row.prev] / row["count"])
        for _, row in pdf.iterrows()
    )
    k = pdf.prev.nunique()
    assert r["n_transitions"] == ctot
    assert r["k"] == k
    assert abs(r["entropy_rate_micro"] - math.floor(h * 1e6)) <= 2
    assert 0 <= r["normalized_milli"] <= 1000


# --------------------------------------------------------------------------
# Wave-5 hand-checks.
# --------------------------------------------------------------------------


def test_rmst_matches_numpy_km_integral(spark):
    """RMST recomputed as the Riemann sum over the KM curve."""
    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        q_kaplan_meier_repeat_purchase,
        q_rmst_repeat_purchase,
    )

    km = sorted(
        (r["t"], r["log_surv_micro"])
        for r in q_kaplan_meier_repeat_purchase(spark, SF).collect()
    )
    r = q_rmst_repeat_purchase(spark, SF).collect()[0]
    assert r["tau_days"] == km[-1][0]
    assert r["n_steps"] == len(km)
    prev_t, prev_log, total = 0, 0, 0.0
    for t, logs in km:
        total += math.exp(prev_log / 1e6) * (t - prev_t)
        prev_t, prev_log = t, logs
    assert abs(r["rmst_micro_days"] - math.floor(total * 1e6)) <= len(km)
    # RMST is bounded by tau and must exceed S-at-tau * tau
    assert 0 < r["rmst_micro_days"] <= r["tau_days"] * 1_000_000


def test_ucb_allocation_properties(spark):
    from ecom_churn_lakehouse_spark.queries.decision_queries import (
        q_ucb_arm_allocation,
    )

    rows = [r.asDict() for r in q_ucb_arm_allocation(spark, SF).collect()]
    assert len(rows) == 5
    n_total = sum(r["n"] for r in rows)
    for r in rows:
        assert 0 <= r["x"] <= r["n"]
        assert r["mean_ppm"] == r["x"] * 1_000_000 // r["n"]
        ucb = r["x"] / r["n"] + math.sqrt(2 * math.log(n_total) / r["n"])
        assert abs(r["ucb_micro"] - math.floor(ucb * 1e6)) <= 1
        # optimism: the index strictly dominates the plain mean
        assert r["ucb_micro"] > r["mean_ppm"]
    chosen = [r for r in rows if r["pull_next"]]
    assert len(chosen) == 1
    assert chosen[0]["ucb_micro"] == max(r["ucb_micro"] for r in rows)


def test_ipw_ate_matches_pandas(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_ipw_ate_promo,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    r = q_ipw_ate_promo(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, SF, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.col("p_type").startswith("PROMO").alias("treated"),
    )
    pdf = li.join(part, li.l_partkey == part.p_partkey).toPandas()
    t_sum = c_sum = n_overlap = 0
    n_degenerate = 0
    for (_, _), g in pdf.groupby(["brand", "q"]):
        n = len(g)
        nt = int(g.treated.sum())
        nc = n - nt
        if nt == 0 or nc == 0:
            n_degenerate += n
            continue
        n_overlap += n
        t_sum += int(g[g.treated].cents.sum()) * n // nt
        c_sum += int(g[~g.treated].cents.sum()) * n // nc
    assert r["n_lines_overlap"] == n_overlap
    assert r["n_lines_degenerate"] == n_degenerate
    assert r["t_weighted_cents"] == t_sum
    assert r["c_weighted_cents"] == c_sum
    import math as _m

    want = _m.floor((t_sum - c_sum) * 10 / n_overlap)
    assert r["ipw_ate_millicents"] == want


def test_markov_absorption_recursion(spark):
    """u3 recomputed with exact integer milli recursion in Python."""
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_markov_absorption_conversion,
    )
    from ecom_churn_lakehouse_spark.sources import load_events
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = {
        r["event_type"]: r.asDict()
        for r in q_markov_absorption_conversion(spark, SF).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pdf = (
        load_events(spark, SF)
        .select("event_type", F.lag("event_type").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != "purchase"))
        .groupBy("prev", "event_type")
        .count()
        .toPandas()
    )
    ci = pdf.groupby("prev")["count"].sum().to_dict()
    p = {
        (row.prev, row.event_type): row["count"] * 1000 // ci[row.prev]
        for _, row in pdf.iterrows()
    }
    direct = {i: p.get((i, "purchase"), 0) for i in ci}
    u = dict(direct)
    for _ in range(2):
        u = {
            i: direct[i]
            + sum(
                p[(i, j)] * u.get(j, 0)
                for (pi, j) in p
                if pi == i and j != "purchase"
            )
            // 1000
            for i in ci
        }
    for i in ci:
        assert rows[i]["absorb1_milli"] == direct[i]
        assert rows[i]["absorb3_milli"] == u[i]
        # more steps can only help
        assert rows[i]["absorb3_milli"] >= rows[i]["absorb1_milli"]


def test_mattr_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        _MATTR_W,
        q_mattr_lexical_diversity,
    )

    rows = {
        r["doc_id"]: r.asDict()
        for r in q_mattr_lexical_diversity(spark, SF).collect()
    }
    pdf = _docs_pdf(spark)
    assert len(rows) == len(pdf)
    for _, doc in pdf.iterrows():
        toks = doc.text.split()
        r = rows[doc.doc_id]
        n = len(toks)
        if n >= _MATTR_W:
            wins = [
                len(set(toks[i : i + _MATTR_W]))
                for i in range(n - _MATTR_W + 1)
            ]
            assert r["win_type_sum"] == sum(wins)
            want = sum(wins) * 1_000_000 // (_MATTR_W * len(wins))
        else:
            assert r["win_type_sum"] == 0
            want = len(set(toks)) * 1_000_000 // n
        assert r["mattr_ppm"] == want
        assert 0 < r["mattr_ppm"] <= 1_000_000


def test_jsd_bounds_and_python(spark):
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        q_vocab_jsd_source_drift,
    )

    r = q_vocab_jsd_source_drift(spark, SF).collect()[0]
    pdf = _docs_pdf(spark)
    from collections import Counter

    ca, cb = Counter(), Counter()
    for _, doc in pdf.iterrows():
        side_a = int(doc.source[3:]) % 2 == 0
        (ca if side_a else cb).update(doc.text.split())
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    jsd = 0.0
    for t in vocab:
        pa, pb = ca[t] / na, cb[t] / nb
        m = (pa + pb) / 2
        if pa > 0:
            jsd += 0.5 * pa * math.log(pa / m)
        if pb > 0:
            jsd += 0.5 * pb * math.log(pb / m)
    assert r["n_vocab"] == len(vocab)
    assert r["na"] == na and r["nb"] == nb
    assert abs(r["jsd_micro"] - math.floor(jsd * 1e6)) <= 2
    # JSD is bounded by ln 2
    assert 0 <= r["jsd_micro"] <= math.ceil(math.log(2) * 1e6)
    assert 0 <= r["jsd_normalized_milli"] <= 1000


# --------------------------------------------------------------------------
# Wave-6 hand-checks.
# --------------------------------------------------------------------------


def test_silhouette_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.similarity_queries import (
        q_label_silhouette_screen,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    rows = {
        r["label"]: r.asDict()
        for r in q_label_silhouette_screen(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").toPandas()
    vecs = np.stack(emb.embedding.map(lambda v: np.asarray(v, dtype=float)))
    labels = emb.label.to_numpy()
    cents = {}
    for lab in np.unique(labels):
        sel = vecs[labels == lab]
        # DECIMAL(20,9)-quantized accumulation like the engine
        acc = np.floor(np.round(sel * 1e9)).sum(axis=0) / 1e9
        cents[lab] = acc / sel.shape[0]
    sums = {lab: [0, 0, 0] for lab in cents}  # s_sum, well, mis
    for v, lab in zip(vecs, labels):
        d = {cl: float(((v - c) ** 2).sum()) for cl, c in cents.items()}
        a = d[lab]
        b = min(dv for cl, dv in d.items() if cl != lab)
        s = (math.sqrt(b) - math.sqrt(a)) / max(
            math.sqrt(a), math.sqrt(b)
        )
        sm = math.floor(s * 1000)
        sums[lab][0] += sm
        sums[lab][1 if sm >= 0 else 2] += 1
    for lab, (ssum, well, mis) in sums.items():
        r = rows[lab]
        assert r["n_well_placed"] == well
        assert r["n_misplaced"] == mis
        # per-point floor can differ by 1 at exact boundaries under
        # numpy-vs-engine accumulation; allow 1 per point
        assert abs(r["s_sum_milli"] - ssum) <= r["n_vectors"]


def test_textrank_iterations_match_python(spark):
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        _TR_BASE_NUM,
        _TR_ITER,
        _TR_SCALE,
        q_textrank_keywords,
    )

    rows = {
        r["token"]: r.asDict()
        for r in q_textrank_keywords(spark, SF).collect()
    }
    pdf = _docs_pdf(spark)
    from collections import Counter

    w = Counter()
    for _, doc in pdf.iterrows():
        toks = doc.text.split()
        for a, b in zip(toks, toks[1:]):
            w[(a, b)] += 1
            w[(b, a)] += 1
    wtot = Counter()
    for (a, b), c in w.items():
        wtot[a] += c
    base = _TR_BASE_NUM // len(wtot)
    p = {v: _TR_SCALE for v in wtot}
    for _ in range(_TR_ITER):
        nxt = {}
        for (a, b), c in w.items():
            nxt[b] = nxt.get(b, 0) + p[a] * c // wtot[a]
        p = {v: base + 85 * m // 100 for v, m in nxt.items()}
    assert set(rows) == set(wtot)
    for v in wtot:
        assert rows[v]["cooccurrence_mass"] == wtot[v]
        assert rows[v]["textrank_fp"] == p[v], v
    # mass conservation sanity: ranks stay positive and bounded
    assert all(0 < r["textrank_fp"] < 10 * _TR_SCALE for r in rows.values())


def test_pinball_backtest_matches_pandas(spark):
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_pinball_loss_quantile_backtest,
    )

    rows = {
        r["tau10"]: r.asDict()
        for r in q_pinball_loss_quantile_backtest(spark, SF).collect()
    }
    pdf = _daily_revenue(spark, grain=100)
    pdf["m"] = pdf.d.map(lambda d: (d.year, d.month))
    months = sorted(pdf.m.unique())
    qs = {}
    for m, g in pdf.groupby("m"):
        ys = sorted(g.y)
        # quantile_disc: smallest value with cume_dist >= tau
        qs[m] = {
            t: ys[max(0, math.ceil(t * len(ys)) - 1)] for t in (0.5, 0.9)
        }
    import datetime

    def next_month(m):
        y, mo = m
        return (y + (mo == 12), mo % 12 + 1)

    for tau10, tau in ((5, 0.5), (9, 0.9)):
        total = n = cov = 0
        for m in months:
            pm = (m[0] - (m[1] == 1), (m[1] - 2) % 12 + 1)
            if pm not in qs:
                continue
            q = qs[pm][tau]
            for y in pdf[pdf.m == m].y:
                n += 1
                total += (
                    tau10 * (y - q) if y >= q else (10 - tau10) * (q - y)
                )
                cov += y <= q
        r = rows[tau10]
        assert r["n_days_eval"] == n
        assert r["pinball_deci_total"] == total
        assert r["coverage_ppm"] == cov * 1_000_000 // n
    # the P90 must cover more often than the P50
    assert rows[9]["coverage_ppm"] > rows[5]["coverage_ppm"]


def test_burstiness_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        q_term_burstiness_profile,
    )

    rows = [
        r.asDict() for r in q_term_burstiness_profile(spark, SF).collect()
    ]
    pdf = _docs_pdf(spark)
    from collections import Counter, defaultdict

    per_doc = defaultdict(Counter)
    for _, doc in pdf.iterrows():
        per_doc[doc.doc_id].update(doc.text.split())
    n = len(pdf)
    df, cf, cf2 = Counter(), Counter(), Counter()
    for counts in per_doc.values():
        for t, c in counts.items():
            df[t] += 1
            cf[t] += c
            cf2[t] += c * c
    want = sorted(df, key=lambda t: (-df[t], t))[: len(rows)]
    assert [r["token"] for r in rows] == want
    for r in rows:
        t = r["token"]
        assert r["df"] == df[t] and r["cf"] == cf[t]
        assert r["burstiness_milli"] == cf[t] * 1000 // df[t]
        assert (
            r["vmr_milli"] == (n * cf2[t] - cf[t] ** 2) * 1000 // (cf[t] * n)
        )
        assert r["overdispersed"] == (n * cf2[t] - cf[t] ** 2 > n * cf[t])


# --------------------------------------------------------------------------
# Wave-7 hand-checks.
# --------------------------------------------------------------------------


def test_evalue_matches_formula(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_evalue_confounding_bound,
    )

    r = q_evalue_confounding_bound(spark, SF).collect()[0]
    p1 = r["x1"] / r["n1"]
    p0 = r["x0"] / r["n0"]
    rr_star = max(p1 / p0, p0 / p1)
    ev = rr_star + math.sqrt(rr_star * (rr_star - 1.0))
    assert abs(r["rr_star_milli"] - math.floor(rr_star * 1000)) <= 1
    assert abs(r["evalue_point_milli"] - math.floor(ev * 1000)) <= 1
    se = math.sqrt(
        1 / r["x1"] - 1 / r["n1"] + 1 / r["x0"] - 1 / r["n0"]
    )
    near = math.exp(abs(math.log(p1 / p0)) - 1.96 * se)
    if near <= 1.0:
        assert r["evalue_ci_milli"] == 1000
    else:
        ev_ci = near + math.sqrt(near * (near - 1.0))
        assert abs(r["evalue_ci_milli"] - math.floor(ev_ci * 1000)) <= 1
    # structural: E-value always >= RR* >= 1; CI E-value <= point E-value
    assert r["evalue_point_milli"] >= r["rr_star_milli"] >= 1000
    assert r["evalue_ci_milli"] <= r["evalue_point_milli"]
    assert r["robust_to_some_confounding"] == (r["evalue_ci_milli"] > 1000)


def test_eoq_matches_formula(spark):
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        _EOQ_HOLD_COST,
        _EOQ_ORDER_COST,
        q_eoq_stock_policy,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = [r.asDict() for r in q_eoq_stock_policy(spark, SF).collect()]
    assert len(rows) == 25
    span = load_table(spark, SF, "orders").agg(
        (
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            + 1
        ).alias("s")
    ).collect()[0]["s"]
    for r in rows:
        d = r["qty_total"] * 365 // span
        assert r["d_annual"] == d
        eoq = math.isqrt(2 * d * _EOQ_ORDER_COST // _EOQ_HOLD_COST)
        assert r["eoq_units"] == eoq
        assert r["orders_per_year"] == d // max(eoq, 1)
        assert r["cycle_days"] == 365 * eoq // max(d, 1)


def test_markov_removal_attribution_python(spark):
    """Removal effects recomputed with the same integer-milli
    recursion in pure Python, including the start-mix weighting."""
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_markov_removal_attribution,
    )
    from ecom_churn_lakehouse_spark.sources import load_events
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = {
        r["channel"]: r.asDict()
        for r in q_markov_removal_attribution(spark, SF).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pdf = (
        load_events(spark, SF)
        .select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .toPandas()
    )
    trans = (
        pdf[pdf.prev.notna() & (pdf.prev != "purchase")]
        .groupby(["prev", "event_type"])
        .size()
    )
    ci = trans.groupby("prev").sum().to_dict()
    p = {
        (i, j): c * 1000 // ci[i] for (i, j), c in trans.items()
    }
    direct = {i: p.get((i, "purchase"), 0) for i in ci}
    starts = pdf[pdf.prev.isna()].event_type.value_counts().to_dict()
    n_tot = sum(starts.values())

    def u3(removed):
        keys = [i for i in ci if i != removed]
        u = {i: direct[i] for i in keys}
        for _ in range(2):
            u = {
                i: direct[i]
                + sum(
                    p[(pi, j)] * u.get(j, 0)
                    for (pi, j) in p
                    if pi == i and j != "purchase" and j != removed
                )
                // 1000
                for i in keys
            }
        return u

    def v_of(u, removed):
        m = sum(
            n * u.get(s, 0)
            for s, n in starts.items()
            if s != removed and s != "purchase"
        )
        return (m + starts.get("purchase", 0) * 1000) // n_tot

    vb = v_of(u3(None), None)
    for c in ("click", "error", "signup", "view"):
        vr = v_of(u3(c), c)
        r = rows[c]
        assert r["v_base_milli"] == vb
        assert r["v_removed_milli"] == vr
        assert r["removal_effect_milli"] == (vb - vr) * 1000 // max(vb, 1)
        # removing a channel can never increase conversion
        assert r["v_removed_milli"] <= r["v_base_milli"]


def test_grid_dof_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.similarity_queries import (
        _GRID_EPS_MICRO,
        _GRID_SHIFT,
        q_grid_density_outlier_factor,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    rows = {
        r["vec_id"]: r.asDict()
        for r in q_grid_density_outlier_factor(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").toPandas()
    q = {
        row.vec_id: (
            math.floor(float(row.embedding[0]) * 1e6) + _GRID_SHIFT,
            math.floor(float(row.embedding[1]) * 1e6) + _GRID_SHIFT,
        )
        for _, row in emb.iterrows()
    }
    nbrs = {i: [] for i in q}
    ids = list(q)
    for i in ids:
        for j in ids:
            if i != j:
                d = (q[i][0] - q[j][0]) ** 2 + (q[i][1] - q[j][1]) ** 2
                if d <= _GRID_EPS_MICRO * _GRID_EPS_MICRO:
                    nbrs[i].append(j)
    assert set(rows) == set(q)
    for i in q:
        n = len(nbrs[i])
        r = rows[i]
        assert r["n_eps"] == n
        assert r["isolated"] == (n == 0)
        if n == 0:
            assert r["dof_milli"] is None
            assert r["outlier"]
        else:
            ssum = sum(len(nbrs[j]) for j in nbrs[i])
            assert r["neighbor_density_sum"] == ssum
            assert r["dof_milli"] == ssum * 1000 // (n * n)
            assert r["outlier"] == (ssum * 2 > 3 * n * n)


def test_covariate_balance_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_covariate_balance_smd,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = {
        r["covariate"]: r.asDict()
        for r in q_covariate_balance_smd(spark, SF).collect()
    }
    assert sorted(rows) == ["discount_bp", "price_dollars", "quantity"]
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias(
            "quantity"
        ),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100"
        ).alias("price_dollars"),
        (F.col("l_discount").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("discount_bp"),
    )
    part = load_table(spark, SF, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("treated")
    )
    pdf = li.join(part, li.l_partkey == part.p_partkey).toPandas()
    for cov in rows:
        t = pdf[pdf.treated][cov].to_numpy(dtype=float)
        c = pdf[~pdf.treated][cov].to_numpy(dtype=float)
        smd = (t.mean() - c.mean()) / math.sqrt(
            (t.var() + c.var()) / 2.0
        )
        r = rows[cov]
        assert r["n_t"] == t.size and r["n_c"] == c.size
        assert abs(r["smd_milli"] - math.floor(smd * 1000)) <= 1
        assert r["balanced_at_01"] == (abs(r["smd_milli"]) < 100)


def test_haar_energy_matches_numpy(spark):
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_haar_energy_decomposition,
    )

    rows = {
        r["level"]: r.asDict()
        for r in q_haar_energy_decomposition(spark, SF).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4, 5]
    pdf = _daily_revenue(spark)
    day0 = pdf.d.min()
    series = {}
    for _, row in pdf.iterrows():
        series[(row.d - day0).days] = int(row.y)
    total = 0
    for lv in (1, 2, 3, 4, 5):
        half, block = 2 ** (lv - 1), 2**lv
        from collections import defaultdict

        dsum = defaultdict(int)
        for idx, y in series.items():
            dsum[idx // block] += y * (1 - 2 * ((idx // half) % 2))
        energy = sum(v * v for v in dsum.values())
        assert rows[lv]["n_blocks"] == len(dsum)
        assert rows[lv]["energy"] == energy
        total += energy
    for lv in (1, 2, 3, 4, 5):
        assert (
            rows[lv]["energy_share_ppm"]
            == rows[lv]["energy"] * 1_000_000 // max(total, 1)
        )


def test_quantile_normalization_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        _QN_BUCKETS,
        q_doc_length_quantile_normalization,
    )

    rows = {
        r["doc_id"]: r.asDict()
        for r in q_doc_length_quantile_normalization(spark, SF).collect()
    }
    pdf = _docs_pdf(spark)
    pdf["n_tokens"] = pdf.text.map(lambda t: len(t.split()))
    pooled = sorted(pdf.n_tokens)

    def qdisc(tau):
        return pooled[max(0, math.ceil(tau * len(pooled)) - 1)]

    grid = {k: qdisc(k / _QN_BUCKETS) for k in range(1, _QN_BUCKETS + 1)}
    for src, g in pdf.groupby("source"):
        g = g.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
        n = len(g)
        for r0, (_, doc) in enumerate(g.iterrows(), start=1):
            b = (r0 * _QN_BUCKETS + n - 1) // n
            r = rows[doc.doc_id]
            assert r["n_tokens"] == doc.n_tokens
            assert r["ventile"] == b
            assert r["normalized_tokens"] == grid[b], (src, doc.doc_id)
    # after normalization every source's value multiset is drawn from
    # the same pooled grid
    vals = {r["normalized_tokens"] for r in rows.values()}
    assert vals <= set(grid.values())


def test_theil_decomposition_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.decision_queries import (
        q_theil_inequality_decomposition,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    r = q_theil_inequality_decomposition(spark, SF).collect()[0]
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, SF, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, SF, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    pdf = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "nation")
        .agg(
            F.expr("CAST(COALESCE(SUM(cents), 0) AS BIGINT) DIV 100").alias(
                "x"
            )
        )
        .toPandas()
    )
    xt, nt = int(pdf.x.sum()), len(pdf)
    total = sum(
        (x / xt) * math.log(x * nt / xt) for x in pdf.x if x > 0
    )
    between = 0.0
    for _, g in pdf.groupby("nation"):
        xg, ng = int(g.x.sum()), len(g)
        if xg > 0:
            between += (xg / xt) * math.log((xg * nt) / (xt * ng))
    assert r["n_customers"] == nt
    assert abs(r["theil_total_micro"] - math.floor(total * 1e6)) <= 2
    assert abs(r["theil_between_micro"] - math.floor(between * 1e6)) <= 2
    # decomposition: within = total - between, and both are >= 0
    assert (
        r["theil_within_micro"]
        == r["theil_total_micro"] - r["theil_between_micro"]
    )
    assert r["theil_total_micro"] >= r["theil_between_micro"] >= 0
    assert 0 <= r["between_share_milli"] <= 1000


def test_consistent_hash_invariants(spark):
    """The consistent-hashing contract: keys only ever move INTO the
    new shard, the ring moves far fewer keys than modulo resharding,
    and loads cover every shard."""
    from ecom_churn_lakehouse_spark.queries.dataops_queries import (
        _CH_N_NEW,
        q_consistent_hash_resharding_audit,
    )

    rows = [
        r.asDict()
        for r in q_consistent_hash_resharding_audit(spark, SF).collect()
    ]
    assert [r["shard"] for r in rows] == list(range(_CH_N_NEW))
    n_keys = rows[0]["n_keys"]
    assert sum(r["load_n9"] for r in rows) == n_keys
    # only the NEW shard receives movers
    for r in rows[:-1]:
        assert r["moved_in"] == 0
    assert rows[-1]["moved_in"] == rows[-1]["load_n9"]
    moved_total = sum(r["moved_in"] for r in rows)
    assert rows[0]["moved_ring_ppm"] == moved_total * 1_000_000 // n_keys
    # the ring must beat naive modulo by a wide margin
    assert rows[0]["moved_ring_ppm"] * 3 < rows[0]["moved_mod_ppm"]


def test_revenue_bridge_identity_and_pandas(spark):
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        _BRIDGE_Y0,
        _BRIDGE_Y1,
        q_revenue_delta_contribution,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = [
        r.asDict()
        for r in q_revenue_delta_contribution(spark, SF).collect()
    ]
    assert len(rows) == 5
    orders = load_table(spark, SF, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    pdf = orders.join(cust, orders.o_custkey == cust.c_custkey).toPandas()
    for r in rows:
        g = pdf[pdf.segment == r["segment"]]
        g0 = g[g.yr == _BRIDGE_Y0]
        g1 = g[g.yr == _BRIDGE_Y1]
        n0, r0 = len(g0), int(g0.cents.sum())
        n1, r1 = len(g1), int(g1.cents.sum())
        assert (r["n0"], r["r0"], r["n1"], r["r1"]) == (n0, r0, n1, r1)
        vol = (n1 - n0) * (r0 // max(n0, 1))
        rate = n1 * (r1 // max(n1, 1) - r0 // max(n0, 1))
        assert r["volume_effect_cents"] == vol
        assert r["rate_effect_cents"] == rate
        # EXACT decomposition identity
        assert (
            r["delta_cents"]
            == r["volume_effect_cents"]
            + r["rate_effect_cents"]
            + r["residual_cents"]
        )
        # the residual is floor slack only: bounded by the new count
        assert abs(r["residual_cents"]) <= n1 + abs(n1 - n0)


def test_qte_matches_pandas(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        _QTE_TAUS,
        q_quantile_treatment_effects,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = {
        r["tau_pct"]: r.asDict()
        for r in q_quantile_treatment_effects(spark, SF).collect()
    }
    assert sorted(rows) == sorted(_QTE_TAUS)
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, SF, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("treated")
    )
    pdf = li.join(part, li.l_partkey == part.p_partkey).toPandas()
    t = sorted(pdf[pdf.treated].cents)
    c = sorted(pdf[~pdf.treated].cents)

    def qdisc(xs, tau):
        return xs[max(0, math.ceil(tau * len(xs)) - 1)]

    for tau in _QTE_TAUS:
        r = rows[tau]
        assert r["q_treated_cents"] == qdisc(t, tau / 100)
        assert r["q_control_cents"] == qdisc(c, tau / 100)
        assert (
            r["qte_cents"] == r["q_treated_cents"] - r["q_control_cents"]
        )


def test_slo_burn_rates_match_pandas(spark):
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        _SLO_BUDGET_PPM,
        _SLO_LONG_HOURS,
        q_slo_burn_rate_alerts,
    )
    from ecom_churn_lakehouse_spark.sources import load_events
    from pyspark.sql import functions as F

    rows = [
        r.asDict() for r in q_slo_burn_rate_alerts(spark, SF).collect()
    ]
    pdf = (
        load_events(spark, SF)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hh"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("e"),
        )
        .orderBy("hh")
        .toPandas()
    )
    assert len(rows) == len(pdf)
    for i, r in enumerate(rows):
        lo = max(0, i - (_SLO_LONG_HOURS - 1))
        n_long = int(pdf.n[lo : i + 1].sum())
        e_long = int(pdf.e[lo : i + 1].sum())
        n, e = int(pdf.n[i]), int(pdf.e[i])
        sb = e * 1_000_000_000 // (n * _SLO_BUDGET_PPM)
        lb = e_long * 1_000_000_000 // (n_long * _SLO_BUDGET_PPM)
        assert r["n"] == n and r["n_err"] == e
        assert r["short_burn_milli"] == sb
        assert r["long_burn_milli"] == lb
        assert r["page_alert"] == (sb > 2000 and lb > 2000)
        assert r["ticket_alert"] == (sb > 1000 and lb > 1000)
    # a page implies a ticket (threshold nesting)
    assert all(
        r["ticket_alert"] for r in rows if r["page_alert"]
    )


def test_littles_law_identity_and_python(spark):
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_littles_law_audit,
    )
    from ecom_churn_lakehouse_spark.sources import load_events

    r = q_littles_law_audit(spark, SF).collect()[0]
    assert r["identity_holds"]
    # recompute sessions + both sides in pure Python
    pdf = load_events(spark, SF).select("user_id", "ts").toPandas()
    pdf = pdf.sort_values(["user_id", "ts"])
    sessions = []
    for _, g in pdf.groupby("user_id"):
        ts = [int(t.value // 1000) for t in g.ts]  # us
        start = ts[0]
        prev = ts[0]
        for t in ts[1:]:
            if t - prev > 1800 * 1_000_000:
                sessions.append((start, prev + 1800 * 1_000_000))
                start = t
            prev = t
        sessions.append((start, prev + 1800 * 1_000_000))
    n = len(sessions)
    dur = sum(e - s for s, e in sessions)
    span = max(e for _, e in sessions) - min(s for s, _ in sessions)
    assert r["n_sessions"] == n
    assert r["total_duration_us"] == dur
    assert r["span_us"] == span
    assert r["integral_us"] == dur  # Little's law, exactly
    assert r["w_mean_us"] == dur // n
    assert r["l_mean_milli"] == dur * 1000 // span


def test_value_window_battery_pitfalls(spark):
    """The explicit-frame and IGNORE NULLS semantics recomputed in
    pandas for one partition."""
    from ecom_churn_lakehouse_spark.queries.warehouse_queries import (
        q_value_window_battery,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = [
        r.asDict()
        for r in q_value_window_battery(spark, SF).collect()
        if r["priority"] == "1-URGENT"
    ]
    pdf = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .toPandas()
        .sort_values(["o_totalprice", "o_orderkey"])
        .reset_index(drop=True)
    )
    ids = list(pdf.o_orderkey)
    finished = [
        k for k, st in zip(pdf.o_orderkey, pdf.o_orderstatus) if st == "F"
    ]
    by_id = {r["order_id"]: r for r in rows}
    assert set(by_id) == set(ids)
    first_f_seen = None
    for i, k in enumerate(ids):
        r = by_id[k]
        assert r["cheapest_id"] == ids[0]
        assert r["priciest_id"] == ids[-1]
        assert r["third_cheapest_id"] == ids[2]
        assert r["lag2_id"] == (ids[i - 2] if i >= 2 else -1)
        assert r["lead2_id"] == (
            ids[i + 2] if i + 2 < len(ids) else -1
        )
        if first_f_seen is None and pdf.o_orderstatus[i] == "F":
            first_f_seen = k
        # default frame: first finished AT OR BEFORE current row
        assert r["first_finished_id"] == first_f_seen
    assert finished and first_f_seen is not None


def test_calendar_battery_semantics(spark):
    import datetime

    from ecom_churn_lakehouse_spark.queries.relational_queries import (
        q_calendar_battery,
    )

    rows = {
        r["d"]: r.asDict() for r in q_calendar_battery(spark, SF).collect()
    }
    assert rows
    epoch = datetime.date(1970, 1, 1)
    n_prior = n_next = 0
    for d, r in rows.items():
        iso = d.isocalendar()
        assert r["iso_dow"] == iso.weekday
        assert r["iso_week"] == iso.week
        assert r["cal_year"] == d.year
        assert r["day_of_year"] == d.timetuple().tm_yday
        assert r["qtr"] == (d.month - 1) // 3 + 1
        assert r["epoch_days"] == (d - epoch).days
        nxt = (d.replace(day=28) + datetime.timedelta(days=4)).replace(
            day=1
        )
        assert r["month_len"] == (nxt - datetime.timedelta(days=1)).day
        assert r["iso_week_of_prior_year"] == (
            iso.week >= 52 and d.month == 1
        )
        assert r["iso_week_of_next_year"] == (
            iso.week == 1 and d.month == 12
        )
        n_prior += r["iso_week_of_prior_year"]
        n_next += r["iso_week_of_next_year"]
    # both boundary traps must actually occur in the fixture calendar
    assert n_prior > 0 and n_next > 0


def test_dow_gof_matches_python(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_dow_uniformity_gof,
    )
    from ecom_churn_lakehouse_spark.sources import load_events

    r = q_dow_uniformity_gof(spark, SF).collect()[0]
    pdf = load_events(spark, SF).select("ts").toPandas()
    counts = pdf.ts.dt.date.map(lambda d: d.isoweekday()).value_counts()
    n = int(counts.sum())
    so2 = int((counts**2).sum())
    assert r["k"] == len(counts)
    assert r["n"] == n
    assert r["o_min"] == int(counts.min())
    assert r["o_max"] == int(counts.max())
    chi2_milli = (7 * so2 - n * n) * 1000 // n
    assert r["chi2_milli"] == chi2_milli
    # identity with the textbook spelling sum((O-E)^2/E)
    e = n / 7
    chi2 = sum((c - e) ** 2 / e for c in counts)
    assert abs(chi2_milli - math.floor(chi2 * 1000)) <= 1
    assert r["reject_uniform_at_05"] == (chi2_milli > 12591)
