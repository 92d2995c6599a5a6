"""Semantic properties of the round-4 analytics/training-data queries
(m14/m15/l58/l60/l61/d30). The driver oracle-checks values; these pin
the invariants a value hash can't express — monotone funnels, retention
triangle identities, boilerplate bounds, PMI/DSIR algebra, CUPED's
variance-reduction contract."""

from __future__ import annotations

import math

import pytest

from oeem_etl_spark.plans import registry


@pytest.fixture(scope="module")
def reg():
    from oeem_etl_spark import plans

    plans.load_all()
    return registry.all_queries()


def rows(reg, spark, sf_dir, name):
    return reg[name].fn(spark, sf_dir).collect()


def test_funnel_monotone(reg, spark, sf_dir):
    (r,) = rows(reg, spark, sf_dir, "m15_funnel_conversion")
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0
    assert 0.0 <= r["overall"] <= r["view_to_click"] <= 1.0


def test_retention_triangle_identities(reg, spark, sf_dir):
    out = rows(reg, spark, sf_dir, "m14_retention_cohorts")
    assert out, "retention triangle is empty"
    for r in out:
        assert 0 <= r["week_offset"] <= 12
        assert 1 <= r["n_active"] <= r["n_cohort"]
        # offset 0 = the cohort's own first week: everyone is active
        if r["week_offset"] == 0:
            assert r["n_active"] == r["n_cohort"] and r["retention"] == 1.0


def test_boilerplate_fractions_bounded(reg, spark, sf_dir):
    out = rows(reg, spark, sf_dir, "l58_boilerplate_ngrams")
    assert out
    for r in out:
        assert 0.0 <= r["avg_boilerplate"] <= r["max_boilerplate"] <= 1.0
        assert r["n_docs"] >= 1


def test_pmi_support_floor_and_tiebreak(reg, spark, sf_dir):
    out = rows(reg, spark, sf_dir, "l60_pmi_bigrams")
    assert 0 < len(out) <= 20
    assert all(r["c_ab"] >= 25 for r in out)
    # descending PMI with bigram ASC tiebreak => a strict total order
    keys = [(-r["pmi"], r["bigram"]) for r in out]
    assert keys == sorted(keys)


def test_dsir_prefers_target_like_docs(reg, spark, sf_dir, duck):
    """Mean importance of the selected top-30 must exceed the corpus
    mean importance per token of the background — selection must pull
    toward the target source, and src0 docs must be overrepresented vs
    their corpus share."""
    out = rows(reg, spark, sf_dir, "l61_dsir_select")
    assert len(out) == 30
    share_src0 = sum(1 for r in out if r["source"] == "src0") / len(out)
    corpus = duck.execute(
        "SELECT AVG(CASE WHEN source = 'src0' THEN 1.0 ELSE 0 END) FROM documents"
    ).fetchone()[0]
    assert share_src0 > corpus, (share_src0, corpus)
    # scores are sorted descending, deterministic tiebreak on doc_id
    keys = [(-r["importance"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_cuped_contract(reg, spark, sf_dir, duck):
    out = rows(reg, spark, sf_dir, "d30_cuped_adjustment")
    assert [r["arm"] for r in out] == [0, 1]
    n_users = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in out) == n_users
    for r in out:
        assert 0.0 <= r["var_reduction"] <= 1.0
        # theta and r2 are pooled: identical on both arm rows
        assert r["theta"] == out[0]["theta"]
        assert r["var_reduction"] == out[0]["var_reduction"]
        # adjustment is a recentering: finite, same scale as the metric
        assert math.isfinite(r["mean_adjusted"])
    # pooled recentering conserves the overall weighted mean:
    # sum_a n_a * (adj_a - post_a) = -theta * sum_a n_a*(pre_a - pre_all) = 0
    drift = sum(r["n_users"] * (r["mean_adjusted"] - r["mean_post"]) for r in out)
    scale = max(abs(r["mean_post"]) for r in out) * n_users
    assert abs(drift) <= 1e-3 * scale, (drift, scale)
