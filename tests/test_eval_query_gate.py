"""The eval query-sample regime gate (r13, r12 verdict item 2).

The recall/NDCG eval rows score an exact-cosine baseline over the
standard query set; un-gated, that made the eval class corpus-
quadratic.  The gate caps the eval query set at ~EVAL_QUERY_BUDGET
queries past EVAL_QUERY_BUDGET * QUERY_MOD corpus rows via the shared
exact-int64 Knuth threshold.  These tests pin the three contract
points: (1) the threshold derivation — non-binding at every committed
fixture, correct integer past it; (2) FORCED engine-vs-engine binding
(the kmeans train_c precedent): both engines given the same pretend
corpus count select the identical sampled query set and identical
top-k values; (3) the sampled set is a strict nonempty subset — the
gate samples, it never empties or no-ops."""

from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators import similarity
from etl_addresses_spark.operators.similarity import (
    EVAL_QUERY_BUDGET,
    QUERY_MOD,
    ann_ivf_topk_for,
    ann_ivf_topk_sql,
    cosine_topk_fast_for,
    cosine_topk_sql,
    eval_query_pred,
    eval_query_pred_sql,
    eval_query_sample_thresh,
)
from etl_addresses_spark.sources.tables import load_table

# A pretend corpus count that forces the gate to BIND at fixture scale
# (every committed fixture is far below EVAL_QUERY_BUDGET * QUERY_MOD)
FORCED_N = 20_000


def test_threshold_derivation():
    lim = EVAL_QUERY_BUDGET * QUERY_MOD  # 6400
    # every committed fixture count -> full query set
    for n in (500, 2000, lim):
        assert eval_query_sample_thresh(n) is None
    # first binding point and the 30x replica
    assert eval_query_sample_thresh(lim + 1) == (lim << 32) // (lim + 1)
    assert eval_query_sample_thresh(60_000) == (lim << 32) // 60_000
    # expected sample fraction ~= lim/n: with n/QUERY_MOD queries the
    # expected sampled-query count is ~EVAL_QUERY_BUDGET
    t = eval_query_sample_thresh(60_000)
    assert abs(t / (1 << 32) - lim / 60_000) < 1e-9


def test_forced_binding_engine_parity_cosine(spark, ddb):
    """Both engines, given the SAME pretend corpus count, must select
    the identical sampled query set and identical exact top-k."""
    e = load_table(spark, SF_ORACLE, "embeddings")
    thresh = eval_query_sample_thresh(FORCED_N)
    assert thresh is not None
    assert_frames_match(
        cosine_topk_fast_for(e, eval_thresh=thresh),
        ddb.sql(
            cosine_topk_sql(eval_query_pred_sql("vec_id", str(FORCED_N)))
        ),
    )


def test_forced_binding_engine_parity_ivf(spark, ddb):
    e = load_table(spark, SF_ORACLE, "embeddings")
    thresh = eval_query_sample_thresh(FORCED_N)
    assert_frames_match(
        ann_ivf_topk_for(e, eval_thresh=thresh),
        ddb.sql(
            ann_ivf_topk_sql(eval_query_pred_sql("vec_id", str(FORCED_N)))
        ),
    )


def test_forced_binding_is_strict_nonempty_subset(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    full = {
        r.vec_id
        for r in e.filter(eval_query_pred(None)).select("vec_id").collect()
    }
    thresh = eval_query_sample_thresh(FORCED_N)
    sampled = {
        r.vec_id
        for r in e.filter(eval_query_pred(thresh)).select("vec_id").collect()
    }
    assert sampled, "forced binding emptied the query set"
    assert sampled < full, "forced binding did not prune anything"


def test_fixture_scale_gate_is_non_binding(spark):
    """At every committed fixture the derived threshold is None, so the
    registered eval rows keep their historical query sets and hashes."""
    e = load_table(spark, SF_ORACLE, "embeddings")
    assert eval_query_sample_thresh(e.count()) is None
    # and the module constant protects the invariant: budget * mod
    # must stay >= the largest committed fixture corpus (sf0.1 = 2000)
    assert EVAL_QUERY_BUDGET * QUERY_MOD >= 2000


def test_sampled_sql_constants_render():
    """The sampled SQL twins must embed the OR-disjunct (full set when
    under the limit) and derive the threshold from the oracle's own
    count CTE — never a baked-in literal."""
    for s in (
        similarity.COSINE_TOPK_SAMPLED_SQL,
        ann_ivf_topk_sql(eval_query_pred_sql("vec_id", "SELECT n FROM en")),
    ):
        assert f"<= {EVAL_QUERY_BUDGET * QUERY_MOD} OR" in s
        assert "SELECT n FROM en" in s
