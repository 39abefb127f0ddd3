"""MMR re-ranking and k-center greedy sampling: oracle parity plus the
greedy-selection invariants both algorithms guarantee by construction."""

from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators.diversity import (
    KCENTER_K,
    KCENTER_SEED,
    MMR_LAMBDA,
    MMR_QUERY_VEC,
    MMR_TOPK,
    kcenter_diverse_sample,
    kcenter_oracle_sql,
    mmr_oracle_sql,
    mmr_rerank_topk,
)


def test_mmr_oracle(spark, ddb):
    assert_frames_match(
        mmr_rerank_topk(spark, SF_ORACLE), ddb.sql(mmr_oracle_sql())
    )


def test_kcenter_oracle(spark, ddb):
    assert_frames_match(
        kcenter_diverse_sample(spark, SF_ORACLE), ddb.sql(kcenter_oracle_sql())
    )


def test_mmr_invariants(spark):
    rows = sorted(
        mmr_rerank_topk(spark, SF_ORACLE).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == list(range(1, MMR_TOPK + 1))
    # picks are distinct docs
    assert len({r.doc_id for r in rows}) == MMR_TOPK
    # step 1 has no diversity penalty: the query doc is its own best
    # match (cosine 1), so pick 1 is the query vector itself with
    # mmr = lambda * 1.0
    assert rows[0].doc_id == MMR_QUERY_VEC
    assert abs(rows[0].mmr - MMR_LAMBDA) < 1e-12
    # greedy scores are non-increasing: at step t+1 the pool shrank
    # and every penalty term max_{s in S} sim can only have grown
    scores = [r.mmr for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_kcenter_invariants(spark):
    rows = sorted(
        kcenter_diverse_sample(spark, SF_ORACLE).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in rows] == list(range(1, KCENTER_K + 1))
    assert len({r.vec_id for r in rows}) == KCENTER_K
    assert rows[0].vec_id == KCENTER_SEED and rows[0].max_cos == 0.0
    # coverage similarity of successive picks is non-decreasing: each
    # point's max-cos to the selected set only grows as centers are
    # added, and each pick is the pool minimum of those values
    cov = [r.max_cos for r in rows[1:]]
    assert cov == sorted(cov)
    # the picks are genuinely diverse: every later pick was, at its
    # selection time, less similar to the selected set than a perfect
    # duplicate would be
    assert all(c < 0.999 for c in cov)
