"""RRF hybrid fusion: oracle parity, the RRF invariants, and the
no-global-sort plan contract."""

from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators.retrieval import (
    RRF_CAND,
    RRF_K,
    RRF_HYBRID_SQL,
    RRF_TOPK,
    rrf_hybrid_topk,
)


def test_rrf_oracle(spark, ddb):
    assert_frames_match(rrf_hybrid_topk(spark, SF_ORACLE), ddb.sql(RRF_HYBRID_SQL))


def test_rrf_invariants(spark):
    rows = rrf_hybrid_topk(spark, SF_ORACLE).collect()
    assert len(rows) == RRF_TOPK
    for r in rows:
        # a doc must come from at least one list, ranks are 1..C, and
        # the score is EXACTLY the sum of its present rank terms (the
        # bit-portability claim: integer ranks -> one division each)
        assert r.bm25_rank is not None or r.cos_rank is not None
        expect = 0.0
        for rank in (r.bm25_rank, r.cos_rank):
            if rank is not None:
                assert 1 <= rank <= RRF_CAND
                expect += 1.0 / (RRF_K + rank)
        assert r.rrf == expect
    # emitted in fused order, two-list docs cannot be beaten by the
    # rank-1 single-list ceiling unless both their ranks are very deep
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_plan_has_no_global_sort(spark):
    """Every Sort in the plan must be part of a TakeOrderedAndProject
    (the top-C / top-k finishers) or a model-sized window over an
    already-limited frame — never a full-corpus Exchange+Sort."""
    plan = rrf_hybrid_topk(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    # the corpus-sized stages are the bm25 scoring pass and the cosine
    # scoring pass; both must reach the rank stage through a
    # TakeOrderedAndProject, which is how Spark renders orderBy+limit
    assert "TakeOrderedAndProject" in plan
    # a global sort of the scored corpus would render as an Exchange
    # SinglePartition feeding a Sort BEFORE any limit; the only
    # single-partition exchanges allowed here are the post-limit
    # window/fusion stages (<= 2*C rows)
    assert plan.count("rangepartitioning") == 0


def test_bm25_inverted_equals_dense(spark):
    """Two algorithms, one answer: the inverted-postings tier must be
    BIT-identical to the dense per-term-column tier (it shares the
    oracle on that claim), and the fixture must exercise the coincide
    precondition (>= RRF/topk docs matching at least one term)."""
    from etl_addresses_spark.operators.llmtext import (
        bm25_topk,
        bm25_topk_inverted,
    )

    dense = {(r.doc_id, r.bm25) for r in bm25_topk(spark, SF_ORACLE).collect()}
    inv = {
        (r.doc_id, r.bm25)
        for r in bm25_topk_inverted(spark, SF_ORACLE).collect()
    }
    assert dense == inv
    assert len(inv) == 20
    # precondition for sharing the oracle: the 20th dense score is
    # positive, i.e. the top-20 never dips into zero-score docs the
    # inverted scored-set does not contain
    assert min(s for _d, s in dense) > 0.0


def test_bm25_regime_gate(spark):
    """The dispatcher rule (r10 verdict item 5): dense below the
    corpus-bytes gate, inverted past it; at fixture scale the chosen
    plan must be the dense shape (no posting-list explode)."""
    from etl_addresses_spark.operators.llmtext import (
        BM25_DENSE_MAX_BYTES,
        bm25_tier_for,
        bm25_topk,
    )

    assert bm25_tier_for(0) == "dense"
    assert bm25_tier_for(BM25_DENSE_MAX_BYTES) == "dense"
    assert bm25_tier_for(BM25_DENSE_MAX_BYTES + 1) == "inverted"
    plan = bm25_topk(spark, SF_ORACLE)._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" not in plan.lower()


def test_bm25_inverted_short_corpus_raises(spark, tmp_path):
    """r10 advice: the dense oracle zero-pads its top-20 when fewer
    than 20 docs contain a query term; the inverted plan now asserts
    that precondition at runtime so a violating corpus fails LOUDLY
    instead of silently hash-diverging."""
    import pytest

    from etl_addresses_spark.operators.llmtext import bm25_topk_inverted

    spark.createDataFrame(
        [
            (i, "table scan merge" if i < 5 else "nothing relevant here",
             "en", "web", 17)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="scored set smaller than k"):
        bm25_topk_inverted(spark, str(tmp_path)).collect()


def test_rrf_ivfpq_oracle(spark, ddb):
    from etl_addresses_spark.operators.retrieval import (
        rrf_hybrid_ivfpq_oracle_sql,
        rrf_hybrid_topk_ivfpq,
    )

    assert_frames_match(
        rrf_hybrid_topk_ivfpq(spark, SF_ORACLE),
        ddb.sql(rrf_hybrid_ivfpq_oracle_sql()),
    )


def test_rrf_ivfpq_invariants_and_tier_overlap(spark):
    """Fusion invariants hold for the index tier too, and the two
    tiers must substantially agree: the BM25 side is IDENTICAL (same
    signal), so the fused top-20s can only diverge where IVF-PQ
    re-ranks the vector side — a healthy index keeps most of the
    brute twin's picks."""
    from etl_addresses_spark.operators.retrieval import (
        rrf_hybrid_topk,
        rrf_hybrid_topk_ivfpq,
    )

    rows = rrf_hybrid_topk_ivfpq(spark, SF_ORACLE).collect()
    assert len(rows) == RRF_TOPK
    for r in rows:
        assert r.bm25_rank is not None or r.vec_rank is not None
        expect = 0.0
        for rank in (r.bm25_rank, r.vec_rank):
            if rank is not None:
                assert 1 <= rank <= RRF_CAND
                expect += 1.0 / (RRF_K + rank)
        assert r.rrf == expect
    brute = {r.doc_id for r in rrf_hybrid_topk(spark, SF_ORACLE).collect()}
    overlap = len(brute & {r.doc_id for r in rows}) / len(brute)
    # fixture-measured floor (0.45 at sf0.001): nprobe=2 of the
    # k = floor(sqrt(n)) ~ 22 lists covers only ~9% of a 500-vector
    # corpus, so the vector side legitimately re-ranks hard at toy
    # scale — the same compounding the ann_ivf_pq_recall row prices
    # (its own fixture floor is 0.15); the guard is against
    # DEGENERATE divergence (disjoint lists), not index recall.
    assert overlap >= 0.35, f"index tier degenerate vs brute fusion: {overlap}"


def test_rrf_ivfpq_candidate_scan_is_hash_join(spark):
    """The composition must inherit the index tier's prune: the
    corpus-side candidate scan joins on list_id as a broadcast HASH
    join — never a corpus-wide cartesian (the ann_ivf_pq_topk plan
    contract, restated for the fused row)."""
    from etl_addresses_spark.operators.retrieval import rrf_hybrid_topk_ivfpq

    plan = (
        rrf_hybrid_topk_ivfpq(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert any(
        "BroadcastHashJoin [list_id" in ln for ln in plan.splitlines()
    ), "fused row lost the list_id hash-join prune"


def test_ndcg_eval_ivfpq_oracle(spark, ddb):
    from etl_addresses_spark.operators.retrieval import (
        ndcg_eval_ivfpq,
        ndcg_eval_ivfpq_oracle_sql,
    )

    assert_frames_match(
        ndcg_eval_ivfpq(spark, SF_ORACLE),
        ddb.sql(ndcg_eval_ivfpq_oracle_sql()),
    )


def test_ndcg_invariants(spark):
    """One row per query; ndcg in [0, 1]; NDCG must never exceed the
    corresponding recall signal's implied ceiling (a query with zero
    exact-top-k hits has ndcg exactly 0), and the mean must be
    positive on the fixture (the index is not degenerate)."""
    from etl_addresses_spark.operators.clustering import ann_ivf_pq_recall
    from etl_addresses_spark.operators.retrieval import ndcg_eval_ivfpq

    rows = {r.query_id: r for r in ndcg_eval_ivfpq(spark, SF_ORACLE).collect()}
    recall = {
        r.query_id: r for r in ann_ivf_pq_recall(spark, SF_ORACLE).collect()
    }
    assert set(rows) == set(recall)
    for qid, r in rows.items():
        assert 0.0 <= r.ndcg <= 1.0 + 1e-12, (qid, r.ndcg)
        if recall[qid].n_hit == 0:
            assert r.ndcg == 0.0
        else:
            assert r.ndcg > 0.0
    assert sum(r.ndcg for r in rows.values()) > 0.0
