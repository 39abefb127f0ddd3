from __future__ import annotations

from conftest import SF_ORACLE

from etl_addresses_spark.operators import clustering, similarity
from etl_addresses_spark.sources.tables import load_table


def test_lloyd_sse_monotone_nonincreasing(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    _, history = clustering.kmeans_fit(e, iters=4)
    assert len(history) == 4
    for a, b in zip(history, history[1:]):
        assert b <= a + 1e-9, f"SSE increased across a Lloyd iteration: {history}"
    assert history[-1] < history[0], "iterations should actually improve SSE"


def test_cluster_sizes_partition_corpus(spark):
    sizes = clustering.kmeans_cluster_sizes(spark, SF_ORACLE).collect()
    n = load_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n_members for r in sizes) == n, "every vector in exactly one cluster"
    assert all(r.n_members > 0 for r in sizes)


def test_ivf_lloyd_recall_vs_exact(spark):
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.cosine_topk(spark, SF_ORACLE).collect()
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in clustering.ann_ivf_lloyd_topk(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    # same bar as the pseudo-centroid IVF; Lloyd lists should not be worse
    assert recall >= 0.3, f"Lloyd-IVF recall suspiciously low: {recall}"


def test_kmeans_deterministic_rerun(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    c1, h1 = clustering.kmeans_fit(e, iters=2)
    c2, h2 = clustering.kmeans_fit(e, iters=2)
    assert h1 == h2, "identical input + init must reproduce identical SSE path"
    assert [r.asDict() for r in c1.collect()] == [r.asDict() for r in c2.collect()]
