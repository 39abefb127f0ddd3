"""Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding
cosine rankings.

The standard production shape for training-data curation and RAG
corpus search (Cormack/Clarke/Buettcher 2009): run a lexical ranker
and a vector ranker INDEPENDENTLY, keep each one's top-C candidate
list (model-sized — never the full corpus), and fuse by
RRF(d) = sum_r 1 / (K + rank_r(d)) over the lists d appears in.
Rank positions are integers and 1/(K+rank) is a single binary64
division, so the fused scores are bit-identical across engines — no
float-accumulation caveats despite fusing two float rankings (only
the RANKS cross the fusion boundary, and both component orderings are
already hash-checked rows: bm25_topk, cosine_topk).

Scale story: each signal ends in a TakeOrderedAndProject top-C (no
global sort, no all-corpus window); the fusion is a full-outer join of
two <=C-row frames — driver-trivial at any corpus size.  The vector
signal here is brute-force over the doc-joined corpus (the checked
baseline); at 100 TB the same fusion consumes the IVF/IVF-PQ top-C
(`ann_ivf_pq_topk`) unchanged, because RRF only reads ranks.

No reference parity: the reference (addresses.js) has no retrieval
surface; this row extends the LLM-data-pipeline family
(SURVEY.md §2 extensions) alongside bm25_topk / cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import window as W

from etl_addresses_spark.operators.llmtext import BM25_SCORED_CTES, bm25_scored
from etl_addresses_spark.operators.similarity import (
    _duckdb_dot,
    _norm_col,
    _pair_dot_seq,
)
from etl_addresses_spark.sources.tables import load_table

RRF_K = 60          # the canonical RRF constant
RRF_CAND = 100      # per-signal candidate-list length
RRF_TOPK = 20
RRF_QUERY_VEC = 0   # the corpus doc whose embedding is the vector query


def _ranked_top(scored: DataFrame, score_col: str, rank_col: str) -> DataFrame:
    """(doc_id, rank) for the top-RRF_CAND of a scored frame.  limit()
    FIRST (TakeOrderedAndProject — no global sort), then a row_number
    over the model-sized survivor set; both order by the identical
    (score DESC, doc_id ASC) total order, so rank is deterministic."""
    top = scored.orderBy(F.desc(score_col), F.asc("doc_id")).limit(RRF_CAND)
    w = W.Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    return top.select(
        "doc_id", F.row_number().over(w).cast("long").alias(rank_col)
    )


def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RRF_TOPK} documents by RRF over (a) BM25 for the fixed text
    query and (b) cosine against doc {RRF_QUERY_VEC}'s embedding, each
    truncated to its top-{RRF_CAND}.  A doc on only one list gets only
    that list's term (the other contributes 0) — the standard RRF
    missing-rank rule.  Output: doc_id, both (nullable) ranks, rrf."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    bm25_top = _ranked_top(bm25_scored(d), "bm25", "bm25_rank")

    # vector signal over the doc-joined corpus (doc_id == vec_id — the
    # docs_with_embeddings contract), scored against one query vector
    emb = e.join(
        d.select("doc_id"), e.vec_id == F.col("doc_id"), "inner"
    ).select("doc_id", "embedding", _norm_col(F.col("embedding")).alias("norm"))
    q = emb.filter(F.col("doc_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    cos_scored = emb.crossJoin(F.broadcast(q)).select(
        "doc_id",
        (
            _pair_dot_seq(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm"))
        ).alias("cosine"),
    )
    cos_top = _ranked_top(cos_scored, "cosine", "cos_rank")

    def rrf_term(rank: F.Column) -> F.Column:
        return F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + rank), F.lit(0.0)
        )

    fused = bm25_top.join(cos_top, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (rrf_term(F.col("bm25_rank")) + rrf_term(F.col("cos_rank"))).alias(
            "rrf"
        ),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)


RRF_HYBRID_SQL = f"""
WITH {BM25_SCORED_CTES},
bm25_top AS (
  SELECT doc_id, CAST(row_number() OVER (
      ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS bm25_rank
  FROM (SELECT * FROM bm25_scored ORDER BY bm25 DESC, doc_id ASC
        LIMIT {RRF_CAND})
),
emb AS (
  SELECT d.doc_id, e.embedding,
    sqrt(CAST({_duckdb_dot('e.embedding', 'e.embedding')} AS DOUBLE)) AS norm
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
q AS (
  SELECT embedding AS q_emb, norm AS q_norm
  FROM emb WHERE doc_id = {RRF_QUERY_VEC}
),
cos_scored AS (
  SELECT emb.doc_id,
    CAST({_duckdb_dot('q.q_emb', 'emb.embedding')} AS DOUBLE)
      / (q.q_norm * emb.norm) AS cosine
  FROM emb CROSS JOIN q
),
cos_top AS (
  SELECT doc_id, CAST(row_number() OVER (
      ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS cos_rank
  FROM (SELECT * FROM cos_scored ORDER BY cosine DESC, doc_id ASC
        LIMIT {RRF_CAND})
)
SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
  b.bm25_rank AS bm25_rank,
  c.cos_rank AS cos_rank,
  (coalesce(1.0e0 / ({RRF_K} + b.bm25_rank), 0.0e0)
   + coalesce(1.0e0 / ({RRF_K} + c.cos_rank), 0.0e0)) AS rrf
FROM bm25_top b FULL OUTER JOIN cos_top c ON b.doc_id = c.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {RRF_TOPK}
"""

QUERIES_RETRIEVAL = {
    "rrf_hybrid_topk": (rrf_hybrid_topk, RRF_HYBRID_SQL),
}
