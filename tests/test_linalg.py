"""linalg: Gram matrix + power-iteration top PC vs dense NumPy."""

from __future__ import annotations

import numpy as np

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators.linalg import (
    EMB_DIM,
    EMBEDDING_GRAM_SQL,
    embedding_gram_matrix,
    embedding_top_pc,
    top_pc_oracle_sql,
)


def _dense(ddb) -> np.ndarray:
    rows = ddb.sql("SELECT embedding FROM embeddings ORDER BY vec_id").fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def test_gram_matches_numpy(spark, ddb):
    X = _dense(ddb)
    G = X.T @ X
    out = embedding_gram_matrix(spark, SF_ORACLE).collect()
    assert len(out) == EMB_DIM * EMB_DIM
    for r in out:
        assert abs(r["gram"] - G[r["i"], r["j"]]) < 1e-5
    assert_frames_match(
        embedding_gram_matrix(spark, SF_ORACLE), ddb.sql(EMBEDDING_GRAM_SQL)
    )


def test_top_pc_matches_numpy_power_iteration(spark, ddb):
    from etl_addresses_spark.operators.linalg import PI_ITERS

    X = _dense(ddb)
    G = X.T @ X
    # dense replica of the SAME fixed-budget algorithm
    v_np = np.full(EMB_DIM, 1.0 / np.sqrt(EMB_DIM))
    rayleigh = [v_np @ G @ v_np]
    for _ in range(PI_ITERS):
        w = G @ v_np
        v_np = w / np.linalg.norm(w)
        rayleigh.append(v_np @ G @ v_np)
    out = embedding_top_pc(spark, SF_ORACLE).collect()
    v = np.zeros(EMB_DIM)
    for r in out:
        v[r["i"]] = r["loading"]
    assert np.max(np.abs(v - v_np)) < 2e-6
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # power iteration invariant: Rayleigh quotient never decreases
    assert all(b >= a - 1e-9 for a, b in zip(rayleigh, rayleigh[1:]))
    assert_frames_match(
        embedding_top_pc(spark, SF_ORACLE), ddb.sql(top_pc_oracle_sql())
    )


def test_pc_scores_match_numpy_and_zero_shuffle(spark, ddb):
    from etl_addresses_spark.operators.linalg import (
        embedding_pc_scores,
        pc_scores_oracle_sql,
    )

    X = _dense(ddb)
    pub = {
        r["i"]: r["loading"]
        for r in embedding_top_pc(spark, SF_ORACLE).collect()
    }
    w = np.array([pub[i] for i in range(EMB_DIM)])
    expect = X @ w
    ids = [r[0] for r in ddb.sql("SELECT vec_id FROM embeddings ORDER BY vec_id").fetchall()]
    df = embedding_pc_scores(spark, SF_ORACLE)
    got = {r["vec_id"]: r["pc_score"] for r in df.collect()}
    for vid, exp in zip(ids, expect):
        assert abs(got[vid] - exp) < 2e-6
    # the scoring pass must be shuffle-free: model as literal, one scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("FileScan parquet") == 1
    assert_frames_match(df, ddb.sql(pc_scores_oracle_sql()))
