"""relational7: clickstream paths, grouped OLS, in-regime PassJoin,
bounded BFS — each checked against an INDEPENDENT Python/NumPy
recompute (the oracle-SQL parity itself is driver_sim's job)."""

from __future__ import annotations

from collections import Counter, deque

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational7 import (
    PATH_MAX_STEPS,
    PATH_TOPK,
    TITLE_MAX_DIST,
    TITLE_WORDS,
    FUZZY_TITLE_PASSJOIN_SQL,
    SESSIONS_PATH_TOPK_SQL,
    STATS_REGRESSION_GROUP_SQL,
    fuzzy_title_match_passjoin,
    sessions_path_topk,
    stats_regression_group,
)


def test_sessions_path_topk_matches_python_recompute(spark, ddb):
    rows = ddb.sql(
        "SELECT user_id, event_id, epoch_us(ts), event_type "
        "FROM events ORDER BY user_id, 3, event_id"
    ).fetchall()
    sessions: list[list[str]] = []
    prev_user, prev_us = None, None
    for user, _eid, us, etype in rows:
        if user != prev_user or us - prev_us > 1_800_000_000:
            sessions.append([])
        if len(sessions[-1]) < PATH_MAX_STEPS:
            sessions[-1].append(etype)
        prev_user, prev_us = user, us
    counts = Counter("->".join(s) for s in sessions)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOPK]
    got = [
        (r["path"], r["n_sessions"])
        for r in sessions_path_topk(spark, SF_ORACLE).collect()
    ]
    assert got == expect
    assert_frames_match(
        sessions_path_topk(spark, SF_ORACLE), ddb.sql(SESSIONS_PATH_TOPK_SQL)
    )


def test_stats_regression_matches_numpy(spark, ddb):
    import numpy as np

    out = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in stats_regression_group(spark, SF_ORACLE).collect()
    }
    data = ddb.sql(
        "SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice "
        "FROM lineitem"
    ).fetchall()
    groups: dict[tuple, list] = {}
    for rf, ls, x, y in data:
        groups.setdefault((rf, ls), []).append((x, y))
    assert set(out) == set(groups)
    for key, pts in groups.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        assert out[key]["n"] == len(pts)
        assert abs(out[key]["slope"] - slope) < 1e-5
        assert abs(out[key]["intercept"] - intercept) < 1e-3
    assert_frames_match(
        stats_regression_group(spark, SF_ORACLE),
        ddb.sql(STATS_REGRESSION_GROUP_SQL),
    )


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_title_passjoin_matches_brute_force(spark, ddb):
    docs = ddb.sql(
        "SELECT doc_id, array_to_string("
        f"list_slice(string_split(text, ' '), 1, {TITLE_WORDS}), ' ') "
        "FROM documents"
    ).fetchall()
    evens = [(i, t) for i, t in docs if i % 2 == 0]
    odds = [(i, t) for i, t in docs if i % 2 == 1]
    expect = {}
    for ei, et in evens:
        best = None
        for oi, ot in odds:
            d = _lev(et, ot)
            if d <= TITLE_MAX_DIST and (best is None or (d, oi) < best[:2]):
                best = (d, oi, ot)
        if best is not None:
            expect[ei] = (et, best[1], best[2], best[0])
    got = {
        r["even_doc"]: (r["even_title"], r["odd_doc"], r["odd_title"], r["dist"])
        for r in fuzzy_title_match_passjoin(spark, SF_ORACLE).collect()
    }
    assert got == expect and len(expect) > 0
    assert_frames_match(
        fuzzy_title_match_passjoin(spark, SF_ORACLE),
        ddb.sql(FUZZY_TITLE_PASSJOIN_SQL),
    )


def test_graph_bfs_matches_python_bfs(spark, ddb):
    from etl_addresses_spark.operators.graph import (
        BFS_HOPS,
        BFS_SEEDS,
        bfs_oracle_sql,
        graph_bfs_distances,
    )

    li = ddb.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    per_order: dict[int, set] = {}
    for ok, p in li:
        per_order.setdefault(ok, set()).add(p)
    adj: dict[int, set] = {}
    for ps in per_order.values():
        for u in ps:
            for v in ps:
                if u != v:
                    adj.setdefault(u, set()).add(v)
    seeds = sorted(adj)[:BFS_SEEDS]
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= BFS_HOPS:
            continue
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    out = graph_bfs_distances(spark, SF_ORACLE)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == dist
    assert_frames_match(
        graph_bfs_distances(spark, SF_ORACLE), ddb.sql(bfs_oracle_sql())
    )
