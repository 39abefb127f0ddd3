"""Central registry: query name -> (spark callable, oracle SQL | None).

This is what __spark_entry__.py exposes to the driver.  Every operator
from SURVEY.md §2 lands here with a DuckDB oracle wherever the
semantics are ANSI-SQL-expressible; genuinely non-SQL ops register
oracle=None (driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_addresses_spark.operators import clustering, graph, polygon
from etl_addresses_spark.plans import (
    extensions,
    flagship,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    streaming_queries,
    transform,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    query: QueryFn
    oracle: str | None


REGISTRY: dict[str, Entry] = {
    "spatiotemporal_join": Entry(flagship.spatiotemporal_join, flagship.ORACLE_SQL),
    "spatiotemporal_join_knn": Entry(
        flagship.spatiotemporal_join_knn, flagship.ORACLE_SQL_KNN
    ),
    "transform_objects": Entry(transform.transform_objects, transform.OBJECTS_ORACLE),
    "transform_relations": Entry(
        transform.transform_relations, transform.RELATIONS_ORACLE
    ),
    "transform_logs": Entry(transform.transform_logs, transform.LOGS_ORACLE),
    "relation_degrees": Entry(transform.relation_degrees, transform.DEGREES_ORACLE),
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in relational.QUERIES.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in extensions.EXTENSION_QUERIES.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in relational2.QUERIES2.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in relational3.QUERIES3.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in relational4.QUERIES4.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in relational5.QUERIES5.items()
    },
    **{
        name: Entry(fn, sql)
        for name, (fn, sql) in streaming_queries.STREAMING_QUERIES.items()
    },
    # Iterative float ops: genuinely non-SQL-expressible -> rows-only
    # checks; SSE-monotonicity + recall asserted in pytest instead.
    "kmeans_cluster_sizes": Entry(clustering.kmeans_cluster_sizes, None),
    "ann_ivf_lloyd_topk": Entry(clustering.ann_ivf_lloyd_topk, None),
    "pagerank_relations": Entry(graph.pagerank_relations, None),
    "st_contains_join": Entry(polygon.st_contains_join, polygon.ST_CONTAINS_SQL),
}


def queries() -> dict[str, QueryFn]:
    return {name: e.query for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}
