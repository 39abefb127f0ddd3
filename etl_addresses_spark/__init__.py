"""PySpark-native analytics engine with the query surface of
nypl-spacetime/etl-addresses (reference: /root/reference/addresses.js),
re-expressed Spark-first, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal).

Layout:
    sources/    - parquet table loaders, NDJSON object streams, geo fixtures
    functions/  - scalar column expressions (fuzzy dates, ids, geo math, text)
    operators/  - the flagship spatio-temporal join, transform fan-out,
                  dedup, similarity, sessionization, multimodal plumbing
    plans/      - relational query surface (joins/aggs/windows/set ops)
    streaming/  - Structured Streaming variants (watermark, session windows)
"""

from etl_addresses_spark.session import get_spark

__all__ = ["get_spark"]
