"""BPE merge-table training — the tokenizer-training member of the
LLM-data-pipeline surface.

Byte-pair encoding's training loop (Sennrich et al. 2016, public
algorithm): start from character symbols, repeatedly (1) count
adjacent symbol pairs over the corpus vocabulary weighted by word
frequency, (2) take the most frequent pair, (3) merge every
occurrence, k times; the learned merge list IS the tokenizer.  This
module trains the first {BPE_MERGES} merges.

Spark shape (the 100 TB story):

- ONE corpus scan builds the (word, count) vocabulary — after that,
  every round runs on the vocab table, which is orders of magnitude
  smaller than the corpus (Heaps' law) and shrinks further as merges
  fuse symbols;
- per round: adjacent pairs via a transform over the split symbol
  array (the array is bound in its own projection first — the
  lambda-CSE hazard, SCALE.md), hash-aggregated with map-side
  partials; the argmax is min(struct(-freq, pair)) — ONE row to the
  driver per round (model-sized collect, the kmeans/IVF precedent);
- merge application is two nested `replace()` calls on the
  space-joined symbol string with space anchors — pure JVM string
  ops, no UDFs.

Cross-engine exactness: frequencies are integer sums; the tie-break
(freq DESC, pair ASC) is a total order; and the merge-apply rule is
BOTH engines' identical `replace()` scan (non-overlapping,
left-to-right).  One documented deviation from textbook BPE: a
boundary-consuming scan cannot merge BOTH of two occurrences that
share a separator (chains like "a a a"), so the rule applies replace
TWICE per round — only chains of 3+ identical adjacent pairs within
one word deviate from the greedy symbol-level fold, and identically
so in both engines (the oracle is the same algorithm, independently
expressed, not a reimplementation quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

BPE_MERGES = 4


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # character symbols joined by single spaces: "hello" -> "h e l l o"
    return words.select(
        F.expr("trim(regexp_replace(w, '(.)', '$1 '))").alias("sw"), "n"
    )


def _adjacent_pair_counts(cur: DataFrame) -> DataFrame:
    # bind the split array once (CSE hazard): transform indexes into it
    syms = cur.select(F.split("sw", " ").alias("s"), "n")
    pairs = syms.select(
        F.explode(
            # guard single-symbol words: Spark's sequence(1, 0) is the
            # DESCENDING [1, 0], not empty
            F.expr(
                "if(size(s) < 2, array(), "
                "transform(sequence(1, size(s) - 1), "
                "i -> concat(element_at(s, i), ' ', element_at(s, i + 1))))"
            )
        ).alias("p"),
        "n",
    )
    return pairs.groupBy("p").agg(F.sum("n").alias("f"))


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first {BPE_MERGES} BPE merges on the documents
    corpus; returns (rank, lhs, rhs, freq) — the merge list in
    learned order."""
    cur = _vocab(spark, sf_dir)
    merges = []
    for rank in range(1, BPE_MERGES + 1):
        counts = _adjacent_pair_counts(cur)
        top = counts.agg(
            F.min(F.struct((-F.col("f")).alias("nf"), F.col("p"))).alias("m")
        ).first()["m"]
        if top is None:
            break
        pair, freq = top["p"], -top["nf"]
        lhs, rhs = pair.split(" ")
        merged = lhs + rhs
        # anchored, applied twice (see module docstring); literals are
        # fixture tokens (letters/digits), no quoting hazard beyond '
        esc = pair.replace("'", "\\'")
        esc_m = merged.replace("'", "\\'")
        apply_once = (
            f"replace(concat(' ', sw, ' '), ' {esc} ', ' {esc_m} ')"
        )
        cur = cur.select(
            F.expr(
                f"trim(replace({apply_once}, ' {esc} ', ' {esc_m} '))"
            ).alias("sw"),
            "n",
        )
        merges.append((rank, lhs, rhs, int(freq)))
    return spark.createDataFrame(
        merges, "rank bigint, lhs string, rhs string, freq bigint"
    )


def _round_ctes(r: int) -> str:
    """CTEs for round r: pair counts c{r} from w{r-1}, winner m{r},
    merged vocab w{r}."""
    return f"""
c{r} AS (
  SELECT l[i] || ' ' || l[i + 1] AS p, sum(n) AS f
  FROM (SELECT string_split(sw, ' ') AS l, n FROM w{r - 1}),
       UNNEST(generate_series(1, len(l) - 1)) AS g(i)
  GROUP BY 1
),
m{r} AS (
  SELECT {r} AS rank, p, CAST(f AS BIGINT) AS f
  FROM c{r} ORDER BY f DESC, p ASC LIMIT 1
),
w{r} AS (
  SELECT trim(replace(
           replace(' ' || sw || ' ',
                   ' ' || (SELECT p FROM m{r}) || ' ',
                   ' ' || (SELECT replace(p, ' ', '') FROM m{r}) || ' '),
           ' ' || (SELECT p FROM m{r}) || ' ',
           ' ' || (SELECT replace(p, ' ', '') FROM m{r}) || ' ')) AS sw,
         n
  FROM w{r - 1}
)"""


BPE_MERGE_TABLE_SQL = (
    """
WITH w0 AS (
  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sw,
         CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  )
  WHERE w <> ''
  GROUP BY 1
),"""
    + ",".join(_round_ctes(r) for r in range(1, BPE_MERGES + 1))
    + """
SELECT rank, split_part(p, ' ', 1) AS lhs, split_part(p, ' ', 2) AS rhs,
       f AS freq
FROM ("""
    + " UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, BPE_MERGES + 1)
    )
    + ")"
)


BPE_TOPK_TOKENS = 50


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY side of the tokenizer: encode the corpus vocabulary with
    the {BPE_MERGES} learned merges and return the top
    {BPE_TOPK_TOKENS} tokens by corpus frequency (freq DESC, token ASC
    — a total order, so the top-k set is deterministic).

    The merge table is model-sized (k rows) and collected once — the
    kmeans-centroid precedent — then applied as literal replace
    chains; tokenization of the full corpus costs one scan + the
    vocab-sized merge passes, and the final top-k is
    TakeOrderedAndProject (no global sort).  Train-time and
    apply-time merge rules are the same code path, which is the
    property a production tokenizer must keep."""
    merges = (
        bpe_merge_table(spark, sf_dir).orderBy("rank").collect()
    )
    cur = _vocab(spark, sf_dir)
    for m in merges:
        esc = f"{m.lhs} {m.rhs}".replace("'", "\\'")
        esc_m = (m.lhs + m.rhs).replace("'", "\\'")
        apply_once = (
            f"replace(concat(' ', sw, ' '), ' {esc} ', ' {esc_m} ')"
        )
        cur = cur.select(
            F.expr(
                f"trim(replace({apply_once}, ' {esc} ', ' {esc_m} '))"
            ).alias("sw"),
            "n",
        )
    tokens = cur.select(F.explode(F.split("sw", " ")).alias("tok"), "n")
    return (
        tokens.groupBy("tok")
        .agg(F.sum("n").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(BPE_TOPK_TOKENS)
    )


BPE_ENCODE_STATS_SQL = (
    BPE_MERGE_TABLE_SQL[: BPE_MERGE_TABLE_SQL.index("\nSELECT rank")]
    + f"""
SELECT tok, CAST(sum(n) AS BIGINT) AS freq
FROM (SELECT unnest(string_split(sw, ' ')) AS tok, n FROM w{BPE_MERGES})
GROUP BY tok
ORDER BY freq DESC, tok ASC
LIMIT {BPE_TOPK_TOKENS}
"""
)
