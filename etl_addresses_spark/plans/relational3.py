"""Third batch: MERGE/SCD2 emulation, window frame variants, and a
string-similarity (edit-distance) join.  Same determinism rules as
plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_addresses_spark.functions.hashing import KNUTH, knuth_order_col, knuth_order_sql
from etl_addresses_spark.sources.tables import load_table


def _change_batch(c: DataFrame) -> DataFrame:
    """Deterministic CDC batch derived from customer: every key % 7 == 0
    gets an updated balance; keys shifted by +1000000 are inserts."""
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.col("c_name"),
        F.col("c_nationkey"),
        (F.col("c_acctbal") + F.lit(500.0)).alias("c_acctbal"),
        F.col("c_mktsegment"),
    )
    inserts = c.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        F.col("c_nationkey"),
        F.col("c_acctbal"),
        F.col("c_mktsegment"),
    )
    return updates.unionByName(inserts)


_CHANGES_SQL = """
changes AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 500.0e0 AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, 'NEW ' || c_name AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 11 = 0
)
"""


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation without a table format: snapshot rows not
    touched by the batch (anti-join) + the batch itself (updates win).
    This is the upsert shape used before Delta/Iceberg are available;
    with them it becomes a single MERGE on the same keys."""
    c = load_table(spark, sf_dir, "customer")
    changes = _change_batch(c)
    untouched = c.join(changes, "c_custkey", "left_anti")
    return untouched.unionByName(changes).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


MERGE_UPSERT_SQL = (
    "WITH " + _CHANGES_SQL.strip() + """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM changes WHERE changes.c_custkey = customer.c_custkey)
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM changes
"""
)


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2: applying the change batch produces history rows —
    updated keys keep their old version with is_current=false and gain
    a new current version; inserts and untouched rows are current."""
    c = load_table(spark, sf_dir, "customer")
    changes = _change_batch(c)
    updated_keys = changes.join(c, "c_custkey", "left_semi")
    old_versions = c.join(updated_keys, "c_custkey", "left_semi").select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(False).alias("is_current"),
    )
    new_versions = changes.join(
        c.select("c_custkey"), "c_custkey", "left_semi"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    untouched = c.join(changes, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    inserts = changes.join(c, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return old_versions.unionByName(new_versions).unionByName(
        untouched
    ).unionByName(inserts)


SCD2_HISTORY_SQL = (
    "WITH " + _CHANGES_SQL.strip() + """
SELECT c_custkey, c_acctbal, 1 AS version, false AS is_current FROM customer
WHERE EXISTS (SELECT 1 FROM changes WHERE changes.c_custkey = customer.c_custkey)
UNION ALL
SELECT ch.c_custkey, ch.c_acctbal, 2 AS version, true AS is_current FROM changes ch
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = ch.c_custkey)
UNION ALL
SELECT c_custkey, c_acctbal, 1 AS version, true AS is_current FROM customer
WHERE NOT EXISTS (SELECT 1 FROM changes WHERE changes.c_custkey = customer.c_custkey)
UNION ALL
SELECT ch.c_custkey, ch.c_acctbal, 1 AS version, true AS is_current FROM changes ch
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = ch.c_custkey)
"""
)


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame + ranking variants: dense_rank, ntile, first/last
    value over explicit row frames, and a centered moving average."""
    o = load_table(spark, sf_dir, "orders")
    order_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = order_w.rowsBetween(-1, 1)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(order_w).cast("long").alias("drank"),
        F.ntile(4).over(order_w).cast("long").alias("quartile"),
        F.first("o_orderkey").over(order_w).alias("first_order"),
        (
            F.sum(price_dec).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("moving_avg3"),
    )


WINDOW_FRAMES_SQL = """
SELECT o_custkey, o_orderkey,
  dense_rank() OVER w AS drank,
  ntile(4) OVER w AS quartile,
  first_value(o_orderkey) OVER w AS first_order,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER frame AS DOUBLE)
    / count(*) OVER frame AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  frame AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""


# Absolute caps for the all-pairs VALIDATION baseline below (r8
# verdict item 2): a baseline need not be full-cartesian at the full
# fixture to prove equivalence, and an uncapped cross product grows
# quadratically with sf — 46.5 s at sf0.1 and unrunnable beyond.  A
# deterministic hash-ORDERED top-k (Knuth multiplicative hash, key
# tie-break) bounds the pair count at 200 x 2000 = 400k levenshtein
# cells REGARDLESS of sf, while at sf0.01 (the driver's oracle scale,
# 100 suppliers x 1500 customers) both caps exceed the table sizes, so
# the checked result is byte-identical to the historical uncapped row.
FUZZY_ALLPAIRS_S_CAP = 200
FUZZY_ALLPAIRS_C_CAP = 2000


def _hash_sample(df: DataFrame, key: str, k: int) -> DataFrame:
    """Deterministic pseudo-random top-k: order by a multiplicative
    hash of the key (tie-broken by the key itself — total order) and
    take k.  Plans as TakeOrderedAndProject (per-partition top-k +
    single merge), never a full sort; the SAME integer arithmetic is
    expressible in DuckDB SQL, so oracle rows sample identically."""
    h = knuth_order_col(key)  # shared definition: functions/hashing.py
    return df.orderBy(h.asc(), F.col(key).asc()).limit(k)


def fuzzy_match_allpairs_for(
    suppliers: DataFrame, customers: DataFrame
) -> DataFrame:
    """The DEFINITIONAL all-pairs argmin over supplied frames (columns
    s_suppkey/s_name and c_custkey/c_name): every pair scored, window
    argmin with deterministic tie-break.  Deliberately quadratic —
    this is the equivalence oracle the tiered dispatcher is tested
    against, never a product path; callers bound its inputs."""
    pairs = suppliers.crossJoin(customers).select(
        "s_suppkey",
        "s_name",
        "c_custkey",
        "c_name",
        F.levenshtein("s_name", "c_name").cast("long").alias("dist"),
    )
    w = W.partitionBy("s_suppkey").orderBy(F.asc("dist"), F.asc("c_custkey"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_suppkey", "s_name", "c_custkey", "c_name", "dist")
    )


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity join, all-pairs VALIDATION baseline:
    each sampled supplier matched to its lexically closest sampled
    customer name (levenshtein argmin, deterministic tie-break).  Runs
    on the `_hash_sample` capped subset so the cross product stays
    O(1) in sf; the scale path is the tiered dispatcher
    (`fuzzy_name_match_blocked`), equivalence-tested against this
    baseline on the same sampled frames in tests/test_relational3.py."""
    s = _hash_sample(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
        "s_suppkey",
        FUZZY_ALLPAIRS_S_CAP,
    )
    c = _hash_sample(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        "c_custkey",
        FUZZY_ALLPAIRS_C_CAP,
    )
    return fuzzy_match_allpairs_for(s, c)


FUZZY_NAME_MATCH_SQL = f"""
WITH s AS (SELECT s_suppkey, s_name FROM supplier
           ORDER BY {knuth_order_sql('s_suppkey')}, s_suppkey
           LIMIT {FUZZY_ALLPAIRS_S_CAP}),
     c AS (SELECT c_custkey, c_name FROM customer
           ORDER BY {knuth_order_sql('c_custkey')}, c_custkey
           LIMIT {FUZZY_ALLPAIRS_C_CAP})
SELECT s_suppkey, s_name, c_custkey, c_name, dist FROM (
  SELECT s_suppkey, s_name, c_custkey, c_name,
    levenshtein(s_name, c_name) AS dist,
    row_number() OVER (PARTITION BY s_suppkey
                       ORDER BY levenshtein(s_name, c_name) ASC, c_custkey ASC) AS rn
  FROM s CROSS JOIN c)
WHERE rn = 1
"""


# Threshold for the blocked tier: the fixture's per-supplier minimum
# distance is exactly 5 (Supplier#/Customer# prefix edit), so 6 keeps
# every supplier matched while exercising the threshold semantics.
FUZZY_MAX_DIST = 6


def fuzzy_name_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE tier of the fuzzy name match: argmin restricted to
    pairs within levenshtein distance <= {FUZZY_MAX_DIST}.  Since
    round 7 this entry IS the tiered dispatcher (`fuzzy_match_auto_for`)
    — the r6 10x scale harness showed the fixed length-band tier going
    quadratic (58x wall at 10x) whenever the data's length spread is
    zero, i.e. the blocking key's selectivity silently decided between
    linear and quadratic.  The dispatcher measures that selectivity
    up front (two length-histogram jobs, model-sized collects) and
    picks per the tier rule (SCALE.md): PassJoin when segments are
    long enough to prune by content, the length band when the length
    spread prunes, and otherwise the dense-regime broadcast argmin
    with the charset-mask prefilter — the best exact plan when NO
    lossless blocker has selectivity.  All tiers are answer-identical;
    the oracle below doesn't care which one answered.

    Original length-band notes (now the `band` tier,
    `fuzzy_match_blocked_for`):

    Blocking is the bin-explode shape (same pattern as
    interval_overlap_bucketed): each supplier row explodes into the
    2D+1 candidate lengths len(s_name)-D .. len(s_name)+D and
    equi-joins customers on length(c_name).  Losslessness is the
    levenshtein triangle-inequality length bound — ed(a, b) >=
    |len(a) - len(b)| — so no pair within the threshold can be
    pruned; the exact levenshtein verify after the join restores
    exactness, which is why the oracle is the naive
    cross-join-with-threshold expression of the SAME semantics.

    NOTE the verdict's sketch added first-char equality blocking; on
    this data that is not lossless (every supplier name starts with
    'S', every customer with 'C', distance-5 pairs differ in char 1),
    so it is deliberately NOT part of the key.  On the uniform 18-char
    fixture names the length band keeps all pairs — pruning power is
    data-dependent — but the PLAN is cartesian-free: a shuffle hash
    join on the exploded length key whose worst case is the per-band
    cross product (~1/L^2 of all-pairs for real name-length
    distributions), and the argmin is the map-side-combinable
    min(struct) aggregation rather than a window sort.

    Two measured bench fixes (45.2 s -> see SCALE.md at sf0.1):
    (1) the probe side is round-robin repartitioned to the session
    parallelism first — a dimension-sized parquet is ONE input split,
    so without it a single task evaluates the whole candidate set
    (broadcast joins parallelize by probe partitions, and a 1-MB file
    gives exactly one); (2) levenshtein runs with the THRESHOLD
    argument, switching Spark to the banded O(len*k) early-abandon
    algorithm (-1 means beyond-threshold, filtered as dist >= 0 —
    same candidate set, cheaper per pair).
    """
    return fuzzy_match_auto_for(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
    )


def fuzzy_match_blocked_for(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Core of `fuzzy_name_match_blocked` over supplied frames
    (columns s_suppkey/s_name and c_custkey/c_name) — the seam the
    hypothesis losslessness property drives with heterogeneous-length
    names, where the length band actually prunes."""
    spark = suppliers.sparkSession
    s = suppliers.select(
        "s_suppkey",
        "s_name",
        F.explode(
            F.sequence(
                F.length("s_name") - F.lit(d), F.length("s_name") + F.lit(d)
            )
        ).alias("blen"),
    )
    c = (
        customers
        .select("c_custkey", "c_name", F.length("c_name").alias("blen"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    best = (
        s.join(c, "blen")
        .select(
            "s_suppkey",
            "s_name",
            F.levenshtein("s_name", "c_name", d).cast("long").alias("dist"),
            "c_custkey",
            "c_name",
        )
        .filter(F.col("dist") >= 0)
        .groupBy("s_suppkey", "s_name")
        .agg(F.min(F.struct("dist", "c_custkey", "c_name")).alias("m"))
    )
    return best.select(
        "s_suppkey",
        "s_name",
        F.col("m.c_custkey").alias("c_custkey"),
        F.col("m.c_name").alias("c_name"),
        F.col("m.dist").alias("dist"),
    )


def _charset_mask_exprs(col: str):
    """Two 64-bit character-presence masks (lo: codepoints 0-63, hi:
    64-127; >=128 folds into hi — folding merges char classes, which
    only WEAKENS the bound below, never breaks it).  Linear per row;
    the split array is bound once per row inside aggregate(), so the
    lambda-CSE hazard (SCALE.md) doesn't apply."""
    chars = f"transform(filter(split({col}, ''), ch -> ch != ''), ch -> ascii(ch) % 128)"
    lo = F.expr(
        f"aggregate({chars}, 0L, (a, b) -> if(b < 64, a | shiftleft(1L, b), a))"
    )
    hi = F.expr(
        f"aggregate({chars}, 0L, (a, b) -> if(b >= 64, a | shiftleft(1L, b - 64), a))"
    )
    return lo, hi


def _segments_expr(col: str, d: int):
    """The d+1 PassJoin segments of `col` as array<struct<i,lc,seg>>.
    Layout for a string of length L: the first L mod (d+1) segments
    have length L div (d+1) + 1, the rest L div (d+1).  Shared by the
    candidate generator and the dispatcher's collision estimator so
    the estimate measures EXACTLY the join key the tier would use."""
    return F.expr(
        f"""
        transform(sequence(0, {d}), i -> named_struct(
          'i', i,
          'lc', length({col}),
          'seg', substring({col},
                   i * (length({col}) div {d + 1})
                     + least(i, length({col}) % {d + 1}) + 1,
                   (length({col}) div {d + 1})
                     + if(i < length({col}) % {d + 1}, 1, 0))))
        """
    )


# Dense-tier packing: (dist, c_custkey) folded into one BIGINT so the
# per-element argmin is allocation-free.  dist <= 7 occupies bits
# 40-42 (banded levenshtein returns -1 past the threshold; -1 & 7 = 7
# sorts above every valid distance for free), the key the low 40 bits
# — ~1.1e12 ids; keys outside [0, 2^40) fall back to the band tier.
# The 3-bit dist field is only sound for d <= DENSE_MAX_DIST = 6: at
# d = 7 the -1 sentinel (&7 = 7) would alias a VALID distance and
# survive the post-fold threshold filter, and for d > 7 true distances
# truncate mod 8 — so the public entry points guard d and fall back to
# the band tier (always correct, just not the minimal-constant plan).
DENSE_BUCKET_ROWS = 2048
DENSE_MAX_DIST = 6
_PACK_BITS = 40
_PACK_SENTINEL = 1 << 62


def fuzzy_match_dense_for(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """DENSE-REGIME tier of the fuzzy match: when neither lossless
    blocker has any selectivity (zero length spread kills the band;
    constant/low-entropy segments kill PassJoin — exactly the uniform
    fixture-name distribution the r6 10x harness measured at 58x),
    the exact pair set is intrinsically all-pairs — the data's cheap
    signatures (length, charset, segments, pivot distances) all have
    spread < 2d, so every lossless filter's relaxed ball covers
    ~everything (measured in tools/evidence/r7_fuzzy_tiers.md).  The
    remaining lever is the CONSTANT per pair, so this tier evaluates
    the product with the cheapest machinery available to a JVM plan:

    - customers are packed into ~{DENSE_BUCKET_ROWS}-row array buckets
      (one dimension shuffle) and broadcast; suppliers fan out to the
      session parallelism and cross-join B bucket ROWS, not |C| rows —
      the per-JOIN-ROW machinery that made a row-level
      BroadcastNestedLoopJoin 2.3x slower (145.9 s vs 64 s at 10x,
      measured) is paid |S| x B times instead of |S| x |C| times;
    - per element, an `aggregate` fold keeps a running argmin packed
      into ONE BIGINT (dist in high bits, key in low bits), so the
      inner loop allocates nothing: a lossless charset-mask prefilter
      (a unit edit changes character PRESENCE by <= 2, so ed <= d =>
      popcount(mask_s XOR mask_c) <= 2d) gates the banded levenshtein;
    - the only shuffles are |C| rows (packing) and |S| partial-min
      rows; c_name is recovered by a broadcast equi-join on the
      winning key, with a min() re-group so duplicate-key dimensions
      keep the (dist, key, name) tie-break of the other tiers.

    At 100 TB the broadcast side caps at executor memory (~60 B/name
    => ~10^7 names per GB); past that the same kernel runs as a
    block-partitioned theta join (tile both sides, same fold).
    """
    if not (0 <= d <= DENSE_MAX_DIST):
        # the 3-bit packed dist field cannot represent d > 6 (the -1
        # beyond-threshold sentinel would alias dist 7) — band tier
        return fuzzy_match_blocked_for(suppliers, customers, d)
    spark = suppliers.sparkSession
    stats = customers.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("lo"),
        F.max("c_custkey").alias("hi"),
    ).first()
    n_c = stats["n"]
    if n_c and (stats["lo"] < 0 or stats["hi"] >= (1 << _PACK_BITS)):
        # keys outside the packing range: the band tier is always
        # correct, just slower in this regime
        return fuzzy_match_blocked_for(suppliers, customers, d)
    n_buckets = max(1, -(-(n_c or 1) // DENSE_BUCKET_ROWS))
    clo, chi = _charset_mask_exprs("c_name")
    slo, shi = _charset_mask_exprs("s_name")
    packed = (
        customers.select(
            "c_custkey", "c_name", clo.alias("lo"), chi.alias("hi")
        )
        .groupBy((F.col("c_custkey") % n_buckets).alias("b"))
        .agg(
            F.collect_list(
                F.struct("c_custkey", "c_name", "lo", "hi")
            ).alias("arr")
        )
    )
    s = suppliers.select(
        "s_suppkey", "s_name", slo.alias("slo"), shi.alias("shi")
    ).repartition(spark.sparkContext.defaultParallelism)
    fold = F.expr(
        f"""
        aggregate(arr, {_PACK_SENTINEL}L, (acc, x) ->
          if(bit_count(slo ^ x.lo) + bit_count(shi ^ x.hi) > {2 * d}, acc,
             least(acc,
                   shiftleft(cast(levenshtein(s_name, x.c_name, {d})
                                  as bigint) & 7L, {_PACK_BITS})
                   + x.c_custkey)))
        """
    )
    best = (
        s.crossJoin(F.broadcast(packed))
        .select("s_suppkey", "s_name", fold.alias("p"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.min("p").alias("p"))
        .filter(F.shiftright(F.col("p"), _PACK_BITS) <= d)
        .select(
            "s_suppkey",
            "s_name",
            F.shiftright("p", _PACK_BITS).alias("dist"),
            (
                F.col("p")
                - F.shiftleft(F.shiftright("p", _PACK_BITS), _PACK_BITS)
            ).alias("c_custkey"),
        )
    )
    # name recovery: with DUPLICATE c_custkey values the equi-join can
    # attach a row whose distance differs from the fold's reported
    # dist, so verify dist on the recovered pair before the min(c_name)
    # tie-break — this keeps the (dist, key, name) answer identity with
    # the band tier for any input, not just unique-key dimensions.
    return (
        best.join(F.broadcast(customers), "c_custkey")
        .filter(
            F.expr(f"levenshtein(s_name, c_name, {d})").cast("long")
            == F.col("dist")
        )
        .groupBy("s_suppkey", "s_name", "dist", "c_custkey")
        .agg(F.min("c_name").alias("c_name"))
        .select("s_suppkey", "s_name", "c_custkey", "c_name", "dist")
    )


# Tier rule constants (measured crossovers, SCALE.md + r7 evidence):
# PassJoin needs segments >= 3 chars AND segment entropy (constant
# segments collide universally — the salted fixture names pass the
# length gate at exactly 21/(6+1) = 3.0 but their segments are ~90%
# constant, which is why the gate alone is NOT sufficient); the length
# band is worth its explode+shuffle only if it discards >= 2/3 of the
# product.
PASSJOIN_MIN_SEG = 3
PASSJOIN_COLLISION_MAX = 0.05
BAND_KEEP_MAX = 1.0 / 3.0


def _length_histogram(df: DataFrame, col: str) -> dict[int, int]:
    """String-length histogram as a driver dict — model-sized (one row
    per DISTINCT LENGTH, bounded by the max string length, not the
    table)."""
    rows = (
        df.groupBy(F.length(col).alias("l"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["l"]: r["n"] for r in rows if r["l"] is not None}


def _median_length(hist: dict[int, int]) -> int:
    target = (sum(hist.values()) + 1) // 2
    acc = 0
    for length in sorted(hist):
        acc += hist[length]
        if acc >= target:
            return length
    return 0


def segment_collision_estimate(df: DataFrame, col: str, d: int) -> float:
    """Upper-bound estimate of the PassJoin candidate fraction: the
    probability that two random indexed rows share a segment key
    (i, len, seg), summed over segment indexes (union bound) —
    sum over keys of n_k^2 / N^2.  Exactly the key
    `passjoin_candidates` joins on, so a near-1 estimate means the
    equi-join degenerates to the cross product (the zero-padded /
    constant-prefix failure mode).  One aggregation over (d+1)
    short-key rows per input row; only runs when the median-length
    gate already passed."""
    seg = df.select(F.explode(_segments_expr(col, d)).alias("k"))
    row = (
        seg.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.col("n") * F.col("n")).alias("sq"),
            F.sum("n").alias("tot"),
        )
        .first()
    )
    if not row["tot"]:
        return 0.0
    n_rows = row["tot"] / (d + 1)
    return float(row["sq"]) / (n_rows * n_rows)


def choose_fuzzy_tier(
    s_hist: dict[int, int],
    c_hist: dict[int, int],
    d: int = FUZZY_MAX_DIST,
    seg_collision: float | None = None,
) -> str:
    """Pick the fuzzy-join tier from measured data statistics — the
    SCALE.md tier rule made executable, with the r7 amendment that
    selectivity is MEASURED, never assumed (the r6 58x-at-10x defect
    was exactly an assumed-selective blocking key):

    1. 'passjoin' when median_len/(d+1) >= {PASSJOIN_MIN_SEG} AND the
       segment-collision estimate (see `segment_collision_estimate`;
       None means the caller skipped the job because the length gate
       failed) is <= {PASSJOIN_COLLISION_MAX}: segments are long
       enough AND carry enough entropy that exact-substring candidacy
       prunes (566x candidate cut measured in regime);
    2. else 'band' when the EXPECTED band-kept fraction, computed
       exactly from the two length histograms
       (sum over |ls-lc|<=d of f_s(ls)*f_c(lc) / (|S|*|C|)),
       is <= {BAND_KEEP_MAX};
    3. else 'dense': no lossless blocker prunes; run the
       minimal-constant packed-fold broadcast argmin.
    """
    total_s = sum(s_hist.values())
    total_c = sum(c_hist.values())
    if not total_s or not total_c:
        return "band"
    med = min(_median_length(s_hist), _median_length(c_hist))
    if (
        med / (d + 1) >= PASSJOIN_MIN_SEG
        and seg_collision is not None
        and seg_collision <= PASSJOIN_COLLISION_MAX
    ):
        return "passjoin"
    kept = sum(
        ns * nc
        for ls, ns in s_hist.items()
        for lc, nc in c_hist.items()
        if abs(ls - lc) <= d
    )
    if kept <= BAND_KEEP_MAX * total_s * total_c:
        return "band"
    return "dense"


def _fuzzy_gate_stats(
    suppliers: DataFrame, customers: DataFrame, d: int
) -> tuple[dict[int, int], dict[int, int], float | None]:
    """The dispatcher's estimator preamble, shared by every dispatch
    point (r8 advice: two verbatim copies could drift): the two
    model-sized length-histogram jobs, plus the segment-collision
    aggregation ONLY when the median-length gate passes (None
    otherwise — `choose_fuzzy_tier` reads None as 'job skipped,
    passjoin ineligible')."""
    s_hist = _length_histogram(suppliers, "s_name")
    c_hist = _length_histogram(customers, "c_name")
    seg_collision = None
    if s_hist and c_hist:
        med = min(_median_length(s_hist), _median_length(c_hist))
        if med / (d + 1) >= PASSJOIN_MIN_SEG:
            seg_collision = segment_collision_estimate(customers, "c_name", d)
    return s_hist, c_hist, seg_collision


def fuzzy_match_auto_for(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Tier-dispatching fuzzy match (r6 verdict fix): two tiny
    length-histogram jobs up front (plus the segment-collision job
    only when the length gate passes), then the tier whose pruning
    signal the data actually has.  All tiers return identical
    answers; the dispatch only decides the PLAN."""
    s_hist, c_hist, seg_collision = _fuzzy_gate_stats(suppliers, customers, d)
    tier = choose_fuzzy_tier(s_hist, c_hist, d, seg_collision)
    if tier == "passjoin":
        return fuzzy_match_passjoin_for(suppliers, customers, d)
    if tier == "band":
        return fuzzy_match_blocked_for(suppliers, customers, d)
    return fuzzy_match_dense_for(suppliers, customers, d)



def fuzzy_name_match_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONTENT-blocked tier of the fuzzy name match: PassJoin-style
    segment pigeonhole (Li/Deng/Feng, VLDB'11 — public algorithm,
    reimplemented on DataFrame HOFs) instead of the length band.

    Pigeonhole: ed(s, c) <= d means at most d edit operations, so of
    any d+1 contiguous segments of c at least one is UNTOUCHED and
    appears in s as an exact substring, shifted by delta positions
    where |delta| + |(len(s)-len(c)) - delta| <= d (edits before the
    segment account for |delta|, edits after for the rest).  Candidate
    generation is therefore an EQUI-join on (segment-index, len(c),
    segment-string): the indexed side emits its d+1 segments, the
    probe side emits every admissible (length, index, shift) substring
    window — O(d^2) short keys per row, generated JVM-side with
    nested transform/filter HOFs, zero UDFs.  The exact banded
    levenshtein verify restores exactness, and the argmin
    `min(struct)` absorbs duplicate candidates (a pair surviving via
    several segments needs no pre-distinct — min over a multiset),
    saving the dedup shuffle.

    vs the length-band tier: banding prunes at best (2d+1)/spread
    (~5x, measured in SCALE.md round 5); segment matching prunes by
    CONTENT — candidates require an exact substring hit, orders of
    magnitude rarer (measured with tools/stress_fuzzy.py --passjoin).
    Same oracle as the other two tiers: three algorithms, one
    hash-checked answer.

    GATED since round 8 (r7 verdict item 2): the salted fixture names
    pass PassJoin's length gate (21/(6+1) = 3.0) but their segments
    are ~90% constant, so the segment equi-join degenerates PAST the
    cross product (segment_collision_estimate = 4.17 measured in
    r7_fuzzy_signature_bounds.json — 185 s at sf0.1).  The standalone
    row now applies the SAME measured-selectivity rule the dispatcher
    uses: PassJoin runs only when the segment keys actually prune,
    else the dense packed-fold tier answers (identically — the gate
    picks the plan, never the result).  `fuzzy_title_match_passjoin`
    (relational7.py) stays the in-regime demonstration where the
    segment join is the winning plan.

    DOWN-FIXTURED since round 10 (the fuzzy_name_match precedent,
    r10_scale_sf1_batch8a.json: 31.6x wall at 10x): this is a
    validation-tier row whose out-of-regime branch is the dense
    all-pairs fold, so its cost was quadratic in sf.  The same
    `_hash_sample` caps bound it at {FUZZY_ALLPAIRS_S_CAP} x
    {FUZZY_ALLPAIRS_C_CAP} pairs, O(1) in sf; at sf0.01 both caps
    exceed the table sizes, so the checked result is byte-identical to
    the historical row, and the oracle becomes FUZZY_NAME_MATCH_SQL
    (all three tiers share one argmin answer on the same frames)."""
    s = _hash_sample(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
        "s_suppkey",
        FUZZY_ALLPAIRS_S_CAP,
    )
    c = _hash_sample(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        "c_custkey",
        FUZZY_ALLPAIRS_C_CAP,
    )
    return fuzzy_match_passjoin_guarded_for(s, c)


def fuzzy_match_passjoin_guarded_for(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """PassJoin with the dispatcher's own FULL passjoin gate — both
    conditions of `choose_fuzzy_tier` rule 1: median length must give
    segments >= {PASSJOIN_MIN_SEG} chars (short segments carry no
    content even when technically distinct), AND the measured
    `segment_collision_estimate` must show the segment equi-join
    prunes (<= {PASSJOIN_COLLISION_MAX}); otherwise the join would
    degenerate toward (or past) the cross product, so fall back to
    the dense packed-fold tier.  Model-sized estimator jobs (two
    length histograms + at most one collision aggregation, via the
    shared `_fuzzy_gate_stats` preamble); both branches are
    answer-identical."""
    s_hist, c_hist, seg_collision = _fuzzy_gate_stats(suppliers, customers, d)
    # the dispatcher's rule is the single source of truth; this row's
    # contract is just narrower (passjoin when rule 1 fires, else the
    # dense tier — never band, so the demonstration stays two-branch)
    if choose_fuzzy_tier(s_hist, c_hist, d, seg_collision) == "passjoin":
        return fuzzy_match_passjoin_for(suppliers, customers, d)
    return fuzzy_match_dense_for(suppliers, customers, d)


def passjoin_candidates(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Candidate-pair generation of the PassJoin tier (pre-verify) —
    exposed separately so tools/stress_fuzzy.py can measure candidate
    volume directly.

    Segment layout for a string of length L with d+1 segments: the
    first L mod (d+1) segments have length L div (d+1) + 1, the rest
    L div (d+1) (possibly 0 for very short strings — empty segments
    keep the pigeonhole argument intact and degrade to (index, L)
    blocking).  All positions are computed from (L, i) identically on
    both sides, so the equi-key lines up by construction."""
    spark = suppliers.sparkSession
    D = d
    # indexed side: the d+1 segments of each customer name.
    seg_c = _segments_expr("c_name", d)
    c = (
        customers.select("c_custkey", "c_name", F.explode(seg_c).alias("k"))
        .select("c_custkey", "c_name", "k.i", "k.lc", "k.seg")
        .repartition(spark.sparkContext.defaultParallelism, "i", "lc", "seg")
    )
    # probe side: every admissible (candidate-length, segment, shift)
    # window of each supplier name.  delta = shift of the segment's
    # start; dl = len(s) - len(c).  Validity: the pigeonhole edit
    # budget |delta| + |dl - delta| <= d, and the window must lie
    # inside s (start >= 1, start + len - 1 <= len(s); start may be
    # len(s)+1 only for an empty segment at the very end).
    win_s = F.expr(
        f"""
        filter(
          flatten(flatten(
            transform(sequence(-{D}, {D}), dl ->
              transform(sequence(0, {D}), i ->
                transform(sequence(-{D}, {D}), delta ->
                  if(length(s_name) - dl >= 1
                     and abs(delta) + abs(dl - delta) <= {D}
                     and i * ((length(s_name) - dl) div {D + 1})
                         + least(i, (length(s_name) - dl) % {D + 1})
                         + 1 + delta >= 1
                     and i * ((length(s_name) - dl) div {D + 1})
                         + least(i, (length(s_name) - dl) % {D + 1})
                         + delta
                         + ((length(s_name) - dl) div {D + 1})
                         + if(i < (length(s_name) - dl) % {D + 1}, 1, 0)
                         <= length(s_name),
                     named_struct(
                       'i', i,
                       'lc', length(s_name) - dl,
                       'seg', substring(s_name,
                                i * ((length(s_name) - dl) div {D + 1})
                                  + least(i, (length(s_name) - dl) % {D + 1})
                                  + 1 + delta,
                                ((length(s_name) - dl) div {D + 1})
                                  + if(i < (length(s_name) - dl) % {D + 1}, 1, 0))),
                     null)))))),
          x -> x is not null)
        """
    )
    s = suppliers.select(
        "s_suppkey", "s_name", F.explode(win_s).alias("k")
    ).select("s_suppkey", "s_name", "k.i", "k.lc", "k.seg")
    return s.join(c, ["i", "lc", "seg"])


def fuzzy_match_passjoin_for(
    suppliers: DataFrame, customers: DataFrame, d: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Core of `fuzzy_name_match_passjoin`: candidates via the segment
    pigeonhole, exact banded-levenshtein verify, map-side-combinable
    argmin (duplicate candidates are absorbed by min(struct), so no
    pre-distinct shuffle)."""
    best = (
        passjoin_candidates(suppliers, customers, d)
        .select(
            "s_suppkey",
            "s_name",
            F.levenshtein("s_name", "c_name", d).cast("long").alias("dist"),
            "c_custkey",
            "c_name",
        )
        .filter(F.col("dist") >= 0)
        .groupBy("s_suppkey", "s_name")
        .agg(F.min(F.struct("dist", "c_custkey", "c_name")).alias("m"))
    )
    return best.select(
        "s_suppkey",
        "s_name",
        F.col("m.c_custkey").alias("c_custkey"),
        F.col("m.c_name").alias("c_name"),
        F.col("m.dist").alias("dist"),
    )


FUZZY_NAME_MATCH_BLOCKED_SQL = f"""
SELECT s_suppkey, s_name, c_custkey, c_name, dist FROM (
  SELECT s_suppkey, s_name, c_custkey, c_name,
    levenshtein(s_name, c_name) AS dist,
    row_number() OVER (PARTITION BY s_suppkey
                       ORDER BY levenshtein(s_name, c_name) ASC, c_custkey ASC) AS rn
  FROM supplier CROSS JOIN customer
  WHERE levenshtein(s_name, c_name) <= {FUZZY_MAX_DIST})
WHERE rn = 1
"""


QUERIES3 = {
    "merge_upsert": (merge_upsert, MERGE_UPSERT_SQL),
    "scd2_history": (scd2_history, SCD2_HISTORY_SQL),
    "window_frames": (window_frames, WINDOW_FRAMES_SQL),
    "fuzzy_name_match": (fuzzy_name_match, FUZZY_NAME_MATCH_SQL),
    "fuzzy_name_match_blocked": (
        fuzzy_name_match_blocked,
        FUZZY_NAME_MATCH_BLOCKED_SQL,
    ),
    # round 5: third tier, same argmin answer — content blocking via
    # segment pigeonhole (see fuzzy_name_match_passjoin docstring).
    # Since round 10 the row runs on the same hash-sampled frames as
    # fuzzy_name_match, so it shares THAT capped oracle (identical at
    # sf0.01 where the caps exceed the table sizes).
    "fuzzy_name_match_passjoin": (
        fuzzy_name_match_passjoin,
        FUZZY_NAME_MATCH_SQL,
    ),
}
