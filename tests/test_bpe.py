"""BPE merge-table training vs a plain-Python reference implementing
the same documented merge rule (anchored replace, applied twice per
round) on the same fixture vocabulary."""

from __future__ import annotations

from collections import Counter

from conftest import SF_ORACLE

from etl_addresses_spark.operators.bpe import BPE_MERGES, bpe_merge_table
from etl_addresses_spark.sources.tables import load_table


def _py_reference(word_counts: dict[str, int], k: int):
    vocab = {" ".join(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for sw, n in vocab.items():
            syms = sw.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # freq DESC, pair ASC — the dispatcher's total order
        (lhs, rhs), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        new_vocab: dict[str, int] = {}
        for sw, n in vocab.items():
            s = f" {sw} ".replace(pat, rep).replace(pat, rep).strip()
            new_vocab[s] = new_vocab.get(s, 0) + n
        vocab = new_vocab
        merges.append((rank, lhs, rhs, freq))
    return merges


def test_bpe_tie_stability_property(spark):
    """Hypothesis tie-stability at higher k (r7 verdict item 6): tiny
    alphabets make pair-frequency ties the COMMON case, so agreement
    with the python reference over many random corpora proves the
    (freq DESC, pair ASC) total order is what the Spark argmin
    implements — not an artifact of the fixture's tie-free counts.
    The alphabet includes quote/backslash/regex metacharacters, which
    regression-tests the Column-API literal merge apply (interpolated
    SQL literals corrupted on these)."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.sampled_from(list("ab'\\$."))
    word = st.text(alphabet=alphabet, min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=24)

    @settings(max_examples=8, deadline=None)
    @given(corpus=corpus)
    def run(corpus):
        counts: Counter = Counter(corpus)
        expected = _py_reference(counts, 8)
        docs = spark.createDataFrame(
            [(" ".join(corpus),)], "text string"
        )
        from etl_addresses_spark.operators.bpe import bpe_train_for

        assert bpe_train_for(docs, 8) == expected

    run()


def test_bpe_oracle_survives_pair_exhaustion(spark):
    """Degenerate-corpus parity (r8 self-review finding): when the
    corpus exhausts mergeable pairs before BPE_MERGES rounds, the
    Spark side stops applying merges — and the DuckDB oracle must
    keep w{r} = w{r-1} instead of NULL-propagating the empty round's
    scalar subquery through replace(), which used to empty the
    encode-stats result entirely."""
    import duckdb

    from etl_addresses_spark.operators.bpe import (
        BPE_ENCODE_STATS_SQL,
        BPE_MERGE_TABLE_SQL,
        bpe_train_for,
        _apply_merge,
        _vocab_for,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([("ab ab ab",)], "text string")
    # pairs exhaust after ONE merge ('a b' -> 'ab'); rounds 2..k empty
    merges = bpe_train_for(docs, 8)
    assert merges == [(1, "a", "b", 3)], merges
    cur = _vocab_for(docs)
    for _, lhs, rhs, _f in merges:
        cur = _apply_merge(cur, lhs, rhs)
    spark_tokens = {
        (r.tok, r.n)
        for r in cur.select(
            F.explode(F.split("sw", " ")).alias("tok"), "n"
        ).collect()
    }
    assert spark_tokens == {("ab", 3)}

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 'ab ab ab' AS text")
    merge_rows = con.execute(BPE_MERGE_TABLE_SQL).fetchall()
    assert merge_rows == [(1, "a", "b", 3)], merge_rows
    enc = con.execute(BPE_ENCODE_STATS_SQL).fetchall()
    assert enc == [("ab", 3)], enc


def test_bpe_apply_batch_invariance(spark):
    """The batched scale-tier apply (`bpe_apply_for`, r8 verdict item
    3) must produce exactly the single-folded-chain result for ANY
    batch size: segmentation changes plan depth and checkpoint
    placement, never the merge order or the per-row replace rule.
    Random corpora over a tie-heavy alphabet, batch sizes that force
    0, 1, and many interior checkpoints for the same merge list."""
    from hypothesis import given, settings, strategies as st

    from etl_addresses_spark.operators.bpe import (
        _vocab_for,
        bpe_apply_for,
        bpe_train_for,
    )

    alphabet = st.sampled_from(list("ab'\\$."))
    word = st.text(alphabet=alphabet, min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=24)

    @settings(max_examples=4, deadline=None)
    @given(corpus=corpus)
    def run(corpus):
        docs = spark.createDataFrame([(" ".join(corpus),)], "text string")
        merges = bpe_train_for(docs, 8)
        results = []
        for batch in (1, 3, 10**9):
            vocab = _vocab_for(docs)
            enc = bpe_apply_for(vocab, merges, batch=batch)
            results.append(sorted((r.sw, r.n) for r in enc.collect()))
        assert results[0] == results[1] == results[2], results

    run()


def test_bpe_apply_segments_truncate_lineage(spark):
    """The scale property of `bpe_apply_for` is PLAN SHAPE, not just
    answers: past BPE_APPLY_BATCH merges the chain must be broken by a
    localCheckpoint (analyzed plan scans a LogicalRDD instead of
    carrying every earlier merge projection), while at k <= batch the
    plan must stay one unbroken projection chain over the source —
    zero checkpoints, the historical folded plan."""
    from etl_addresses_spark.operators.bpe import _vocab_for, bpe_apply_for

    # parquet-backed source: a createDataFrame seed is ITSELF a
    # LogicalRDD scan, which would make the folded-case assertion
    # vacuous
    docs = load_table(spark, SF_ORACLE, "documents").limit(4)
    merges = [(i + 1, "a", "b", 0) for i in range(3)]

    def analyzed(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    folded = bpe_apply_for(_vocab_for(docs), merges, batch=10)
    assert "LogicalRDD" not in analyzed(folded)

    segmented = bpe_apply_for(_vocab_for(docs), merges, batch=2)
    plan = analyzed(segmented)
    assert "LogicalRDD" in plan
    # ...and the final segment rides lazily ON the checkpoint: only
    # the last (3 - 2) = 1 merge's replace survives in the plan text.
    # Count bare `replace(` only — `regexp_replace(` also contains the
    # substring (r9 advice: the raw count held only because the vocab's
    # regexp_replace is checkpointed out of the segmented plan, so any
    # benign plan-text drift would skew it confusingly).
    n_replace = plan.count("replace(") - plan.count("regexp_replace(")
    assert n_replace == 2, n_replace  # one merge = two replaces


def test_bpe_merge_table_matches_python_reference(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    counts: Counter = Counter()
    for row in docs.select("text").collect():
        for w in row.text.lower().split(" "):
            if w:
                counts[w] += 1
    expected = _py_reference(counts, BPE_MERGES)
    got = [
        (r.rank, r.lhs, r.rhs, r.freq)
        for r in bpe_merge_table(spark, SF_ORACLE).orderBy("rank").collect()
    ]
    assert got == expected, (got, expected)
