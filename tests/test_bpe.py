"""Distributed BPE trainer: known-merge corpus, greedy-apply semantics,
tokenize consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_example_spark.operators.bpe import bpe_tokenize, bpe_train, _merge_expr


def test_bpe_learns_expected_merges(spark):
    """'banana' x3 + 'bandana': (a,n) dominates (count 3*2+2=8), then the
    learned symbol chains."""
    docs = spark.createDataFrame(
        [(0, "banana banana banana bandana")], "doc_id bigint, text string"
    )
    out = bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    assert (out[0]["lhs"], out[0]["rhs"]) == ("a", "n")
    assert out[0]["pair_count"] == 8
    # after merging 'an': banana -> b an an a ; bandana -> b an d an a
    # pair counts: (b,an)=4, (an,an)=3, (an,a)=4, (an,d)=1, (d,an)=1
    # tie between (an,a) and (b,an) at 4 -> lexicographic: 'an' < 'b'
    assert (out[1]["lhs"], out[1]["rhs"]) == ("an", "a")
    assert out[1]["pair_count"] == 4


def test_bpe_greedy_overlap_semantics(spark):
    """Greedy left-to-right: 'aaaa' under merge (a,a) -> 'aa aa',
    'aaa' -> 'aa a' (no re-merge of the merged symbol)."""
    df = spark.createDataFrame([("a a a a",), ("a a a",)], "s string")
    out = [r["m"] for r in df.select(_merge_expr("a", "a").alias("m")).collect()]
    assert out == ["aa aa", "aa a"]


def test_bpe_tokenize_counts_shrink(spark):
    """Applying learned merges strictly reduces the symbol count, and with
    zero merges equals the character count."""
    docs = spark.createDataFrame(
        [(0, "banana banana"), (1, "bandana")], "doc_id bigint, text string"
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    base = {r["doc_id"]: r["n_bpe_symbols"] for r in bpe_tokenize(docs, []).collect()}
    merged = {
        r["doc_id"]: r["n_bpe_symbols"] for r in bpe_tokenize(docs, merges).collect()
    }
    assert base[0] == 12 and base[1] == 7
    assert merged[0] < base[0] and merged[1] < base[1]
