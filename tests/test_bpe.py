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


def test_kn_surprisal_probabilities_sum_to_one(spark):
    """The d=1/2 KN rational device: over the training vocabulary the
    conditional distribution p(.|w1) must sum to EXACTLY 1 for every w1 —
    verified symbolically on the integer num/den pairs."""
    from fractions import Fraction

    from pyspark.sql import Row

    from flink_example_spark.operators.text import kn_surprisal  # noqa: F401

    docs = [
        Row(doc_id=1, text="the cat sat on the mat"),
        Row(doc_id=2, text="the dog sat on the rug"),
        Row(doc_id=3, text="a cat and a dog"),
    ]
    df = spark.createDataFrame(docs)
    # rebuild the model relations exactly as the operator does
    from flink_example_spark.operators.text import normalized, tokens
    from pyspark.sql import functions as F, Window

    toks = df.select(
        "doc_id", F.posexplode(tokens(normalized(F.col("text")))).alias("p", "t")
    ).filter(F.col("t") != "")
    w = Window.partitionBy("doc_id").orderBy("p")
    pr = toks.select(
        F.col("t").alias("w1"), F.lead("t").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull())
    c2 = {(r["w1"], r["w2"]): r["c"] for r in pr.groupBy("w1", "w2").count().withColumnRenamed("count", "c").collect()}
    vocab_w2 = sorted({b for _, b in c2})
    n1fwd = {}
    c1 = {}
    n1back = {}
    for (a, b), c in c2.items():
        n1fwd[a] = n1fwd.get(a, 0) + 1
        c1[a] = c1.get(a, 0) + c
        n1back[b] = n1back.get(b, 0) + 1
    T = len(c2)
    for w1 in c1:
        total = Fraction(0)
        for w2 in vocab_w2:
            num = max(2 * c2.get((w1, w2), 0) - 1, 0) * T + n1fwd[w1] * n1back[w2]
            den = 2 * c1[w1] * T
            total += Fraction(num, den)
        # KN normalizes exactly when Σ_w2 n1back(w2) == T (true by def)
        assert total == 1, (w1, total)
