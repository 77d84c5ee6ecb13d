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
