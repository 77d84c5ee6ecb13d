"""Model-fitting operators (operators/ml.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_example_spark.operators.ml import linear_fit, zscore_outliers


def test_linear_fit_exact_line(spark):
    # y = 2x + 3 exactly -> slope 2.0, intercept 3.0, r2 1.0 (all exact)
    rows = [("g", x, 2 * x + 3) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = linear_fit(df, "grp", "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["slope"], r["intercept"], r["r2"]) == (2.0, 3.0, 1.0)
    assert r["n"] == 7


def test_linear_fit_degenerate_groups(spark):
    rows = (
        # constant x: den_x == 0 -> dropped
        [("cx", 5, v) for v in (1, 2, 3)]
        # constant y: fit exists, r2 NULL, slope 0
        + [("cy", x, 7) for x in (1, 2, 3)]
        # singleton: dropped
        + [("one", 1, 1)]
    )
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r["grp"]: r for r in linear_fit(df, "grp", "x", "y").collect()}
    assert set(out) == {"cy"}
    assert out["cy"]["slope"] == 0.0
    assert out["cy"]["intercept"] == 7.0
    assert out["cy"]["r2"] is None


def test_linear_fit_matches_closed_form(spark):
    xs = [3, 7, 11, 20, 24, 31]
    ys = [10, 25, 31, 70, 75, 99]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x long, y long"
    )
    r = linear_fit(df, "grp", "x", "y").collect()[0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    num, den_x, den_y = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert r["slope"] == num / den_x
    assert r["intercept"] == (sy - (num / den_x) * sx) / n
    assert r["r2"] == (float(num) * float(num)) / (float(den_x) * float(den_y))


def test_zscore_outliers_known_values(spark):
    # group g: nine 10s and one 100 -> the 100 is the outlier
    rows = [("g", i, 10) for i in range(9)] + [("g", 9, 100)]
    # constant group: std == 0 -> never emits
    rows += [("c", i, 42) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, id long, x long")
    out = zscore_outliers(df, "grp", "x", "id", z=2.5).collect()
    assert [(r["grp"], r["id"], r["x"]) for r in out] == [("g", 9, 100)]
    xs = [10] * 9 + [100]
    mean = sum(xs) / 10
    std = math.sqrt((10 * sum(x * x for x in xs) - sum(xs) ** 2) / (10 * 9))
    assert out[0]["zscore"] == (100 - mean) / std


def test_zscore_threshold_is_strict(spark):
    # symmetric pair: each sits at |z| = 0.707..sample -> below any z>=1
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 10)], "grp string, id long, x long"
    )
    assert zscore_outliers(df, "grp", "x", "id", z=1.0).count() == 0


def test_streaming_fit_converges_to_batch(spark):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.text import normalized, tokens
    from flink_example_spark.streaming.ml_stream import run_streaming_linear_fit
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents").select(
        "lang",
        "n_chars",
        F.size(F.array_remove(tokens(normalized(F.col("text"))), "")).alias("n_tok"),
    )
    want = sorted(map(tuple, linear_fit(d, "lang", "n_tok", "n_chars").collect()))
    for chunks in (1, 3):
        got = sorted(map(tuple, run_streaming_linear_fit(spark, sf, chunks).collect()))
        assert got == want, f"chunks={chunks} diverged"


def test_mad_outliers_robust_where_zscore_breaks(spark):
    """A 20% junk cluster inflates mean/std enough that the z-gate misses
    every junk row; the median/MAD gate flags exactly the junk."""
    from flink_example_spark.operators.ml import mad_outliers, zscore_outliers

    rows = [("g", i, 10 if i % 2 else 11) for i in range(20)]
    rows += [("g", 100 + i, 1000) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, rid long, x long")
    z = zscore_outliers(df, "grp", "x", "rid", z=2.5)
    assert z.count() == 0
    m = mad_outliers(df, "grp", "x", "rid", c=3.0)
    assert {r["id"] for r in m.collect()} == {100 + i for i in range(5)}


def test_mad_outliers_zero_mad_guard(spark):
    """All-identical group: MAD = 0 must gate to empty, not flag everything."""
    from flink_example_spark.operators.ml import mad_outliers

    df = spark.createDataFrame(
        [("g", i, 7) for i in range(10)], "grp string, rid long, x long"
    )
    assert mad_outliers(df, "grp", "x", "rid").count() == 0


def test_user_knn_blocked_subset_of_exact(spark):
    """The LSH-blocked kNN only ever returns true >= threshold neighbors,
    and its top-1 can never beat the exact top-1 (blocking prunes, the
    verify is exact)."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import user_knn, user_knn_blocked
    from flink_example_spark.plans.events_demo import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    blocked = user_knn_blocked(ev, k=3, threshold=0.9).localCheckpoint()
    assert blocked.filter(F.col("cos") < 0.9).count() == 0
    exact_top1 = {
        r["user_a"]: r["cos"]
        for r in user_knn(ev, k=1).withColumnRenamed("dot", "d").collect()
    }
    for r in blocked.filter(F.col("rank") == 1).collect():
        assert r["cos"] <= exact_top1[r["user_a"]] + 1e-12


def test_feature_corr_perfect_and_anti(spark):
    """Hand-built units: types 'a' and 'b' move together (corr 1), 'a' and
    'c' move oppositely (corr -1)."""
    from datetime import datetime

    from flink_example_spark.operators.ml import feature_corr

    rows = []
    # unit (u, day1): a=1, b=1, c=2 ; unit (u, day2): a=2, b=2, c=1
    for day, (na, nb, nc) in ((1, (1, 1, 2)), (2, (2, 2, 1))):
        for t, cnt in (("a", na), ("b", nb), ("c", nc)):
            for i in range(cnt):
                rows.append(("u", datetime(2024, 5, day, i), t))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    out = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in feature_corr(df, dims=("a", "b", "c")).collect()
    }
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_ab_proportion_test_arithmetic(spark):
    """Known conversion split: group A (even ids) 2/3 convert, group B 1/3."""
    import math

    from datetime import datetime

    from flink_example_spark.operators.ml import ab_proportion_test

    rows = []
    # 6 users: evens 0,2,4 (A) — 0 and 2 purchase; odds 1,3,5 (B) — only 1
    for u in range(6):
        rows.append((u, datetime(2024, 6, 1), "view"))
        if u in (0, 2, 1):
            rows.append((u, datetime(2024, 6, 1, 1), "purchase"))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_proportion_test(df).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (3, 2, 3, 1)
    p = 0.5
    se = math.sqrt(p * (1 - p) * (1 / 3 + 1 / 3))
    assert abs(r["z"] - (2 / 3 - 1 / 3) / se) < 1e-12


def test_ab_cuped_shrinks_variance(spark):
    """Outcome = covariate + group effect: CUPED strips the covariate
    variance, so the adjusted z detects the effect far more sharply than
    the raw difference-in-means."""
    from datetime import datetime

    from flink_example_spark.operators.ml import ab_cuped_test

    rows = []
    for u in range(20):
        x = (u // 2) % 5 + 1          # covariate, balanced across parity groups
        noise = (u // 4) % 2          # balanced residual noise (keeps var > 0)
        y = x + noise + (1 if u % 2 == 0 else 0)  # +1 true effect for group A
        for i in range(x):
            rows.append((u, datetime(2024, 1, 10, i), "view"))
        for i in range(y):
            rows.append((u, datetime(2024, 1, 20, i), "purchase"))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_cuped_test(df, "2024-01-16 00:00:00").collect()[0]
    assert abs(r["theta"] - 1.0) < 0.2            # y tracks x ~one-for-one
    assert abs((r["mean_adj_a"] - r["mean_adj_b"]) - 1.0) < 0.05
    assert abs(r["z_adj"]) > 2 * abs(r["z_raw"])  # the variance reduction


def test_nb_language_classifier_learns_separable_classes(spark):
    from flink_example_spark.operators.ml import nb_language_classifier

    # ids 1..9 % 3 != 0 train, % 3 == 0 holdout; two trivially separable
    # vocabularies
    en = "the cat sat on the mat and the dog ran"
    de = "der hund lief und die katze sass auf der matte"
    rows = [(i, en if i % 2 == 0 else de, "en" if i % 2 == 0 else "de")
            for i in range(1, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in
           nb_language_classifier(df, holdout_mod=3).collect()}
    assert set(out) == {3, 6, 9, 12}
    for r in out.values():
        assert r["pred_label"] == r["true_label"]
        assert r["is_correct"] == 1
        assert r["pred_bits"] > 0


def test_nb_classifier_prior_only_doc_breaks_ties_to_min_class(spark):
    from flink_example_spark.operators.ml import nb_language_classifier

    # holdout doc 10 shares no vocabulary with training -> scored by prior
    # alone; balanced priors (2 docs each) -> equal bits -> min class wins
    rows = [
        (1, "aaa bbb", "en"), (2, "aaa bbb", "en"),
        (3, "ccc ddd", "de"), (4, "ccc ddd", "de"),
        (10, "zzz qqq", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_language_classifier(df, holdout_mod=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 10
    assert r["pred_label"] == "de"  # 'de' < 'en' lexicographically
    assert r["is_correct"] == 0


def test_regression_eval_perfect_fit_zero_error(spark):
    from flink_example_spark.operators.ml import regression_eval

    # y = 3x + 7 exactly on train AND holdout -> mae = rmse = 0
    rows = [(i, "g", i % 11 + 1, 3 * (i % 11 + 1) + 7) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id long, grp string, x long, y long")
    out = regression_eval(df, "id", "grp", "x", "y", holdout_mod=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_test"] == 6  # ids 5,10,15,20,25,30
    assert r["mae"] == 0.0 and r["rmse"] == 0.0


def test_regression_eval_known_residuals(spark):
    import math

    from flink_example_spark.operators.ml import regression_eval

    # train: exact line y = 2x; holdout: off by +3 and -1
    rows = [(1, "g", 1, 2), (2, "g", 2, 4), (3, "g", 3, 6), (4, "g", 4, 8),
            (5, "g", 10, 23), (10, "g", 20, 39)]
    df = spark.createDataFrame(rows, "id long, grp string, x long, y long")
    r = regression_eval(df, "id", "grp", "x", "y", holdout_mod=5).collect()[0]
    assert r["n_test"] == 2
    assert abs(r["mae"] - 2.0) < 1e-9          # (|3| + |-1|) / 2
    assert abs(r["rmse"] - math.sqrt(5.0)) < 1e-9  # sqrt((9 + 1) / 2)


def test_crossval_subtraction_equals_explicit_refit(spark):
    """The leave-fold-out-by-subtraction model must equal literally
    refitting on the complement: compare CV residual metrics against
    regression_eval run per fold with the roles made to match."""
    from flink_example_spark.operators.ml import crossval_eval, linear_fit
    import random

    rng = random.Random(7)
    rows = [
        (i, "g", x := rng.randint(1, 50), 3 * x + rng.randint(-4, 4))
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, x long, y long")
    cv = {(r["grp"], r["fold"]): r for r in
          crossval_eval(df, "id", "grp", "x", "y", k=3).collect()}
    assert len(cv) == 3
    from pyspark.sql import functions as F

    for fold in range(3):
        train = df.filter(F.col("id") % 3 != fold)
        fit = linear_fit(train, "grp", "x", "y").collect()[0]
        test = [r for r in rows if r[0] % 3 == fold]
        scale = 1000
        # recompute the quantization exactly as the operator does
        import math

        eqs = [
            math.floor((y - (fit["intercept"] + fit["slope"] * x)) * scale + 0.5)
            for _, _, x, y in test
        ]
        n = len(eqs)
        mae = (sum(abs(e) for e in eqs) / n) / scale
        rmse = math.sqrt(sum(e * e for e in eqs) / n) / scale
        r = cv[("g", fold)]
        assert r["n_test"] == n
        assert abs(r["mae"] - mae) < 1e-12
        assert abs(r["rmse"] - rmse) < 1e-12


def test_diff_in_diff_recovers_planted_effect(spark):
    import datetime

    from flink_example_spark.operators.ml import diff_in_diff

    pre = datetime.datetime(2024, 1, 10)
    post = datetime.datetime(2024, 1, 20)
    rows = []
    # control (even users): 10 pre and post; treated (odd): 10 pre, 17 post
    for u in (1, 2, 3, 4):
        for i in range(5):
            base_v = 10.0
            rows.append((u, pre, "x", base_v))
            lift = 7.0 if u % 2 == 1 else 0.0
            rows.append((u, post, "x", base_v + lift))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    out = diff_in_diff(df, "2024-01-16 00:00:00").collect()
    assert len(out) == 1
    r = out[0]
    assert r["did"] == 7.0
    assert r["m_c_post"] - r["m_c_pre"] == 0.0


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    from flink_example_spark.operators.ml import bootstrap_ci

    rows = [(i, "g", 50.0 + (i % 21) - 10) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = bootstrap_ci(df).collect()[0]
    assert r["n_rows"] == 400
    # CI must bracket the point estimate and be reasonably tight for n=400
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    width = r["ci_hi"] - r["ci_lo"]
    # sd ~ 6.06, se ~ 0.30 -> 95% CI width ~ 1.2; allow generous slack
    assert 0.3 < width < 3.0


def test_bootstrap_multiplicities_are_poisson_like(spark):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import _POISSON_THRESHOLDS
    from flink_example_spark.operators.sketch import portable_hash32

    # hash -> multiplicity distribution over many (id, b) draws should be
    # close to Poisson(1): mean ~ 1
    ids = spark.range(1, 3001).select(
        portable_hash32(F.concat_ws("|", F.col("id").cast("string"), F.lit(1))).alias("h")
    )
    mult = F.when(F.col("h") < _POISSON_THRESHOLDS[0], 0)
    for k, t in enumerate(_POISSON_THRESHOLDS[1:], start=1):
        mult = mult.when(F.col("h") < t, k)
    mult = mult.otherwise(len(_POISSON_THRESHOLDS))
    stats = ids.select(mult.alias("m")).agg(
        F.avg("m").alias("mean"), F.sum((F.col("m") == 0).cast("int")).alias("zeros")
    ).collect()[0]
    assert abs(stats["mean"] - 1.0) < 0.06
    assert abs(stats["zeros"] / 3000 - 0.3679) < 0.03


def test_linear_fit2_exact_plane(spark):
    from flink_example_spark.operators.ml import linear_fit2

    # y = 5 + 2*x1 + 3*x2 exactly, over a non-degenerate grid
    rows = [("g", x1, x2, 5 + 2 * x1 + 3 * x2)
            for x1 in range(1, 7) for x2 in range(1, 5)]
    df = spark.createDataFrame(rows, "grp string, x1 long, x2 long, y long")
    out = linear_fit2(df, "grp", "x1", "x2", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["b0"] - 5.0) < 1e-9
    assert abs(r["b1"] - 2.0) < 1e-9
    assert abs(r["b2"] - 3.0) < 1e-9


def test_linear_fit2_drops_collinear_groups(spark):
    from flink_example_spark.operators.ml import linear_fit2

    # x2 = 2*x1 exactly -> singular normal matrix -> dropped
    rows = [("c", x, 2 * x, x + 1) for x in range(1, 10)]
    df = spark.createDataFrame(rows, "grp string, x1 long, x2 long, y long")
    assert linear_fit2(df, "grp", "x1", "x2", "y").count() == 0


def test_quantile_normalize_matches_pool_and_preserves_order(spark):
    from flink_example_spark.operators.ml import quantile_normalize

    # group a: 1..5 ; group b: 101..105 — after normalization both map
    # onto the pooled 10-value distribution at the same rank positions
    rows = [("a", i, float(i)) for i in range(1, 6)] + [
        ("b", i + 10, float(100 + i)) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = {(r["grp"], r["id"]): r["value_norm"]
           for r in quantile_normalize(df, "grp", "id", "v").collect()}
    # identical within-group ranks -> identical normalized values
    for i in range(1, 6):
        assert out[("a", i)] == out[("b", i + 10)]
    # order preserved within each group
    a_vals = [out[("a", i)] for i in range(1, 6)]
    assert a_vals == sorted(a_vals)
    # extremes hit the pooled min/max
    assert a_vals[0] == 1.0 and a_vals[-1] == 105.0


def test_decision_stump_exact_split(spark):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import decision_stump

    # positives at x >= 3: the optimal cut is 2 (quantized 200), pure sides
    rows = [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")
    r = decision_stump(df, "x", F.col("y") == 1).first()
    assert r["cut_q"] == 200
    assert (r["n_l"], r["pos_l"], r["n_r"], r["pos_r"]) == (2, 0, 2, 2)
    assert r["gini_cost"] == 0.0


def test_tree_depth2_recovers_interval_class(spark):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import tree_depth2

    # positives in the middle band (3..4): root splits one boundary, the
    # child on the impure side splits the other -> all leaves pure
    rows = [(float(x), 1 if 3 <= x <= 4 else 0) for x in range(1, 7)]
    df = spark.createDataFrame(rows, "x double, y int")
    nodes = {r["node"]: r for r in tree_depth2(df, "x", F.col("y") == 1).collect()}
    assert nodes["root"]["cut_q"] in (200, 400)
    impure = "R" if nodes["root"]["cut_q"] == 200 else "L"
    assert nodes[impure]["gini_cost"] == 0.0


def test_conformal_quantile_rank_and_coverage(spark):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import conformal_eval

    # y = 2x exactly except a few calibration outliers: qhat is the
    # rank-picked calibration residual, coverage counts test hits
    rows = []
    for i in range(60):
        x = float(i % 10 + 1)
        y = 2.0 * x
        if i % 3 == 1 and i % 9 == 1:  # a few calibration outliers
            y += 5.0
        rows.append((i, "g", x, y))
    df = spark.createDataFrame(rows, "id long, grp string, x double, y double")
    r = conformal_eval(df, "id", "grp", "x", "y").first()
    assert r["n_calib"] == 20 and r["n_test"] == 20
    # alpha=0.1 -> k = ceil(21*0.9) = 19; with <=3 outliers qhat is tiny
    # or an outlier depending on rank — either way coverage >= 0.9
    assert r["n_covered"] >= 18


def test_perceptron_converges_on_separable_data(spark):
    """Planted linearly-separable corpus (en docs are long, others short):
    the batch perceptron must reach zero training misses (the perceptron
    convergence theorem) and a diagonal holdout confusion."""
    from flink_example_spark.operators.ml import (
        perceptron_confusion,
        perceptron_train,
    )

    rows = []
    for i in range(40):
        en = i % 2 == 0
        text = ("spark query engine data table " * (8 if en else 1)).strip()
        rows.append((i, text, "en" if en else "de", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    w = {r["j"]: (r["weight"], r["n_miss"]) for r in perceptron_train(df, n_rounds=8).collect()}
    assert all(m == 0 for (_, m) in w.values())
    conf = {(r["pred"], r["truth"]): r["n"] for r in perceptron_confusion(df, n_rounds=8).collect()}
    assert conf.get((1, -1), 0) == 0 and conf.get((-1, 1), 0) == 0
    assert conf[(1, 1)] > 0 and conf[(-1, -1)] > 0


def test_isotonic_matches_pava_reference(spark):
    """The min-max closed form equals classic pool-adjacent-violators on
    a hand series, is monotone, and preserves the mean."""
    from datetime import datetime, timezone

    from flink_example_spark.operators.ml import isotonic_fit

    ys = [1.0, 3.0, 2.0, 2.0, 5.0, 4.0]

    def pava(y):
        # classic PAVA reference implementation
        blocks = [[v, 1] for v in y]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        out = []
        for s, n in blocks:
            out.extend([s / n] * n)
        return out

    rows = [
        ("k", datetime(2024, 1, 1 + d, tzinfo=timezone.utc), v)
        for d, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = [r["fit"] for r in isotonic_fit(df).orderBy("day").collect()]
    assert got == pava(ys)
    assert all(a <= b for a, b in zip(got, got[1:]))
    assert abs(sum(got) - sum(ys)) < 1e-9


def test_stump_bagging_separable_signal(spark):
    """A cleanly separable feature -> the bagged vote recovers the label on
    the holdout almost perfectly (every bootstrap stump finds the cut)."""
    from pyspark.sql import Row

    from flink_example_spark.operators.ml import stump_bagging

    rows = [
        Row(
            event_id=i,
            event_type="error" if i % 2 == 0 else "view",
            value=float(80 + (i % 7)) if i % 2 == 0 else float(10 + (i % 7)),
        )
        for i in range(400)
    ]
    out = {
        (r["predicted_pos"], r["actual_pos"]): r["n"]
        for r in stump_bagging(spark.createDataFrame(rows)).collect()
    }
    # holdout = ids % 5 == 0: 40 even (error, high value), 40 odd (view, low)
    assert out.get((1, 1), 0) == 40
    assert out.get((0, 0), 0) == 40
    assert out.get((1, 0), 0) == 0 and out.get((0, 1), 0) == 0


def test_ridge_path_shrinks_toward_zero(spark):
    from pyspark.sql import Row

    from flink_example_spark.operators.ml import linear_fit, ridge_path

    rows = [Row(g="a", x=i, y=3 * i + 7 + (i % 3)) for i in range(50)]
    df = spark.createDataFrame(rows)
    path = {r["lam"]: r for r in ridge_path(df, "g", "x", "y").collect()}
    ols = linear_fit(df, "g", "x", "y").first()
    assert path[0]["slope"] == ols["slope"]  # lam=0 bit-identical to OLS
    slopes = [path[l]["slope"] for l in sorted(path)]
    assert all(a > b for a, b in zip(slopes, slopes[1:]))  # monotone shrink
    assert slopes[-1] > 0


def test_gbm_stumps_matches_python_reference(spark):
    # two features; y is a noisy step in f1 -- the reference below replays
    # the exact integer algorithm (trunc-div leaves, per-side double SSE)
    import itertools

    rows = []
    vals = [3, 7, 11, 19, 23, 31, 41, 53]
    for i, (a, b) in enumerate(itertools.product(range(8), range(4))):
        y = 100 + 40 * (a >= 4) + vals[(i * 5) % 8]
        rows.append((float(a), float(b), float(y)))
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    from flink_example_spark.operators.ml import gbm_stumps

    out = {
        r["boost_round"]: r
        for r in gbm_stumps(
            df, "y", [("f1", "f1", 1), ("f2", "f2", 1)], rounds=3
        ).collect()
    }

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    data = [(int(a), int(b), int(y)) for a, b, y in rows]
    f0 = tdiv(sum(y for *_, y in data), len(data))
    resid = [(a, b, y - f0) for a, b, y in data]
    for m in range(1, 4):
        best = None
        for fi, fname in ((0, "f1"), (1, "f2")):
            xs = sorted({r[fi] for r in resid})
            for cut in xs[:-1]:
                left = [r[2] for r in resid if r[fi] <= cut]
                right = [r[2] for r in resid if r[fi] > cut]
                cost = (
                    (len(left) * sum(v * v for v in left) - sum(left) ** 2)
                    / len(left)
                    + (len(right) * sum(v * v for v in right) - sum(right) ** 2)
                    / len(right)
                )
                key = (cost, fname, cut)
                if best is None or key < best[0]:
                    best = (
                        key,
                        fi,
                        cut,
                        tdiv(sum(left), 2 * len(left)),
                        tdiv(sum(right), 2 * len(right)),
                        len(left),
                        len(right),
                    )
        (cost, fname, cut), fi, cut_q, ll, lr, nl, nr = best
        resid = [
            (a, b, r - (ll if (a, b)[fi] <= cut_q else lr))
            for a, b, r in resid
        ]
        sse = sum(r * r for *_, r in resid)
        got = out[m]
        assert (
            got["feat"],
            got["cut_q"],
            got["n_l"],
            got["n_r"],
            got["leaf_l"],
            got["leaf_r"],
            got["sse_after"],
        ) == (fname, cut_q, nl, nr, ll, lr, sse), f"round {m}"


def test_sprt_first_crossing_decides_and_sticks(spark):
    from datetime import datetime, timezone

    from flink_example_spark.operators.ml import _sprt_weights, sprt

    w1, w0, upper, lower = _sprt_weights(0.18, 0.22, 0.05, 0.2)

    def ts(i):
        return datetime.fromtimestamp(1000 + i, tz=timezone.utc)

    # arm "hi": all successes -> LLR climbs by w1 each obs, crosses upper
    # at n = ceil(upper / w1); later failures cannot un-decide
    import math

    n_hit = math.ceil(upper / w1)
    rows = [("hi", ts(i), i, 1) for i in range(n_hit)] + [
        ("hi", ts(100 + i), 100 + i, 0) for i in range(50)
    ]
    # arm "lo": all failures -> crosses lower at ceil(lower / w0)
    n_lo = math.ceil(lower / w0)
    rows += [("lo", ts(i), i, 0) for i in range(n_lo + 3)]
    df = spark.createDataFrame(
        rows, "variant string, ts timestamp, event_id long, y long"
    )
    out = {
        r["variant"]: r
        for r in sprt(df, "variant", "ts", "event_id", F.col("y") == 1).collect()
    }
    assert out["hi"]["decision"] == "accept_h1"
    assert out["hi"]["decision_n"] == n_hit
    assert out["lo"]["decision"] == "accept_h0"
    assert out["lo"]["decision_n"] == n_lo
    assert out["hi"]["n_total"] == n_hit + 50


def test_sprt_indifferent_arm_continues(spark):
    from datetime import datetime, timezone

    from flink_example_spark.operators.ml import sprt

    def ts(i):
        return datetime.fromtimestamp(1000 + i, tz=timezone.utc)

    # one success, one failure -> tiny LLR, no boundary
    df = spark.createDataFrame(
        [("m", ts(0), 0, 1), ("m", ts(1), 1, 0)],
        "variant string, ts timestamp, event_id long, y long",
    )
    r = sprt(df, "variant", "ts", "event_id", F.col("y") == 1).collect()[0]
    assert r["decision"] == "continue" and r["decision_n"] is None


def test_att_strata_known_effect_and_trimming(spark):
    from flink_example_spark.operators.ml import att_strata

    rows = (
        # stratum 0: treated mean 3, control mean 1 -> diff 2
        [(0, 1, 3), (0, 1, 3), (0, 0, 1), (0, 0, 1)]
        # stratum 1: treated mean 5, control mean 4 -> diff 1
        + [(1, 1, 5), (1, 0, 4)]
        # stratum 2: treated only -> off common support, trimmed from ATT
        + [(2, 1, 100)]
    )
    df = spark.createDataFrame(rows, "stratum long, treated long, outcome long")
    out = {r["stratum"]: r for r in att_strata(df, "stratum", "treated", "outcome").collect()}
    assert out[0]["diff_micro"] == 2_000_000
    assert out[1]["diff_micro"] == 1_000_000
    assert out[2]["diff_micro"] is None and out[2]["n_c"] == 0
    # ATT = (2e6 * 2 + 1e6 * 1) / 3 treated-on-support; the combined row
    # carries stratum NULL (an integer sentinel would collide with a
    # caller-provided stratum value)
    assert out[None]["diff_micro"] == (2_000_000 * 2 + 1_000_000) // 3
    assert out[None]["n_t"] == 3


def test_calibration_bins_quantile_bands_and_mono(spark):
    from flink_example_spark.operators.ml import calibration_bins

    # 8 rows, margins 1..8; positives exactly the top half -> with 4 bins
    # of 2: rates 0, 0, 1e6, 1e6 and no monotonicity break
    rows = [(i, 1 if i > 4 else -1, i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id long, y long, m long")
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=4).collect()}
    assert [out[b]["n"] for b in range(4)] == [2, 2, 2, 2]
    assert [out[b]["pos_rate_micro"] for b in range(4)] == [0, 0, 1_000_000, 1_000_000]
    assert all(out[b]["mono_break"] == 0 for b in range(4))
    assert out[0]["lo_m"] == 1 and out[3]["hi_m"] == 8
    # flip one: a positive in the bottom band and a negative at the top
    rows2 = [(i, 1 if (i > 4) != (i in (1, 8)) else -1, i) for i in range(1, 9)]
    df2 = spark.createDataFrame(rows2, "id long, y long, m long")
    out2 = {r["bin"]: r for r in calibration_bins(df2, n_bins=4).collect()}
    assert sum(r["mono_break"] for r in out2.values()) >= 1


def test_shap_linear_attributes_to_the_real_feature(spark):
    from flink_example_spark.operators.ml import shap_linear

    # y = 3*a exactly; b is a shuffled copy of a's values (same marginal,
    # no relation to y given a... actually correlated; use b = const+noise
    # pattern independent of y): a in 1..40, b cycles 0..3
    rows = [(i, i % 4, 3 * i) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "a long, b long, y long")
    r = shap_linear(df, "a", "b", "y").collect()[0]
    # full model explains ~everything; a gets ~all credit
    assert r["r2_full_ppm"] > 990_000
    assert r["shap_a_x2ppm"] > 1_900_000  # ~2 * 1e6
    assert abs(r["shap_b_x2ppm"]) < 100_000
    # completeness: shap_a + shap_b == 2 * r2_full (exact identity)
    assert r["shap_a_x2ppm"] + r["shap_b_x2ppm"] == 2 * r["r2_full_ppm"]


def test_pr_curve_known_confusions(spark):
    from flink_example_spark.operators.ml import pr_curve

    # margins: positives at 10, 8; negatives at 9, 1
    rows = [(1, 1, 10), (2, -1, 9), (3, 1, 8), (4, -1, 1)]
    df = spark.createDataFrame(rows, "id long, y long, m long")
    out = {r["thresh_m"]: r for r in pr_curve(df).collect()}
    # thresh 10: tp=1 fp=0 fn=1 -> P=1e6, R=5e5, F1=2/3
    assert (out[10]["tp"], out[10]["fp"], out[10]["fn"]) == (1, 0, 1)
    assert out[10]["precision_ppm"] == 1_000_000
    assert out[10]["recall_ppm"] == 500_000
    assert out[10]["f1_ppm"] == 666_666
    # thresh 8: tp=2 fp=1 fn=0 -> P=2/3, R=1, F1=4/5
    assert (out[8]["tp"], out[8]["fp"], out[8]["fn"]) == (2, 1, 0)
    assert out[8]["f1_ppm"] == 800_000
    # best row first = thresh 8
    first = pr_curve(df).collect()[0]
    assert first["thresh_m"] == 8


def test_anova_matches_closed_form(spark):
    import math

    from flink_example_spark.operators.ml import anova_oneway

    groups = {"a": [10, 12, 14], "b": [20, 22, 24], "c": [10, 20, 30]}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    vals = [v for vs in groups.values() for v in vs]
    n, k = len(vals), len(groups)
    gm = sum(vals) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k"] == k and r["n"] == n
    assert math.isclose(r["ssb_milli"] / 1000, ssb, rel_tol=1e-6)
    assert math.isclose(r["ssw_milli"] / 1000, ssw, rel_tol=1e-6)
    assert math.isclose(r["f_stat"], f, rel_tol=1e-6)


def test_kappa_known_values(spark):
    from flink_example_spark.operators.ml import kappa_agreement

    # 10 units: raters agree on 8 (4 pos, 4 neg), disagree on 2
    rows_a = [(i, 1 if i < 5 else 0) for i in range(10)]
    rows_b = [(i, 1 if i < 4 or i == 5 else 0) for i in range(10)]
    a = spark.createDataFrame(rows_a, "id long, flag long")
    b = spark.createDataFrame(rows_b, "id long, flag long")
    r = kappa_agreement(a, b).collect()[0]
    n, agree = 10, 8
    r1, c1 = 5, 5
    pe_num = r1 * c1 + (n - r1) * (n - c1)  # 50
    expected = ((agree * n - pe_num) * 1_000_000) // (n * n - pe_num)
    assert r["n"] == n and r["n_agree"] == agree
    assert r["kappa_ppm"] == expected == 600_000


def test_kappa_perfect_and_chance(spark):
    from flink_example_spark.operators.ml import kappa_agreement

    a = spark.createDataFrame([(i, i % 2) for i in range(8)], "id long, flag long")
    assert kappa_agreement(a, a).collect()[0]["kappa_ppm"] == 1_000_000
    # rater b constant -> pe == max -> filtered (kappa undefined) when
    # rater a is also constant; with a varying, denominator > 0
    b = spark.createDataFrame([(i, 1) for i in range(8)], "id long, flag long")
    r = kappa_agreement(a, b).collect()[0]
    assert r["kappa_ppm"] == 0  # agreement no better than chance


def test_mcnemar_discordant_pairs(spark):
    from flink_example_spark.operators.ml import mcnemar_test

    # 12 units: both right on 5, both wrong on 1, A-only right on 4,
    # B-only right on 2 -> b=4, c=2, chi2 = 4/6, cc = 1/6
    ca = [1] * 5 + [0] + [1] * 4 + [0] * 2
    cb = [1] * 5 + [0] + [0] * 4 + [1] * 2
    a = spark.createDataFrame(list(enumerate(ca)), "id long, correct long")
    b = spark.createDataFrame(list(enumerate(cb)), "id long, correct long")
    r = mcnemar_test(a, b).collect()[0]
    assert (r["n"], r["n_b"], r["n_c"]) == (12, 4, 2)
    assert r["chi2_milli"] == (4 - 2) ** 2 * 1000 // 6 == 666
    assert r["chi2_cc_milli"] == (2 - 1) ** 2 * 1000 // 6 == 166


def test_permuted_column_is_a_permutation(spark):
    from flink_example_spark.operators.ml import permuted_column

    rows = [(i, i * 10, i * 100) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    p = permuted_column(df, "a", "id")
    out = p.collect()
    # multiset of the permuted column preserved; other columns untouched rows
    assert sorted(r["a"] for r in out) == sorted(r[1] for r in rows)
    assert {(r["id"], r["b"]) for r in out} == {(i, b) for i, _, b in rows}
    # deterministic: same result twice
    out2 = {(r["id"], r["a"]) for r in permuted_column(df, "a", "id").collect()}
    assert {(r["id"], r["a"]) for r in out} == out2
    # and it actually permutes (some value moved)
    assert any(r["a"] != r["id"] * 10 for r in out)


def test_perm_importance_kills_the_real_feature(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from flink_example_spark.operators.ml import permuted_column, shap_linear

    rows = [(i, i % 7, 3 * (i % 7) + 100, 5 + (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a long, y long, b long")
    full = shap_linear(df, "a", "b", "y").collect()[0]["r2_full_ppm"]
    pa = shap_linear(permuted_column(df, "a", "id"), "a", "b", "y").collect()[0][
        "r2_full_ppm"
    ]
    pb = shap_linear(permuted_column(df, "b", "id"), "a", "b", "y").collect()[0][
        "r2_full_ppm"
    ]
    assert full > 990_000
    assert full - pa > 500_000  # shuffling the real feature destroys the fit
    assert full - pb < 100_000  # shuffling the noise feature costs ~nothing


def test_spearman_monotone_nonlinear_is_one(spark):
    from flink_example_spark.operators.ml import spearman_corr

    rows = [(i, i, i * i * i) for i in range(1, 30)]  # cubic: monotone
    df = spark.createDataFrame(rows, "id long, a long, b long")
    r = spearman_corr(df, "a", "b", "id").collect()[0]
    assert abs(r["rho"] - 1.0) < 1e-12
    rows2 = [(i, i, -i) for i in range(1, 30)]
    r2 = spearman_corr(
        spark.createDataFrame(rows2, "id long, a long, b long"), "a", "b", "id"
    ).collect()[0]
    assert abs(r2["rho"] + 1.0) < 1e-12


def test_cramers_v_extremes(spark):
    import math

    from flink_example_spark.operators.ml import cramers_v

    # perfect association: b == a -> V = 1
    rows = [(f"x{i % 3}", f"x{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert math.isclose(r["v"], 1.0, rel_tol=1e-6)
    # exact independence on a balanced grid -> V = 0
    rows2 = [(f"a{i}", f"b{j}") for i in range(3) for j in range(4) for _ in range(5)]
    r2 = cramers_v(
        spark.createDataFrame(rows2, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r2["chi2_micro"] == 0 and r2["v"] == 0.0
    assert (r2["n_rows_cat"], r2["n_cols_cat"]) == (3, 4)


def test_logistic_fit_separates_and_is_deterministic(spark):
    """On a linearly separable set the fixed-round descent must reach
    100% training accuracy, and rerunning must reproduce identical
    weights (bit-determinism is the contract)."""
    from flink_example_spark.operators.ml import logistic_fit

    rows = [(1, 8), (1, 7), (1, 8), (0, 0), (0, 1), (0, 0)] * 20
    df = spark.createDataFrame(rows, "y long, x long")
    fit = lambda: {  # noqa: E731
        r["feature"]: r["w_micro"]
        for r in logistic_fit(df, "y", ["x"], n_steps=48).collect()
    }
    out1, out2 = fit(), fit()
    assert out1 == out2
    assert out1["__n"] == 120
    assert out1["__n_correct"] == 120  # separable -> perfect at z >= 0
    assert out1["x"] > 0  # positive class has the larger feature
    assert out1["intercept"] < 0  # all-zero features must predict 0


def test_quantile_fit_intercept_only_hits_p90(spark):
    """y = 0..9 each once, no features: the pinball subgradient walks the
    intercept to the 90th percentile neighborhood and the empirical
    coverage lands at tau*n; rerunning reproduces identical weights."""
    from flink_example_spark.operators.ml import quantile_fit

    df = spark.createDataFrame([(y,) for y in range(10)], "y long")
    fit = lambda: {  # noqa: E731
        r["feature"]: r["w_micro"]
        for r in quantile_fit(
            df, "y", [], tau_num=9, tau_den=10, n_steps=40, scale_den=1
        ).collect()
    }
    out1, out2 = fit(), fit()
    assert out1 == out2
    assert out1["__n"] == 10
    assert 8_000_000 <= out1["intercept"] <= 10_000_000
    assert out1["__n_below"] in (8, 9)


def test_huber_fit_resists_outliers(spark):
    """y = x trend plus 10% wild outliers: the clipped gradient keeps the
    slope near 1e6 micros where the outliers would drag an unclipped fit
    far upward; deterministic across reruns."""
    from flink_example_spark.operators.ml import huber_fit

    rows = [(x, x) for x in range(10)] * 9 + [(100, x) for x in range(10)]
    df = spark.createDataFrame(rows, "y long, x long")
    fit = lambda: {  # noqa: E731
        r["feature"]: r["w_micro"]
        for r in huber_fit(df, "y", ["x"], n_steps=30, scale_den=4).collect()
    }
    out1, out2 = fit(), fit()
    assert out1 == out2
    assert out1["__n"] == 100
    # the 10 wild rows stay clipped; the slope heads to the true 1.0 and
    # the intercept stays far below the +10 the contaminated mean would
    # drag an unclipped fit toward
    assert out1["__n_clipped"] >= 10
    assert 400_000 <= out1["x"] <= 1_600_000
    assert out1["intercept"] < 3_000_000


def test_poisson_fit_recovers_rate(spark):
    """Constant-rate counts y ~ 3: with an intercept only, the converged
    rate exp(w0) must sit in the table bucket containing ln(3) (~1.0986);
    deterministic across reruns."""
    from flink_example_spark.operators.ml import poisson_fit

    df = spark.createDataFrame([(3,)] * 60, "y long")
    fit = lambda: {  # noqa: E731
        r["feature"]: r["w_micro"]
        for r in poisson_fit(df, "y", [], n_steps=40, scale_den=16).collect()
    }
    out1, out2 = fit(), fit()
    assert out1 == out2
    assert out1["__n"] == 60 and out1["__sum_y"] == 180
    # ln(3) = 1.0986; the 0.125-bucket table makes the fixed point land
    # within one bucket of it
    assert 950_000 <= out1["intercept"] <= 1_250_000


def test_psi_drift_negative_values_match_oracle(spark):
    """Negative metric values must land in the SAME bucket in both engines:
    Spark `div` truncates toward zero, DuckDB `//` floors, so the bucket
    index uses the sign-and-magnitude form mirrored in the oracle (ADVICE
    r8). NULL slice predicates coalesce to the REFERENCE side."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import psi_drift, psi_drift_oracle

    rows = [(float(v), s) for v in range(-1300, 1300, 7) for s in (0, 1, None)]
    df = spark.createDataFrame(rows, "value double, cur int")
    key = lambda t: (t[0] is None, t[0] if t[0] is not None else 0)
    got = sorted(
        (
            (g["bucket"], g["n_ref"], g["n_cur"], g["psi_term"])
            for g in psi_drift(
                df, F.col("cur") == 1, "value", width=500
            ).collect()
        ),
        key=key,
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["value", "cur"]))
    ora = sorted(
        (
            (o[0], o[1], o[2], o[5])
            for o in con.execute(
                psi_drift_oracle("SELECT * FROM t", "cur = 1", "value", width=500)
            ).fetchall()
        ),
        key=key,
    )
    assert len(got) > 3 and got == ora
    # negative buckets genuinely present; summary is the NULL-bucket row
    assert any(b is not None and b < 0 for b, *_ in got)
    # the NULL-pred rows landed on the reference side (n_ref counts them)
    total = [g for g in got if g[0] is None][0]
    assert total[1] == 2 * total[2]


def test_fairness_audit_null_pred_and_label_match_oracle(spark):
    """NULL select-pred -> not selected; NULL label -> negative — coalesced
    identically in the Spark op and the DuckDB oracle (ADVICE r8)."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        fairness_audit,
        fairness_audit_oracle,
    )

    rows = [
        ("a", True, True), ("a", True, False), ("a", None, True),
        ("a", False, None), ("b", True, None), ("b", None, None),
        ("b", False, False), ("b", True, True),
    ]
    df = spark.createDataFrame(rows, "grp string, sel boolean, y boolean")
    got = {
        r["grp"]: r
        for r in fairness_audit(df, "grp", F.col("sel"), F.col("y")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "sel", "y"]))
    ora = con.execute(
        fairness_audit_oracle("SELECT * FROM t", "grp", "sel", "y")
    ).fetchall()
    assert len(ora) == 2
    for row in ora:
        g = got[row[0]]
        assert (g["n"], g["n_sel"], g["sel_rate_micro"], g["tpr_micro"],
                g["fpr_micro"]) == (row[1], row[2], row[3], row[4], row[5]), (
            g, row)


def test_ipw_ate_corrects_confounding(spark):
    """Planted design: treatment probability rises with covariate x, and
    the outcome baseline ALSO rises with x (classic confounding), with a
    constant additive treatment effect of 5. The naive treated-control
    difference is inflated by the confounder; the IPW estimate must land
    strictly closer to the truth."""
    from flink_example_spark.operators.ml import ipw_ate

    rows = []
    for x in range(6):
        n_t = 5 + 2 * x      # more treated units at high x
        n_c = 14 - 2 * x     # more control units at low x
        for i in range(n_t):
            rows.append((1, 10 * x + 5 + (i % 2), x))
        for i in range(n_c):
            rows.append((0, 10 * x + (i % 2), x))
    df = spark.createDataFrame(rows, "treated long, y long, x long")
    out = {r["feature"]: r["value"]
           for r in ipw_ate(
               df, "treated", "y", ["x"], n_steps=64, scale_den=2
           ).collect()}
    naive_t = sum(y for t, y, _ in rows if t) / sum(1 for t, _, _ in rows if t)
    naive_c = (sum(y for t, y, _ in rows if not t)
               / sum(1 for t, _, _ in rows if not t))
    naive_err = abs((naive_t - naive_c) - 5.0)
    ipw_err = abs(out["ate_micro"] / 1e6 - 5.0)
    assert naive_err > 10.0          # the confounding is real

    assert ipw_err < naive_err / 3   # and IPW strips most of it
    assert out["__n"] == len(rows)
    assert out["__n_treated"] == sum(1 for t, _, _ in rows if t)


def test_ipw_ate_matches_duckdb_oracle_hostile(spark):
    """Parity on a hostile mix: an empty control arm in one run (mean 0
    via the den guard) and saturated propensities (clip audit > 0) in
    another."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import ipw_ate, ipw_ate_oracle

    con = duckdb.connect()
    # saturated design: x separates treatment almost perfectly
    rows = [(1 if x > 2 else 0, x * 3 + (i % 4), x)
            for x in range(6) for i in range(12)]
    # flip a few so the fit does not diverge entirely
    rows += [(0, 9, 5), (1, 2, 0)]
    con.register("u", pd.DataFrame(rows, columns=["treated", "y", "x"]))
    df = spark.createDataFrame(rows, "treated long, y long, x long")
    got = sorted(tuple(r)
                 for r in ipw_ate(
                     df, "treated", "y", ["x"], clip_micro=300_000
                 ).collect())
    ora = sorted(tuple(r) for r in con.execute(
        ipw_ate_oracle("SELECT * FROM u", "treated", "y", [("x", "x")],
                       clip_micro=300_000)
    ).fetchall())
    assert got == ora
    assert dict(got)["__n_clipped"] > 0

    only_t = [(1, 3 + i % 2, i % 3) for i in range(10)]
    con.register("u2", pd.DataFrame(only_t, columns=["treated", "y", "x"]))
    df2 = spark.createDataFrame(only_t, "treated long, y long, x long")
    got2 = sorted(tuple(r)
                  for r in ipw_ate(df2, "treated", "y", ["x"]).collect())
    ora2 = sorted(tuple(r) for r in con.execute(
        ipw_ate_oracle("SELECT * FROM u2", "treated", "y", [("x", "x")])
    ).fetchall())
    assert got2 == ora2
    assert dict(got2)["mean_c_micro"] == 0


def test_aipw_is_doubly_robust_to_a_bad_propensity(spark):
    """The doubly-robust property, concretely: on the planted confounded
    design the outcome strata on x are EXACTLY the true outcome model,
    so even with a crippled propensity fit (n_steps=1 — essentially
    e = 0.5 everywhere) AIPW lands within quantization of the true
    effect 5, while plain IPW with the same crippled fit stays far off."""
    from flink_example_spark.operators.ml import aipw_ate, ipw_ate

    rows = []
    for x in range(6):
        n_t = 5 + 2 * x
        n_c = 14 - 2 * x
        for i in range(n_t):
            rows.append((1, 10 * x + 5 + (i % 2), x))
        for i in range(n_c):
            rows.append((0, 10 * x + (i % 2), x))
    df = spark.createDataFrame(rows, "treated long, y long, x long")
    aipw = {r["feature"]: r["value"]
            for r in aipw_ate(df, "treated", "y", ["x"], n_steps=1).collect()}
    ipw = {r["feature"]: r["value"]
           for r in ipw_ate(df, "treated", "y", ["x"], n_steps=1).collect()}
    aipw_err = abs(aipw["ate_micro"] / 1e6 - 5.0)
    ipw_err = abs(ipw["ate_micro"] / 1e6 - 5.0)
    assert aipw_err < 1.0      # outcome model alone carries it
    assert ipw_err > 3.0       # the crippled propensity does not
    assert aipw["__n_fallback_units"] == 0  # every stratum has both arms


def test_aipw_matches_duckdb_oracle_with_fallback_strata(spark):
    """Parity including the global-mean fallback path: one stratum is
    treated-only and one control-only, so their units count in
    __n_fallback_units and read the global arm means."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import aipw_ate, aipw_ate_oracle

    rows = [(1 if (x + i) % 2 else 0, x * 4 + i % 3, x)
            for x in range(4) for i in range(10)]
    rows += [(1, 30, 8)] * 3 + [(0, 2, 9)] * 3  # single-arm strata
    con = duckdb.connect()
    con.register("u3", pd.DataFrame(rows, columns=["treated", "y", "x"]))
    df = spark.createDataFrame(rows, "treated long, y long, x long")
    got = sorted(tuple(r)
                 for r in aipw_ate(df, "treated", "y", ["x"]).collect())
    ora = sorted(tuple(r) for r in con.execute(
        aipw_ate_oracle("SELECT * FROM u3", "treated", "y", [("x", "x")])
    ).fetchall())
    assert got == ora
    assert dict(got)["__n_fallback_units"] == 6


def test_overlap_report_flags_one_armed_bins(spark):
    """On the near-separable design the extreme propensity bins hold a
    single arm (flagged one_armed) while mid bins hold both; bin edges
    are exact integer tenths, counts total to n, and DuckDB agrees."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        overlap_report,
        overlap_report_oracle,
    )

    rows = [(1 if x > 2 else 0, x) for x in range(6) for _ in range(12)]
    rows += [(0, 5), (1, 0)]  # two crossovers
    df = spark.createDataFrame(rows, "treated long, x long")
    got = sorted(tuple(r) for r in overlap_report(
        df, "treated", ["x"], n_steps=48, scale_den=4).collect())
    assert sum(r[2] + r[3] for r in got) == len(rows)
    assert any(r[4] for r in got)          # separation shows up
    assert all(r[1] == r[0] * 100_000 for r in got)
    con = duckdb.connect()
    con.register("u4", pd.DataFrame(rows, columns=["treated", "x"]))
    ora = sorted(tuple(r) for r in con.execute(overlap_report_oracle(
        "SELECT * FROM u4", "treated", [("x", "x")],
        n_steps=48, scale_den=4)).fetchall())
    assert got == ora


def test_srm_check_exact_chi2_and_flag(spark):
    """SRM guard: a 70/30 split of 100 units reads chi2 EXACTLY 16.0
    (split-form integer arithmetic) and flags; 50/50 reads 0 and
    passes; the embedded 3.841459 critical value is the boundary.
    DuckDB parity on both fixtures."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import srm_check, srm_check_oracle

    bad = [(i * 2,) for i in range(70)] + [(i * 2 + 1,) for i in range(30)]
    df = spark.createDataFrame(bad, "user_id long")
    got = dict((r["feature"], r["value"]) for r in srm_check(df).collect())
    assert got == {
        "n_a": 70, "n_b": 30, "chi2_micro": 16_000_000, "srm_flag": 1,
    }
    con = duckdb.connect()
    con.register("srm_u", pd.DataFrame(bad, columns=["k"]))
    ora = dict(con.execute(
        srm_check_oracle("SELECT k FROM srm_u")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}

    ok = [(i,) for i in range(100)]
    got2 = dict(
        (r["feature"], r["value"])
        for r in srm_check(spark.createDataFrame(ok, "user_id long")).collect()
    )
    assert got2 == {"n_a": 50, "n_b": 50, "chi2_micro": 0, "srm_flag": 0}
    # boundary: 60/40 of 100 -> chi2 = 4.0 > 3.841459 -> flags
    edge = [(i * 2,) for i in range(60)] + [(i * 2 + 1,) for i in range(40)]
    got3 = dict(
        (r["feature"], r["value"])
        for r in srm_check(spark.createDataFrame(edge, "user_id long")).collect()
    )
    assert got3["chi2_micro"] == 4_000_000 and got3["srm_flag"] == 1


def test_ab_power_mde_closed_form_and_monotonicity(spark):
    """MDE pinned against the integer closed form (per-arm radicand,
    embedded z sum 2.801586) on a 100v100/25% fixture, and the design
    property: quadrupling both arms halves the detectable effect (up to
    the floor). DuckDB parity via the registry oracle shape."""
    import math

    from flink_example_spark.operators.ml import ab_power_mde

    def fixture(n_per_arm):
        # one event per unit; every 4th unit converts -> pm = 250000
        rows = []
        for i in range(2 * n_per_arm):
            rows.append((i, "purchase" if i % 4 == 0 else "view"))
        return spark.createDataFrame(rows, "user_id long, event_type string")

    def expect_mde(n_a, n_b, pm):
        rad = (pm * (1_000_000 - pm)) // n_a + (pm * (1_000_000 - pm)) // n_b
        return (2_801_586 * math.isqrt(rad)) // 1_000_000

    got = dict(
        (r["feature"], r["value"]) for r in ab_power_mde(fixture(100)).collect()
    )
    assert got["n_a"] == got["n_b"] == 100
    assert got["p_pool_micro"] == 250_000
    assert got["mde_abs_micro"] == expect_mde(100, 100, 250_000) == 171_560
    assert got["mde_rel_micro"] == (171_560 * 1_000_000) // 250_000 == 686_240

    got4 = dict(
        (r["feature"], r["value"]) for r in ab_power_mde(fixture(400)).collect()
    )
    # 4x the data -> half the MDE (floor slack: a few micro)
    assert got4["mde_abs_micro"] == expect_mde(400, 400, 250_000)
    assert abs(got4["mde_abs_micro"] * 2 - got["mde_abs_micro"]) <= 5


def test_ab_winsorized_lift_caps_the_whale(spark):
    """The quality property: one whale unit (y=1000) in arm A swings the
    RAW mean lift to ~ +20; the pooled-p99 winsorized lift caps it and
    reads the arms as equal-ish. Threshold semantics pinned (min value
    whose cumulative count reaches ceil(.99 n)); DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        ab_winsorized_lift,
        ab_winsorized_lift_oracle,
    )

    # 50 units per arm, y=2 everywhere; unit 0 (arm A) is a whale
    rows = []
    for i in range(100):
        y = 1000 if i == 0 else 2
        rows += [(i, "purchase")] * y
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = dict(
        (r["feature"], r["value"]) for r in ab_winsorized_lift(df).collect()
    )
    # rank ceil(.99*100)=99 -> the 99th ordered unit still has y=2;
    # the whale occupies rank 100, so thr = 2 and the lift vanishes
    assert got["thr"] == 2
    assert got["n_a"] == got["n_b"] == 50
    assert got["wmean_a_micro"] == got["wmean_b_micro"] == 2_000_000
    assert got["lift_micro"] == 0
    raw_lift = (1000 + 49 * 2) / 50 - 2  # what the naive mean would say
    assert raw_lift > 19

    con = duckdb.connect()
    con.register("wl_ev", pd.DataFrame(rows, columns=["user_id", "event_type"]))
    ora = dict(con.execute(
        ab_winsorized_lift_oracle("wl_ev")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_ab_winsorized_lift_negative_and_threshold_rank(spark):
    """Lift is a plain subtraction and goes negative when arm B leads;
    with 10 units the ceil(.99*10)=10th rank IS the max, so nothing is
    capped and the winsorized means equal the raw ones."""
    from flink_example_spark.operators.ml import ab_winsorized_lift

    rows = []
    for i in range(10):
        y = 3 if i % 2 == 1 else 1  # arm B (odd) leads
        rows += [(i, "purchase")] * y
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = dict(
        (r["feature"], r["value"]) for r in ab_winsorized_lift(df).collect()
    )
    assert got["thr"] == 3  # rank 10 of 10 -> max value: uncapped
    assert got["wmean_a_micro"] == 1_000_000
    assert got["wmean_b_micro"] == 3_000_000
    assert got["lift_micro"] == -2_000_000


def test_did_strips_the_shared_time_trend(spark):
    """Estimator quality (round-10 lesson): plant a time trend BOTH
    groups share (post rates double) plus a treatment effect only in
    treated-post; the naive post-pre diff on the treated group reads
    trend+effect, DiD reads the effect alone. Missing-cell audit and
    DuckDB parity."""
    import duckdb
    import pandas as pd
    from datetime import datetime

    from flink_example_spark.operators.ml import (
        did_estimate,
        did_estimate_oracle,
    )

    pre, post = datetime(2024, 1, 10), datetime(2024, 1, 20)
    cutoff = "2024-01-15 00:00:00"
    rows = []
    # control: 10% pre -> 20% post (pure trend)
    rows += [(0, pre, "purchase")] * 10 + [(0, pre, "view")] * 90
    rows += [(0, post, "purchase")] * 20 + [(0, post, "view")] * 80
    # treated: 10% pre -> 20% trend + 30% effect = 50% post
    rows += [(1, pre, "purchase")] * 10 + [(1, pre, "view")] * 90
    rows += [(1, post, "purchase")] * 50 + [(1, post, "view")] * 50
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = dict((r["feature"], r["value"]) for r in did_estimate(df, cutoff).collect())
    naive_post_pre = got["m_t_post_micro"] - got["m_t_pre_micro"]
    assert naive_post_pre == 400_000          # trend + effect
    assert got["did_micro"] == 300_000        # the effect alone
    assert got["__n_t_pre"] == got["__n_c_post"] == 100

    con = duckdb.connect()
    con.register("did_ev", pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]))
    ora = dict(con.execute(
        did_estimate_oracle("did_ev", cutoff_ts=cutoff)).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_did_missing_cell_reads_zero_and_audits(spark):
    """An empty cell (no control-post data) contributes mean 0 and its
    count audits 0 — no division error, deterministic both engines."""
    from datetime import datetime

    from flink_example_spark.operators.ml import did_estimate

    pre = datetime(2024, 1, 10)
    rows = [(0, pre, "purchase")] * 3 + [(1, pre, "view")] * 3
    rows += [(1, datetime(2024, 1, 20), "purchase")] * 2
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = dict(
        (r["feature"], r["value"])
        for r in did_estimate(df, "2024-01-15 00:00:00").collect()
    )
    assert got["__n_c_post"] == 0 and got["m_c_post_micro"] == 0


def test_ab_exposure_lift_gates_pre_exposure_outcomes(spark):
    """The correctness guard pinned: purchases BEFORE a unit's first
    click never count; a purchase AT the click instant counts
    (inclusive gate); never-exposed units leave the denominator but
    stay in n_units. DuckDB parity."""
    import duckdb
    import pandas as pd
    from datetime import datetime

    from flink_example_spark.operators.ml import (
        ab_exposure_lift,
        ab_exposure_lift_oracle,
    )

    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    rows = [
        # unit 0 (arm A): purchase BEFORE click (excluded), click d5,
        # purchase AT the click instant (counts), purchase after (counts)
        (0, t(2), "purchase"), (0, t(5), "click"),
        (0, t(5), "purchase"), (0, t(9), "purchase"),
        # unit 2 (arm A): click, no post purchases -> y = 0
        (2, t(3), "click"),
        # unit 1 (arm B): click d4, one post purchase
        (1, t(4), "click"), (1, t(6), "purchase"),
        # unit 3 (arm B): NEVER exposed; its purchase must not count
        (3, t(7), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = dict(
        (r["feature"], r["value"]) for r in ab_exposure_lift(df).collect()
    )
    assert got["n_units"] == 4
    assert got["n_exposed_a"] == 2 and got["n_exposed_b"] == 1
    assert got["exposure_rate_micro"] == 750_000
    # arm A: units 0 (y=2) and 2 (y=0) -> mean 1.0; arm B: unit 1 -> 1.0
    assert got["post_mean_a_micro"] == 1_000_000
    assert got["post_mean_b_micro"] == 1_000_000
    assert got["lift_micro"] == 0

    con = duckdb.connect()
    con.register("exp_ev", pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]))
    ora = dict(con.execute(ab_exposure_lift_oracle("exp_ev")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_causal_qte_moves_tail_not_median(spark):
    """Quality property: the planted effect lifts ONLY the treated
    tail — both arms share the median, the P90 differs — so the mean
    estimators under-describe while QTE50 reads 0 and QTE90 reads the
    tail shift exactly. Rank contract (ceil) pinned; DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import causal_qte, causal_qte_oracle

    rows = []
    # both arms: 18 units at y=2; tail: control 2 units at y=4,
    # treated 2 units at y=10
    for i in range(40):
        arm = i % 2
        unit_rank = i // 2
        y = 2 if unit_rank < 18 else (10 if arm == 1 else 4)
        rows += [(i, "purchase")] * y + [(i, "view")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = dict((r["feature"], r["value"]) for r in causal_qte(df).collect())
    assert got["n_a"] == got["n_b"] == 20
    assert got["q50_a"] == got["q50_b"] == 2 and got["qte50"] == 0
    assert got["q90_a"] == 2 and got["q90_b"] == 2  # rank 18 of 20
    # P95-ish tail: use the ceil contract — rank ceil(.9*20)=18 is still
    # in the bulk; the planted shift appears at rank 19+ only, so widen
    # via a direct call at pcts=(50, 95)
    got95 = dict(
        (r["feature"], r["value"])
        for r in causal_qte(df, pcts=(50, 95)).collect()
    )
    assert got95["q95_a"] == 4 and got95["q95_b"] == 10
    assert got95["qte95"] == 6

    con = duckdb.connect()
    con.register("qte_ev", pd.DataFrame(rows, columns=["user_id", "event_type"]))
    ora = dict(con.execute(causal_qte_oracle("qte_ev")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}
    ora95 = dict(
        con.execute(causal_qte_oracle("qte_ev", pcts=(50, 95))).fetchall()
    )
    assert got95 == {k: int(v) for k, v in ora95.items()}


def test_data_shapley_devalues_the_corrupted_source(spark):
    """Estimator quality: three sources carry a clean linear relation
    (y = 10x + small deterministic jitter), source 3's labels are
    anti-correlated garbage — its Shapley must land FAR below the clean
    sources' (and the efficiency axiom must hold: the x k! values sum
    to k! * r2_full exactly). DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        data_shapley,
        data_shapley_oracle,
    )

    rows = []
    for i in range(200):
        src = i % 4
        x = (i * 7) % 50 + 1
        if src == 3:
            y = 500 - 10 * x + (i % 3)  # anti-correlated garbage
        else:
            y = 10 * x + (i % 5)        # clean signal
        rows.append((src, x, y))
    df = spark.createDataFrame(rows, "src long, xv long, yv long")
    got = {r["source"]: r for r in data_shapley(df, "src", "xv", "yv").collect()}
    clean = [got[s]["shap_xkf_ppm"] for s in (0, 1, 2)]
    # the poisoned source carries a large NEGATIVE Shapley value while
    # every clean source is solidly positive — the actionable signal
    assert got[3]["shap_xkf_ppm"] < -5_000_000
    assert min(clean) > 4_000_000
    # its solo coalition ANTI-fits the corpus; adding it to the clean
    # coalition destroys the fit (loo ~0 means "the other three alone
    # score ~0 on a corpus still 25% garbage" — value is corpus-R^2)
    assert got[3]["r2_solo_ppm"] < -1_000_000
    assert got[3]["r2_loo_ppm"] > got[3]["r2_solo_ppm"]

    con = duckdb.connect()
    con.register("dsh", pd.DataFrame(rows, columns=["src", "xv", "yv"]))
    ora = sorted(
        tuple(int(v) for v in r)
        for r in con.execute(
            data_shapley_oracle("SELECT * FROM dsh")
        ).fetchall()
    )
    assert sorted(tuple(r) for r in data_shapley(df, "src", "xv", "yv").collect()) == ora


def test_data_shapley_efficiency_axiom_iid_sources(spark):
    """On IID sources the Shapley values are near-equal and their sum
    equals k! times the full-coalition R^2 (the axiom, exact in ppm
    integers up to the k floors of the R^2 quantization)."""
    from flink_example_spark.operators.ml import data_shapley

    rows = [
        (i % 4, (i * 13) % 40 + 1, 7 * ((i * 13) % 40 + 1) + (i % 4))
        for i in range(160)
    ]
    df = spark.createDataFrame(rows, "src long, xv long, yv long")
    got = {r["source"]: r for r in data_shapley(df, "src", "xv", "yv").collect()}
    shaps = [got[s]["shap_xkf_ppm"] for s in range(4)]
    assert max(shaps) - min(shaps) < 600_000  # near-equal (x24 scale)
    # efficiency: sum == 24 * r2_full; recover r2_full via the loo+solo
    # identity is lossy, so just check the sum is 24 * (~1.0 fit)
    assert abs(sum(shaps) - 24 * 1_000_000) < 24 * 6_000


def _swb_arm(bucket: int) -> int:
    import hashlib

    return int(hashlib.md5(str(bucket).encode()).hexdigest()[:8], 16) % 2


def _swb_events(spark):
    """Switchback fixture: 20 hourly buckets (100..119), body rows carry
    the CURRENT bucket's arm effect (10.0 if arm==1), head rows (first
    10 min) carry the PREVIOUS bucket's — planted carryover."""
    from datetime import datetime, timezone

    rows = []
    for k in range(100, 120):
        eff = lambda a: 10.0 if a == 1 else 0.0  # noqa: E731
        for minute, carry in ((2, True), (5, True), (15, False), (30, False), (45, False)):
            a = _swb_arm(k - 1) if carry else _swb_arm(k)
            ts = datetime.fromtimestamp(k * 3600 + minute * 60, tz=timezone.utc).replace(tzinfo=None)
            rows.append((ts, eff(a)))
    return spark.createDataFrame(rows, "ts timestamp, value double"), rows


def test_switchback_washout_strips_carryover(spark):
    """Quality pin: the washout read recovers the EXACT planted lift
    (-10.0: arm 0 mean 0, arm 1 mean 10) on both the row-weighted and
    bucket-weighted estimates; the washout=0 naive read is contaminated
    by the carryover head rows and strictly attenuated. DuckDB parity
    on the same fixture."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        ab_switchback,
        ab_switchback_oracle,
    )

    df, rows = _swb_events(spark)
    arms = [_swb_arm(k) for k in range(100, 120)]
    assert len(set(arms)) == 2  # both arms occur
    assert any(_swb_arm(k) != _swb_arm(k - 1) for k in range(100, 120))

    got = {r["feature"]: r["value"] for r in ab_switchback(df).collect()}
    assert got["n_buckets_a"] == arms.count(0)
    assert got["n_buckets_b"] == arms.count(1)
    assert got["n_rows_excluded"] == 40  # 2 head rows x 20 buckets
    assert got["lift_rows_micro"] == -10_000_000
    assert got["lift_buckets_micro"] == -10_000_000
    assert got["mean_rows_a_micro"] == 0
    assert got["mean_rows_b_micro"] == 10_000_000

    naive = {
        r["feature"]: r["value"]
        for r in ab_switchback(df, washout_minutes=0).collect()
    }
    assert naive["n_rows_excluded"] == 0
    assert abs(naive["lift_rows_micro"]) < 10_000_000  # carryover bias
    assert abs(naive["lift_buckets_micro"]) < 10_000_000

    con = duckdb.connect()
    con.register("swb_ev", pd.DataFrame(rows, columns=["ts", "value"]))
    ora = dict(con.execute(ab_switchback_oracle("swb_ev")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_cluster_lift_se_discipline(spark):
    """Quality pin: with cluster-level noise and a tiny planted shift,
    the per-row flag FIRES (falsely tight SE) while the cluster flag —
    the valid read under cluster randomization — does not; a genuine
    large effect fires both. DuckDB parity on the noise fixture."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        ab_cluster_lift,
        ab_cluster_lift_oracle,
    )

    def fixture(shift):
        return [
            (k, ((k * 13) % 7) * 10.0 + (shift if k % 2 == 0 else 0.0))
            for k in range(40)
            for _ in range(25)
        ]

    rows = fixture(5.0)
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = {r["feature"]: r["value"] for r in ab_cluster_lift(df).collect()}
    assert got["n_clusters_a"] == 20 and got["n_clusters_b"] == 20
    assert got["lift_cluster_milli"] == 4500  # +5000 shift - 500 baseline
    assert got["sig_naive"] == 1  # the false positive
    assert got["sig_cluster"] == 0  # the valid read holds
    assert got["se2_cluster_milli2"] > got["se2_naive_milli2"]

    big = {
        r["feature"]: r["value"]
        for r in ab_cluster_lift(
            spark.createDataFrame(
                fixture(500.0), "user_id long, value double"
            )
        ).collect()
    }
    assert big["sig_cluster"] == 1 and big["sig_naive"] == 1
    assert big["lift_cluster_milli"] == 499_500

    con = duckdb.connect()
    con.register("cl_ev", pd.DataFrame(rows, columns=["user_id", "value"]))
    ora = dict(con.execute(ab_cluster_lift_oracle("cl_ev")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_cluster_lift_audit_counts_dropped_keys(spark):
    """Rows whose key maps to neither arm (NULL / negative -> arm
    NULL/-1) are no longer silent: the __n_rows_dropped audit row counts
    them, and DuckDB agrees."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.ml import (
        ab_cluster_lift,
        ab_cluster_lift_oracle,
    )

    rows = [(0, 1.0), (1, 2.0), (-3, 9.0), (-3, 9.0), (None, 4.0)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = {r["feature"]: r["value"] for r in ab_cluster_lift(df).collect()}
    assert got["__n_rows_dropped"] == 3
    assert got["n_rows_a"] == 1 and got["n_rows_b"] == 1

    con = duckdb.connect()
    con.register("cl_ev2", pd.DataFrame(rows, columns=["user_id", "value"]))
    ora = dict(con.execute(ab_cluster_lift_oracle("cl_ev2")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_ks_drift_detects_planted_shift_and_respects_null(spark):
    """Quality pin: identically-distributed halves do NOT reject; a
    planted location shift in the second half rejects; d_num matches a
    direct Python reference of the discrete KS statistic."""
    from flink_example_spark.operators.ml import ks_drift

    def fixture(shift):
        rows = []
        for i in range(900):
            ts = f"2024-01-{1 + (i % 30):02d} 12:00:00"
            # value depends only on the block index, so every day sees
            # the identical value multiset -> the null halves really are
            # identically distributed
            base = float((i // 30) % 50)
            rows.append((ts, base + (shift if (i % 30) >= 15 else 0.0)))
        return rows

    def run(rows):
        df = spark.createDataFrame(rows, "ts string, value double").selectExpr(
            "CAST(ts AS TIMESTAMP) AS ts", "value"
        )
        return {r["feature"]: r["value"] for r in ks_drift(df).collect()}

    null = run(fixture(0.0))
    assert null["ks_reject_95"] == 0
    assert null["d_num"] == 0  # identical halves, identical values

    shifted_rows = fixture(30.0)
    shifted = run(shifted_rows)
    assert shifted["ks_reject_95"] == 1

    # direct reference of d_num on the shifted fixture
    a = sorted(
        int(v * 1e6 + 0.5) for t, v in shifted_rows if int(t[8:10]) < 16
    )
    b = sorted(
        int(v * 1e6 + 0.5) for t, v in shifted_rows if int(t[8:10]) >= 16
    )
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a, v) * nb - bisect.bisect_right(b, v) * na)
        for v in vals
    )
    assert shifted["d_num"] == d_num
    assert shifted["n_a"] == na and shifted["n_b"] == nb


def test_streaming_ks_converges_to_batch(spark):
    """The live KS monitor (per-value count monoid in state, statistic
    at read) replays to the bit-identical batch row."""
    from flink_example_spark.operators.ml import ks_drift
    from flink_example_spark.streaming.ml_stream import run_streaming_ks
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    live = sorted(tuple(r) for r in run_streaming_ks(spark, sf).collect())
    batch = sorted(
        tuple(r)
        for r in ks_drift(load_table(spark, sf, "events")).collect()
    )
    assert live == batch


def test_user_knn_salted_path_matches_broadcast(spark):
    """r15 size gate: with SPARK_GRAFT_KNN_BCAST_MAX=0 the pair join takes
    the deterministic salted fallback (no user-scaled broadcast); rows must
    match the broadcast path exactly (same integer dot sums, same IEEE cos,
    same deterministic rank tie-breaks)."""
    import os

    from flink_example_spark.operators.ml import user_knn

    rows = [
        (f"u{i % 7}", f"e{(i * 3) % 5}") for i in range(200)
    ]
    events = spark.createDataFrame(rows, "user_id string, event_type string")
    key = lambda r: (r["user_a"], r["user_b"])
    bcast = sorted((tuple(r) for r in user_knn(events, k=3).collect()), key=lambda t: t[:2])
    os.environ["SPARK_GRAFT_KNN_BCAST_MAX"] = "0"
    try:
        salted = sorted(
            (tuple(r) for r in user_knn(events, k=3).collect()), key=lambda t: t[:2]
        )
    finally:
        del os.environ["SPARK_GRAFT_KNN_BCAST_MAX"]
    assert bcast == salted and len(bcast) > 0
