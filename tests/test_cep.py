"""CEP pattern operators (operators/cep.py): greedy funnels and
count-burst alerts."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from flink_example_spark.operators.cep import event_bursts, funnel, funnel_counts

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    # rows: (user, seconds_offset, type)
    data = [
        (int(u), T0 + timedelta(seconds=s), t, i)
        for i, (u, s, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )


def test_funnel_greedy_earliest_completion(spark):
    ev = _ev(
        spark,
        [
            (1, 50, "click"),  # click BEFORE the first view: must not match
            (1, 100, "view"),
            (1, 200, "click"),  # earliest click after the view -> matched
            (1, 300, "click"),
            (1, 400, "purchase"),
        ],
    )
    out = funnel(ev, ["view", "click", "purchase"], within_sec=3600).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t_1"], r["t_2"], r["t_3"]) == (
        T0 + timedelta(seconds=100),
        T0 + timedelta(seconds=200),
        T0 + timedelta(seconds=400),
    )
    assert r["duration_us"] == 300 * 1_000_000


def test_funnel_within_bound_is_from_first_step(spark):
    # click at +30s ok, purchase at +70s exceeds within=60 of the FIRST view
    ev = _ev(spark, [(1, 0, "view"), (1, 30, "click"), (1, 70, "purchase")])
    assert funnel(ev, ["view", "click", "purchase"], within_sec=60).count() == 0
    assert funnel(ev, ["view", "click", "purchase"], within_sec=120).count() == 1


def test_funnel_steps_strictly_ordered(spark):
    # click exactly at the view's timestamp does NOT satisfy ts > t1
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
    assert funnel(ev, ["view", "click"], within_sec=60).count() == 0
    ev2 = _ev(spark, [(1, 0, "view"), (1, 1, "click")])
    assert funnel(ev2, ["view", "click"], within_sec=60).count() == 1


def test_funnel_requires_two_steps(spark):
    ev = _ev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel(ev, ["view"], within_sec=60)


def test_funnel_counts_shape(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            (2, 0, "view"), (2, 10, "click"),
            (3, 0, "view"),
            (4, 5, "click"),  # never viewed: not in any frontier
        ],
    )
    out = {
        r["step_idx"]: (r["step"], r["n_keys"])
        for r in funnel_counts(ev, ["view", "click", "purchase"], 3600).collect()
    }
    assert out == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_event_bursts_threshold_and_window(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "error"), (1, 5, "error"), (1, 9, "error"),  # burst of 3
            (1, 100, "error"),  # isolated
            (2, 0, "error"), (2, 50, "error"),  # never 3 within 10s
            (1, 3, "click"),  # other types never counted
        ],
    )
    alerts = event_bursts(ev, "error", n=3, within_sec=10).collect()
    assert [(r["key"], r["n_in_window"]) for r in alerts] == [(1, 3)]
    assert alerts[0]["ts"] == T0 + timedelta(seconds=9)


def test_event_bursts_trailing_window_inclusive(spark):
    # exactly within_sec apart: both endpoints inside the trailing frame
    ev = _ev(spark, [(1, 0, "error"), (1, 10, "error")])
    alerts = event_bursts(ev, "error", n=2, within_sec=10).collect()
    assert len(alerts) == 1 and alerts[0]["n_in_window"] == 2
    # one microsecond beyond would fall out: 11s apart with 10s window
    ev2 = _ev(spark, [(1, 0, "error"), (1, 11, "error")])
    assert event_bursts(ev2, "error", n=2, within_sec=10).count() == 0


def test_funnel_without_negative_pattern(spark):
    from flink_example_spark.operators.cep import funnel_without

    ev = _ev(
        spark,
        [
            # user 1 completes cleanly
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # user 2 completes but an error sits strictly inside -> dropped
            (2, 0, "view"), (2, 10, "click"), (2, 15, "error"), (2, 20, "purchase"),
            # user 3: errors exactly AT t_1 and t_k are NOT "in between"
            (3, 0, "error"), (3, 0, "view"), (3, 10, "click"),
            (3, 20, "purchase"), (3, 20, "error"),
        ],
    )
    out = funnel_without(
        ev, ["view", "click", "purchase"], 3600, forbidden=["error"]
    )
    assert sorted(r["key"] for r in out.collect()) == [1, 3]


def test_consecutive_runs_strict_contiguity(spark):
    from flink_example_spark.operators.cep import consecutive_runs

    ev = _ev(
        spark,
        [
            # run of 3, broken by a click, then a lone error
            (1, 0, "error"), (1, 1, "error"), (1, 2, "error"),
            (1, 3, "click"),
            (1, 4, "error"),
            # user 2: exactly min_len
            (2, 0, "error"), (2, 1, "error"),
        ],
    )
    out = sorted(
        (r["key"], r["run_len"]) for r in consecutive_runs(ev, "error", 2).collect()
    )
    # the lone error after the click is NOT contiguous with the first run
    assert out == [(1, 3), (2, 2)]


def test_event_transitions_probabilities(spark):
    from datetime import datetime

    from flink_example_spark.operators.cep import event_transitions

    rows = [
        ("u", datetime(2024, 1, 1, h), h, t)
        for h, t in enumerate(["view", "click", "view", "click", "purchase"])
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long, event_type string")
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in event_transitions(df).collect()}
    # view->click twice (p=1); click->view once, click->purchase once (p=.5 each)
    assert out == {
        ("view", "click"): (2, 1.0),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_retention_cohorts_matrix(spark):
    from datetime import datetime

    from flink_example_spark.operators.cep import retention_cohorts

    rows = [
        # cohort week of Jan 1 (Mon): u1 active weeks 0,1,2; u2 weeks 0,2
        ("u1", datetime(2024, 1, 2)), ("u1", datetime(2024, 1, 9)), ("u1", datetime(2024, 1, 16)),
        ("u2", datetime(2024, 1, 3)), ("u2", datetime(2024, 1, 17)),
        # cohort week of Jan 8: u3 active weeks 0,1
        ("u3", datetime(2024, 1, 10)), ("u3", datetime(2024, 1, 18)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r["cohort"].day, r["week_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in retention_cohorts(df).collect()
    }
    assert out == {
        (1, 0): (2, 2, 1.0), (1, 1): (1, 2, 0.5), (1, 2): (2, 2, 1.0),
        (8, 0): (1, 1, 1.0), (8, 1): (1, 1, 1.0),
    }


def test_funnel_latency_totals_match_funnel(spark):
    """The 'total' transition quantiles are exactly the funnel durations'
    quantiles, and each key contributes one gap per transition."""
    from flink_example_spark.operators.cep import funnel, funnel_latency
    from flink_example_spark.plans.events_demo import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    steps = ["view", "click", "purchase"]
    f = funnel(ev, steps, 86400)
    lat = {r["transition"]: r for r in funnel_latency(ev, steps, 86400).collect()}
    n = f.count()
    assert {t for t in lat} == {"view->click", "click->purchase", "total"}
    assert all(lat[t]["n"] == n for t in lat)
    durs = sorted(r["duration_us"] for r in f.collect())
    import statistics

    assert lat["total"]["p50_us"] == statistics.median(durs)
    assert lat["total"]["p25_us"] <= lat["total"]["p50_us"] <= lat["total"]["p90_us"]


def test_rfm_segments_boundary_scoring(spark):
    import datetime

    from flink_example_spark.operators.cep import rfm_segments

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # 4 users with clearly separated recency/frequency/monetary profiles:
    # user u gets u events on day u, each worth 10*u
    for u in range(1, 5):
        for i in range(u):
            rows.append((u, base + datetime.timedelta(days=u, minutes=i), 10.0 * u))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rfm_segments(df).collect()
    # all three axes order users identically -> 4 diagonal segments
    segs = {(r["r_score"], r["f_score"], r["m_score"]): r for r in out}
    assert set(segs) == {(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)}
    assert all(r["n_users"] == 1 for r in out)
    assert segs[(4, 4, 4)]["m_sum"] == 160.0  # 4 events x 40
