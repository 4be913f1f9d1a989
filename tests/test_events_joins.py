"""As-of join (union + carry-forward window) and bucketed range join:
hand-computed micro-cases incl. the bucket-boundary edges that the
time-chunking trick must get right."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glirel_spark.operators.events import asof_last_event, range_join_counts

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), u, t)
         for i, us, u, t in rows],
        SCHEMA,
    )


def test_asof_inclusive_and_per_user(spark):
    ev = _ev(spark, [
        (0, 0, 1, "error"),
        (1, 5, 1, "click"),      # 5us after error 0
        (2, 9, 2, "click"),      # user 2: no error ever -> NULLs
        (3, 10, 1, "error"),     # an error matches ITSELF (lag 0)
        (4, 11, 1, "view"),      # most recent is error 3, not 0
    ])
    out = {r.event_id: (r.last_error_event_id, r.us_since_error)
           for r in asof_last_event(ev).collect()}
    assert out == {
        0: (0, 0), 1: (0, 5), 2: (None, None), 3: (3, 0), 4: (3, 1),
    }


def test_range_join_window_boundaries(spark):
    # purchase at t=3600s exactly; window is [t-3600s, t): a click AT
    # t-3600s counts (inclusive lower), a click AT t does not (exclusive
    # upper), and the two clicks land in DIFFERENT hour buckets — the
    # exploded two-bucket join must find both candidates.
    s = 1_000_000
    ev = _ev(spark, [
        (0, 0,          1, "click"),   # == lower bound -> counts
        (1, 1800 * s,   1, "click"),   # inside -> counts
        (2, 3600 * s,   1, "click"),   # == purchase ts -> excluded
        (3, 3600 * s + 1, 1, "click"), # after -> excluded
        (4, 3600 * s,   1, "purchase"),
        (5, 10,         2, "purchase"),  # other user: no clicks
    ])
    out = {r.event_id: r.n_clicks_window
           for r in range_join_counts(ev).collect()}
    assert out == {4: 2, 5: 0}


def test_asof_equals_naive_join(spark):
    """Property: the window formulation == the obvious per-row max-ts
    join on a denser synthetic stream."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(300):
        rows.append((i, i * 7919 % 100000, i % 7,
                     "error" if i % 5 == 0 else "click"))
    ev = _ev(spark, rows)
    got = asof_last_event(ev)
    err = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
    )
    naive = (
        ev.join(err, (ev.user_id == err.u) & (err.ets <= ev.ts), "left")
        .groupBy("event_id")
        .agg(F.max(F.struct("ets", "eid")).alias("m"))
        .select("event_id", F.col("m.eid").alias("naive_id"))
    )
    joined = got.join(naive, "event_id")
    assert joined.filter(
        ~(
            (F.col("last_error_event_id") == F.col("naive_id"))
            | (F.col("last_error_event_id").isNull() & F.col("naive_id").isNull())
        )
    ).count() == 0


def test_funnel_counts_hand_case(spark):
    from glirel_spark.operators import events as ev

    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "2024-01-01 10:00:00", 10, "view"),
        (2, "2024-01-01 10:05:00", 10, "click"),
        (3, "2024-01-01 10:10:00", 10, "purchase"),
        # u2: click BEFORE first view -> stalls after view
        (4, "2024-01-01 09:00:00", 20, "click"),
        (5, "2024-01-01 09:30:00", 20, "view"),
        (6, "2024-01-01 09:40:00", 20, "purchase"),  # no click after view
        # u3: never views
        (7, "2024-01-01 08:00:00", 30, "purchase"),
    ]
    events = spark.createDataFrame(
        [(e, t, u, k) for e, t, u, k in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step_idx"]: r for r in ev.funnel_counts(events).collect()}
    assert (out[0]["step_type"], out[0]["n_users"]) == ("view", 2)  # u1, u2
    assert (out[1]["step_type"], out[1]["n_users"]) == ("click", 1)  # u1 only
    assert (out[2]["step_type"], out[2]["n_users"]) == ("purchase", 1)


def test_user_state_intervals_hand_case(spark):
    from glirel_spark.operators import events as ev

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10, "view"),
            (2, "2024-01-01 11:00:00", 10, "click"),
            (3, "2024-01-01 09:00:00", 20, "signup"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in ev.user_state_intervals(events).collect()}
    assert str(out[1]["valid_to"]) == "2024-01-01 11:00:00"
    assert out[1]["is_open"] is False
    assert out[2]["is_open"] is True and str(out[2]["valid_to"]).startswith("2100")
    assert out[3]["is_open"] is True
    # intervals tile: each user's states cover [first_ts, sentinel)
    assert out[1]["state"] == "view" and out[2]["state"] == "click"


def test_user_retention_hand_case(spark):
    from glirel_spark.operators import events as ev

    # weeks are epoch-week numbers; 1970-01-05 is week 0, +7d = week 1
    events = spark.createDataFrame(
        [
            (1, "1970-01-02 00:00:00", 1, "view"),   # u1 cohort week 0
            (2, "1970-01-09 00:00:00", 1, "view"),   # u1 active week 1
            (3, "1970-01-02 12:00:00", 2, "view"),   # u2 cohort week 0
            (4, "1970-01-16 00:00:00", 3, "view"),   # u3 cohort week 2
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["cohort_week"], r["week_offset"]): (r["n_active"], r["n_cohort"],
                                               r["retention_milli"])
        for r in ev.user_retention(events).collect()
    }
    assert out == {
        (0, 0): (2, 2, 1000),
        (0, 1): (1, 2, 500),
        (2, 0): (1, 1, 1000),
    }


def test_event_gaps_hand_case(spark):
    from glirel_spark.operators import events as ev

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00.000000", 1, "view"),
            (2, "2024-01-01 10:00:01.500000", 1, "view"),   # gap 1.5s
            (3, "2024-01-01 10:00:02.000000", 1, "view"),   # gap 0.5s
            (4, "2024-01-01 09:00:00.000000", 2, "view"),   # single: no gaps
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r for r in ev.event_gaps(events).collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r["n_gaps"], r["min_gap_us"], r["max_gap_us"]) == (2, 500000, 1500000)
    assert r["mean_gap_us"] == 1000000
