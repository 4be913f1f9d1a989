"""Event-stream operators (batch form; streaming twins in
glirel_spark/streaming/). Window functions + sessionization — the
standard OLAP patterns the engine exposes alongside the KG pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def windowed_counts(events: DataFrame) -> DataFrame:
    """Hourly tumbling-window counts per event type.

    value aggregated as integer cents (value*100 cast) so the oracle
    sum is order-insensitive-exact (float sums are not).
    """
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: lag + cumulative sum of session starts.

    Single shuffle on user_id; both windows share the same partitioning
    and sort, so Catalyst plans one exchange + one sort.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(F.lag("ts").over(w).isNull(), 1).when(
        gap > gap_seconds, 1
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        events.withColumn("sess_id", sess_id.cast("long"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
    )


def asof_last_event(events: DataFrame, right_type: str = "error") -> DataFrame:
    """AS-OF join: every event annotated with the most recent event of
    `right_type` for the same user at-or-before its timestamp ("time
    since last error" — the canonical ops-analytics as-of).

    Spark has no ASOF JOIN operator; the scalable formulation is NO
    join at all: tag the right-side rows inside the SAME relation,
    then one carry-forward window — ``last(..., ignorenulls)`` over
    (user, time) — fills each row with the latest right-side row seen
    so far. One shuffle on user_id, one sort, zero join; at 10^12
    events this beats any join-based plan (a per-user sort-merge is
    exactly what the window executes) and never builds the O(left x
    right) candidate space a range predicate would. Both windows share
    one spec, so Catalyst plans a single exchange + sort. Semantics
    are inclusive (an 'error' row matches itself, lag 0), identical to
    DuckDB's ``ASOF JOIN ON l.ts >= r.ts`` — the oracle. The lag is
    integer microseconds (exact in both engines; float seconds would
    not hash).
    """
    is_r = F.col("event_type") == right_type
    tagged = events.select(
        "event_id", "ts", "user_id", "event_type",
        F.when(is_r, F.col("event_id")).alias("_r_id"),
        F.when(is_r, F.col("ts")).alias("_r_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # timestampdiff, not unix_micros: ts is TIMESTAMP_NTZ, and an
    # NTZ->LTZ cast would make the result depend on the session
    # timezone; NTZ-NTZ difference is timezone-free in both engines.
    return tagged.select(
        "event_id", "ts", "user_id", "event_type",
        F.last("_r_id", ignorenulls=True).over(w)
        .cast("long").alias(f"last_{right_type}_event_id"),
        F.last("_r_ts", ignorenulls=True).over(w).alias("_last_ts"),
    ).select(
        "event_id", "ts", "user_id", "event_type",
        f"last_{right_type}_event_id",
        F.expr("timestampdiff(MICROSECOND, _last_ts, ts)")
        .cast("long").alias(f"us_since_{right_type}"),
    )


def range_join_counts(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    window_seconds: int = 3600,
) -> DataFrame:
    """Range join via time-bucketing: per `left_type` event, how many
    `right_type` events the same user produced in the preceding
    `window_seconds` (clicks-before-purchase attribution).

    A naive ``ON c.ts BETWEEN p.ts - W AND p.ts`` is a non-equi join —
    Spark plans it as a per-user nested loop, O(clicks x purchases)
    per user and a broadcast/cartesian at scale. Bucketing time into
    window-sized chunks turns it into an EQUI-join: a half-open window
    of width W overlaps exactly two chunks, so each left row explodes
    to 2 bucket keys, joins co-partitioned on (user_id, bucket), and
    the exact range predicate filters the at-most-2x candidates.
    Shuffle is keyed on (user, time-chunk) — naturally balanced even
    for hot users, and AQE skew-split applies. Window arithmetic in
    integer microseconds; counts are longs.
    """
    wus = window_seconds * 1_000_000
    # epoch microseconds of a TIMESTAMP_NTZ, timezone-free (see
    # asof_last_event): NTZ difference from the naive epoch.
    ep = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    # integer DIV, not floor(double /): epoch-us values are exact longs
    # and must stay exact through the bucket arithmetic (a double
    # division is only safe below 2^53 and rounds at the boundary)
    clicks = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("c_user"),
        F.expr(ep).alias("c_us"),
    ).withColumn("bucket", F.expr(f"c_us DIV {wus}"))
    purchases = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts", F.expr(ep).alias("p_us"),
    )
    exploded = purchases.select(
        "event_id", "user_id", "p_us",
        F.explode(
            F.array(
                F.expr(f"p_us DIV {wus}") - 1, F.expr(f"p_us DIV {wus}")
            )
        ).alias("bucket"),
    )
    matched = (
        exploded.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (exploded["bucket"] == clicks["bucket"]),
        )
        .filter(
            (F.col("c_us") >= F.col("p_us") - wus) & (F.col("c_us") < F.col("p_us"))
        )
        .groupBy("event_id")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    return purchases.join(matched, "event_id", "left").select(
        "event_id", "user_id", "ts",
        F.coalesce("_n", F.lit(0)).cast("long").alias(f"n_{right_type}s_window"),
    )


def props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured JSON extraction at scan time: pull the numeric
    ``k`` out of the ``props`` JSON string column and aggregate per
    event type. ``get_json_object`` is a JVM-side codegen expression —
    the parse happens inside the scan stage, no UDF, no second pass;
    at 10^12 events the alternative (a parsed staging table) is a
    storage choice, not a plan necessity. Aggregates are
    integer-exact (count / long sum / exact count-distinct via the
    two-stage dedup shuffle Spark plans for countDistinct).
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
    )


FUNNEL_STEPS = ["view", "click", "purchase"]
SCD_OPEN_END = "2100-01-01 00:00:00"  # far-future, pandas-ns-representable


def funnel_counts(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """(step_idx, step_type, n_users): the ordered conversion funnel —
    how many users reached step i, where step i counts only if an event
    of that type occurs at-or-after the user's step-(i-1) time (first
    qualifying occurrence each). The product-analytics staple.

    Scale shape: one conditional min-aggregate per step, each keyed on
    user_id — the SAME shuffle key every round, so after the first
    exchange the per-step joins are co-partitioned (Catalyst reuses the
    hash partitioning; no re-shuffle); per-step state is one timestamp
    per user. Each step's count collapses to ONE row and the result is
    the lazy union of |steps| single-row aggregates — no driver-side
    action, no windows, no per-user loops.
    """
    steps = steps if steps is not None else FUNNEL_STEPS
    reached = events.filter(F.col("event_type") == steps[0]).groupBy("user_id").agg(
        F.min("ts").alias("t")
    )

    def step_row(i: int, s: str, users: DataFrame) -> DataFrame:
        return users.agg(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(s).alias("step_type"),
            F.count("*").cast("long").alias("n_users"),
        )

    out = step_row(0, steps[0], reached)
    for i, s in enumerate(steps[1:], start=1):
        reached = (
            events.filter(F.col("event_type") == s)
            .join(reached, "user_id")
            .filter(F.col("ts") >= F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        out = out.unionByName(step_row(i, s, reached))
    return out


def user_state_intervals(events: DataFrame) -> DataFrame:
    """(user_id, state, valid_from, valid_to, is_open): SCD2-style
    state-interval build — every event opens a state (its event_type)
    valid until the user's next event; the latest event's interval is
    closed with the far-future sentinel end (2100-01-01 — chosen inside
    the pandas timestamp[ns] range so Arrow conversion round-trips) and
    flagged is_open.
    The warehouse dimension-history shape (Kimball type-2) applied to
    the event log.

    Scale shape: ONE window partitioned by user_id (per-key frames,
    never a global order), deterministic within-key order (ts,
    event_id). The sentinel close keeps the schema NULL-free so
    downstream BETWEEN probes need no null guards.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit(SCD_OPEN_END).cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_open"),
        "event_id",
    )


def user_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_active, n_cohort, retention_milli):
    classic cohort retention — users grouped by first-activity week,
    tracked by how many are active k weeks later. Weeks are integer
    epoch-week numbers (epoch seconds DIV 604800), all arithmetic
    integer; retention_milli = n_active * 1000 DIV n_cohort is the one
    integer division.

    Scale shape: first-activity is one min-aggregate on user_id; the
    (user, week) activity relation is one distinct (skew-free composite
    key); the cohort join is keyed on user_id (co-partitioned with the
    first-activity agg); the final rollup's key space is
    weeks x offsets — tiny, fully map-side combined. No windows.
    """
    ep = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    week = F.expr(f"({ep}) DIV 604800")
    first = (
        events.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    active = events.select("user_id", week.alias("week")).distinct()
    per_cell = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    cohorts = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    return per_cell.join(cohorts, "cohort_week").select(
        F.col("cohort_week").cast("long"),
        F.col("week_offset").cast("long"),
        "n_active",
        "n_cohort",
        F.expr("(n_active * 1000) DIV n_cohort").alias("retention_milli"),
    )


def event_gaps(events: DataFrame) -> DataFrame:
    """(user_id, n_gaps, min_gap_us, max_gap_us, mean_gap_us): per-user
    inter-arrival census — the burstiness/liveness profile behind
    session-gap tuning (events.sessionize's gap_seconds is chosen by
    looking at exactly this distribution). Gaps in integer
    microseconds (NTZ difference, timezone-free in both engines);
    mean is the one integer division.

    Scale shape: one per-key lag window (same single exchange + sort
    the as-of join shares), then a map-side-combinable per-user
    aggregate. Users with a single event have no gaps and are absent.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    gaps = events.select("user_id", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.expr("sum(gap_us) DIV count(*)").cast("long").alias("mean_gap_us"),
    )
