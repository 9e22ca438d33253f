"""Gap-based sessionization: group each key's events into sessions
separated by more than ``gap`` of inactivity (the event-stream
counterpart of the weather star's snapshot grouping; a core
training-data-pipeline op for user/interaction logs).

Batch form (here): the classic two-window plan —
``lag`` marks session starts, a running sum of start markers numbers
the sessions — one shuffle on the key, both windows share the same
(key, ts) sort order so Spark plans a single sort.

Streaming form: ``F.session_window(ts, gap)`` with a watermark gives
the same grouping incrementally; the batch and streaming aggregates
produce identical (key, session_start, n_events) rows for closed
sessions.

Scale: state is one row per open session in streaming; in batch the
shuffle is by key only (sessions never straddle keys), so skew follows
key skew — salt hot keys upstream if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Attach ``session_id`` (1-based per key, in time order) and
    ``session_start`` to every row.

    The key exchange is an EXPLICIT repartition (r12, the q92/ewma
    pattern): session rows are narrow, so AQE's byte-based coalescing
    shrank the window stage to ONE task at sf0.1 (1.4 MB post-shuffle,
    0.5 s of single-threaded lag+cumsum; stage profile) — repartition
    by key is exempt from coalescing and the window needs exactly this
    hash clustering anyway, at any scale.

    The WIDTH tracks the input's own scan parallelism (r13, settling
    the r12-verdict q34 regression): a flat ``shuffle.partitions``
    width pays ~30 per-task floors over kilobyte partitions at small
    SF. ``plan_scan_partitions`` is Spark's byte-derived estimate of
    the input's parallelism — at cluster scale it is ≥ nparts so the
    width IS nparts (the r12 behavior); locally it right-sizes the
    window stage. Same-session ABAB at sf0.1 (2×2 reps, cold med):
    scan-width 1.52-1.57 s < rep(32) 1.78-1.91 s < none/AQE-coalesced
    1.98-2.09 s."""
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    from alaska_etl_spark.operators.parallelism import plan_scan_partitions

    width = plan_scan_partitions(df) or nparts
    df = df.repartition(max(2, min(nparts, width)), *key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("timestamp") > prev_ts.cast("timestamp") + F.expr(f"INTERVAL {gap}"))
    ).cast("bigint")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("session_id", F.sum(is_start).over(wcum))
    wsess = Window.partitionBy(*key_cols, "session_id")
    return out.withColumn("session_start", F.min(ts_col).over(wsess))


def concurrency_by_day(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per UTC day — the
    interval sweep (max concurrent sessions / connections / calls).

    Intervals are CLOSED ``[start, end]``: one interval ending at t and
    another starting at t count as overlapping (concurrency 2 at t).

    Plan, sized for 100 TB of intervals:

    1. Split multi-day intervals at midnight (``sequence`` + explode —
       per-row fan-out is the number of days spanned, bounded and tiny
       for session-like data) and clamp the boundaries into each day.
    2. Reduce boundary events to per-(day, ts) counts FIRST: one hash
       aggregate with map-side partial combine. The sweep's window then
       runs over |distinct timestamps| rows, not 2×|intervals|.
    3. One window partitioned by day, ordered by ts: with ``net =
       starts - ends`` collapsed per timestamp, the within-ts peak is
       ``cumsum(net) + ends`` (all starts at t apply before any end at
       t under closed-interval semantics), so no per-event ordering or
       tie-break column survives to the window.

    The only shuffles are the (day, ts) aggregate and the by-day
    window; day is the partition key, so a year of data is ~365 window
    partitions — for extreme per-day volume the step-2 aggregate has
    already collapsed the sweep input to distinct timestamps.
    """
    s, e = F.col(start_col).cast("timestamp"), F.col(end_col).cast("timestamp")
    days = F.sequence(F.date_trunc("day", s), F.date_trunc("day", e), F.expr("INTERVAL 1 DAY"))
    seg = intervals.select(
        s.alias("_s"), e.alias("_e"), F.explode(days).alias("_day")
    ).select(
        "_day",
        F.greatest(F.col("_s"), F.col("_day")).alias("_seg_start"),
        F.least(F.col("_e"), F.col("_day") + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 MICROSECOND")).alias(
            "_seg_end"
        ),
    )
    # explode a 2-struct array rather than union two selects: a union
    # would plan the (often expensive) interval-producing subtree twice
    boundary = F.explode(
        F.array(
            F.struct(F.col("_seg_start").alias("ts"), F.lit(1).alias("starts"), F.lit(0).alias("ends")),
            F.struct(F.col("_seg_end").alias("ts"), F.lit(0).alias("starts"), F.lit(1).alias("ends")),
        )
    )
    deltas = (
        seg.select("_day", boundary.alias("_b"))
        .select("_day", "_b.ts", "_b.starts", "_b.ends")
        .groupBy("_day", "ts")
        .agg(F.sum("starts").alias("n_starts"), F.sum("ends").alias("n_ends"))
    )
    w = Window.partitionBy("_day").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    peaks = deltas.withColumn(
        "peak", F.sum(F.col("n_starts") - F.col("n_ends")).over(w) + F.col("n_ends")
    )
    # day stays a midnight TIMESTAMP (like every date_trunc grain here):
    # pandas/Arrow turns engine DATEs into mismatched types across engines
    return (
        peaks.groupBy(F.col("_day").alias("utc_day"))
        .agg(F.max("peak").alias("max_concurrent"))
        .orderBy("utc_day")
    )


def session_stats(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per session: start, end, event count, duration seconds."""
    s = sessionize(df, key_cols=key_cols, ts_col=ts_col, gap=gap, order_tiebreak=order_tiebreak)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col(ts_col).cast("timestamp")).cast("long")
            - F.min(F.col(ts_col).cast("timestamp")).cast("long")
        ).alias("duration_s"),
    )


def transition_matrix(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition estimate over per-key event
    sequences: P(next state | state), the path-analysis primitive
    behind "what do users do after an error" (the stochastic sibling
    of qd3's attribution paths and qh2's PMI — those score pairs,
    this estimates the conditional process).

    One exchange + one sort (the lead window on the key), then a
    transition-pair aggregate; the row normalization runs over the
    |states|² count frame via a window — tiny by construction.
    Transitions never cross keys (lead stays inside the partition).
    Probabilities are the engine's exact 4dp round-half-up emit from
    BIGINT counts. Returns ``(src, dst, n, row_total, prob)``.
    """
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    w = Window.partitionBy(part_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(F.col(state_col)).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_row = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.sum("n").over(w_row).cast("bigint").alias("row_total"),
    ).select(
        "src",
        "dst",
        "n",
        "row_total",
        (div_half_up("n", "row_total", 10000) / 10000.0).alias("prob"),
    )


def combination_overlap(
    df: DataFrame,
    subject_col: str,
    set_col: str,
    members: list[str],
) -> DataFrame:
    """UpSet-style intersection cardinalities (Lex et al. '14): for
    every observed COMBINATION of set memberships, how many subjects
    have exactly that combination — the exact answer Venn counts
    approximate and pairwise overlap matrices lose (pairwise says "A∩B
    is big"; only the combination frame says whether that mass also
    sits in C). Audience-overlap / feature-adoption analytics.

    One aggregate collapses subjects to a membership BITMASK
    (``bit_or`` of per-member bits — mergeable, map-side combined, the
    same economics as the activity bitmap), a second counts subjects
    per mask — at most 2^|members| rows. Subjects touching none of the
    listed members are excluded by construction (no rows match).
    Membership order is the caller's ``members`` list: bit i =
    members[i]; the emitted ``combo`` string joins member names with
    '+' in list order for human reading — counts key off the mask.

    Returns ``(mask, combo, degree, n_subjects)``.
    """
    bit = F.lit(0).cast("bigint")
    for i, m in enumerate(members):
        bit = bit + F.when(F.col(set_col) == m, F.lit(1 << i)).otherwise(0)
    masks = (
        df.select(F.col(subject_col).alias("_s"), bit.alias("_b"))
        .filter(F.col("_b") > 0)
        .groupBy("_s")
        .agg(F.bit_or("_b").cast("bigint").alias("mask"))
    )
    combo = F.concat_ws(
        "+",
        F.filter(
            F.array(
                *[
                    F.when(
                        (F.col("mask").bitwiseAND(F.lit(1 << i))) > 0, F.lit(m)
                    )
                    for i, m in enumerate(members)
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return (
        masks.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_subjects"))
        .select(
            "mask",
            combo.alias("combo"),
            F.bit_count("mask").cast("bigint").alias("degree"),
            "n_subjects",
        )
    )


def episode_support(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    state_col: str,
    *,
    window_us: int,
) -> DataFrame:
    """Temporal episode discovery (Mannila et al. '97 serial episodes,
    length 2): for every ordered state pair (a → b within ``window_us``
    of the same key), the occurrence count and the SUPPORT (distinct
    keys exhibiting it) — the discovery-form generalization of qc4's
    fixed funnel (that checks ONE given sequence; this surfaces every
    pair worth a funnel) and of qk1's transitions (adjacent-only; this
    sees across intervening events).

    Scale shape — the pair join is banded, never per-key-quadratic in
    time: events bucket by ``floor(epoch/window)`` and each event
    joins only its own and the NEXT bucket of the same key (any pair
    within the window spans at most one boundary), then the exact
    ``0 < Δt ≤ window`` filter applies. Fan-out is bounded by events ×
    same-key density per window — the bounded-state contract of the
    streaming interval join, in batch. Equal-timestamp pairs are
    excluded (no order evidence; document keys needing them should
    tiebreak upstream).

    Returns ``(src, dst, n_occurrences, support)``.
    """
    q = ts_col.replace("`", "``")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{q}`)"
    )
    w = int(window_us)
    base = df.select(
        F.col(part_col).alias("_k"),
        F.col(state_col).alias("_s"),
        us.alias("_us"),
    ).withColumn("_b", F.expr(f"_us div {w}"))
    right = base.select(
        F.col("_k").alias("_k2"),
        F.col("_s").alias("_s2"),
        F.col("_us").alias("_us2"),
        F.explode(F.array(F.col("_b"), F.col("_b") - 1)).alias("_b2"),
    )
    pairs = base.join(
        right,
        on=[
            F.col("_k") == F.col("_k2"),
            F.col("_b") == F.col("_b2"),
            F.col("_us2") > F.col("_us"),
            F.col("_us2") - F.col("_us") <= F.lit(w),
        ],
    )
    return (
        pairs.groupBy(F.col("_s").alias("src"), F.col("_s2").alias("dst"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("_k").cast("bigint").alias("support"),
        )
    )


def last_touch_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str,
    touch_types: "list[str]",
    window_days: int = 7,
) -> DataFrame:
    """Last-touch conversion attribution — the canonical marketing/
    product-analytics credit rule: each conversion event credits the
    user's most recent PRIOR attributable touch within
    ``window_days``; conversions with no qualifying touch report as
    ``(none)``. The missing sibling of sessionize/funnel in the
    behavioral family: funnels ask "did the sequence happen",
    attribution asks "which step gets the credit".

    One exchange + one sort: the per-user window carries the last
    attributable (ts, type) via ``last(..., ignorenulls=True)`` over
    rows-up-to-previous — no self-join against the touch stream, which
    is the naive O(conversions × touches-per-user) shape. The order is
    (ts, id) so same-timestamp events resolve deterministically on any
    engine. Returns (touch_type, n_conversions, share_bp) ordered."""
    from pyspark.sql import Window

    from alaska_etl_spark.functions.fixedpoint import div_half_up

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(touch_types)
    tagged = events.select(
        user_col,
        ts_col,
        id_col,
        type_col,
        F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias("_tts"),
        F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True)
        .over(w)
        .alias("_tty"),
    ).filter(F.col(type_col) == conversion_type)
    credit = F.when(
        F.col("_tts").isNotNull()
        & (
            F.col("_tts")
            >= F.col(ts_col) - F.expr(f"INTERVAL {window_days} DAYS")
        ),
        F.col("_tty"),
    ).otherwise(F.lit("(none)"))
    per = tagged.groupBy(credit.alias("touch_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        per.withColumn(
            "_tot", F.sum("n_conversions").over(wall).cast("bigint")
        )
        .select(
            "touch_type",
            "n_conversions",
            div_half_up("10000 * n_conversions", "_tot").alias("share_bp"),
        )
        .orderBy("touch_type")
    )


def rfm_segments(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    *,
    buckets: int = 5,
    value_scale: int = 100,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    behavioral cut of an event stream: per user, days since last
    event (against the corpus high-watermark), event count, and total
    value; each dimension bucketed 1..k by exact global ntile, and the
    output reduced to segment-grain counts (k³ rows max — the heatmap
    a retention team reads).

    Exactness discipline: recency is an integer day difference
    (epoch-second div 86400); monetary sums ride
    ``round(value·scale)`` BIGINT units (doubles summed in engine
    order are not reproducible — the qi2/PSI quantized-term stance);
    buckets come from :func:`~alaska_etl_spark.operators.ranking.
    global_ntile` over (dimension, user id) — a range exchange, never
    a single-partition window, and the id tiebreak makes every
    bucketing a total order DuckDB replays verbatim. Recency ntile
    orders ASCENDING on days-since (bucket 1 = most recent), frequency
    and monetary DESCENDING (bucket 1 = most active / highest value) —
    the conventional "111 is the best customer" reading.

    The corpus high-watermark joins via a one-row crossJoin (broadcast
    by construction), and the per-user frame is corpus-grain (one row
    per user). Returns (r_bucket, f_bucket, m_bucket, n_users,
    total_events, total_value_units) ordered."""
    from alaska_etl_spark.operators.parallelism import ensure_min_parallelism
    from alaska_etl_spark.operators.ranking import global_ntile

    events = ensure_min_parallelism(events, user_col)
    per_user = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(F.col(ts_col)).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("_freq"),
        F.sum(F.round(F.col(value_col) * F.lit(value_scale)).cast("bigint"))
        .cast("bigint")
        .alias("_mon"),
    )
    hwm = events.agg(F.max(F.col(ts_col)).alias("_hwm"))
    u = per_user.crossJoin(F.broadcast(hwm)).select(
        "_u",
        # exact integer MICROSECOND difference, floor-divided to days:
        # unix_timestamp() truncates each value to whole seconds BEFORE
        # subtracting while SQL epoch() keeps fractions — near a day
        # boundary the two disagree by one, which reorders the recency
        # ntile (caught by the sf0.001 sweep)
        # cast through TIMESTAMP for unix_micros (parquet event times
        # load as TIMESTAMP_NTZ; the session timezone is pinned UTC, so
        # the NTZ -> TZ cast is wall-clock identity and the micros
        # match DuckDB's epoch_us on the same naive values)
        F.expr(
            "(unix_micros(cast(_hwm as timestamp))"
            " - unix_micros(cast(_last as timestamp))) div 86400000000"
        ).cast("bigint").alias("_rec_days"),
        "_freq",
        "_mon",
    )
    u = global_ntile(u, ["_rec_days", "_u"], buckets, bucket_col="r_bucket")
    u = global_ntile(
        u.select("*", (-F.col("_freq")).alias("_nf")),
        ["_nf", "_u"], buckets, bucket_col="f_bucket",
    )
    u = global_ntile(
        u.select("*", (-F.col("_mon")).alias("_nm")),
        ["_nm", "_u"], buckets, bucket_col="m_bucket",
    )
    return (
        u.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("_freq").cast("bigint").alias("total_events"),
            F.sum("_mon").cast("bigint").alias("total_value_units"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


def sequence_predictability(
    df: DataFrame,
    part_col: str,
    order_cols: "list[str]",
    state_col: str,
    *,
    scale: int = 10**9,
) -> DataFrame:
    """How predictable is the event process? From the SAME transition
    pairs :func:`transition_matrix` estimates, compute the Markov-1
    conditional entropy H(next|current), the marginal next-state
    entropy H(next), and the information the current state carries
    about the next one, I = H(next) − H(next|current) — one number per
    corpus separating ritualized flows (checkout funnels, I → H) from
    memoryless browsing (I → 0). The process-level summary the
    transition MATRIX (|states|² rows) is too wide to read at a
    glance.

    Quantized-term discipline throughout (the qi2/MI stance): H(next|
    current) = Σ_src (n_src/n)·H(next|src) decomposes into per-(src,
    dst) terms (n_sd/n)·(ln n_src − ln n_sd), every ln argument an
    exact BIGINT, each term rounded to 1e-9 units, BIGINT sums
    order-free; H(next) gets the same treatment over the dst margin.
    One lead window (the transition_matrix exchange), one pair
    aggregate, reductions over the |states|²-bounded count frame.
    Returns one row: (n_transitions, n_states, h_next_units,
    h_cond_units, info_gain_units)."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("_src"),
            F.lead(F.col(state_col)).over(w).alias("_dst"),
        )
        .filter(F.col("_dst").isNotNull())
        .groupBy("_src", "_dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_sd"))
    )
    from alaska_etl_spark.cache import tracked_persist

    pairs = tracked_persist(pairs)
    src_m = pairs.groupBy("_src").agg(F.sum("_n_sd").cast("bigint").alias("_n_s"))
    dst_m = pairs.groupBy("_dst").agg(F.sum("_n_sd").cast("bigint").alias("_n_d"))
    tot = pairs.agg(
        F.sum("_n_sd").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_n_cells"),
    )
    states = (
        pairs.select(F.col("_src").alias("_st"))
        .unionByName(pairs.select(F.col("_dst").alias("_st")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_states"))
    )
    cond = (
        pairs.join(src_m, "_src")
        .crossJoin(F.broadcast(tot.select("_n")))
        .select(
            F.round(
                F.lit(scale)
                * (F.col("_n_sd").cast("double") / F.col("_n"))
                * (F.log(F.col("_n_s")) - F.log(F.col("_n_sd")))
            )
            .cast("long")
            .alias("_t")
        )
        .agg(F.sum("_t").cast("bigint").alias("h_cond_units"))
    )
    hnext = (
        dst_m.crossJoin(F.broadcast(tot.select("_n")))
        .select(
            F.round(
                F.lit(scale)
                * (F.col("_n_d").cast("double") / F.col("_n"))
                * (F.log(F.col("_n")) - F.log(F.col("_n_d")))
            )
            .cast("long")
            .alias("_t")
        )
        .agg(F.sum("_t").cast("bigint").alias("h_next_units"))
    )
    return (
        tot.select(F.col("_n").alias("n_transitions"))
        .crossJoin(F.broadcast(states))
        .crossJoin(F.broadcast(hnext))
        .crossJoin(F.broadcast(cond))
        .select(
            "n_transitions",
            "n_states",
            "h_next_units",
            "h_cond_units",
            (F.col("h_next_units") - F.col("h_cond_units"))
            .cast("bigint")
            .alias("info_gain_units"),
        )
    )
