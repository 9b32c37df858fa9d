"""Event-stream operators — gap sessionization and windowed rollups.

A web-scale ingestion pipeline carries interaction/telemetry streams next
to the document corpus (the driver tables ship an ``events`` table:
event_id, ts, user_id, event_type, value, props). These operators are the
batch form of the classic stateful streaming computations; both compile
to pure Catalyst window/aggregate plans with exact ANSI-SQL oracles. The
streaming twin of :func:`sessionize` is Structured Streaming's
``session_window`` (or ``applyInPandasWithState`` for richer state) over
the same gap rule — the batch operator is the replayable backfill of that
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch microseconds for either timestamp flavor. Parquet stamps
    written without the adjusted-to-UTC flag surface as TIMESTAMP_NTZ
    (naive), where ``unix_micros`` is a type error and a cast to
    TIMESTAMP would silently re-interpret through the session timezone.
    Pure FIELD EXTRACTION (unix_date + hour/minute/second) is
    timezone-free by construction and matches DuckDB's ``epoch_us`` of
    the same naive value. NOT ``timestampdiff(MICROSECOND, ntz_epoch,
    ts)``: that converts both NTZ operands through the session timezone
    internally, so under a DST-observing zone a naive time inside the
    spring-forward hole (e.g. America/New_York 2024-03-10 02:00) shifts
    by +1h — measured, and pinned by the DST parity test. Instants
    (TIMESTAMP) take ``unix_micros``, which is already
    timezone-independent."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            f"unix_date(cast(`{ts_col}` AS date)) * 86400000000L"
            f" + extract(HOUR FROM `{ts_col}`) * 3600000000L"
            f" + extract(MINUTE FROM `{ts_col}`) * 60000000L"
            f" + cast(extract(SECOND FROM `{ts_col}`) * 1000000 AS bigint)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the gap to the
    user's previous event exceeds ``gap_s`` seconds (strictly greater —
    events exactly ``gap_s`` apart stay in one session).

    Output: one row per (user_id, session_n) with session_start_us /
    session_end_us (epoch microseconds — integers, so the oracle compare
    is timezone-proof), n_events, and total_value (the per-event values
    rounded to 2 decimals and summed as DECIMAL(18,2): exact,
    order-independent addition, same discipline as lm_perplexity).
    Cross-engine caveat: the round(value, 2) step is engine-identical
    only when the doubles are not exact .xx5 ties (Spark rounds HALF_UP
    on the shortest decimal repr; DuckDB half-away on the binary value)
    — monetary-style sources with <= 2 decimal places, like the driver
    fixture, are always safe.

    Plan shape: ONE shuffle. The lag + running-sum windows hash-partition
    by user_id, and the closing groupBy on (user_id, session_n) is
    satisfied by that same partitioning (subset key), so Catalyst chains
    window -> window -> aggregate inside a single exchange. Per-user
    state never crosses partitions; skewed users (bots with 10^6 events)
    cost one partition's sort, not a replan — cap upstream if that
    matters. Deterministic: ordering ties on (ts, event_id).
    """
    gap_us = int(gap_s) * 1_000_000
    # windows run over the POST-alias frame, so partition/order on the
    # canonical names — the caller's user_col/id_col no longer exist there
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = (
        df.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col).alias("event_id"),
            _epoch_us(df, ts_col).alias("_us"),
            F.round(F.col(value_col), 2).cast("decimal(18,2)").alias("_val"),
        )
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull()
             | (F.col("_us") - F.col("_prev") > gap_us)).cast("int"),
        )
        .withColumn("session_n", F.sum("_new").over(run))
    )
    return (
        ev.groupBy("user_id", "session_n")
        .agg(
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("_val").cast("double"), 2).alias("total_value"),
        )
    )


def sessionize_stream(
    stream: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Structured Streaming twin of :func:`sessionize`: native
    ``session_window(ts, gap)`` state with a watermark; the caller
    attaches the sink (memory/kafka/foreachBatch). Same output columns
    as the batch operator, so a backfill and the live stream are
    interchangeable.

    Exact-gap parity: Spark's session window spans ``[ts, ts+gap)`` and
    merges on OVERLAP, so with a raw ``gap_s`` window two events exactly
    ``gap_s`` apart would split here but share a session under the batch
    operator's strictly-greater rule. The stream therefore widens its
    window by exactly 1 microsecond (``gap_s`` + 1 µs): events ``gap_s``
    apart now overlap-merge, events ``gap_s`` + 1 µs apart still split —
    bit-identical to the batch rule at Spark's microsecond timestamp
    resolution. Pinned by the parity test with planted exactly-gap
    boundary events.

    State/scale: per-(user, open-session) state only; the watermark
    (default 2x gap) closes sessions and evicts state, so memory is
    bounded by concurrently-active users, not history.
    """
    gap = f"{int(gap_s)} seconds 1 microseconds"
    wm = watermark_delay or f"{int(gap_s) * 2} seconds"
    # the watermark/session-window machinery accepts only TIMESTAMP.
    # Rebuild the state key from the timezone-proof epoch micros
    # (timestamp_micros gives an absolute instant — epoch-is-epoch) rather
    # than casting NTZ -> TIMESTAMP, which re-interprets the naive value
    # through the session timezone: in a DST-observing zone that shift is
    # NOT constant (spring-forward inflates a straddling gap by 1h;
    # fall-back is non-monotonic), silently diverging from the batch
    # sessionize. Every OUTPUT column also comes from the same epoch
    # arithmetic, so results are timezone-free end to end.
    work = stream.select(
        F.col(user_col).alias("user_id"),
        F.timestamp_micros(_epoch_us(stream, ts_col)).alias("_ts"),
        F.round(F.col(value_col), 2).cast("decimal(18,2)").alias("_val"),
        _epoch_us(stream, ts_col).alias("_us"),
    )
    return (
        work.withWatermark("_ts", wm)
        .groupBy(F.session_window("_ts", gap).alias("_w"), F.col("user_id"))
        .agg(
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("_val").cast("double"), 2).alias("total_value"),
        )
        .select("user_id", "session_start_us", "session_end_us",
                "n_events", "total_value")
    )


def event_rates(
    df: DataFrame,
    window_s: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup per event type: event count and decimal-
    exact value sum per (window_start_us, event_type) — the batch form of
    a ``groupBy(window(ts), type)`` streaming aggregation. One map-side-
    combined aggregate; the shuffle key (window, type) is time-bounded,
    so no key grows with history length.
    """
    win_us = int(window_s) * 1_000_000
    us = _epoch_us(df, ts_col)
    return (
        df.select(
            # integer arithmetic (us - us % win), not floor(us/win)*win:
            # exact in both engines, no float-boundary rounding
            (us - us % win_us).alias("window_start_us"),
            F.col(type_col).alias("event_type"),
            F.round(F.col(value_col), 2).cast("decimal(18,2)").alias("_val"),
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("_val").cast("double"), 2).alias("total_value"),
        )
    )
