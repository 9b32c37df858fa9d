"""Event-stream operator tests: gap semantics, decimal sums, plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.events import event_rates, sessionize


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: events at 0s, 1800s (exactly the gap — SAME session),
        # then 3601+1800s later (new session)
        (1, _ts(0), 1, "view", 1.11),
        (2, _ts(1800), 1, "click", 2.22),
        (3, _ts(1800 + 1801), 1, "view", 3.33),
        # user 2: single event
        (4, _ts(500), 2, "error", 10.004),  # rounds to 10.0
        # user 3: tie-breaking on event_id at identical ts
        (5, _ts(100), 3, "view", 1.0),
        (6, _ts(100), 3, "view", 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double"
    )


class TestSessionize:
    def test_gap_semantics_hand_checked(self, events):
        got = {
            (r["user_id"], r["session_n"]): r
            for r in sessionize(events, gap_s=1800).collect()
        }
        assert set(got) == {(1, 1), (1, 2), (2, 1), (3, 1)}
        s11 = got[(1, 1)]
        # gap == 1800s exactly stays in one session (strictly-greater rule)
        assert s11["n_events"] == 2 and s11["total_value"] == 3.33
        assert s11["session_end_us"] - s11["session_start_us"] == 1800 * 10**6
        s12 = got[(1, 2)]
        assert s12["n_events"] == 1 and s12["total_value"] == 3.33
        assert got[(2, 1)]["total_value"] == 10.0  # rounded before the sum
        assert got[(3, 1)]["n_events"] == 2

    def test_single_shuffle_plan(self, events):
        plan = (
            sessionize(events)._jdf.queryExecution().executedPlan().toString()
        )
        # the lag window, running session counter, and session aggregate
        # must all reuse ONE user_id exchange (subset-key satisfaction)
        assert plan.count("Exchange hashpartitioning") == 1

    def test_matches_oracle_fixture(self, spark):
        # the sf0.001 driver fixture: every event lands in exactly one
        # session and session bounds tile the user's event timeline
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ses = sessionize(ev, gap_s=1800)
        assert (
            ses.agg(F.sum("n_events")).collect()[0][0] == ev.count()
        )
        overlap = (
            ses.alias("a").join(
                ses.alias("b"),
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.session_n") < F.col("b.session_n"))
                & (F.col("b.session_start_us")
                   <= F.col("a.session_end_us") + 1800 * 10**6),
            )
        )
        assert overlap.count() == 0  # consecutive sessions gap > 1800s


class TestEventRates:
    def test_tumbling_windows_hand_checked(self, events):
        got = {
            (r["window_start_us"], r["event_type"]): r
            for r in event_rates(events, window_s=3600).collect()
        }
        epoch0 = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp()) * 10**6
        # hour 0: views at 0s/100s/100s + click at 1800s + error at 500s
        assert got[(epoch0, "view")]["n_events"] == 3
        assert got[(epoch0, "view")]["total_value"] == round(1.11 + 1.0 + 2.0, 2)
        assert got[(epoch0, "click")]["n_events"] == 1
        # hour 1: the 3601+1800s view
        assert got[(epoch0 + 3600 * 10**6, "view")]["n_events"] == 1
        # window starts align to the hour grid
        for (w, _t) in got:
            assert w % (3600 * 10**6) == 0


class TestSessionizeProperty:
    def test_random_events_match_brute_force(self, spark):
        """1,000 random events across 20 users vs a driver-side reference:
        session boundaries, bounds, counts, and decimal-exact sums."""
        import numpy as np

        rng = np.random.default_rng(42)
        n = 1000
        users = rng.integers(0, 20, size=n)
        # gaps cluster around the 1800s boundary to hammer the edge:
        # many exactly-1800, many 1801, plus a broad spread
        gaps = rng.choice(
            [1, 60, 1799, 1800, 1801, 3600, 10], size=n
        ) * rng.integers(1, 3, size=n)
        # 2-decimal amounts, like the driver fixture: round(v, 2) is then
        # the identity, so no engine's .xx5 tie-breaking (Spark HALF_UP on
        # the shortest decimal repr, Python half-even, DuckDB half-away on
        # the binary value) can enter the comparison — the documented
        # precondition of the decimal-sum determinism contract
        values = np.round(rng.uniform(0, 100, size=n), 2)
        rows, t_user = [], {}
        for i in range(n):
            u = int(users[i])
            t_user[u] = t_user.get(u, 0) + int(gaps[i])
            rows.append((i, _ts(t_user[u]), u, "e", float(values[i])))

        # brute-force reference (dict walk, decimal sums)
        from collections import defaultdict
        from decimal import Decimal

        by_user = defaultdict(list)
        for eid, ts, u, _t, v in rows:
            by_user[u].append((ts, eid, v))
        expected = {}
        for u, evs in by_user.items():
            evs.sort()
            sn, prev = 0, None
            for ts, eid, v in evs:
                if prev is None or (ts - prev).total_seconds() > 1800:
                    sn += 1
                    expected[(u, sn)] = [ts, ts, 0, Decimal("0")]
                rec = expected[(u, sn)]
                rec[1] = ts
                rec[2] += 1
                rec[3] += Decimal(str(round(v, 2)))
                prev = ts
        want = {
            k: (
                int(v[0].replace(tzinfo=dt.timezone.utc).timestamp()) * 10**6,
                int(v[1].replace(tzinfo=dt.timezone.utc).timestamp()) * 10**6,
                v[2],
                float(round(v[3], 2)),
            )
            for k, v in expected.items()
        }

        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double"
        )
        got = {
            (r["user_id"], r["session_n"]): (
                r["session_start_us"], r["session_end_us"],
                r["n_events"], r["total_value"],
            )
            for r in sessionize(df, gap_s=1800).collect()
        }
        assert got == want


class TestSessionizeStream:
    def test_streaming_parity_with_batch(self, spark):
        """session_window streaming state over the fixture events produces
        the same sessions as the batch operator. (The fixture never has
        timestamps exactly gap apart — asserted below — so this test
        covers the bulk behavior; the exact-gap boundary is pinned
        separately by test_exact_gap_and_dst_parity with planted
        boundary events.)"""
        from frizbee_spark.operators.events import sessionize, sessionize_stream

        src = "/root/testdata/sf0.001/events.parquet"
        batch_df = spark.read.parquet(src)
        batch = {
            (r["user_id"], r["session_start_us"]): (
                r["session_end_us"], r["n_events"], r["total_value"])
            for r in sessionize(batch_df, gap_s=1800).collect()
        }
        # precondition for exact parity: no consecutive gap == exactly 1800s
        from pyspark.sql import Window as W

        us = F.unix_micros(F.col("ts").cast("timestamp")) if dict(
            batch_df.dtypes)["ts"] == "timestamp" else F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        gaps = (
            batch_df.select("user_id", us.alias("us"))
            .withColumn("prev", F.lag("us").over(
                W.partitionBy("user_id").orderBy("us")))
            .filter(F.col("us") - F.col("prev") == 1800 * 10**6)
        )
        assert gaps.count() == 0

        stream = spark.readStream.schema(batch_df.schema).parquet(
            "/root/testdata/sf0.001", pathGlobFilter="events.parquet")
        out = sessionize_stream(stream, gap_s=1800)
        q = (
            out.writeStream.format("memory").queryName("sess_parity")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["session_start_us"]): (
                r["session_end_us"], r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM sess_parity").collect()
        }
        spark.catalog.dropTempView("sess_parity")
        assert got == batch

    def test_exact_gap_and_dst_parity(self, spark, tmp_path):
        """Planted boundary events: (a) consecutive events exactly gap_s
        apart must share ONE session in the stream, matching the batch
        strictly-greater rule (the stream widens its session window by
        1 µs to turn [ts, ts+gap) overlap-merge into the same rule);
        (b) a chain of exact-gap events whose NAIVE timestamps straddle
        the America/New_York spring-forward (2024-03-10 02:00 local)
        must stay one session even when the session timezone observes
        DST — the state key is rebuilt from epoch micros, not a
        NTZ->TIMESTAMP cast that would inflate the straddling gap by 1h
        and split the session."""
        from frizbee_spark.operators.events import (
            sessionize, sessionize_stream)

        gap = 1800
        # user 1: exact-gap chain (one session), then gap+1s (new session)
        u1 = [(10, _ts(0), 1), (11, _ts(gap), 1), (12, _ts(2 * gap), 1),
              (13, _ts(2 * gap + gap + 1), 1)]
        # user 2: naive 01:00 / 01:30 / 02:00 / 02:30 on the NY
        # spring-forward morning — consecutive naive gaps of exactly
        # 1800s; 02:00 and 02:30 do not exist as NY local times, so the
        # old cast path maps them forward 1h and the 01:30->02:00
        # instant gap becomes 3600s > gap (session split = the bug)
        d = dt.datetime(2024, 3, 10)
        u2 = [(20, d + dt.timedelta(hours=1), 2),
              (21, d + dt.timedelta(hours=1, minutes=30), 2),
              (22, d + dt.timedelta(hours=2), 2),
              (23, d + dt.timedelta(hours=2, minutes=30), 2)]
        rows = [(eid, ts, u, "e", 1.0) for eid, ts, u in u1 + u2]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double")
        src = str(tmp_path / "boundary_events")
        df.write.parquet(src)

        batch_df = spark.read.parquet(src)
        batch = {
            (r["user_id"], r["session_start_us"]): (
                r["session_end_us"], r["n_events"], r["total_value"])
            for r in sessionize(batch_df, gap_s=gap).collect()
        }
        # ground truth: u1 -> two sessions (3 + 1 events), u2 -> ONE
        counts = sorted((u, n) for (u, _s), (_e, n, _v) in batch.items())
        assert counts == [(1, 1), (1, 3), (2, 4)]

        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            stream = spark.readStream.schema(batch_df.schema).parquet(src)
            q = (
                sessionize_stream(stream, gap_s=gap)
                .writeStream.format("memory").queryName("sess_boundary")
                .outputMode("complete").trigger(availableNow=True).start()
            )
            q.awaitTermination(120)
            got = {
                (r["user_id"], r["session_start_us"]): (
                    r["session_end_us"], r["n_events"], r["total_value"])
                for r in spark.sql("SELECT * FROM sess_boundary").collect()
            }
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
            spark.catalog.dropTempView("sess_boundary")
        assert got == batch

    def test_non_default_column_names(self, spark):
        """sessionize's windows run over the post-alias frame, so
        caller-renamed user/id/ts/value columns must resolve (they once
        raised AnalysisException because the window partitioned on the
        caller's original names)."""
        rows = [(1, _ts(0), 1, 1.0), (2, _ts(1800), 1, 2.0),
                (3, _ts(5000), 1, 3.0), (4, _ts(10), 2, 4.0)]
        base = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, value double")
        renamed = base.selectExpr(
            "event_id AS eid", "ts AS stamp", "user_id AS uid", "value AS v")
        want = sorted(map(tuple, sessionize(base, gap_s=1800).collect()))
        got = sorted(map(tuple, sessionize(
            renamed, gap_s=1800, user_col="uid", ts_col="stamp",
            id_col="eid", value_col="v").collect()))
        assert got == want and len(got) == 3
