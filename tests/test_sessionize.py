"""Stateful-streaming sessionization tests (applyInPandasWithState over
transcript turns): gap-based session assembly, watermark-exact close,
out-of-order coalescing, bounded state."""

import os

import pandas as pd
import pytest

from quickwit_spark.streaming.sessionize import _sweep_merge, sessionize_conversations


def test_sweep_merge_coalesces_and_bridges():
    gap = 600
    # two far-apart runs stay apart
    assert _sweep_merge([(100, 200, 2), (900, 900, 1)], gap) == [(100, 200, 2), (900, 900, 1)]
    # a late event between them bridges all three into one session
    assert _sweep_merge([(100, 200, 2), (900, 900, 1), (500, 500, 1)], gap) == [(100, 900, 4)]
    # an event inside an existing run just increments the count
    assert _sweep_merge([(100, 700, 3), (400, 400, 1)], gap) == [(100, 700, 4)]
    assert _sweep_merge([], gap) == []


def _write_turn_file(path: str, rows: list[tuple[str, int]]):
    pdf = pd.DataFrame(rows, columns=["conv_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    pdf.to_parquet(path)


def test_streaming_sessions_close_on_watermark(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1): sessions split on the
    gap, close only once the watermark passes end+gap (including via the
    event-time timeout on the final empty batch), and a still-open
    conversation is NOT emitted."""
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: c1 has a 3-turn run (gaps <= 600), c2 a singleton
    _write_turn_file(str(src / "a.parquet"), [("c1", 1000), ("c1", 1300), ("c1", 1700), ("c2", 1000)])
    # batch 2: c1 starts a second session; watermark -> 9000 closes batch-1 runs
    _write_turn_file(str(src / "b.parquet"), [("c1", 9000)])
    # batch 3: far-future turn advances the watermark past 9000+600
    _write_turn_file(str(src / "c.parquet"), [("c3", 50000)])

    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    schema = StructType([StructField("conv_id", StringType()), StructField("ts", TimestampType())])
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
    sessions = sessionize_conversations(stream, gap_secs=600, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("qw_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        (r["conv_id"], int(r["session_start"].timestamp()), int(r["session_end"].timestamp())): r["n_turns"]
        for r in spark.sql("select * from qw_sessions").collect()
    }
    assert rows == {
        ("c1", 1000, 1700): 3,  # gap-assembled, closed by watermark
        ("c2", 1000, 1000): 1,
        ("c1", 9000, 9000): 1,  # closed by the event-time timeout
    }
    # c3's session is still open (watermark never passed 50000+600): not emitted
    assert not any(c == "c3" for c, _, _ in rows)


def _batch_oracle(events: list[tuple[str, int]], gap: int) -> dict:
    """Reference semantics: per conv, sort ts, split on gap, aggregate."""
    from collections import defaultdict

    by_conv = defaultdict(list)
    for c, t in events:
        by_conv[c].append(t)
    out = {}
    for c, ts in by_conv.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                out[(c, start, prev)] = n
                start, n = t, 0
            n += 1
            prev = t
        out[(c, start, prev)] = n
    return out


def test_sessionize_differential_random(spark, tmp_path):
    """Differential vs the batch oracle: random events split into random
    micro-batches (arbitrary arrival order) must yield the oracle's exact
    session set once a far-future sentinel closes everything.  The
    watermark is set larger than the whole event span, so no event is ever
    dropped as late and arrival order is irrelevant — the operator's
    interval-sweep state merging has to reassemble the same sessions."""
    import random

    rng = random.Random(0xC0FFEE)
    gap = 600
    for case in range(6):
        events = [
            (f"c{rng.randrange(4)}", rng.randrange(0, 20_000))
            for _ in range(rng.randrange(1, 40))
        ]
        # random partition into 1..4 files, random order (late arrivals!)
        shuffled = events[:]
        rng.shuffle(shuffled)
        n_files = rng.randrange(1, 5)
        chunks = [shuffled[i::n_files] for i in range(n_files)]
        chunks = [c for c in chunks if c]
        chunks.append([("sentinel", 10_000_000)])  # closes every real session
        src = tmp_path / f"src{case}"
        src.mkdir()
        for i, chunk in enumerate(chunks):
            _write_turn_file(str(src / f"f{i}.parquet"), chunk)

        from pyspark.sql.types import StringType, StructField, StructType, TimestampType

        schema = StructType(
            [StructField("conv_id", StringType()), StructField("ts", TimestampType())]
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
        )
        q = (
            sessionize_conversations(stream, gap_secs=gap, watermark="30000 seconds")
            .writeStream.format("memory")
            .queryName(f"qw_sess_diff{case}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt{case}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["conv_id"], int(r["session_start"].timestamp()), int(r["session_end"].timestamp())): r["n_turns"]
            for r in spark.sql(f"select * from qw_sess_diff{case}").collect()
        }
        assert got == _batch_oracle(events, gap), f"case {case}: {sorted(events)}"


def test_streaming_sessions_exactly_once_restart(spark, tmp_path):
    """Restart on the same checkpoint re-emits nothing; new data continues
    from the persisted state (Spark state store + offsets)."""
    src = tmp_path / "src"
    src.mkdir()
    _write_turn_file(str(src / "a.parquet"), [("c1", 1000), ("c1", 1200)])
    _write_turn_file(str(src / "b.parquet"), [("c1", 9000)])

    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    schema = StructType([StructField("conv_id", StringType()), StructField("ts", TimestampType())])

    def drain(qname):
        got: list[tuple] = []
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
        q = (
            sessionize_conversations(stream, gap_secs=600, watermark="0 seconds")
            .writeStream.foreachBatch(
                lambda bdf, bid: got.extend(tuple(r) for r in bdf.collect())
            )
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return got

    first = drain("qw_sess_r1")
    assert len(first) == 1  # only (c1, 1000..1200) closed; 9000 still open
    # restart with no new data: nothing re-emitted
    assert drain("qw_sess_r2") == []
    # a far-future turn closes the open 9000-session on the next drain
    _write_turn_file(str(src / "c.parquet"), [("c9", 99000)])
    third = drain("qw_sess_r3")
    assert [(r[0], int(r[1].timestamp()), int(r[2].timestamp()), r[3]) for r in third] == [
        ("c1", 9000, 9000, 1)
    ]


def test_sessions_are_timezone_invariant(spark, tmp_path):
    """Session close is watermark-exact in TRUE event time regardless of
    spark.sql.session.timeZone.  Regression: the UDF compared session-tz
    local epochs against the UTC watermark, closing sessions hours early
    (or late) on any non-UTC session timezone."""
    src = tmp_path / "src"
    src.mkdir()
    _write_turn_file(str(src / "a.parquet"), [("c1", 1000), ("c1", 1300), ("c1", 1700), ("c2", 1000)])
    _write_turn_file(str(src / "b.parquet"), [("c1", 9000)])
    _write_turn_file(str(src / "c.parquet"), [("c3", 50000)])

    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    schema = StructType([StructField("conv_id", StringType()), StructField("ts", TimestampType())])
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
        sessions = sessionize_conversations(stream, gap_secs=600, watermark="0 seconds")
        q = (
            sessions.writeStream.format("memory")
            .queryName("qw_sessions_tz")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tz"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # the parquet fixtures carry WALL-CLOCK timestamps (NTZ), so under a
        # non-UTC session tz the whole timeline shifts together; the
        # invariant is that sessions come out at the SAME wall-clock values
        # and with the same close decisions as the UTC run.  Pre-fix, the
        # local-epoch vs UTC-watermark skew closed c3's still-open session
        # (and armed timeouts 8h off)
        wall = lambda e: pd.Timestamp(e, unit="s")  # noqa: E731
        rows = {
            (r["conv_id"], pd.Timestamp(r["session_start"]), pd.Timestamp(r["session_end"])): r["n_turns"]
            for r in spark.sql("select * from qw_sessions_tz").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert rows == {
        ("c1", wall(1000), wall(1700)): 3,
        ("c2", wall(1000), wall(1000)): 1,
        ("c1", wall(9000), wall(9000)): 1,
    }
