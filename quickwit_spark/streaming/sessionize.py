"""Stateful streaming sessionization — the custom-stateful-operator shape
(Structured Streaming ``applyInPandasWithState``) over transcript turns.

The reference has no session concept (its streaming surface is the
indexing pipeline, SURVEY.md §2.1/§2.6); this operator is part of the
training-data pipeline extensions: a transcript firehose is grouped into
*conversation sessions* (maximal runs of turns whose inter-turn gap stays
under ``gap_secs``), the canonical unit for transcript-level dedup /
quality / sampling downstream.

Correctness contract (watermark-exact, not heuristic):

* State per ``conv_id`` is a bounded set of OPEN runs ``(start, end,
  n_turns)`` — never the turns themselves, so state size is O(open
  sessions), not O(events).
* New events merge into the run set by interval sweep: any two runs (or
  event-runs) within ``gap_secs`` coalesce, so out-of-order arrivals
  within the watermark bound land in the right session and can even
  bridge two runs into one.
* A run is emitted as a CLOSED session only when the event-time watermark
  has passed ``end + gap_secs`` — the only point where Spark guarantees no
  more events can join it.  In-batch gaps alone never close a session
  (a bounded-late row between two runs could still arrive).
* The event-time timeout is armed at the earliest open run's close point,
  so sessions close even for conversations that go silent.

Append-mode output: one row per closed session.  Conversations still open
when the stream ends stay in state (standard Structured Streaming
semantics for append-mode stateful ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_turns", LongType()),
    ]
)

# open runs as parallel arrays: (starts, ends, n_turns), epoch seconds
_STATE_SCHEMA = StructType(
    [
        StructField("starts", StringType()),
        StructField("ends", StringType()),
        StructField("counts", StringType()),
    ]
)


def _pack(runs: list[tuple[int, int, int]]) -> tuple[str, str, str]:
    return (
        ",".join(str(r[0]) for r in runs),
        ",".join(str(r[1]) for r in runs),
        ",".join(str(r[2]) for r in runs),
    )


def _unpack(state_tuple) -> list[tuple[int, int, int]]:
    starts, ends, counts = state_tuple
    if not starts:
        return []
    return [
        (int(s), int(e), int(c))
        for s, e, c in zip(starts.split(","), ends.split(","), counts.split(","))
    ]


def _sweep_merge(runs: list[tuple[int, int, int]], gap: int) -> list[tuple[int, int, int]]:
    """Coalesce runs whose gap is <= ``gap`` (input need not be sorted)."""
    out: list[tuple[int, int, int]] = []
    for s, e, c in sorted(runs):
        if out and s - out[-1][1] <= gap:
            ps, pe, pc = out[-1]
            out[-1] = (ps, max(pe, e), pc + c)
        else:
            out.append((s, e, c))
    return out


def sessionize_conversations(
    turns: DataFrame,
    gap_secs: int = 1800,
    watermark: str = "10 minutes",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming DataFrame of transcript turns -> closed conversation
    sessions (conv_id, session_start, session_end, n_turns), append mode.

    ``turns`` must be a streaming DataFrame with at least (conv_col string,
    ts_col timestamp).  ``watermark`` bounds how late a turn may arrive and
    therefore how long a session stays provisional after its last turn.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = int(gap_secs)
    # applyInPandasWithState hands timestamp columns to the UDF as naive
    # pandas datetimes in the SESSION timezone, while getCurrentWatermarkMs
    # is true-UTC epoch ms — comparing the two bases closes sessions hours
    # early/late whenever spark.sql.session.timeZone is not UTC.  So the
    # true epoch is computed JVM-side (unix_timestamp, tz-exact) and the
    # UDF never touches the naive datetimes; emitted timestamps convert
    # back UTC→session-tz explicitly (unambiguous even across DST).
    tz = turns.sparkSession.conf.get("spark.sql.session.timeZone")

    def fn(key, pdf_iter, state: GroupState):
        conv = key[0]

        def emit(runs):
            def local(vals):
                return (
                    pd.to_datetime(vals, unit="s", utc=True)
                    .tz_convert(tz)
                    .tz_localize(None)
                )

            return pd.DataFrame(
                {
                    "conv_id": conv,
                    "session_start": local([r[0] for r in runs]),
                    "session_end": local([r[1] for r in runs]),
                    "n_turns": pd.Series([r[2] for r in runs], dtype="int64"),
                }
            )

        runs = _unpack(state.get) if state.exists else []
        if not state.hasTimedOut:
            ts = np.concatenate(
                [pdf["__ts_epoch"].to_numpy(dtype=np.int64) for pdf in pdf_iter]
            ).astype(np.int64)
            runs = _sweep_merge(runs + [(int(t), int(t), 1) for t in ts], gap)
        # close every run the watermark has STRICTLY passed; keep the rest
        # open.  Strict `<` matches the merge rule `s - end <= gap`: an
        # event at ts == end+gap is still admissible at watermark == end+gap
        # (Spark keeps events at exactly the watermark) and must coalesce
        # into the run, not start a second session
        wm_sec = state.getCurrentWatermarkMs() // 1000
        closed = [r for r in runs if r[1] + gap < wm_sec]
        open_ = [r for r in runs if r[1] + gap >= wm_sec]
        if open_:
            state.update(_pack(open_))
            # earliest close point, clamped strictly past the watermark (a
            # run held open at exactly end+gap == wm closes on the next tick)
            state.setTimeoutTimestamp(
                max(
                    min(r[1] for r in open_) * 1000 + gap * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        else:
            state.remove()
        yield emit(closed)

    return (
        turns.withColumn("__ts_epoch", F.unix_timestamp(F.col(ts_col)))
        .withWatermark(ts_col, watermark)
        .groupBy(conv_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
