"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch twin (``operators.events.sessionize``) assigns session numbers
with two window functions; a stream cannot window over unbounded history,
so the streaming form keeps one tiny state record per user — (last event
ts, current session number) — and advances it per micro-batch. This is the
canonical "custom operator Spark lacks" shape from the build brief:
grouped Arrow batches + explicit GroupState, no driver-side loops. State
is partitioned by ``user_id`` so it scales horizontally with the key
space; per-key state is O(1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_seq", T.LongType()),
    ]
)

# (last event epoch-seconds, current session number)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_sec", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)


def _make_session_fn(gap_minutes: int):
    gap_s = gap_minutes * 60

    def assign_sessions(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ts, seq = state.get if state.exists else (None, 0)
        for pdf in pdf_iter:
            # within a micro-batch events may arrive unordered; the
            # (ts, event_id) sort mirrors the batch operator's window order
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_sec = (
                pdf["ts"].astype("int64") // 1_000_000_000
            ).to_numpy()
            seqs = []
            for t in ts_sec:
                if last_ts is None or t - last_ts > gap_s:
                    seq += 1
                seqs.append(seq)
                last_ts = int(t)
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "session_seq": pd.array(seqs, dtype="int64"),
                }
            )
        state.update((int(last_ts) if last_ts is not None else 0, int(seq)))

    return assign_sessions


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: one GroupState record per user, session
    splits on gaps > ``gap_minutes`` — semantics identical to the batch
    ``sessionize`` when events arrive in order."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
