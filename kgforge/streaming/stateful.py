"""Custom stateful streaming operators (applyInPandasWithState).

The reference is a pure batch parser (SURVEY §2.9); these are the engine's
own incremental surfaces for the training-data pipeline:

- ``streaming_first_seen``: cross-micro-batch EXACT dedup — emit each
  distinct document text exactly once over the life of the stream, however
  the duplicates are spread across batches. State is one tiny row (seen
  flag + canonical id) per content digest; grouping by the digest gives
  the same shuffle key the batch ``exact_dedup`` aggregates on, so a
  digest's duplicates always land on the owning state partition.

Scale notes: state size is O(distinct texts), 40-ish bytes per digest —
bounded by content cardinality, not stream length; a TTL can cap it for
windowed-dedup semantics (pass ``ttl_minutes``). Output mode is append
(emitted rows are final the moment they are emitted).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_STATE = StructType([StructField("seen", BooleanType())])


def streaming_first_seen(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: one output row per distinct ``text_col`` value
    across ALL micro-batches (the min id within the first batch that carries
    the digest wins, matching the batch ``exact_dedup`` tiebreak)."""

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # digest already emitted in an earlier batch: swallow duplicates
            for _ in pdfs:
                pass
            return
        best_id, best_text = None, None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf["doc_id"].idxmin()
            if best_id is None or pdf["doc_id"][i] < best_id:
                best_id = int(pdf["doc_id"][i])
                best_text = pdf["text"][i]
        if best_id is None:
            return
        state.update((True,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({"digest": [key[0]], "doc_id": [best_id], "text": [best_text]})

    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def streaming_sessions(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_epoch",
) -> DataFrame:
    """Custom stateful streaming sessionizer (applyInPandasWithState):
    event-time session windows with a ``gap_seconds`` inactivity gap,
    closed sessions emitted in append mode the moment a later event
    proves the gap — the streaming twin of the batch ``sessionize``
    operator, with the SAME (start, end, count) semantics.

    Event-time driven, not wall-clock: a session closes when a LATER
    EVENT of the same user arrives more than the gap after the session's
    last event (the in-flight final session stays in state; a TTL is the
    production pattern for flushing it, kept out here so emission stays
    deterministic for the oracle-style tests). Events may arrive
    unordered WITHIN a micro-batch (sorted per group before folding);
    cross-batch late events that predate the current session extend it
    only if they fall inside the gap — true out-of-order reprocessing
    needs watermarked event-time state, documented as the upgrade path.

    Scale shape: grouping key is the user — state is one 24-byte row per
    ACTIVE user, shuffles co-partition with any downstream per-user join;
    per-batch work is a sort of that user's batch slice only.
    """

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        ts_all = []
        for pdf in pdfs:
            if len(pdf):
                ts_all.extend(int(t) for t in pdf["ts_epoch"])
        if not ts_all:
            return
        ts_all.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            elif t >= last:
                last, n = t, n + 1
            else:
                # late event inside the current session window: count it
                n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    keyed = events_stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("long").alias("ts_epoch"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
