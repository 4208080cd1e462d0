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
