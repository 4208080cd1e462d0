"""Custom stateful streaming operators (applyInPandasWithState).

The reference is a pure batch parser (SURVEY §2.9); these are the engine's
own incremental surfaces for the training-data pipeline:

- ``streaming_first_seen``: cross-micro-batch EXACT dedup — emit each
  distinct document text exactly once over the life of the stream, however
  the duplicates are spread across batches. State is one tiny row (seen
  flag + canonical id) per content digest; grouping by the digest gives
  the same shuffle key the batch ``exact_dedup`` aggregates on, so a
  digest's duplicates always land on the owning state partition.
- ``streaming_sessions``: event-time sessionization with an inactivity
  gap, state = one (start, last, n) row per active user.
- ``streaming_neardup_edges``: cross-micro-batch MinHash-LSH near-dup
  EDGE stream, state keyed by (band, bucket) — the stateful sibling of
  ``near_dedup_each_batch``; periodic connected-components over the edge
  log reproduces ``dedup_pages(mode='near')``.

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
    ArrayType,
    BooleanType,
    DoubleType,
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


NEARDUP_OUTPUT = StructType(
    [
        StructField("a", StringType()),
        StructField("b", StringType()),
        StructField("jaccard", DoubleType()),
    ]
)

_NEARDUP_STATE = StructType(
    [
        StructField("ids", ArrayType(StringType())),
        StructField("grams", ArrayType(ArrayType(LongType()))),
    ]
)


def streaming_neardup_edges(
    pages_stream: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 64,
    id_col: str = "url",
    text_col: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Cross-micro-batch MinHash-LSH near-duplicate EDGE stream: emit
    (a, b, jaccard) with a < b for every verified near-duplicate pair,
    however the two documents are spread across micro-batches (a doc in
    batch 7 matches a doc that arrived in batch 1 — per-batch re-blocking
    misses exactly these).

    This is the pure-applyInPandasWithState sibling of
    ``near_dedup_each_batch`` (pipeline.py): that one emits KEPT PAGES,
    which forces per-doc verdicts across N band groups and therefore
    foreachBatch; emitting EDGES needs no cross-band combine (every
    band's matches are final rows), so a single stateful operator
    suffices — no watermark, no chained state.

    Same math as the batch path, term for term, so the edge set equals the
    batch ``minhash_duplicate_pairs`` candidates' verified edges on the
    same corpus: signatures via :func:`minhash_sig_col`, band buckets via
    the identical xxhash64(band-slice, band) expression as
    :func:`lsh_candidate_pairs`, exact Jaccard over the identical
    :func:`_hashed_ngram_set` gram sets (computed map-side BEFORE the
    stateful op — the state function never re-tokenizes). Downstream is
    the standard lambda shape: periodic connected-components over the
    accumulated edge log collapses clusters exactly like
    ``dedup_pages(mode='near')`` (the equivalence test does precisely
    that).

    State is keyed by (band, bucket) — the same shuffle key the batch
    banding aggregates on — holding each member's id + hashed gram set.
    Divergences from batch, both deliberate:

    - the same pair can be emitted by several bands (batch dedups
      candidates with ``distinct()``); consumers of an append-mode edge
      log dedup on read, so the operator does not pay a second stateful
      stage for it.
    - ``max_bucket`` FREEZES a bucket once it is full (no new members, no
      new pairs) where batch drops oversized buckets entirely — a stream
      cannot unemit the pairs it produced before the bucket went hot. The
      cap bounds state and per-batch work at O(max_bucket) per bucket
      either way.

    Scale notes: state weight is O(members x gram-set) per bucket — the
    exact-verify-grade choice (oracle parity with batch). The production
    trim when gram sets are too heavy for the state store is to keep only
    the 8*num_hashes-byte signatures and emit signature-ESTIMATED jaccard
    (the batch ``sig_prefilter`` estimator); same operator shape, smaller
    state, approximate edge weights. ``ttl_minutes`` gives windowed-dedup
    semantics exactly like :func:`streaming_first_seen`.
    """
    from ..operators.canonicalize import _hashed_ngram_set, minhash_sig_col

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    rows_per_band = num_hashes // bands

    sigs = pages_stream.select(
        F.col(id_col).cast("string").alias("id"),
        minhash_sig_col(F.col(text_col), num_hashes).alias("sig"),
        _hashed_ngram_set(F.col(text_col), 3).alias("grams"),
    )
    banded = sigs.select(
        "id",
        "grams",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            "_",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        incoming = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                incoming.append((str(row["id"]), frozenset(int(g) for g in row["grams"])))
        if not incoming:
            return
        # deterministic fold order within the batch (files can arrive in
        # any order; id order makes the frozen-bucket membership stable)
        incoming.sort(key=lambda t: t[0])
        if state.exists:
            ids, gram_lists = state.get
            members = [(i, frozenset(g)) for i, g in zip(ids, gram_lists)]
        else:
            members = []
        seen = {i for i, _ in members}
        edges = []
        for new_id, new_grams in incoming:
            if new_id in seen:
                continue  # replayed row (source retry): state already has it
            if len(members) >= max_bucket:
                break  # bucket frozen: bounded state, bounded pair fan-out
            for old_id, old_grams in members:
                inter = len(new_grams & old_grams)
                union = len(new_grams | old_grams)
                j = inter / union if union else 0.0
                if j >= threshold:
                    a, b = sorted((new_id, old_id))
                    edges.append((a, b, j))
            members.append((new_id, new_grams))
            seen.add(new_id)
        state.update(([i for i, _ in members], [sorted(g) for _, g in members]))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if edges:
            yield pd.DataFrame(edges, columns=["a", "b", "jaccard"])

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        outputStructType=NEARDUP_OUTPUT,
        stateStructType=_NEARDUP_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
