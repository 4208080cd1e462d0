from .pipeline import (
    entail_each_batch,
    latest_entailed,
    near_dedup_each_batch,
    near_dedup_increment,
    stream_pages,
    streaming_predicate_counts,
    streaming_triples,
    validate_each_batch,
)

__all__ = [
    "stream_pages",
    "streaming_triples",
    "streaming_predicate_counts",
    "validate_each_batch",
    "near_dedup_each_batch",
    "near_dedup_increment",
    "entail_each_batch",
    "latest_entailed",
]
