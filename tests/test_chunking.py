"""Sliding-window chunking (operators/chunking.py): hand-computed windows."""

import pytest

from kgforge.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_windows_and_overlap(spark):
    # 10 tokens, size 4, overlap 2 -> stride 2, n_chunks = 1+ceil(6/2) = 4
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    got = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents(
            _docs(spark, [(1, text)]), chunk_size=4, overlap=2
        ).collect()
    )
    assert got == [
        (0, 4, "t1 t2 t3 t4"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t5 t6 t7 t8"),
        (3, 4, "t7 t8 t9 t10"),
    ]


def test_short_doc_single_chunk_and_blank_dropped(spark):
    got = chunk_documents(
        _docs(spark, [(1, "a b"), (2, "   "), (3, "x")]), chunk_size=4, overlap=1
    ).collect()
    by_doc = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text) for r in got}
    assert by_doc == {(1, 0): (2, "a b"), (3, 0): (1, "x")}


def test_ragged_tail_chunk(spark):
    # 7 tokens, size 4, overlap 2 -> stride 2, n_chunks = 1+ceil(3/2)=3;
    # last window starts at token 5 and holds 3 tokens
    got = sorted(
        (r.chunk_id, r.n_tokens)
        for r in chunk_documents(
            _docs(spark, [(1, "a b c d e f g")]), chunk_size=4, overlap=2
        ).collect()
    )
    assert got == [(0, 4), (1, 4), (2, 3)]


def test_every_token_covered_no_gaps(spark):
    # windows tile the doc: union of [start, start+size) covers 1..n
    n, size, ov = 23, 5, 2
    text = " ".join(f"w{i}" for i in range(1, n + 1))
    rows = chunk_documents(_docs(spark, [(1, text)]), chunk_size=size, overlap=ov).collect()
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(1, n + 1)}


def test_rejects_overlap_ge_size(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, overlap=4)
