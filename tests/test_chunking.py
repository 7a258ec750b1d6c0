"""Fixed-window document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from kenlm_spark.operators.chunking import chunk_documents


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_window_boundaries_and_coverage(spark):
    df = spark.createDataFrame(
        [
            (0, _toks(5)),      # under max_tokens: one chunk
            (1, _toks(12)),     # exactly max_tokens: one chunk
            (2, _toks(13)),     # one past: second chunk starts at step=8
            (3, _toks(30)),     # several chunks
            (4, ""),            # empty: no chunks
            (5, None),          # null: no chunks
            (6, _toks(3)),      # shorter than overlap: still one chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=12, overlap=4)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    )
    by_doc: dict = {}
    for d, i, t, n in rows:
        by_doc.setdefault(d, []).append((i, t.split(" "), n))
    assert set(by_doc) == {0, 1, 2, 3, 6}  # empty/null docs emit nothing
    assert len(by_doc[0]) == 1 and by_doc[0][0][2] == 5
    assert len(by_doc[1]) == 1 and by_doc[1][0][2] == 12
    # 13 tokens: chunk 0 = t0..t11, chunk 1 = t8..t12 (5 tokens, 4 overlap)
    assert [n for _, _, n in by_doc[2]] == [12, 5]
    assert by_doc[2][1][1][0] == "t8" and by_doc[2][1][1][-1] == "t12"
    # invariants on every doc: stride positions, full coverage, no gaps
    for d, chunks in by_doc.items():
        total = {0: 5, 1: 12, 2: 13, 3: 30, 6: 3}[d]
        seen = set()
        for i, toks, n in chunks:
            assert n == len(toks) <= 12
            start = i * 8
            assert toks == [f"t{j}" for j in range(start, min(start + 12, total))]
            seen.update(range(start, min(start + 12, total)))
        assert seen == set(range(total))  # every token lands in a chunk
        # no chunk fully contained in its predecessor
        assert all(i * 8 + 12 > (i - 1) * 8 + 12 for i, _, _ in chunks if i)


def test_stream_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is a pure map-side projection, so it is
    stream-legal as-is: the streaming result must equal the batch one."""
    from kenlm_spark.streaming.jobs import run_available_now

    rows = [(i, _toks(5 + 7 * i)) for i in range(8)] + [(99, "")]
    src = str(tmp_path / "docs_dir")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in run_available_now(
            chunk_documents(stream, max_tokens=12, overlap=4), "chunk_test"
        )
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            spark.read.parquet(src), max_tokens=12, overlap=4
        ).collect()
    }
    assert got == want and len(want) > 8  # multi-chunk docs present


def test_param_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=-1)
