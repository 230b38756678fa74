"""Document chunking + deterministic split assignment
(operators.text, round 5): chunk fan-out verified against a pure-Python
reference; split assignment verified deterministic, id-stable, and
distributionally sane."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import text as T
from snowflake_azure_etl_spark.sources.registry import load_tables


def py_chunks(text: str, size: int, stride: int) -> list[str]:
    toks = text.split(" ")
    n = len(toks)
    extra = max(n - size, 0)
    n_ch = 1 + -(-extra // stride)  # ceil
    return [" ".join(toks[i * stride:i * stride + size])
            for i in range(n_ch)]


def py_split(doc_id: int, train: int = 80, val: int = 10) -> str:
    b = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8], 16) % 100
    return "train" if b < train else ("val" if b < train + val else "test")


@pytest.mark.parametrize("size,stride", [(8, 6), (128, 96), (5, 5)])
def test_chunk_documents_matches_python(spark, sf_dir, size, stride):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(50)
    got = {}
    for r in T.chunk_documents(docs, size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_text, r.chunk_tokens))
    for r in docs.collect():
        want = py_chunks(r.text, size, stride)
        chunks = sorted(got[r.doc_id])
        assert [c[1] for c in chunks] == want, f"doc {r.doc_id}"
        assert all(c[2] == len(c[1].split(" ")) for c in chunks)
        # every chunk except possibly the last is full-size
        assert all(c[2] == size for c in chunks[:-1]) or len(want) == 1


def test_chunks_cover_all_tokens(spark, sf_dir):
    """stride <= size ⇒ concatenated chunk windows cover every token."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(20)
    for r in docs.select("doc_id", "text",
                         T.n_chunks("text", 16, 12).alias("nc"),
                         T.n_tokens("text").alias("nt")).collect():
        last_start = (r.nc - 1) * 12
        assert last_start < r.nt  # last window starts inside the doc
        assert last_start + 16 >= r.nt  # and reaches the end


def test_split_assign_deterministic_and_python_equal(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    rows = docs.select("doc_id",
                       T.split_assign("doc_id").alias("s")).collect()
    for r in rows:
        assert r.s == py_split(r.doc_id)
    # all three splits present and roughly proportioned on 5k docs
    from collections import Counter
    c = Counter(r.s for r in rows)
    n = sum(c.values())
    assert 0.7 < c["train"] / n < 0.9
    assert c["val"] > 0 and c["test"] > 0


def test_chunk_validation():
    with pytest.raises(ValueError):
        T.chunk_texts("text", size=0)


def test_token_vocab_matches_python(spark, sf_dir):
    from collections import Counter
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(100)
    rows = docs.select("text").collect()
    total, by_doc = Counter(), Counter()
    for r in rows:
        toks = r.text.split(" ")
        total.update(toks)
        by_doc.update(set(toks))
    got = {r.token: (r.doc_freq, r.total_freq, r.rank)
           for r in T.token_vocab(docs, top_k=20).collect()}
    assert len(got) == 20
    want_order = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for rank, (tok, tf) in enumerate(want_order, start=1):
        assert got[tok] == (by_doc[tok], tf, rank), tok


def test_token_vocab_top_k_avoids_global_sort(spark, sf_dir):
    import contextlib
    import io
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    head = T.token_vocab(docs, top_k=50)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        head.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_token_vocab_full_rank_parallel_and_correct(spark, sf_dir):
    """Full-vocabulary ranking must use the range-partitioned parallel
    plan (no single-partition window) and agree with the top-k head."""
    import contextlib
    import io
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(100)
    full = T.token_vocab(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        full.explain("formatted")
    assert "rangepartitioning" in buf.getvalue().lower()
    head = {r.token: r.rank for r in T.token_vocab(docs, top_k=10).collect()}
    full_ranks = {r.token: r.rank for r in full.collect() if r.rank <= 10}
    assert head == full_ranks
