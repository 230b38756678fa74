"""BPE merge training vs an independent pure-Python reference
(the classic Sennrich word-freq-dict algorithm), plus the encode
path's contract properties."""

from __future__ import annotations

import collections

import pytest

from snowflake_azure_etl_spark.operators import bpe


# ---------------------------------------------------------------------------
# Reference implementation: dict-of-symbol-tuples BPE, no Spark.
# ---------------------------------------------------------------------------

def _ref_word_freqs(texts):
    wf = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    return {tuple(w): f for w, f in wf.items()}


def _ref_pair_counts(wf):
    pc = collections.Counter()
    for syms, f in wf.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += f
    return pc


def _ref_merge(wf, pair):
    a, b = pair
    out = {}
    for syms, f in wf.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + f
    return out


def ref_train(texts, n_merges):
    wf = _ref_word_freqs(texts)
    merges = []
    for _ in range(n_merges):
        pc = _ref_pair_counts(wf)
        if not pc:
            break
        # max count; ties broken by ascending (a, b) — same total order
        # as the Spark/SQL implementations
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((pair[0], pair[1], pc[pair]))
        wf = _ref_merge(wf, pair)
    return merges


def ref_encode(text, merges):
    segs = []
    for w in text.split(" "):
        syms = list(w)
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        segs.extend(syms)
    return segs


def _strip(merges):
    return [(a.replace(bpe.SENT, ""), b.replace(bpe.SENT, ""), c)
            for a, b, c in merges]


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the hats",
    "that hat is the best hat",
    "low lower lowest newer newest",
    "low low low lower newest new",
]


def test_train_matches_reference(spark):
    texts = CORPUS
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id int, text string")
    got = _strip(bpe.train_bpe_merges(docs, "text", n_merges=10))
    want = ref_train(texts, 10)
    assert got == want


def test_train_greedy_overlap_semantics(spark):
    # "aaaa" with merge (a,a): greedy left-to-right gives (aa)(aa),
    # NOT (a)(aa)(a) or a re-merge into aaaa — the single-replace
    # semantics both the reference loop and F.replace implement.
    docs = spark.createDataFrame([(0, "aaaa aaa")], "doc_id int, text string")
    got = _strip(bpe.train_bpe_merges(docs, "text", n_merges=2))
    want = ref_train(["aaaa aaa"], 2)
    assert got == want
    assert got[0][:2] == ("a", "a")


def test_train_stops_when_pairs_exhausted(spark):
    # single-char words only → zero adjacent pairs → empty merge list
    docs = spark.createDataFrame([(0, "a b c a")], "doc_id int, text string")
    assert bpe.train_bpe_merges(docs, "text", n_merges=5) == []


def test_train_rejects_bad_n_merges(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bpe.train_bpe_merges(docs, "text", n_merges=0)


def test_encode_matches_reference_and_roundtrips(spark):
    texts = CORPUS
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id int, text string")
    merges = bpe.train_bpe_merges(docs, "text", n_merges=8)
    rows = (docs.select("doc_id", "text",
                        bpe.apply_merges("text", merges).alias("segs"),
                        bpe.bpe_segment_count("text", merges).alias("n"))
            .orderBy("doc_id").collect())
    stripped = _strip(merges)
    for r in rows:
        want = ref_encode(r["text"], stripped)
        assert r["segs"] == want
        assert r["n"] == len(want)
        # segmentation is a partition of the original characters
        assert "".join(r["segs"]) == r["text"].replace(" ", "")


def test_merges_table_shape(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id int, text string")
    merges = bpe.train_bpe_merges(docs, "text", n_merges=4)
    tbl = bpe.merges_table(spark, merges).collect()
    assert [r["rank"] for r in tbl] == [1, 2, 3, 4]
    for r in tbl:
        assert r["merged"] == r["left"] + r["right"]
        assert bpe.SENT not in r["merged"]


def test_train_property_random_corpora(spark):
    """Hypothesis sweep: the distributed trainer must equal the Python
    reference on arbitrary small corpora (sentinel safety, tie-breaks,
    early exhaustion, repeated words, overlapping runs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcxy", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(doc, min_size=1, max_size=5), st.integers(1, 5))
    def check(texts, k):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id int, text string")
        assert _strip(bpe.train_bpe_merges(docs, "text", n_merges=k)) \
            == ref_train(texts, k)

    check()


def test_arrow_encode_matches_expression_path(spark):
    """The Arrow-batched production encoder and the expression-tree
    encoder must segment identically (both follow training-order
    greedy merge application)."""
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id int, text string")
    merges = bpe.train_bpe_merges(docs, "text", n_merges=8)
    via_expr = (docs.select(
        "doc_id", bpe.apply_merges("text", merges).alias("segs"))
        .orderBy("doc_id").collect())
    via_arrow = (bpe.apply_merges_arrow(docs, merges)
                 .orderBy("doc_id").collect())
    for e, a in zip(via_expr, via_arrow):
        assert e["doc_id"] == a["doc_id"]
        assert e["segs"] == a["segs"]
        assert a["n_segs"] == len(a["segs"])
