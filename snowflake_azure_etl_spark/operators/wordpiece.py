"""WordPiece-style greedy maximal-munch encoder — the third classic
tokenizer family beside BPE (`operators.bpe`) and the unigram LM
(`operators.unigram`), completing the set a training-data pipeline
meets in the wild (GPT-family BPE, T5/LLaMA unigram, BERT WordPiece).

This is the ENCODER (Schuster & Nakajima 2012; the `##`-continuation
greedy longest-match-first algorithm BERT ships for inference): at
each position take the LONGEST vocabulary piece starting there —
continuation pieces (position > 1) are surfaced with the `##` prefix
— and a word with ANY unmatchable position becomes the single
``[UNK]`` piece, WordPiece's whole-word unk contract (a deliberate
contrast with unigram's fail-visible NULL document and its
char-fallback mode: three unk disciplines, each pinned). Matching is
position-independent over one piece SET (the trained BPE/unigram
vocabularies this engine produces are position-independent); the
``##`` mark is surface form, not a separate vocabulary.

Training stays with the trained families (`bpe.train_bpe_merges`,
`unigram.train_unigram`): WordPiece's likelihood-ratio merge argmax
(count(ab)/(count(a)·count(b))) has no exact-integer total-order key
under int64 at corpus scale — the cross-multiplied comparison needs
~T⁴ scaling, past the fixed-point discipline every trainer here keeps
— so shipping a greedy ENCODER over the engine's trained piece sets
is the honest scope (and matches practice: BERT-style greedy encode
against a given vocab is the deployed component).

Scale: the encode is ONE row-local `F.aggregate` fold per word (k
membership probes per consumed position, all JVM-side, no UDF, no
shuffle); the piece set ships gated on vocabulary size exactly like
the unigram cost model (plan-literal map under
`unigram.UNIGRAM_MAP_LIT_MAX`, one-row attested-broadcast map
relation above — VERDICT r13 #3's rule applied family-wide). The
DuckDB mirror (`greedy_oracle_ctes`) unrolls the greedy walk as
per-position CTEs, the `_viterbi_cte` discipline (no recursive CTEs —
see operators.unigram for why), failing loud past the unroll.

Reference parity: the reference repo has no tokenizer; this extends
the LLM-pipeline surface (SURVEY §2 north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.attest import bounded_broadcast
from .text import tokens
from .unigram import UNIGRAM_MAX_PIECE_LEN, _lit_max

#: WordPiece's whole-word unknown piece (the BERT surface form).
WP_UNK = "[UNK]"

#: Continuation-piece mark for matches past a word's first position.
WP_CONT = "##"


def _pieces_map_lit(pieces: "list[str] | set[str]") -> Column:
    """Membership map (piece → 1) as a plan literal — the small-vocab
    shipping shape (same economics as unigram's cost-map literal)."""
    entries: list[Column] = []
    for p in sorted(set(pieces)):
        entries.append(F.lit(p))
        entries.append(F.lit(1).cast("int"))
    return F.create_map(*entries)


def _pieces_map_rel(spark, pieces: "list[str] | set[str]") -> DataFrame:
    """ONE-ROW (_wpm: map<string,int>) membership relation — the
    large-vocab shipping shape (the unigram `_costs_map_rel` twin)."""
    rel = spark.createDataFrame([(p,) for p in sorted(set(pieces))],
                                "piece string")
    return rel.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", F.lit(1).alias("one"))))
        .alias("_wpm"))


def greedy_expr(word: Column, pieces_map: Column,
                k: int = UNIGRAM_MAX_PIECE_LEN,
                unk: str = WP_UNK) -> Column:
    """array<string>: the greedy maximal-munch segmentation of `word`
    under the membership map — longest piece first at every consumed
    position, continuations marked ``##``, whole word → ``[unk]`` on
    the first unmatchable position. One `F.aggregate` fold over
    positions: the state (next-position, segs, failed) only advances
    at iterations equal to its own position pointer, so each consumed
    position is visited exactly once. All JVM-side."""

    def step(st, i):
        p = st["p"]
        # longest match first: the first satisfied guard wins
        ln = F.lit(None).cast("int")
        for l in range(1, k + 1):           # build k..1 by nesting up
            ln = F.when(
                (p + F.lit(l) - 1 <= F.length(word))
                & F.element_at(pieces_map,
                               word.substr(p, F.lit(l))).isNotNull(),
                F.lit(l)).otherwise(ln)
        piece = word.substr(p, ln)
        marked = F.when(p == 1, piece).otherwise(
            F.concat(F.lit(WP_CONT), piece))
        adv = F.struct(
            (p + ln).alias("p"),
            F.concat(st["s"], F.array(marked)).alias("s"),
            F.lit(False).alias("b"))
        fail = F.struct(p.alias("p"), st["s"].alias("s"),
                        F.lit(True).alias("b"))
        return (F.when((i != p) | st["b"], st)
                .otherwise(F.when(ln.isNull(), fail).otherwise(adv)))

    init = F.struct(F.lit(1).cast("int").alias("p"),
                    F.array().cast("array<string>").alias("s"),
                    F.lit(False).alias("b"))
    final = F.aggregate(F.sequence(F.lit(1), F.length(word)),
                        init, step)
    return F.when(F.length(word) < 1,
                  F.array().cast("array<string>")) \
            .when(final["b"], F.array(F.lit(unk))) \
            .otherwise(final["s"])


def segment_text_wp(text_col: Column | str,
                    pieces: "list[str] | set[str]",
                    k: int = UNIGRAM_MAX_PIECE_LEN,
                    map_lit_max: int | None = None) -> Column:
    """array<string>: greedy WordPiece encode of a whole document —
    each whitespace word independently (unmatchable words surface as
    ``[UNK]``, so coverage is total by construction; NULL text stays
    NULL). A bare Column ships the piece set as a plan literal only,
    so vocabularies above the gate fail loud here — use
    `segment_docs_wp` (one-row broadcast map relation) instead."""
    ps = set(pieces)
    if len(ps) > _lit_max(map_lit_max):
        raise ValueError(
            f"segment_text_wp: {len(ps)} pieces exceed the "
            f"plan-literal gate ({_lit_max(map_lit_max)}) — use "
            "segment_docs_wp (one-row broadcast map relation)")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _segment_expr_wp(c, _pieces_map_lit(ps), k)


def _segment_expr_wp(c: Column, pmap: Column, k: int) -> Column:
    words = F.filter(tokens(c), lambda t: F.length(t) > 0)
    return F.flatten(F.transform(words,
                                 lambda w: greedy_expr(w, pmap, k)))


def segment_docs_wp(docs: DataFrame, pieces: "list[str] | set[str]",
                    text_col: str = "text",
                    k: int = UNIGRAM_MAX_PIECE_LEN,
                    out_col: str = "pieces",
                    map_lit_max: int | None = None) -> DataFrame:
    """docs + `out_col`: the DataFrame-level greedy encode with the
    piece set's shipping shape GATED on vocabulary size (the unigram
    `segment_docs` rule: plan literal under the gate, one-row
    attested-broadcast map relation above — identical results)."""
    ps = set(pieces)
    c = F.col(text_col)
    if len(ps) <= _lit_max(map_lit_max):
        return docs.withColumn(
            out_col, _segment_expr_wp(c, _pieces_map_lit(ps), k))
    rel = bounded_broadcast(
        _pieces_map_rel(docs.sparkSession, ps),
        bound="one-row wordpiece membership map (piece-vocab-bounded)",
        max_rows=1)
    return (docs.crossJoin(rel)
            .withColumn(out_col, _segment_expr_wp(c, F.col("_wpm"), k))
            .drop("_wpm"))


def word_segmentations_wp(docs: DataFrame,
                          pieces: "list[str] | set[str]",
                          k: int = UNIGRAM_MAX_PIECE_LEN,
                          text_col: str = "text",
                          map_lit_max: int | None = None) -> DataFrame:
    """(word, segs): greedy segmentation of the corpus's DISTINCT
    words — the derived encode ARTIFACT (a lookup table beside the
    vocabulary, the `unigram.word_segmentations` twin); session-cache
    it so repeat encodes pay a word join instead of re-running the
    fold per invocation. Total by construction ([UNK] words included),
    so consumers never see NULL segs."""
    ps = set(pieces)
    c = F.col(text_col)
    words = F.filter(tokens(c), lambda t: F.length(t) > 0)
    distinct = docs.select(F.explode(words).alias("word")).distinct()
    if len(ps) <= _lit_max(map_lit_max):
        seg = greedy_expr(F.col("word"), _pieces_map_lit(ps), k)
        src = distinct
    else:
        src = distinct.crossJoin(
            bounded_broadcast(
                _pieces_map_rel(docs.sparkSession, ps),
                bound="one-row wordpiece membership map "
                      "(piece-vocab-bounded)",
                max_rows=1))
        seg = greedy_expr(F.col("word"), F.col("_wpm"), k)
    return src.select("word", seg.alias("segs"))


def encode_wordpiece(docs: DataFrame,
                     pieces: "list[str] | set[str]",
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     k: int = UNIGRAM_MAX_PIECE_LEN,
                     wseg: DataFrame | None = None) -> DataFrame:
    """(id, pieces, n_pieces): the scale ENCODE path — greedy-segment
    the DISTINCT words once, join back by word (UNhinted: AQE
    broadcasts a small word set, shuffle-joins a web-scale one) and
    reassemble per document in (doc, position) order — the
    `unigram.encode_unigram` shape (greedy is total, so the trained
    artifact never carries NULL segs — but a caller-supplied `wseg`
    that does not COVER the docs' words surfaces each uncovered word
    exactly like unigram's unsegmentable one: the whole document's
    pieces go NULL, fail-visible, never a silently shorter
    segmentation). NULL text keeps NULL pieces; no-words documents
    keep []."""
    c = F.col(text_col)
    words = F.filter(tokens(c), lambda t: F.length(t) > 0)
    pos = docs.select(F.col(id_col),
                      F.posexplode(words).alias("_i", "word"))
    if wseg is None:
        wseg = word_segmentations_wp(docs, pieces, k, text_col)
    # LEFT join + the nullness-as-flag aggregation (the encode_unigram
    # pattern): a NULL segs array must never reach flatten — flattening
    # a null inner array inside an aggregate's result projection NPEs
    # in Spark 4.1's generated code — so coverage failure is carried
    # as its own boolean and the collected arrays stay non-null
    per_doc = (pos.join(wseg, "word", "left")
               .groupBy(id_col)
               .agg(F.collect_list(F.struct(
                        F.col("_i").alias("i"),
                        F.coalesce(F.col("segs"),
                                   F.array().cast("array<string>"))
                        .alias("s"))).alias("_lst"),
                    F.max(F.col("segs").isNull()).alias("_bad"),
                    F.count("*").alias("_nw"))
               .select(id_col, "_nw",
                       F.when(F.col("_bad"),
                              F.lit(None).cast("array<string>"))
                       .otherwise(F.flatten(F.transform(
                           F.array_sort("_lst"), lambda x: x["s"])))
                       .alias("pieces")))
    # _nw distinguishes no-words docs (empty pieces) from docs with an
    # UNCOVERED word under a caller-supplied wseg (NULL pieces,
    # fail-visible — a plain coalesce would erase the NULL back to [])
    base = docs.select(F.col(id_col),
                       c.isNull().alias("_tnull"))
    return (base.join(per_doc, id_col, "left")
            .select(id_col,
                    F.when(F.col("_tnull"),
                           F.lit(None).cast("array<string>"))
                    .when(F.col("_nw").isNull(),
                          F.array().cast("array<string>"))
                    .otherwise(F.col("pieces")).alias("pieces"))
            .withColumn("n_pieces", F.size("pieces")))


def wordpiece_vocab(spark, pieces: "list[str] | set[str]") -> DataFrame:
    """(token, token_id): the BERT vocab surface for a piece set —
    ``[UNK]`` at id 0 (the convention), then every word-initial form,
    then every ``##``-continuation form, each block in deterministic
    token order, so rebuilding from the same piece set yields
    byte-identical ids (the `bpe.vocab_from_merges` /
    `unigram.unigram_vocab` reproducibility contract). Every surface
    `greedy_expr` can emit is in this vocabulary, so wp encode-to-ids
    is TOTAL — unk lives in the id space, not as a missing key."""
    toks = sorted(set(pieces))
    rows = [(WP_UNK, 0)]
    rows += [(p, i + 1) for i, p in enumerate(toks)]
    rows += [(WP_CONT + p, len(toks) + 1 + i)
             for i, p in enumerate(toks)]
    return spark.createDataFrame(rows, "token string, token_id int")


def encode_ids_wp(docs: DataFrame, pieces: "list[str] | set[str]",
                  vocab: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  k: int = UNIGRAM_MAX_PIECE_LEN,
                  map_lit_max: int | None = None) -> DataFrame:
    """(id, token_ids, n_ids): greedy WordPiece encode straight to
    vocabulary ids — the `bpe.encode_ids` / `unigram.encode_ids`
    family shape (one-row broadcast vocab map, row-local element_at
    inside transform, no explode, no shuffle). Total by construction:
    every emitted surface (including ``[UNK]`` and ``##`` forms) is
    in `wordpiece_vocab`, so there is no unk_id knob — unknownness is
    already a token. Decode with `decode_ids_wp`; stripping the
    ``##`` marks makes decode(encode(text)) == text with spaces
    removed EXCEPT for [UNK] words (WordPiece's lossy-unk contract —
    the round-trip attestation therefore holds exactly on fully
    covered text, pinned in tests)."""
    vmap = (vocab.groupBy("token")
            .agg(F.min("token_id").alias("token_id"))
            .agg(F.map_from_entries(
                F.collect_list(F.struct("token", "token_id")))
                .alias("_vmap")))
    segged = segment_docs_wp(docs, pieces, text_col, k,
                             out_col="_wps", map_lit_max=map_lit_max)
    ids = F.transform(
        F.col("_wps"),
        lambda s: F.element_at(F.col("_vmap"), s))
    return (segged.crossJoin(bounded_broadcast(
            vmap, bound="one-row wordpiece vocab map (piece-bounded)",
            max_rows=1))
            .select(F.col(id_col), ids.alias("token_ids"))
            .withColumn("n_ids", F.size("token_ids")))


def decode_ids_wp(encoded: DataFrame, vocab: DataFrame,
                  id_col: str = "doc_id",
                  ids_col: str = "token_ids") -> DataFrame:
    """(id, detok): ids → token surfaces → ``##`` marks stripped →
    concatenated — the WordPiece decode (same one-row broadcast map
    economics as the encode; NULL ids stay NULL)."""
    imap = (vocab.groupBy("token_id")
            .agg(F.min("token") .alias("token"))
            .agg(F.map_from_entries(
                F.collect_list(F.struct("token_id", "token")))
                .alias("_imap")))
    toks = F.transform(
        F.col(ids_col),
        lambda i: F.regexp_replace(
            F.element_at(F.col("_imap"), i), f"^{WP_CONT}", ""))
    return (encoded.crossJoin(bounded_broadcast(
            imap, bound="one-row wordpiece id map (piece-bounded)",
            max_rows=1))
            .select(F.col(id_col), F.array_join(toks, "").alias("detok")))


# --------------------------------------------------------------------------
# DuckDB oracle fragment — the greedy walk as an unrolled per-position
# CTE chain (the `unigram._viterbi_cte` discipline).
# --------------------------------------------------------------------------

def greedy_cte(tag: str, pieces_cte: str, words_cte: str, k: int,
               max_word_len: int, unk: str = WP_UNK) -> str:
    """One greedy maximal-munch pass over `{words_cte}(word)` as an
    UNROLLED chain of per-position CTEs; `{pieces_cte}(piece)` is the
    vocabulary. State per word: (pos, segs, bad); position t only
    acts when t == pos — each consumed position exactly once, the
    engine fold's exact rule. Words longer than the unroll FAIL LOUD
    in `{tag}_f` (the fail-loud `_viterbi_cte` contract)."""
    parts = [f"""
    {tag}_m AS MATERIALIZED (
      SELECT MAP(list(piece ORDER BY piece),
                 list(1 ORDER BY piece)) AS m
      FROM {pieces_cte}),
    {tag}0 AS (
      SELECT word, 1 AS pos, []::VARCHAR[] AS segs, FALSE AS bad
      FROM {words_cte})"""]
    for t in range(1, max_word_len + 1):
        ls = list(range(min(k, max_word_len - t + 1), 0, -1))
        ln = ("CASE " + " ".join(
            f"WHEN pos + {l} - 1 <= length(word) AND "
            f"list_extract(map_extract(gm.m, "
            f"substr(word, pos, {l})), 1) IS NOT NULL THEN {l}"
            for l in ls) + " END")
        parts.append(f"""
    {tag}{t} AS (
      SELECT word,
             CASE WHEN skip THEN pos ELSE pos + COALESCE(ln, 0) END
                 AS pos,
             CASE WHEN skip OR ln IS NULL THEN segs
                  ELSE list_append(segs,
                       CASE WHEN pos = 1 THEN pc
                            ELSE '{WP_CONT}' || pc END) END AS segs,
             CASE WHEN skip THEN bad
                  WHEN ln IS NULL THEN TRUE ELSE bad END AS bad
      FROM (SELECT word, pos, segs, bad, skip, ln,
                   substr(word, pos, ln) AS pc
            FROM (SELECT word, pos, segs, bad,
                         (bad OR {t} != pos
                          OR {t} > length(word)) AS skip,
                         {ln} AS ln
                  FROM {tag}{t - 1} CROSS JOIN {tag}_m gm)))""")
    parts.append(f"""
    {tag}_f AS MATERIALIZED (
      SELECT word,
             CASE WHEN length(word) > {max_word_len}
                  THEN error('wordpiece oracle: word longer than the '
                             || '{max_word_len}-position unrolled '
                             || 'greedy walk — raise max_word_len')
                  WHEN bad THEN ['{unk}']
                  ELSE segs END AS segs
      FROM {tag}{max_word_len})""")
    return ",".join(parts)
