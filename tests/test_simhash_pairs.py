"""SimHash near-dup pairs (r6, X-DEDUP-SIMHASH-PAIRS): banded
candidates + Hamming verify, on synthetic fingerprints with exact
controlled distances."""

from __future__ import annotations

import pytest

from snowflake_azure_etl_spark.operators import dedup


def _sig(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_simhash_pairs_find_close_and_reject_far(spark):
    base = 0b10101010_11001100_11110000_00001111
    rows = [
        (1, base),
        (2, base ^ 0b11),                  # hamming 2, same-band flips
        # hamming 4, all in band 0 — candidates via bands 1..3, but
        # the verify must reject (4 > 3)
        (3, base ^ 0b1111),
        # hamming 8, two flips in EVERY band — no band intact, so not
        # even a candidate (and far anyway)
        (4, base ^ 0b00000011_00000011_00000011_00000011),
    ]
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.simhash_near_dups(
               _sig(spark, rows), max_hamming=3, n_docs=4).collect()}
    # (1,2): 2 flips. (2,3): xor = 0b1100, also 2. (1,3): hamming 4 —
    # candidate via intact bands but rejected by the verify. (·,4):
    # either no intact band or hamming ≥ 6.
    assert got == {(1, 2): 2, (2, 3): 2}


def test_simhash_pairs_transitive_band_sharing(spark):
    """Pairs are per-band first-match distinct: a triple of mutually
    close fingerprints yields all three pairs exactly once."""
    base = 1 << 20
    rows = [(1, base), (2, base ^ 1), (3, base ^ 2)]
    got = sorted((r.id_a, r.id_b) for r in dedup.simhash_near_dups(
        _sig(spark, rows), max_hamming=3, n_docs=3).collect())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_simhash_pairs_pigeonhole_guard():
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_dups(None, max_hamming=4, bands=4)
