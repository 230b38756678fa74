"""bench.py's noise-reference logic (r14): the committed steady floor
takes precedence, ratchets down monotonically (a noisy run can never
raise it), keys per scale factor, and degrades to the detail-file
chain when the floor is absent or covers too little of the catalog.
Pure file/JSON logic — no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "_steady_path",
                        lambda: str(tmp_path / "BENCH_STEADY.json"))
    monkeypatch.setattr(mod, "_detail_path",
                        lambda: str(tmp_path / "BENCH_DETAIL_LAST.json"))
    return mod


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)


def test_floor_takes_precedence_and_reads_elevation(tmp_path,
                                                    monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    floor = {f"q{i:02d}": 1.0 for i in range(12)}
    _write(tmp_path / "BENCH_STEADY.json", {"0.1": floor})
    # an elevated detail chain that would mask elevation (the r13/r14
    # failure): same x1.2 values as the current run
    _write(tmp_path / "BENCH_DETAIL_LAST.json",
           {"sf": 0.1, "queries": {k: 1.2 for k in floor}})
    cur = {k: 1.2 for k in floor}
    ratio, src = b._noise_vs_prev(cur, 0.1)
    assert src == "BENCH_STEADY.json"
    assert ratio == 1.2                   # elevation READS as elevation


def test_floor_falls_back_when_sparse_or_absent(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    # floor covers only 2 of 12 queries -> too sparse, chain wins
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.1": {"q00": 1.0, "q01": 1.0}})
    prev = {f"q{i:02d}": 2.0 for i in range(12)}
    _write(tmp_path / "BENCH_DETAIL_LAST.json",
           {"sf": 0.1, "queries": prev})
    cur = {k: 1.0 for k in prev}
    ratio, src = b._noise_vs_prev(cur, 0.1)
    assert src == "BENCH_DETAIL_LAST.json"
    assert ratio == 0.5
    # wrong-sf floor never matches
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.01": {k: 1.0 for k in prev}})
    ratio, src = b._noise_vs_prev(cur, 0.1)
    assert src == "BENCH_DETAIL_LAST.json"


def test_steady_update_is_a_min_ratchet(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.1": {"q00": 1.0, "q01": 3.0}})
    # two attempts: one noisy (x2), one faster on q01, plus a new query
    b._steady_update(0.1, [{"q00": 2.0, "q01": 2.5, "q02": 4.0},
                           {"q00": 1.5, "q01": 2.0}])
    got = json.load(open(tmp_path / "BENCH_STEADY.json"))["0.1"]
    assert got["q00"] == 1.0              # noisy values never raise it
    assert got["q01"] == 2.0              # real improvement ratchets in
    assert got["q02"] == 4.0              # new queries enter at first value
    # other sf keys are untouched by an update
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.1": got, "0.01": {"q00": 9.0}})
    b._steady_update(0.1, [{"q00": 0.5}])
    d = json.load(open(tmp_path / "BENCH_STEADY.json"))
    assert d["0.01"] == {"q00": 9.0}
    assert d["0.1"]["q00"] == 0.5


def test_fp_change_drops_that_querys_floor_entries(tmp_path,
                                                   monkeypatch):
    """VERDICT r14 next #5 (mechanical floor refresh): a query whose
    catalog definition changed loses its floor entry in EVERY sf map
    (the min-ratchet cannot re-price upward on its own), other
    queries' floors stay, and the stored fingerprint updates."""
    b = _load_bench(tmp_path, monkeypatch)
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.1": {"q00": 1.0, "q01": 2.0},
            "0.01": {"q00": 0.1, "q01": 0.2},
            b.FP_KEY: {"q00": "aaaa", "q01": "bbbb"}})
    b._refresh_floor_fps({"q00": "aaaa", "q01": "NEW!"})
    d = json.load(open(tmp_path / "BENCH_STEADY.json"))
    assert d["0.1"] == {"q00": 1.0}
    assert d["0.01"] == {"q00": 0.1}
    assert d[b.FP_KEY] == {"q00": "aaaa", "q01": "NEW!"}


def test_fp_first_seeding_drops_nothing(tmp_path, monkeypatch):
    """First-ever fingerprints seed without touching floors (the
    transition is covered by one curated deletion), and an unchanged
    fingerprint never drops an entry."""
    b = _load_bench(tmp_path, monkeypatch)
    floor = {"q00": 1.0, "q01": 2.0}
    _write(tmp_path / "BENCH_STEADY.json", {"0.1": dict(floor)})
    b._refresh_floor_fps({"q00": "aaaa", "q01": "bbbb"})
    d = json.load(open(tmp_path / "BENCH_STEADY.json"))
    assert d["0.1"] == floor                      # nothing dropped
    assert d[b.FP_KEY] == {"q00": "aaaa", "q01": "bbbb"}
    # second run, unchanged fps: still nothing dropped
    b._refresh_floor_fps({"q00": "aaaa", "q01": "bbbb"})
    d = json.load(open(tmp_path / "BENCH_STEADY.json"))
    assert d["0.1"] == floor


def test_fp_key_is_invisible_to_the_floor_reader(tmp_path,
                                                 monkeypatch):
    """The fingerprint map lives beside the per-sf floor maps and
    must never be read as one, and _steady_update must preserve it."""
    b = _load_bench(tmp_path, monkeypatch)
    floor = {f"q{i:02d}": 1.0 for i in range(12)}
    _write(tmp_path / "BENCH_STEADY.json",
           {"0.1": floor, b.FP_KEY: {"q00": "aaaa"}})
    assert b._steady_floor(0.1) == floor
    b._steady_update(0.1, [{"q00": 0.5}])
    d = json.load(open(tmp_path / "BENCH_STEADY.json"))
    assert d[b.FP_KEY] == {"q00": "aaaa"}         # preserved
    assert d["0.1"]["q00"] == 0.5                 # ratcheted


def test_catalog_fingerprints_move_with_oracle_and_source():
    """The fingerprint basis: oracle text and engine source each move
    it; identical definitions hash identically."""
    import importlib.util
    import os as _os
    import sys as _sys
    spec = importlib.util.spec_from_file_location(
        "bench_fp_test",
        _os.path.join(_os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["bench_fp_test"] = mod
    spec.loader.exec_module(mod)

    class Q:
        def __init__(self, oracle, fn):
            self.oracle, self.fn = oracle, fn

    def f(spark, sf):
        return 1

    a = mod._catalog_fingerprints({"q": Q("SELECT 1", f)})
    b2 = mod._catalog_fingerprints({"q": Q("SELECT 2", f)})
    c = mod._catalog_fingerprints({"q": Q("SELECT 1", f)})
    assert a["q"] != b2["q"] and a["q"] == c["q"]
