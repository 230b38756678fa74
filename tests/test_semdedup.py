"""Semantic dedup (operators.similarity.semantic_dedup, X-DEDUP-SEMANTIC
/ SemDeDup): planted duplicate clusters resolve to min-id keepers,
near-orthogonal vectors survive, the within-cell-only contract, and the
cell-width guard."""

from __future__ import annotations

import math

from snowflake_azure_etl_spark.operators import similarity


def _vec(i, dim=16, eps=0.0, base=None):
    """Unit basis vector (optionally perturbed copy of `base`)."""
    v = [0.0] * dim
    if base is not None:
        v = list(base)
        v[(i * 7) % dim] += eps
    else:
        v[i % dim] = 1.0
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _rows():
    # ids < n_cells are the seed centroids (orthogonal basis vectors);
    # planted near-dup cluster members sit at HIGHER ids so they land
    # in the seeds' cells instead of seeding their own
    a = _vec(0)
    b = _vec(1)
    rows = [(0, a), (1, b), (2, _vec(2)), (3, _vec(3)),
            (100, _vec(10, eps=0.01, base=a)),
            (101, _vec(11, eps=0.02, base=a)),   # cluster {0, 100, 101}
            (110, _vec(12, eps=0.015, base=b)),  # cluster {1, 110}
            (120, _vec(5))]                      # orthogonal singleton
    return rows


def _run(spark, rows, **kw):
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    kw.setdefault("n_cells", 4)
    kw.setdefault("train_iters", 0)
    kw.setdefault("threshold", 0.95)
    out = similarity.semantic_dedup(emb, "vec_id", "embedding", **kw)
    return {r["id"]: r for r in out.collect()}


def test_planted_clusters_resolve_to_min_id_keeper(spark):
    got = _run(spark, _rows())
    assert len(got) == 8
    # cluster members point at the min id; is_dup marks the drops
    assert {got[i]["keeper"] for i in (0, 100, 101)} == {0}
    assert [got[i]["is_dup"] for i in (0, 100, 101)] == [False, True, True]
    assert got[110]["keeper"] == 1 and got[110]["is_dup"]
    for i in (2, 3, 120):
        assert got[i]["keeper"] == i and not got[i]["is_dup"]


def test_kept_fraction_matches_component_count(spark):
    got = _run(spark, _rows())
    keepers = {r["keeper"] for r in got.values()}
    survivors = {i for i, r in got.items() if not r["is_dup"]}
    assert keepers == survivors == {0, 1, 2, 3, 120}


def test_pairs_only_within_cells(spark):
    """The defining SemDeDup approximation: identical vectors assigned
    to different cells are NOT merged. Force n_cells == n_rows with
    orthogonal seeds so every vector is its own cell."""
    rows = [(i, _vec(i)) for i in range(4)]
    # duplicate of vector 0 but with a HIGHER id: same cell as 0
    rows.append((7, _vec(13, eps=0.001, base=_vec(0))))
    got = _run(spark, rows, n_cells=4)
    assert got[7]["keeper"] == 0 and got[7]["is_dup"]


def test_cell_width_guard_drops_wide_cells(spark):
    """All rows collapse into one cell wider than max_cell: the pair
    stage must drop the cell whole (no pairs, nobody deduped) rather
    than pay the quadratic join."""
    base = _vec(0)
    rows = [(i, _vec(i + 1, eps=0.001 * (i + 1), base=base))
            for i in range(6)]
    got = _run(spark, rows, n_cells=1, max_cell=3)
    assert all(not r["is_dup"] for r in got.values())
    # and without the guard the same data DOES dedup
    got2 = _run(spark, rows, n_cells=1, max_cell=100)
    assert sum(r["is_dup"] for r in got2.values()) == 5


def test_attested_small_corpus_skips_guard(spark):
    rows = _rows()
    a = _run(spark, rows)
    b = _run(spark, rows, n_rows=len(rows))
    assert a.keys() == b.keys()
    assert all(a[k]["keeper"] == b[k]["keeper"] for k in a)


def test_multi_probe_catches_boundary_pair_single_probe_misses(spark):
    """VERDICT r10 #3: a near-dup pair split across two cells (each
    member lands in a different seed's cell) is invisible at nprobe=1
    (the published SemDeDup contract) and merged at nprobe=2, where
    each member's probe set covers the other's primary cell. Index
    semantics (primary cell_id) are identical in both runs."""
    a, b = _vec(0), _vec(1)

    def lean(base, other, w):
        v = [x + w * y for x, y in zip(base, other)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(0, a), (1, b),
            (100, lean(a, b, 1.05)),   # primary cell 1 (leans to b)
            (101, lean(b, a, 1.05))]   # primary cell 0 (leans to a)
    # cos(100, 101) = 2.1/2.1025 ≈ 0.9988 — a real near-dup pair
    single = _run(spark, rows, n_cells=2, train_iters=0,
                  threshold=0.95)
    assert not single[100]["is_dup"] and not single[101]["is_dup"]
    multi = _run(spark, rows, n_cells=2, train_iters=0,
                 threshold=0.95, nprobe=2)
    assert multi[100]["keeper"] == 100 and not multi[100]["is_dup"]
    assert multi[101]["keeper"] == 100 and multi[101]["is_dup"]
    # primary assignment (the index artifact) identical across probes
    assert all(single[i]["cell_id"] == multi[i]["cell_id"]
               for i in single)
    # seeds stay singletons (orthogonal — below threshold everywhere)
    assert not multi[0]["is_dup"] and not multi[1]["is_dup"]


def test_multi_probe_matches_python_reference_on_random_vectors(spark):
    """Property sweep: nprobe=2 semantic dedup equals a Python replay
    (assign primary + second-best cell per row, pair when either
    member's probe set covers the other's primary, union-find over
    the thresholded pairs, min-id keeper) on deterministic
    pseudo-random unit vectors."""
    import hashlib

    def cos(x, y):
        d = sum(p * q for p, q in zip(x, y))
        nx = math.sqrt(sum(p * p for p in x))
        ny = math.sqrt(sum(q * q for q in y))
        return d / (nx * ny)

    def prand_vec(i, dim=6):
        # deterministic "random" vector from md5 bytes (no RNG state)
        h = hashlib.md5(f"v:{i}".encode()).digest()
        v = [(h[j] - 127.5) / 127.5 for j in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    n_cells, tau, nprobe = 3, 0.5, 2
    rows = [(i, prand_vec(i)) for i in range(24)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    got = {r["id"]: r["keeper"] for r in similarity.semantic_dedup(
        emb, "vec_id", "embedding", n_cells=n_cells, train_iters=0,
        threshold=tau, nprobe=nprobe).collect()}

    cents = {i: v for i, v in rows if i < n_cells}

    def probe_cells(v, k):
        scored = sorted(cents.items(),
                        key=lambda cv: (-cos(v, cv[1]), cv[0]))
        return [c for c, _ in scored[:k]]

    primary = {i: probe_cells(v, 1)[0] for i, v in rows}
    probes = {i: set(probe_cells(v, nprobe)) for i, v in rows}
    vecs = dict(rows)
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            covered = (primary[b] in probes[a]
                       or primary[a] in probes[b])
            if covered and cos(vecs[a], vecs[b]) >= tau:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    assert got == want
