"""Funnel and retention legs (events_queries q40, X-FUNNEL /
X-RETENTION): planted dropouts, strict ordering (an out-of-order step
never counts), and retention offsets — semantics the dense synthetic
fixture can't exercise (every user converts there)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.workload.events_queries import (
    FUNNEL_STEPS, funnel_anchors)

T0 = datetime(2024, 1, 1)


def _ev(uid, etype, minutes):
    return (uid, etype, T0 + timedelta(minutes=minutes))


EVENTS = [
    # user 1: full ordered funnel
    _ev(1, "signup", 0), _ev(1, "view", 10), _ev(1, "click", 20),
    _ev(1, "purchase", 30),
    # user 2: drops after view
    _ev(2, "signup", 0), _ev(2, "view", 5),
    # user 3: purchase BEFORE the click anchor — must stop at click
    _ev(3, "signup", 0), _ev(3, "view", 10), _ev(3, "purchase", 15),
    _ev(3, "click", 20),
    # user 4: never signs up — in no funnel step at all
    _ev(4, "view", 0), _ev(4, "click", 1), _ev(4, "purchase", 2),
    # user 5: view at the SAME timestamp as signup — strictly-later
    # fails, a later view rescues step 2
    _ev(5, "signup", 0), _ev(5, "view", 0), _ev(5, "view", 7),
]


def _funnel_counts(spark, events):
    """Anchor sets from the PRODUCTION fold (funnel_anchors) — and, as
    an in-test cross-check, assert the fold equals the min-after join
    chain formulation (the q40 oracle's shape) on the same input."""
    df = spark.createDataFrame(
        events, "user_id bigint, event_type string, ts timestamp_ntz")
    rows = funnel_anchors(df).collect()
    fold = {s: {r["user_id"] for r in rows
                if r["a"][f"t{i}"] is not None}
            for i, s in enumerate(FUNNEL_STEPS)}
    reached = [df.filter(F.col("event_type") == FUNNEL_STEPS[0])
               .groupBy("user_id").agg(F.min("ts").alias("t"))]
    for s in FUNNEL_STEPS[1:]:
        reached.append(
            df.filter(F.col("event_type") == s)
            .join(reached[-1].select("user_id", F.col("t").alias("_pt")),
                  "user_id")
            .filter(F.col("ts") > F.col("_pt"))
            .groupBy("user_id").agg(F.min("ts").alias("t")))
    chain = {s: {r["user_id"] for r in rel.select("user_id").collect()}
             for s, rel in zip(FUNNEL_STEPS, reached)}
    assert fold == chain
    return fold


def test_funnel_dropouts_and_strict_ordering(spark):
    got = _funnel_counts(spark, EVENTS)
    assert got["signup"] == {1, 2, 3, 5}       # user 4 never signed up
    assert got["view"] == {1, 2, 3, 5}         # user 5 via the later view
    assert got["click"] == {1, 3}              # user 2 dropped
    # user 3's purchase predates their click anchor: not converted
    assert got["purchase"] == {1}


def test_funnel_same_timestamp_is_not_later(spark):
    ev = [_ev(9, "signup", 0), _ev(9, "view", 0)]
    got = _funnel_counts(spark, ev)
    assert got["signup"] == {9}
    assert got["view"] == set()


def test_retention_offsets_from_own_first_event(spark):
    from snowflake_azure_etl_spark.workload.events_queries import (
        retention_offsets)

    ev = [
        (1, "click", T0), (1, "click", T0 + timedelta(days=8)),
        (2, "click", T0 + timedelta(days=100)),                  # own week0
        (2, "click", T0 + timedelta(days=100 + 21)),             # week3
    ]
    df = spark.createDataFrame(
        ev, "user_id bigint, event_type string, ts timestamp")
    got = {(r["user_id"], r["wk"])
           for r in retention_offsets(df).collect()}
    assert got == {(1, 0), (1, 1), (2, 0), (2, 3)}


def test_funnel_works_on_ltz_timestamps_and_empty_corpus(spark):
    """The accumulator type follows ts's own type (plain TIMESTAMP
    must not fail analysis — r8 review finding), and a corpus with no
    step events yields an EMPTY anchors relation, not an error."""
    ev = [(1, "signup", T0), (1, "view", T0 + timedelta(minutes=1))]
    ltz = spark.createDataFrame(
        ev, "user_id bigint, event_type string, ts timestamp")
    rows = funnel_anchors(ltz, ("signup", "view")).collect()
    assert rows and rows[0]["a"]["t1"] is not None
    none = spark.createDataFrame(
        [(1, "error", T0)], "user_id bigint, event_type string, ts timestamp")
    assert funnel_anchors(none, ("signup", "view")).collect() == []


def test_time_bounded_funnel(spark):
    """within_seconds: a step landing after the bound neither converts
    nor resets the anchor (greedy, no backtracking)."""
    ev = [
        # user 1: view 10 min after signup — inside a 15-min bound
        _ev(1, "signup", 0), _ev(1, "view", 10),
        # user 2: view 30 min after signup — outside; a later view at
        # 40 min is ALSO measured against the original anchor: dead
        _ev(2, "signup", 0), _ev(2, "view", 30), _ev(2, "view", 40),
    ]
    df = spark.createDataFrame(
        ev, "user_id bigint, event_type string, ts timestamp_ntz")
    rows = funnel_anchors(df, ("signup", "view"),
                          within_seconds=900).collect()
    got = {r["user_id"]: r["a"]["t1"] is not None for r in rows}
    assert got == {1: True, 2: False}
    # unbounded: user 2 converts via the 30-min view
    rows2 = funnel_anchors(df, ("signup", "view")).collect()
    assert all(r["a"]["t1"] is not None for r in rows2)


def test_hot_user_state_cap_fails_loud(spark):
    """r9 (VERDICT r8 #2): per-user fold state is the user's step-typed
    event array — a planted hot user over max_events_per_user raises
    with their id instead of silently materializing an unbounded array
    in one task. The guard lives inside the output expression, so
    column pruning cannot disarm it; compliant users at the same cap
    still fold normally."""
    import pytest

    ev = ([_ev(9, "view", m) for m in range(8)]        # hot: 8 events
          + [_ev(1, "signup", 0), _ev(1, "view", 1)])  # normal: 2
    df = spark.createDataFrame(
        ev, "user_id bigint, event_type string, ts timestamp_ntz")
    with pytest.raises(Exception, match="user 9 has more than 5"):
        funnel_anchors(df, ("signup", "view"),
                       max_events_per_user=5).collect()
    # pruning-proof: selecting ONLY a derived count still trips it
    with pytest.raises(Exception, match="more than 5"):
        (funnel_anchors(df, ("signup", "view"), max_events_per_user=5)
         .agg(F.sum(F.col("a.t1").isNotNull().cast("long"))).collect())
    ok = funnel_anchors(df, ("signup", "view"),
                        max_events_per_user=8).collect()
    assert {r["user_id"] for r in ok} == {1, 9}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# random per-user event streams over the step alphabet + noise types
_events = st.lists(
    st.tuples(st.integers(min_value=1, max_value=6),          # user
              st.sampled_from(list(FUNNEL_STEPS) + ["noise"]),  # type
              st.integers(min_value=0, max_value=120)),       # minute
    min_size=1, max_size=60)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ev=_events)
def test_funnel_fold_equals_min_after_chain_property(spark, ev):
    """Property form of the fold≡chain equivalence the q40 oracle
    attests: for ANY event multiset (dup timestamps, out-of-order
    steps, noise types, absent users), the greedy sorted-array fold
    reaches exactly the user sets the min-after join chain reaches,
    step by step."""
    rows = [_ev(u, t, m) for u, t, m in ev]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz")
    anchors = {r["user_id"]: r["a"] for r in funnel_anchors(df).collect()}
    fold = {s: {u for u, a in anchors.items()
                if a[f"t{i}"] is not None}
            for i, s in enumerate(FUNNEL_STEPS)}
    # python min-after reference
    per_user = {}
    for u, t, m in ev:
        per_user.setdefault(u, []).append((m, t))
    chain = {s: set() for s in FUNNEL_STEPS}
    for u, evs in per_user.items():
        prev = None
        for i, s in enumerate(FUNNEL_STEPS):
            cand = [m for m, t in evs if t == s
                    and (i == 0 or (prev is not None and m > prev))]
            if not cand:
                break
            prev = min(cand)
            chain[s].add(u)
    assert fold == chain
