"""Temporal joins: as-of (backward/forward/tolerance/ties) vs brute force,
plan shape (join-free, one shuffle), and interval-join path equivalence.
"""

import random

import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import temporal


def _brute_asof(lrows, rrows, direction="backward", tolerance=None):
    """(k, ts, lv) x (k, ts, rv) -> {(k, ts, lv): rv or None}."""
    out = {}
    for k, ts, lv in lrows:
        if direction == "backward":
            cand = [(rts, rv) for rk, rts, rv in rrows if rk == k and rts <= ts]
            best = max(cand) if cand else None
        else:
            cand = [(rts, rv) for rk, rts, rv in rrows if rk == k and rts >= ts]
            best = min(cand) if cand else None
        if best is not None and tolerance is not None and abs(best[0] - ts) > tolerance:
            best = None
        out[(k, ts, lv)] = best
    return out


@pytest.fixture(scope="module")
def frames(spark):
    random.seed(11)
    lrows = [(i % 5, random.randint(0, 200), i) for i in range(120)]
    # unique (k, ts) on the right so brute-force max() is the unique answer
    seen, rrows = set(), []
    for i in range(150):
        k, ts = i % 5, random.randint(0, 200)
        if (k, ts) not in seen:
            seen.add((k, ts))
            rrows.append((k, ts, 1000 + i))
    L = spark.createDataFrame(lrows, "k int, ts int, lv int")
    R = spark.createDataFrame(rrows, "k int, ts int, rv int")
    return L, R, lrows, rrows


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(frames, direction):
    L, R, lrows, rrows = frames
    got = temporal.asof_join(L, R, on="ts", by=["k"], direction=direction).collect()
    exp = _brute_asof(lrows, rrows, direction)
    assert len(got) == len(lrows)
    for row in got:
        best = exp[(row.k, row.ts, row.lv)]
        assert (row.ts_r, row.rv) == (best if best else (None, None))


def test_asof_tolerance(frames):
    L, R, lrows, rrows = frames
    got = temporal.asof_join(L, R, on="ts", by=["k"], tolerance=5).collect()
    exp = _brute_asof(lrows, rrows, "backward", tolerance=5)
    for row in got:
        best = exp[(row.k, row.ts, row.lv)]
        assert (row.ts_r, row.rv) == (best if best else (None, None))


def test_asof_equal_ts_matches(spark):
    L = spark.createDataFrame([(1, 10, 0)], "k int, ts int, lv int")
    R = spark.createDataFrame([(1, 10, 7)], "k int, ts int, rv int")
    row = temporal.asof_join(L, R, on="ts", by=["k"]).collect()[0]
    assert (row.ts_r, row.rv) == (10, 7)
    row = temporal.asof_join(L, R, on="ts", by=["k"], direction="forward").collect()[0]
    assert (row.ts_r, row.rv) == (10, 7)


def test_asof_tie_break_largest_wins(spark):
    L = spark.createDataFrame([(1, 10, 0)], "k int, ts int, lv int")
    R = spark.createDataFrame(
        [(1, 8, 3), (1, 8, 9), (1, 8, 5)], "k int, ts int, rv int"
    )
    row = temporal.asof_join(L, R, on="ts", by=["k"], tie_break="rv").collect()[0]
    assert row.rv == 9


def test_asof_empty_right(spark):
    L = spark.createDataFrame([(1, 10, 0)], "k int, ts int, lv int")
    R = spark.createDataFrame([], "k int, ts int, rv int")
    row = temporal.asof_join(L, R, on="ts", by=["k"]).collect()[0]
    assert row.rv is None and row.ts_r is None


def test_asof_plan_is_join_free(frames):
    """The as-of is a union + window: NO join node may appear, and the only
    wide node is the window's hash exchange on the by-keys."""
    L, R, _, _ = frames
    plan = (
        temporal.asof_join(L, R, on="ts", by=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("hashpartitioning") <= 1


def test_asof_validates_inputs(frames):
    L, R, _, _ = frames
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(L, R, direction="nearest")
    with pytest.raises(ValueError, match="missing"):
        temporal.asof_join(L, R, on="missing")


@pytest.fixture(scope="module")
def intervals(spark):
    random.seed(23)

    def mk(n, tag):
        rows = []
        for i in range(n):
            s = random.randint(-100, 300)
            rows.append((i, i % 4, s, s + random.randint(0, 40)))
        return rows

    lrows, rrows = mk(80, "l"), mk(100, "r")
    L = spark.createDataFrame(lrows, "lid int, k int, start int, end int")
    R = spark.createDataFrame(rrows, "rid int, k int, start int, end int")
    brute = {
        (a, b)
        for a, ka, sa, ea in lrows
        for b, kb, sb, eb in rrows
        if ka == kb and sa <= eb and sb <= ea
    }
    return L, R, brute


def test_interval_broadcast_path(intervals):
    L, R, brute = intervals
    got = temporal.interval_join(L, R, by=["k"], broadcast_limit=10_000)
    assert {(r.lid, r.rid) for r in got.collect()} == brute


@pytest.mark.parametrize("width", [7, 40, 1000])
def test_interval_grid_path_no_dups(intervals, width):
    """Bucketed path: exact pair set AND each pair exactly once (the anchor
    filter replaces any dedup shuffle), across bucket widths smaller than,
    equal to, and dwarfing the interval lengths."""
    L, R, brute = intervals
    got = temporal.interval_join(
        L, R, by=["k"], broadcast_limit=0, bucket_width=width
    ).collect()
    assert {(r.lid, r.rid) for r in got} == brute
    assert len(got) == len(brute)


def test_interval_auto_width_and_keyless(spark):
    L = spark.createDataFrame([(0, 0, 10), (1, 40, 45)], "lid int, start int, end int")
    R = spark.createDataFrame(
        [(0, 10, 12), (1, 46, 50), (2, -5, 0)], "rid int, start int, end int"
    )
    # touching endpoints match (closed intervals); keyless broadcast path
    got = {(r.lid, r.rid) for r in temporal.interval_join(L, R).collect()}
    assert got == {(0, 0), (0, 2)}
    # keyless grid path with sampled default width
    got2 = {
        (r.lid, r.rid)
        for r in temporal.interval_join(L, R, broadcast_limit=0).collect()
    }
    assert got2 == got


def test_sessionize_matches_brute_force(spark):
    random.seed(31)
    rows = [(i, i % 4, random.randint(0, 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "eid int, u int, ts int")
    got = {
        (r.eid): (r.session_seq, r.session_id)
        for r in temporal.sessionize(df, on="ts", by=["u"], gap=20).collect()
    }
    for u in range(4):
        evs = sorted((ts, eid) for eid, uu, ts in rows if uu == u)
        seq, prev = 0, None
        for ts, eid in evs:
            if prev is not None and ts - prev > 20:
                seq += 1
            prev = ts
            assert got[eid] == (seq, f"{u}#{seq}")


def test_sessionize_gap_boundary_and_singletons(spark):
    # gap EXACTLY equal stays in-session; lone events are session 0
    df = spark.createDataFrame(
        [(0, 1, 0), (1, 1, 20), (2, 1, 41), (3, 2, 99)], "eid int, u int, ts int"
    )
    got = {r.eid: r.session_seq for r in temporal.sessionize(df, by=["u"], gap=20).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 0}


def test_sessionize_single_shuffle_plan(spark):
    df = spark.createDataFrame([(0, 1, 0)], "eid int, u int, ts int")
    plan = (
        temporal.sessionize(df, by=["u"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") <= 1 and "Join" not in plan
    with pytest.raises(ValueError, match="by-key"):
        temporal.sessionize(df, by=[])


def test_asof_timestamp_and_date_epochs(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    L = spark.createDataFrame(
        [(1, "2024-01-10", 0)], "k int, d string, lv int"
    ).select("k", F.col("d").cast("date").alias("d"), "lv")
    R = spark.createDataFrame(
        [(1, "2024-01-08", 7), (1, "2024-01-11", 8)], "k int, d string, rv int"
    ).select("k", F.col("d").cast("date").alias("d"), "rv")
    row = temporal.asof_join(L, R, on="d", by=["k"], tolerance=5).collect()[0]
    assert row.rv == 7
    row = temporal.asof_join(L, R, on="d", by=["k"], tolerance=1).collect()[0]
    assert row.rv is None
