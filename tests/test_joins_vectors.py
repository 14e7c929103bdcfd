"""Semantic tests for the temporal joins (as-of, range) and the new
vector operators (IVF top-k, embedding near-dup) on small hand-built
frames where the expected answer is checkable by eye. The sf0.01
DuckDB oracle (tools/check_oracle.py) covers them at data scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.operators import joins, similarity


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_join_matches_most_recent_at_or_before(spark):
    left = _ts(
        spark,
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c")],
        "k long, ts long, tag string",
    )
    right = _ts(
        spark,
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (3, 1, 99.0)],
        "k long, ts long, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["asof_ts"], r["asof_v"])
        for r in joins.asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    # same-ts right row matches; most recent prior wins; no match -> nulls
    assert out[(1, 100)] == (100, 10.0)
    assert out[(1, 205)] == (200, 20.0)
    assert out[(2, 50)] == (None, None)


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = _ts(spark, [(1, 5, "x")], "k long, ts long, tag string")
    right = _ts(spark, [(1, 1, 7.0)], "k long, ts long, v double")
    out = joins.asof_join(left, right, on="k", right_cols=["v"])
    assert set(out.columns) == {"k", "ts", "tag", "asof_ts", "asof_v"}
    assert out.count() == 1


def test_range_join_inclusive_bounds(spark):
    fact = _ts(spark, [(1,), (16,), (17,), (50,), (51,)], "x long")
    dim = _ts(spark, [("lo", 1, 16), ("hi", 17, 50)], "tier string, lo long, hi long")
    got = {
        (r["x"], r["tier"])
        for r in joins.range_join(fact, dim, "x").collect()
    }
    assert got == {(1, "lo"), (16, "lo"), (17, "hi"), (50, "hi")}


def test_embedding_neardup_finds_planted_duplicate(spark):
    rows = [
        (0, [1.0, 0.0, 1.0, 0.5]),
        (1, [1.0, 0.01, 1.0, 0.5]),   # near-dup of 0, same sign bucket
        (2, [-1.0, 0.5, -1.0, 0.5]),  # different bucket
    ]
    df = _ts(spark, rows, "vec_id long, embedding array<double>")
    pairs = similarity.embedding_neardup_pairs(df, threshold=0.95, bits=4).collect()
    assert [(p["vec_a"], p["vec_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["cos_sim"] > 0.99


def test_ivf_topk_matches_bruteforce_when_probing_all_cells(spark, sf_dir):
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    # probing every cell makes IVF exact -> must equal brute force
    ivf = similarity.topk_cosine_ivf(emb, query_id=0, k=5, n_centroids=4, n_probe=4)
    bf = similarity.topk_cosine_bruteforce(emb, query_id=0, k=5)
    assert [(r["vec_id"], r["cos_sim"]) for r in ivf.collect()] == [
        (r["vec_id"], r["cos_sim"]) for r in bf.collect()
    ]


def test_ivf_probe_prunes_cells(spark, sf_dir):
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    out = similarity.topk_cosine_ivf(emb, query_id=0, k=5, n_centroids=8, n_probe=2)
    cells = {r["cell"] for r in out.collect()}
    assert len(cells) <= 2  # results come only from probed cells


def test_multi_query_topk_matches_single_bruteforce(spark, sf_dir):
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    multi = similarity.topk_cosine_multi(emb, query_ids=[0, 7], k=4)
    for qid in (0, 7):
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in sorted(multi.filter(F.col("query_id") == qid).collect(),
                            key=lambda r: r["rn"])
        ]
        want = [
            (r["vec_id"], r["cos_sim"])
            for r in similarity.topk_cosine_bruteforce(emb, query_id=qid, k=4).collect()
        ]
        assert got == want


def test_auto_bits_keeps_bucket_size_constant():
    from agentic_workflow_for_data_transformation_spark.operators.similarity import auto_bits

    assert auto_bits(0) == 2
    assert auto_bits(200) == 2          # at/below target: floor
    assert auto_bits(2_000) == 4        # sf0.1 embeddings -> 16 buckets
    assert auto_bits(20_000) == 7       # sf1 -> 128 buckets
    assert auto_bits(20_000_000) == 16  # capped at hi
    # expected bucket size n/2^bits stays within ~2x of target
    for n in (500, 5_000, 50_000, 5_000_000):
        bits = auto_bits(n)
        assert n / 2**bits <= 400, (n, bits)


def test_interval_containment_join_late_events(spark):
    """The final period must close at a DATA-DERIVED horizon: an event
    after the last boundary (and after any fixed calendar constant)
    still lands in the last period instead of crashing F.sequence or
    silently dropping."""
    from datetime import datetime

    from agentic_workflow_for_data_transformation_spark.operators.joins import (
        interval_containment_join,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5, 12, 0), 7, "signup"),
            (2, datetime(2024, 1, 7, 9, 0), 7, "click"),
            (3, datetime(2024, 3, 1, 0, 30), 7, "signup"),
            (4, datetime(2026, 6, 15, 8, 0), 7, "click"),   # far future
            (5, datetime(2024, 1, 1, 0, 0), 8, "click"),    # before any boundary
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    from pyspark.sql import functions as F

    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("period_start")
    )
    got = {
        r["event_id"]: r["period_start"]
        for r in interval_containment_join(ev, signups).collect()
    }
    # events 1,2 fall in the first period; 3,4 in the second (4 only
    # because the horizon is max(ts)+1day, not a constant); 5 has no
    # containing period (inner semantics)
    assert got == {
        1: datetime(2024, 1, 5, 12, 0),
        2: datetime(2024, 1, 5, 12, 0),
        3: datetime(2024, 3, 1, 0, 30),
        4: datetime(2024, 3, 1, 0, 30),
    }


def test_interval_containment_join_out_of_range_boundary(spark):
    """A boundary AFTER its key's last event (or a boundary key with no
    events at all) must degrade to an empty period instead of crashing
    F.sequence with end < start, and must not steal events from the
    preceding period."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.operators.joins import (
        interval_containment_join,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5, 12, 0), 7, "click"),
            (2, datetime(2024, 1, 7, 9, 0), 7, "click"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    bounds = spark.createDataFrame(
        [
            (7, datetime(2024, 1, 1, 0, 0)),
            # boundary long after user 7's last event: empty final period
            (7, datetime(2025, 6, 1, 0, 0)),
            # boundary for a user with no events: drops out entirely
            (9, datetime(2024, 1, 1, 0, 0)),
        ],
        "user_id long, period_start timestamp",
    )
    got = {
        r["event_id"]: r["period_start"]
        for r in interval_containment_join(ev, bounds).collect()
    }
    assert got == {
        1: datetime(2024, 1, 1, 0, 0),
        2: datetime(2024, 1, 1, 0, 0),
    }


def test_interval_containment_join_long_periods_month_tier(spark):
    """A multi-year interior period must route through the MONTH
    bucket tier and still assign events exactly: same output as the
    day tier would give, ~37 bucket rows instead of ~1100."""
    from datetime import datetime

    from agentic_workflow_for_data_transformation_spark.operators.joins import (
        interval_containment_join,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2021, 1, 10, 12, 0), 5, "click"),   # period 1
            (2, datetime(2022, 7, 4, 9, 30), 5, "click"),    # deep inside period 1
            (3, datetime(2024, 2, 2, 0, 0), 5, "click"),     # period 2 (short, final)
            (4, datetime(2021, 1, 1, 0, 0), 5, "click"),     # exactly at boundary 1
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    bounds = spark.createDataFrame(
        [
            (5, datetime(2021, 1, 1, 0, 0)),   # 3-year period -> month tier
            (5, datetime(2024, 1, 15, 0, 0)),  # final period -> day tier
        ],
        "user_id long, period_start timestamp",
    )
    got = {
        r["event_id"]: r["period_start"]
        for r in interval_containment_join(ev, bounds).collect()
    }
    assert got == {
        1: datetime(2021, 1, 1, 0, 0),
        2: datetime(2021, 1, 1, 0, 0),
        4: datetime(2021, 1, 1, 0, 0),
        3: datetime(2024, 1, 15, 0, 0),
    }


def test_interval_overlap_join_planted_and_tiers(spark):
    """Planted overlap cases across both bucket tiers: short-short,
    short-long (tier-crossing: the pair must meet in the month-bucket
    join), long-long, touching-but-not-overlapping (half-open), and an
    inverted interval that must vanish instead of crashing."""
    import datetime as dt

    from agentic_workflow_for_data_transformation_spark.operators import joins

    d = lambda day, h=0: dt.datetime(2024, 3, day, h)  # noqa: E731
    rows = [
        # (id, key, start, end)
        (1, 1, d(1, 0), d(1, 5)),     # short
        (2, 1, d(1, 4), d(1, 9)),     # short, overlaps 1
        (3, 1, d(1, 5), d(1, 6)),     # touches 1's end exactly -> NO overlap with 1, inside 2
        (4, 1, d(2), dt.datetime(2024, 8, 1)),  # LONG, overlaps nothing on day 1... starts day 2
        (5, 1, d(3), d(4)),           # short inside 4's span -> overlaps 4
        (6, 1, dt.datetime(2024, 2, 1), dt.datetime(2024, 9, 1)),  # LONG, overlaps 1,2,3,4,5
        (7, 2, d(1, 0), d(1, 5)),     # other key: no cross-key pairs
        (8, 1, d(9), d(8)),           # inverted -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, user_id long, s timestamp, e timestamp")
    out = joins.interval_overlap_join(
        df.withColumnRenamed("id", "a_id"),
        df.withColumnRenamed("id", "b_id"),
        key_col="user_id", start_col="s", end_col="e",
        left_id="a_id", right_id="b_id", anti_reflexive=True,
    )
    got = {(r["a_id"], r["b_id"]) for r in out.collect()}
    want = {(1, 2), (2, 3), (4, 5), (1, 6), (2, 6), (3, 6), (4, 6), (5, 6)}
    assert got == want, got ^ want
    # plan shape: equi hash/sortmerge joins only — the whole point is
    # avoiding the per-key non-equi BNLJ
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_nearest_picks_closer_side_ties_backward(spark):
    left = _ts(
        spark,
        [(1, 100, "a"), (1, 206, "b"), (1, 150, "c"), (2, 50, "d")],
        "k long, ts long, tag string",
    )
    right = _ts(
        spark,
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (3, 1, 99.0)],
        "k long, ts long, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["asof_ts"], r["asof_v"])
        for r in joins.asof_join(
            left, right, on="k", right_cols=["v"], direction="nearest"
        ).collect()
    }
    assert out[(1, 100)] == (100, 10.0)   # exact match
    assert out[(1, 206)] == (200, 20.0)   # 6 back vs 94 forward
    assert out[(1, 150)] == (100, 10.0)   # 50 back vs 50 forward: tie -> backward
    assert out[(2, 50)] == (None, None)   # no right rows for key


def test_asof_join_nearest_one_exchange(spark):
    left = _ts(spark, [(1, 5, "x")], "k long, ts long, tag string")
    right = _ts(spark, [(1, 1, 7.0), (1, 9, 8.0)], "k long, ts long, v double")
    out = joins.asof_join(left, right, on="k", right_cols=["v"], direction="nearest")
    assert {(r["asof_ts"], r["asof_v"]) for r in out.collect()} == {(1, 7.0)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both running fills share one partitioning: the second Window sits
    # on a Sort with NO exchange between the two Window nodes (the only
    # exchanges are the initial partitioning, which AQE may push into
    # the union legs)
    first = plan.index("Window [")
    second = plan.index("Window [", first + 1)
    between = plan[first:second]
    assert "Sort [" in between and "Exchange" not in between, between
    assert "unboundedfollowing" not in plan.lower(), plan[:1500]


def test_asof_join_nearest_subsecond_timestamps(spark):
    """Sub-second distances must not truncate: 0.9 s back vs 0.4 s
    forward picks the FORWARD row (second-floor longs would compare
    0 <= 0 and wrongly keep backward)."""
    left = spark.sql(
        "SELECT 1L AS k, timestamp'2024-01-01 00:00:10.0' AS ts"
    )
    right = spark.sql(
        "SELECT 1L AS k, timestamp'2024-01-01 00:00:09.1' AS ts, 1.0D AS v "
        "UNION ALL "
        "SELECT 1L, timestamp'2024-01-01 00:00:10.4', 2.0D"
    )
    out = joins.asof_join(left, right, on="k", right_cols=["v"], direction="nearest")
    assert [r["asof_v"] for r in out.collect()] == [2.0]


def test_asof_join_nearest_date_keys(spark):
    """DATE-typed ts columns must still compare both sides (a plain
    long cast of a date is NULL, silently forcing the forward match)."""
    left = spark.sql("SELECT 1L AS k, date'2024-03-10' AS ts")
    right = spark.sql(
        "SELECT 1L AS k, date'2024-03-09' AS ts, 10.0D AS v "
        "UNION ALL SELECT 1L, date'2024-03-14', 20.0D"
    )
    out = joins.asof_join(left, right, on="k", right_cols=["v"], direction="nearest")
    # 1 day back vs 4 days forward -> backward
    assert [r["asof_v"] for r in out.collect()] == [10.0]


def test_asof_join_tolerance_nulls_far_matches(spark):
    """merge_asof-parity tolerance: matches farther than the bound
    null out exactly like a missing match, in every direction, for
    numeric and timestamp keys (seconds unit)."""
    left = _ts(spark, [(1, 100, "a"), (1, 210, "b")], "k long, ts long, tag string")
    right = _ts(spark, [(1, 95, 1.0), (1, 300, 2.0)], "k long, ts long, v double")
    out = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in joins.asof_join(
            left, right, on="k", right_cols=["v"], direction="nearest",
            tolerance=20,
        ).collect()
    }
    assert out[(1, 100)] == 1.0   # distance 5 <= 20
    assert out[(1, 210)] is None  # nearest is 90 away -> nulled
    # backward with tolerance
    out_b = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in joins.asof_join(
            left, right, on="k", right_cols=["v"], direction="backward",
            tolerance=4,
        ).collect()
    }
    assert out_b[(1, 100)] is None  # 5 > 4
    assert out_b[(1, 210)] is None  # backward match 115 away
    # timestamps: tolerance is SECONDS
    lts = spark.sql("SELECT 1L AS k, timestamp'2024-01-01 00:10:00' AS ts")
    rts = spark.sql(
        "SELECT 1L AS k, timestamp'2024-01-01 00:00:00' AS ts, 9.0D AS v"
    )
    got = joins.asof_join(
        lts, rts, on="k", right_cols=["v"], direction="backward",
        tolerance=600,
    ).collect()[0]
    assert got["asof_v"] == 9.0  # exactly at the 600 s bound (inclusive)
    got2 = joins.asof_join(
        lts, rts, on="k", right_cols=["v"], direction="backward",
        tolerance=599,
    ).collect()[0]
    assert got2["asof_v"] is None


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_null_payload_stays_null(spark, direction):
    """A NULL payload cell on the matched right row must come through
    as NULL — per-column running fills would stitch it from a farther
    right row whose payload is non-null (different row than the one
    asof_ts came from); the struct-packed fill makes every asof_*
    cell come from the single matched row, as a LATERAL one-row pick
    would."""
    left = _ts(spark, [(1, 100, "a")], "k long, ts long, tag string")
    # the matched row (ts=90 backward / 110 forward / 90 nearest-tie)
    # carries a NULL v; farther rows carry non-null v in BOTH
    # directions so a cross-row stitch would surface 7.0 or 9.0
    right = _ts(
        spark,
        [(1, 10, 7.0), (1, 90, None), (1, 110, None), (1, 200, 9.0)],
        "k long, ts long, v double",
    )
    row = joins.asof_join(
        left, right, on="k", right_cols=["v"], direction=direction
    ).collect()[0]
    expected_ts = 110 if direction == "forward" else 90
    assert row["asof_ts"] == expected_ts
    assert row["asof_v"] is None


def test_merge_upsert_semantics(spark):
    from agentic_workflow_for_data_transformation_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "name", "amt"],
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], ["id", "name", "amt"]
    )
    out = {r["id"]: (r["name"], r["amt"], r["merge_action"])
           for r in merge_upsert(base, updates, "id").collect()}
    assert out == {
        1: ("a", 10.0, "kept"),
        2: ("b2", 21.0, "updated"),
        3: ("c", 30.0, "kept"),
        4: ("d", 40.0, "inserted"),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        merge_upsert(base, updates.select("id", "amt", "name"), "id")


def test_label_centroid_similarity_identical_and_orthogonal(spark):
    """Two labels sharing a centroid direction read cosine 1.0; an
    orthogonal label reads 0.0; only a < b pairs are emitted."""
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        label_centroid_similarity,
    )

    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0], 0),
        (3, [2.0, 0.0, 0.0], 1),   # same direction as label 0
        (4, [0.0, 3.0, 0.0], 2),   # orthogonal to both
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {(r["label_a"], r["label_b"]): r["cosine"]
           for r in label_centroid_similarity(df).collect()}
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] == 0.0 and out[(1, 2)] == 0.0
