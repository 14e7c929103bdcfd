"""Property-based correctness (SURVEY.md §5): hypothesis generates
random predicate trees and pipelines over the people table; each spec
runs through the Spark compiler AND the spec->SQL generator on DuckDB,
and the row sets must match exactly. This checks the *compilers*, not
hand-picked cases: precedence, negation, BETWEEN/IN edges, empty
results, stacked ops."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, example, given, settings
from hypothesis import strategies as st

# Derandomize the whole fuzz suite: every @settings below inherits
# derandomize=True from this profile, so the gate cannot flake on a
# lucky/unlucky seed. Regressions found by a randomized run get pinned
# as @example (see the anova ssw-guard case).
settings.register_profile("derandomized", derandomize=True)
settings.load_profile("derandomized")

from agentic_workflow_for_data_transformation_spark.plans import compile_spec
from agentic_workflow_for_data_transformation_spark.plans.sqlgen import spec_to_sql

from conftest import PEOPLE_ROWS

PEOPLE_PDF = pd.DataFrame(PEOPLE_ROWS, columns=["name", "age", "city"])
CITIES = sorted(PEOPLE_PDF["city"])
NAMES = sorted(PEOPLE_PDF["name"])

ages = st.integers(min_value=15, max_value=60)
city_lits = st.sampled_from(CITIES + ["Nowhere"])
substrings = st.sampled_from(["a", "an", "on", "J", "z", "New", "ia"])


def age_cmp():
    return st.tuples(st.sampled_from(["gt", "ge", "lt", "le", "eq", "ne"]), ages).map(
        lambda t: {t[0]: ["age", t[1]]}
    )


def age_between():
    return st.tuples(ages, ages).map(
        lambda t: {"between": ["age", min(t), max(t)]}
    )


def city_pred():
    return st.one_of(
        city_lits.map(lambda c: {"eq": ["city", {"lit": c}]}),
        st.lists(city_lits, min_size=1, max_size=3).map(
            lambda cs: {"isin": ["city", cs]}
        ),
        substrings.map(lambda s: {"startswith": ["city", s]}),
        substrings.map(lambda s: {"contains": ["name", s]}),
    )


leaf = st.one_of(age_cmp(), age_between(), city_pred())

predicate = st.recursive(
    leaf,
    lambda children: st.one_of(
        st.lists(children, min_size=2, max_size=3).map(lambda cs: {"and": cs}),
        st.lists(children, min_size=2, max_size=3).map(lambda cs: {"or": cs}),
        children.map(lambda c: {"not": c}),
    ),
    max_leaves=6,
)


def _duck(sql: str) -> list[tuple]:
    from hypothesis import assume

    con = duckdb.connect()
    con.register("people", PEOPLE_PDF)
    try:
        rows = con.execute(sql).fetchall()
    except duckdb.InternalException:
        # DuckDB assertion failure (e.g. its optimizer chokes on
        # duplicate OR-disjuncts + LIMIT 0, seen on 1.0.0): the ORACLE
        # crashed, so it can't adjudicate this example — reject it
        # rather than fail the engine under test.
        con.close()
        assume(False)
    con.close()
    return sorted(tuple(str(v) for v in r) for r in rows)


def _spark_rows(df) -> list[tuple]:
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate)
def test_random_predicates_match_duckdb(spark_module, expr):
    spec = {"ops": [{"op": "filter", "expr": expr}]}
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    proj=st.sampled_from([["name"], ["name", "age"], ["city", "age"]]),
    sort_desc=st.booleans(),
    n=st.integers(min_value=0, max_value=12),
)
def test_random_pipelines_match_duckdb(spark_module, expr, proj, sort_desc, n):
    # filter -> computed column -> sort (with name tiebreak) -> limit -> select
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "with_column", "name": "age2", "expr": {"mul": ["age", 2]}},
            {
                "op": "sort",
                "keys": [
                    {"col": "age", "asc": not sort_desc},
                    {"col": "name", "asc": True},
                ],
            },
            {"op": "limit", "n": n},
            {"op": "select", "cols": proj + ["age2"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@pytest.fixture(scope="module")
def spark_module(spark, people):
    # hypothesis reruns the test body many times; bind the DataFrame
    # once so per-example cost is one filter job, not a session build
    return people


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    keys=st.sampled_from([[], ["city"]]),
    fn=st.sampled_from(["count", "avg", "sum", "min", "max", "count_distinct",
                        "median"]),
)
def test_random_aggregates_match_duckdb(spark_module, expr, keys, fn):
    """Grouped AND global (empty-key) aggregates over filtered input,
    including count_distinct — the round-2 grammar surface."""
    col = "*" if fn == "count" else "age"
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "groupby_agg", "keys": keys,
             "aggs": [{"fn": fn, "col": col, "alias": "m"}]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


# ---- join/union fuzz (round-4 grammar surface) ---------------------------
# A dim table that deliberately misses five people-cities and contains
# one city no person has: every join type has matched AND unmatched
# rows on both sides. people2 shares one exact row with people so
# union-distinct actually dedups.
CITIES_ROWS = [
    ("New York", "east"), ("Chicago", "central"), ("Seattle", "west"),
    ("Austin", "south"), ("Miami", "south"), ("Nowhere", "void"),
]
CITIES_PDF = pd.DataFrame(CITIES_ROWS, columns=["city", "region"])
PEOPLE2_ROWS = [
    ("Karl", 28, "Chicago"), ("Alice", 25, "New York"), ("Luna", 33, "Reno"),
]
PEOPLE2_PDF = pd.DataFrame(PEOPLE2_ROWS, columns=["name", "age", "city"])


def _norm_num(v) -> str:
    # DuckDB widens sum(BIGINT) to HUGEINT (float64 via pandas) where
    # Spark keeps LongType: compare integral floats as ints
    if isinstance(v, float) and not pd.isna(v) and v == int(v):
        return str(int(v))
    return str(v)


def _name_sorted_rows(pdf: pd.DataFrame) -> list[tuple]:
    # engines order join output columns differently (Spark leads with
    # the USING keys); compare by sorted column name like the driver's
    # oracle gate does
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_norm_num(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def _duck2(sql: str) -> list[tuple]:
    from hypothesis import assume

    con = duckdb.connect()
    con.register("people", PEOPLE_PDF)
    con.register("cities", CITIES_PDF)
    con.register("people2", PEOPLE2_PDF)
    try:
        pdf = con.execute(sql).fetch_df()
    except duckdb.InternalException:
        # same DuckDB-1.0.0 optimizer assertion `_duck` guards against
        # (duplicate OR-disjuncts + LIMIT 0): the oracle crashed, the
        # engine did not — reject the example instead of failing.
        assume(False)
    finally:
        con.close()
    return _name_sorted_rows(pdf)


@pytest.fixture(scope="module")
def join_tables(spark):
    from pyspark.sql import types as T

    cities = spark.createDataFrame(
        CITIES_ROWS,
        T.StructType([
            T.StructField("city", T.StringType(), False),
            T.StructField("region", T.StringType(), False),
        ]),
    )
    people2 = spark.createDataFrame(
        PEOPLE2_ROWS,
        T.StructType([
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.LongType(), False),
            T.StructField("city", T.StringType(), False),
        ]),
    )
    return {"cities": cities, "people2": people2}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    how=st.sampled_from(["inner", "left", "right", "full",
                         "left_semi", "left_anti", "cross"]),
)
def test_random_joins_match_duckdb(spark_module, join_tables, expr, how):
    """Every spec join type over a filtered left side, against the
    sqlgen rendering (JOIN ... USING / SEMI / ANTI): matched and
    unmatched rows on both sides, null-extension included. 'cross'
    with an 'on' list is an equi-join in Spark, and sqlgen must render
    that, not a cartesian product."""
    spec = {"ops": [
        {"op": "filter", "expr": expr},
        {"op": "join", "right": "cities", "on": ["city"], "how": how},
    ]}
    got = _name_sorted_rows(compile_spec(spark_module, spec, tables=join_tables).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, distinct=st.booleans())
def test_random_unions_match_duckdb(spark_module, join_tables, expr, distinct):
    """unionByName (+ optional distinct) vs UNION [ALL] BY NAME —
    including the duplicate row people shares with people2."""
    op = {"op": "union", "right": "people2"}
    if distinct:
        op["distinct"] = True
    spec = {"ops": [{"op": "filter", "expr": expr}, op]}
    got = _name_sorted_rows(compile_spec(spark_module, spec, tables=join_tables).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(["row_number", "rank", "dense_rank", "lag", "lead",
                        "sum", "min", "max", "count", "avg", "ntile",
                        "percent_rank", "cume_dist", "first_value"]),
    parts=st.sampled_from([[], ["city"]]),
    age_desc=st.booleans(),
)
def test_random_windows_match_duckdb(spark_module, fn, parts, age_desc):
    """Every spec window function (ranking incl. ntile/percent_rank/
    cume_dist/first_value, lag/lead, ordered aggregates) against
    sqlgen's OVER rendering. The (age, name) order is total (names
    unique), so ranking and lag/lead are deterministic; integer sums
    make ordered aggregates exact; percent_rank/cume_dist divide
    integers in float64, bit-identical under a total order."""
    e = {"fn": fn, "col": "age", "alias": "w"}
    if fn == "ntile":
        e["n"] = 3
    spec = {"ops": [{
        "op": "window",
        "partition_by": parts,
        "order_by": [
            {"col": "age", "asc": not age_desc},
            {"col": "name", "asc": True},
        ],
        "exprs": [e],
    }]}
    got = _name_sorted_rows(compile_spec(spark_module, spec).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


# ---- null-handling fuzz: three-valued logic + null ordering --------------
PEOPLE_NULL_ROWS = PEOPLE_ROWS + [
    ("Kira", None, "Chicago"), ("Liam", 27, None), ("Mona", None, None),
]
PEOPLE_NULL_PDF = pd.DataFrame(
    PEOPLE_NULL_ROWS, columns=["name", "age", "city"]
).astype({"age": "Int64"})


def _norm_null(v) -> str:
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    return str(v)


def _null_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_norm_null(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


@pytest.fixture(scope="module")
def people_nulls(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("name", T.StringType(), False),
        T.StructField("age", T.LongType(), True),
        T.StructField("city", T.StringType(), True),
    ])
    return spark.createDataFrame(PEOPLE_NULL_ROWS, schema)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, sort_desc=st.booleans(), n=st.integers(min_value=0, max_value=13))
def test_null_semantics_match_duckdb(people_nulls, expr, sort_desc, n):
    """Three-valued logic end to end: random predicates over a table
    WITH nulls (a NULL comparison filters the row in both engines, NOT
    included), then a sort+limit whose boundary rows depend on the
    NULLS FIRST/LAST mapping sqlgen pins to Spark's defaults."""
    spec = {"ops": [
        {"op": "filter", "expr": expr},
        {"op": "sort", "keys": [
            {"col": "age", "asc": not sort_desc},
            {"col": "name", "asc": True},
        ]},
        {"op": "limit", "n": n},
    ]}
    got = _null_rows(compile_spec(people_nulls, spec).toPandas())
    con = duckdb.connect()
    con.register("people_n", PEOPLE_NULL_PDF)
    try:
        want = _null_rows(con.execute(spec_to_sql(spec, "people_n")).fetch_df())
    except duckdb.InternalException:
        # DuckDB 1.0.0 optimizer bug: NOT over an OR of *identical* AND
        # subtrees plus LIMIT 0 trips an internal assertion ("Attempted to
        # dereference unique_ptr that is NULL"). The Spark side already
        # evaluated the same spec fine above; the oracle engine crashed, not
        # ours — discard the example rather than fail on a DuckDB defect.
        assume(False)
    finally:
        con.close()
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    do_rename=st.booleans(),
    do_drop=st.booleans(),
    do_distinct=st.booleans(),
    frac=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
def test_random_schema_ops_match_duckdb(
    spark_module, expr, do_rename, do_drop, do_distinct, frac
):
    """Schema-mutating ops stacked in random combinations: rename,
    drop, deterministic hash sample (including keep-none/keep-all
    rates), distinct — the part of the relational core the pipeline
    fuzz didn't reach."""
    ops = [{"op": "filter", "expr": expr}]
    if do_rename:
        ops.append({"op": "rename", "renames": {"city": "town"}})
    if do_drop:
        ops.append({"op": "drop", "cols": ["age"]})
    ops.append({"op": "sample", "fraction": frac, "key": "name"})
    if do_distinct:
        ops.append({"op": "distinct"})
    spec = {"ops": ops}
    got = _name_sorted_rows(compile_spec(spark_module, spec).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


# ---- round-5 grammar surface: pivot / rollup / sliding frames ------------

@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    vals=st.lists(st.sampled_from(NAMES + ["Zed"]), min_size=1, max_size=3,
                  unique=True),
    fn=st.sampled_from(["count", "min", "max"]),
)
def test_random_pivots_match_duckdb(spark_module, expr, vals, fn):
    """Declared-values pivot over filtered input: count cells
    null-fill to 0 on both sides (count FILTER of zero rows is 0);
    min/max keep NULL for absent cells on both sides."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "pivot", "keys": ["city"], "col": "name",
             "values": list(vals),
             "agg": {"fn": fn, "col": "*" if fn == "count" else "age"},
             "aliases": [f"v{i}" for i in range(len(vals))]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, fn=st.sampled_from(["count", "min", "max", "sum"]))
def test_random_rollups_match_duckdb(spark_module, expr, fn):
    """ROLLUP over filtered input: subtotal rows, NULL key levels, and
    the grouping_id bitmask must agree bit-for-bit across engines.
    Empty input is excluded — Spark (DataFrame and SQL alike) emits 0
    rows there while standard SQL emits the grand-total row; this
    engine keeps Spark semantics (see
    test_spec.test_rollup_empty_input_is_spark_semantics)."""
    from hypothesis import assume

    from agentic_workflow_for_data_transformation_spark.plans.sqlgen import expr_to_sql

    n = int(_duck(f"SELECT count(*) FROM people WHERE {expr_to_sql(expr)}")[0][0])
    assume(n > 0)
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "rollup", "keys": ["city", "name"],
             "aggs": [{"fn": fn, "col": "*" if fn == "count" else "age",
                       "alias": "m"}]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    n_prec=st.integers(min_value=0, max_value=5),
    fn=st.sampled_from(["sum", "min", "max", "count", "avg"]),
)
def test_random_sliding_frames_match_duckdb(spark_module, expr, n_prec, fn):
    """ROWS frame aggregates ordered by the (unique) age column: frame
    contents are total-order deterministic, integer sums are exact, so
    even avg compares as an identical IEEE double."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "window", "partition_by": [],
             "order_by": [{"col": "age", "asc": True}],
             "exprs": [{"fn": fn, "col": "age", "alias": "m",
                        "rows_preceding": n_prec}]},
            {"op": "select", "cols": ["name", "age", "m"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


# ---- round-5/6 relational-op fuzz: mode / pivot / listagg / as-of --------


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    kind=st.sampled_from(["mode", "listagg", "pivot"]),
)
def test_random_mode_pivot_listagg_match_duckdb(spark_module, expr, kind):
    """The round-5/6 relational extensions against their sqlgen
    renderings, over a randomly filtered input (including the empty
    frame): deterministic mode tie-break, declared-values pivot with
    count null-fill (one declared value never occurs), ordered
    LISTAGG."""
    if kind == "mode":
        op = {"op": "mode", "keys": ["city"], "col": "name"}
    elif kind == "listagg":
        op = {"op": "groupby_agg", "keys": ["city"],
              "aggs": [{"fn": "listagg", "col": "name", "alias": "names"}]}
    else:
        op = {"op": "pivot", "keys": ["city"], "col": "name",
              "values": ["Alice", "Bob", "Zzz_never"],
              "agg": {"fn": "count", "col": "*"},
              "aliases": ["n_alice", "n_bob", "n_zzz"]}
    spec = {"ops": [{"op": "filter", "expr": expr}, op]}
    got = _name_sorted_rows(compile_spec(spark_module, spec).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lts=st.lists(st.integers(min_value=0, max_value=40),
                 min_size=1, max_size=6),
    rts=st.lists(st.integers(min_value=0, max_value=40),
                 min_size=0, max_size=6, unique=True),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=25)),
)
def test_random_asof_match_duckdb(spark, lts, rts, direction, tolerance):
    """asof_join (all three directions) on random integer timestamps —
    equal-ts matches, unmatched keys, empty right sides, nearest's
    ties-to-backward rule, and random merge_asof tolerances (including
    0 = exact-ts only) — vs the LATERAL sqlgen oracle. Right (k, ts)
    unique by construction (ties among identical right timestamps are
    engine-arbitrary by documented contract). Every third right row
    carries a NULL payload: a matched-row NULL must come through as
    NULL, not get stitched from a farther non-null row (the struct-
    packed running fill's contract; operators/joins.py)."""
    left_rows = [(1, t, i) for i, t in enumerate(lts)] + [(2, 7, 99)]
    # key 2 never matches; t % 3 == 0 rows carry a NULL payload
    right_rows = [(1, t, None if t % 3 == 0 else t * 2.0) for t in rts]
    left = spark.createDataFrame(left_rows, "k long, ts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double") \
        if right_rows else spark.createDataFrame([], "k long, ts long, v double")
    spec_op = {
        "op": "asof_join", "right": "rtab", "on": "k", "ts": "ts",
        "right_cols": ["v"], "direction": direction,
    }
    if tolerance is not None:
        spec_op["tolerance"] = tolerance  # raw units on the numeric key
        spec_op["tolerance_unit"] = "raw"  # required alongside tolerance
    spec = {"ops": [spec_op]}
    got = _name_sorted_rows(
        compile_spec(left, spec, tables={"rtab": right}).toPandas()
    )
    con = duckdb.connect()
    con.register("ltab", pd.DataFrame(left_rows, columns=["k", "ts", "lid"]))
    con.register(
        "rtab", pd.DataFrame(right_rows, columns=["k", "ts", "v"]).astype(
            {"k": "int64", "ts": "int64", "v": "float64"}
        )
    )
    try:
        want = _name_sorted_rows(con.execute(spec_to_sql(spec, "ltab")).fetch_df())
    finally:
        con.close()
    assert got == want, (direction, got, want)


# ---- round-7 op fuzz: explode / keyed dedup / median & percentile --------


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    pattern=st.sampled_from(["a", "e", "o", "n", "\\s+"]),
)
def test_random_explode_matches_duckdb(spark_module, expr, pattern):
    """The explode op across the regex-dialect boundary (Java regex vs
    DuckDB RE2 — single-char and \\s+ patterns mean the same in both):
    same tokens, same empty-token drops, same no-token row removal."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "explode", "col": "name", "alias": "tok",
             "pattern": pattern},
            {"op": "select", "cols": ["name", "city", "tok"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, keep=st.sampled_from(["min", "max"]))
def test_random_dedup_matches_duckdb(spark_module, expr, keep):
    """Keyed dedup with an explicit keep order: both engines must pick
    the SAME representative row per key (age is unique, so the order
    is total), including over empty filtered input."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "dedup", "keys": ["city"], "keep_col": "age",
             "keep": keep},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    n_prec=st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    parts=st.sampled_from([[], ["city"]]),
)
def test_random_median_windows_match_duckdb(spark_module, expr, n_prec, parts):
    """Window median (cumulative and sliding ROWS frames): Spark
    rejects median() over ordered windows, so the compiler builds it
    from collect_list over the same frame + interpolated array median
    — the values must still match DuckDB's native median() OVER
    exactly (lo + (hi-lo)/2 over integer-valued doubles)."""
    e = {"fn": "median", "col": "age", "alias": "m"}
    if n_prec is not None:
        e["rows_preceding"] = n_prec
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "window", "partition_by": parts,
             "order_by": [{"col": "age", "asc": True}], "exprs": [e]},
            {"op": "select", "cols": ["name", "age", "m"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    p=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.95]),
    keys=st.sampled_from([[], ["city"]]),
)
def test_random_percentiles_match_duckdb(spark_module, expr, p, keys):
    """Exact interpolated percentile aggregate: Spark F.percentile ==
    DuckDB quantile_cont (index p*(n-1), linear interpolation) — over
    random filters including empty groups and the empty global frame."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "groupby_agg", "keys": keys,
             "aggs": [{"fn": "percentile", "col": "age", "p": p,
                       "alias": "q"}]},
        ]
    }
    got = _name_sorted_rows(compile_spec(spark_module, spec).toPandas())
    want = _duck2(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    t1=st.integers(min_value=0, max_value=80),
    t2=st.integers(min_value=0, max_value=80),
    with_else=st.booleans(),
)
def test_random_case_matches_duckdb(spark_module, expr, t1, t2, with_else):
    """CASE expression: first-match-wins branch order, overlapping
    (even inverted) thresholds, and the no-else -> NULL path must
    agree cell-for-cell across Spark's when-chain and ANSI CASE."""
    case = {"when": [
        [{"lt": ["age", t1]}, {"lit": "a"}],
        [{"lt": ["age", t2]}, {"lit": "b"}],
    ]}
    if with_else:
        case["else"] = {"lit": "z"}
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "with_column", "name": "tier", "expr": {"case": case}},
            {"op": "select", "cols": ["name", "age", "tier"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, fill=st.integers(min_value=-5, max_value=99))
def test_random_replace_in_place_matches_duckdb(spark_module, expr, fill):
    """with_column replace=True (the fillna/convert path): the updated
    column must be THE column downstream clauses see — in SQL a bare
    '*, expr AS name' leaves a duplicate and later references bind to
    the original (the round-7 sqlgen bug). Pipeline re-reads the
    replaced column in a filter and an aggregate to pin the binding."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "with_column", "name": "age", "replace": True,
             "expr": {"case": {"when": [[{"lt": ["age", fill]}, {"lit": fill}]],
                               "else": {"col": "age"}}}},
            {"op": "filter", "expr": {"ge": ["age", fill]}},
            {"op": "groupby_agg", "keys": ["city"],
             "aggs": [{"fn": "sum", "col": "age", "alias": "s",
                       "cast": "decimal(18,2)"}]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    terms=st.lists(
        st.sampled_from(["alice", "bob", "paris", "tokyo", "berlin", "zzz"]),
        min_size=1, max_size=3, unique=True,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_random_bm25_matches_duckdb(spark_module, expr, terms, k):
    """BM25 spec op under random upstream filters, term sets (including
    all-miss terms), and k: per-slice statistics, the rounded per-doc
    sum, and the doc-id tie-break at the k boundary must agree. The
    synthesized text column repeats the name so tf>1 saturation paths
    execute."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "with_column", "name": "txt",
             "expr": {"concat": [{"lower": {"col": "name"}}, {"lit": " "},
                                 {"lower": {"col": "city"}}, {"lit": " "},
                                 {"lower": {"col": "name"}}]}},
            {"op": "bm25", "terms": terms, "k": k,
             "id_col": "age", "text_col": "txt"},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(expr=predicate, keys=st.sampled_from([[], ["city"]]))
def test_random_count_nulls_matches_duckdb(people_nulls, expr, keys):
    """count_nulls over a table WITH nulls and random filters: the
    null count plus count rows and count(col) must reconcile
    (nulls + non-null = rows) and hash-match the CASE-WHEN oracle,
    including groups whose key is itself NULL."""
    spec = {"ops": [
        {"op": "filter", "expr": expr},
        {"op": "groupby_agg", "keys": keys,
         "aggs": [
            {"fn": "count", "col": "*", "alias": "n"},
            {"fn": "count", "col": "age", "alias": "n_age"},
            {"fn": "count_nulls", "col": "age", "alias": "n_null"},
         ]},
    ]}
    got_pdf = compile_spec(people_nulls, spec).toPandas()
    assert ((got_pdf["n_age"] + got_pdf["n_null"]) == got_pdf["n"]).all()
    got = _null_rows(got_pdf)
    con = duckdb.connect()
    con.register("people_n", PEOPLE_NULL_PDF)
    try:
        want = _null_rows(con.execute(spec_to_sql(spec, "people_n")).df())
    finally:
        con.close()
    assert got == want


def test_cumulative_median_tied_order_keys_match_duckdb(spark):
    """Round-8 advisor finding: cumulative window median over a TIED
    order column. The compiler keeps Spark's default ordered frame
    (RANGE unbounded..current — peers included) precisely because (a)
    it is also DuckDB's default for median() OVER and (b) it is the
    only tie-DETERMINISTIC frame: a ROWS frame over ties admits
    whichever tied row a partition delivers first. Ties 10,20,40,30
    at keys 1,2,2,3 must give the RANGE answer (10, 20, 20, 20)."""
    pdf = pd.DataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 2, 40.0), ("a", 3, 30.0),
         ("b", 1, 5.0), ("b", 1, 7.0), ("b", 2, 9.0)],
        columns=["g", "k", "v"],
    )
    spec = {
        "ops": [
            {"op": "window", "partition_by": ["g"],
             "order_by": [{"col": "k", "asc": True}],
             "exprs": [{"fn": "median", "col": "v", "alias": "m"}]},
            {"op": "select", "cols": ["g", "k", "v", "m"]},
        ]
    }
    df = spark.createDataFrame(pdf)
    got = sorted(tuple(r) for r in compile_spec(df, spec).collect())
    con = duckdb.connect()
    try:
        con.register("tied", pdf)
        want = sorted(
            tuple(r) for r in con.execute(spec_to_sql(spec, "tied")).fetchall()
        )
    finally:
        con.close()
    assert got == want
    by_gk = {(g, k, v): m for g, k, v, m in got}
    assert by_gk[("a", 2, 20.0)] == 20.0 and by_gk[("a", 2, 40.0)] == 20.0
    assert by_gk[("b", 1, 5.0)] == 6.0 and by_gk[("b", 1, 7.0)] == 6.0


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.sampled_from([0.0, 0.05, 0.1, 0.25, 0.5]),
    hi=st.sampled_from([0.6, 0.75, 0.9, 0.95, 1.0]),
)
def test_random_winsorize_match_duckdb(spark_module, lo, hi):
    """Winsorize spec op: Spark percentile() and DuckDB quantile_cont
    must clamp to the SAME band for any lo < hi over the people ages."""
    spec = {
        "ops": [
            {"op": "winsorize", "col": "age", "keys": ["city"],
             "lo": lo, "hi": hi},
            {"op": "select", "cols": ["name", "age_winsor", "was_clamped"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.floats(min_value=0.5, max_value=20, allow_nan=False),
        min_size=2, max_size=5,
    ),
)
def test_random_splits_match_duckdb(spark_module, weights):
    """split_assign: any weight vector must give identical per-row
    assignments on both engines (shared integer cutoffs)."""
    labels = [f"s{i}" for i in range(len(weights))]
    spec = {
        "ops": [
            {"op": "split_assign", "key": "name", "weights": weights,
             "labels": labels},
            {"op": "select", "cols": ["name", "split"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


# random word-salad documents mixing required stopwords, symbols,
# bullets, ellipses and plain words — the gopher battery's whole
# signal space, rendered to both engines
_gopher_words = st.sampled_from(
    ["the", "of", "with", "cat", "sat", "zig", "###", "a...b", "word"]
)
_gopher_lines = st.lists(
    st.lists(_gopher_words, min_size=1, max_size=30).map(" ".join).flatmap(
        lambda body: st.sampled_from(
            [body, "- " + body, "* " + body, body + "..."]
        )
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_gopher_lines, min_size=1, max_size=5))
def test_random_gopher_docs_match_duckdb(spark_module, docs):
    """Every gopher signal and rule boolean must agree bit-for-bit
    between the Spark battery and the sqlgen rendering over random
    multi-line documents exercising bullets, ellipses, symbols, and
    the required-stopword set."""
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    # spark_module is the session-scoped people DataFrame; its session
    # builds the ad-hoc documents frame
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "text"])
    spec = {"ops": [{"op": "gopher"}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


_dsir_docs = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "the", "of"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_dsir_docs)
def test_random_dsir_docs_match_duckdb(spark_module, docs):
    """DSIR weights over random (lang, text) rows: the hashed
    bucketing, smoothing, ln shapes, and decimal per-doc sums must
    agree to the rounded digit between the compiler and the sqlgen
    rendering — including corpora with zero target-language rows."""
    rows = [(i, lang, text) for i, (lang, text) in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "lang", "text"])
    spec = {"ops": [{"op": "dsir", "target_col": "lang", "target_val": "en"}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_dsir_docs)
def test_random_fertility_docs_match_duckdb(spark_module, docs):
    """Token fertility per language over random docs: regex token
    counts, integer sums, and the two per-group divisions must agree
    exactly across engines."""
    rows = [(i, lang, text) for i, (lang, text) in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "lang", "text"])
    spec = {"ops": [{"op": "fertility", "key": "lang"}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


# duplication-audit corpora: few words from a tiny vocabulary so
# 2-grams collide within and across the two-valued source column
_dup_docs = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_dup_docs, n=st.integers(min_value=2, max_value=3))
def test_random_dup_audit_matches_duckdb(spark_module, docs, n):
    """Per-source duplication audit over random tiny-vocabulary
    corpora: gram digests, window totals, occurrence ratios, and the
    left-join nulls for gram-less sources must agree exactly between
    the compiled plan and the rendered SQL."""
    rows = [(i, text, src) for i, (src, text) in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "text", "source"])
    spec = {"ops": [{"op": "dup_by_source", "key": "source", "n": n}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


_entropy_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "eee", "the"]),
        min_size=1,
        max_size=24,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=_entropy_docs)
def test_random_word_entropy_matches_duckdb(spark_module, docs):
    """Word entropy + evenness over random repetitive docs: the
    DECIMAL(18,8)-pinned cnt*log2(cnt) sums and both rounded outputs
    must agree bit-for-bit between the compiler and the sqlgen
    rendering — heavy duplication exercises the log terms hardest."""
    rows = [(i, t) for i, t in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "text"])
    spec = {"ops": [{"op": "word_entropy"}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=_entropy_docs,
    words=st.lists(
        st.sampled_from(["a", "dd", "eee", "zzz"]), min_size=1, max_size=3,
        unique=True,
    ),
)
def test_random_blocklist_matches_duckdb(spark_module, docs, words):
    """Blocklist screen over random docs and random word lists: the
    surviving row sets must match between arrays_overlap (Spark) and
    list_has_any (DuckDB) — word-level, case-folded, never substring."""
    rows = [(i, t) for i, t in enumerate(docs)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark_module.sparkSession.createDataFrame(rows, ["doc_id", "text"])
    spec = {"ops": [{"op": "blocklist", "words": words}]}
    got = _spark_rows(compile_spec(df, spec))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(str(v) for v in r)
        for r in con.sql(spec_to_sql(spec, "documents")).fetchall()
    )
    con.close()
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    alpha=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
    n_prec=st.integers(min_value=1, max_value=4),
    parts=st.sampled_from([[], ["city"]]),
)
def test_random_ewma_windows_match_duckdb(spark_module, expr, alpha,
                                          n_prec, parts):
    """EWMA window fn: the bounded weighted lag chain (a^j literals,
    ascending-j additions, renormalized over available lags) must be
    bit-identical between the Spark compiler and the sqlgen rendering
    on DuckDB for random predicates, smoothing factors, frame widths,
    and partitionings — including the short-history rows right after
    each partition start."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "window", "partition_by": parts,
             "order_by": [{"col": "age", "asc": True}],
             "exprs": [{"fn": "ewma", "col": "age", "alias": "e",
                        "alpha": alpha, "rows_preceding": n_prec}]},
            {"op": "select", "cols": ["name", "age", "e"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    expr=predicate,
    n=st.integers(min_value=3, max_value=6),
    z=st.sampled_from([1.0, 2.0, 3.0]),
)
def test_random_anomaly_flags_match_duckdb(spark_module, expr, n, z):
    """Rolling z-score anomaly op: the engine's O(1)-per-row
    cumulative-diff decimal sums must equal the oracle's plain bounded
    frame bit-for-bit for random predicates, window sizes, and
    thresholds — including the NULL-z short-history rows right after
    each partition start."""
    spec = {
        "ops": [
            {"op": "filter", "expr": expr},
            {"op": "anomaly", "col": "age", "key": "city",
             "order_col": "name", "n": n, "z": z},
            {"op": "select",
             "cols": ["name", "age", "moving_avg", "moving_std",
                      "zscore", "is_anomaly"]},
        ]
    }
    got = _spark_rows(compile_spec(spark_module, spec))
    want = _duck(spec_to_sql(spec, "people"))
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(),
                      st.decimals(min_value=-999, max_value=999, places=2)
                      .map(float)),
            st.one_of(st.none(),
                      st.decimals(min_value=-999, max_value=999, places=2)
                      .map(float)),
            st.one_of(st.none(),
                      st.decimals(min_value=-999, max_value=999, places=2)
                      .map(float)),
        ),
        min_size=0,
        max_size=25,
    ),
)
def test_random_null_frames_correlate_match_duckdb(spark, data):
    """Pairwise-complete Pearson fuzz (ADVICE r9 high): random frames
    with NULLs sprinkled in every column — each pair's (n, r) must
    match DuckDB's rendering of the same null-masked moment chain.
    This is the net the original global-n formula slipped through
    (its oracle replicated the same wrong formula, so only a
    differently-derived check could catch it: here pandas'
    pairwise-complete corr is the third opinion on r)."""
    import duckdb
    import pandas as pd

    spec = {"ops": [{"op": "correlate", "cols": ["a", "b", "c"]}]}
    pdf = pd.DataFrame(data, columns=["a", "b", "c"], dtype="float64")
    df = spark.createDataFrame(
        data or [(None, None, None)],
        "a: double, b: double, c: double",
    )
    if not data:
        df = df.limit(0)
    got = sorted(
        tuple(r) for r in compile_spec(df, spec).collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(tuple(r) for r in con.sql(spec_to_sql(spec, "t")).fetchall())
    assert got == want
    # third opinion: pandas pairwise-complete corr agrees wherever
    # both sides are defined
    pcorr = pdf.corr(min_periods=1)
    for col_a, col_b, n, r in got:
        if r is not None and n >= 2:
            ref = pcorr.loc[col_a, col_b]
            if ref == ref:  # not NaN
                assert abs(r - round(float(ref), 6)) < 2e-6, (col_a, col_b)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["g1", "g2", "g3"])),
            st.one_of(st.none(),
                      st.decimals(min_value=-999, max_value=999, places=2)
                      .map(float)),
        ),
        min_size=0,
        max_size=30,
    ),
)
# Pinned regression (r10): a singleton group whose s^2/n term
# round-trips through round(double, 12) leaves ssw ~ 1.5e-8 in Spark
# but exactly 0 in DuckDB; the NULL-F guard must compare the
# report-scale round(ssw, 6), not the raw float64 difference.
@example(data=[("g1", 430.45), ("g2", 0.0), ("g2", 0.0)])
def test_random_null_frames_anova_match_duckdb(spark, data):
    """One-way-ANOVA null fuzz (the correlate-fuzz pattern): random
    (group, value) frames with NULLs in both columns — the one-row
    (k, n, ss_between, ss_within, f_stat, eta_sq) report must match
    DuckDB's rendering of the same null-excluded sufficient-stats
    chain, including every degenerate guard (k < 2, n <= k, zero
    within-variance -> NULL F)."""
    import duckdb
    import pandas as pd

    spec = {"ops": [{"op": "anova", "value": "v", "group": "g"}]}
    pdf = pd.DataFrame(data, columns=["g", "v"])
    pdf["v"] = pdf["v"].astype("float64")
    df = spark.createDataFrame(
        data or [(None, None)], "g: string, v: double"
    )
    if not data:
        df = df.limit(0)
    got = sorted(tuple(r) for r in compile_spec(df, spec).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(tuple(r) for r in con.sql(spec_to_sql(spec, "t")).fetchall())
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["a1", "a2", "a3"])),
            st.one_of(st.none(), st.sampled_from(["b1", "b2"])),
        ),
        min_size=0,
        max_size=30,
    ),
)
def test_random_null_frames_cramers_v_match_duckdb(spark, data):
    """Cramér's V null fuzz: random two-categorical frames with NULLs
    — the one-row (n, r_levels, c_levels, chi2, cramers_v) report
    must match DuckDB's rendering of the same null-excluded
    contingency chain, including the single-level NULL-V guard."""
    import duckdb
    import pandas as pd

    spec_sql = (
        "WITH j AS (SELECT g AS a, h AS b, CAST(count(*) AS BIGINT) AS o "
        "FROM t WHERE g IS NOT NULL AND h IS NOT NULL GROUP BY 1, 2), "
        "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM j GROUP BY 1), "
        "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM j GROUP BY 1), "
        "t2 AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM j), "
        "lv AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r_levels, "
        "(SELECT CAST(count(*) AS BIGINT) FROM cb) AS c_levels), "
        "c2 AS (SELECT sum(CAST(round((o - CAST(na AS DOUBLE) * nb / n) "
        "* (o - CAST(na AS DOUBLE) * nb / n) / (CAST(na AS DOUBLE) * nb / n), "
        "12) AS DECIMAL(28,12))) AS chi2 "
        "FROM j JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t2) "
        "SELECT n, r_levels, c_levels, round(CAST(chi2 AS DOUBLE), 6) AS chi2, "
        "CASE WHEN least(r_levels, c_levels) - 1 >= 1 THEN "
        "round(sqrt(round(CAST(chi2 AS DOUBLE), 6) "
        "/ (n * (least(r_levels, c_levels) - 1))), 6) END AS cramers_v "
        "FROM t2 CROSS JOIN lv CROSS JOIN c2"
    )
    from agentic_workflow_for_data_transformation_spark.operators.stats import cramers_v

    pdf = pd.DataFrame(data, columns=["g", "h"])
    df = spark.createDataFrame(
        data or [(None, None)], "g: string, h: string"
    )
    if not data:
        df = df.limit(0)
    got = sorted(tuple(r) for r in cramers_v(df, "g", "h").collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(tuple(r) for r in con.sql(spec_sql).fetchall())
    assert got == want
