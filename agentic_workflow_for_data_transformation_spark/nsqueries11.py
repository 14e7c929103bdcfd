"""Round-9 late-session registrations: the analysis layer a dataset
owner reaches for once the corpus is built — variance decomposition
(one-way ANOVA), bounded categorical association (Cramér's V),
cross-source distribution alignment (quantile normalization),
community structure (fixed-round label propagation), marginal-content
decay (n-gram novelty), training-order construction (curriculum sort
key), repeat-epoch budget accounting (data-constrained scaling audit),
multi-stage funnel conversion, source-concentration dominance (HHI /
Gini / top-share), and lexical richness (hapax ratio). All
exact-oracle: DECIMAL-pinned
sufficient statistics, integer votes with ordered tie-breaks, and
one fixed float expression shape per derived double. Registered AFTER
the frozen round-9 driver window (the r5 lesson) — these queue behind
the nsqueries10 cohort for the r10 rotation.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, DataFrame
from pyspark.sql import functions as F

from .benchqueries import _t, register
from .nsqueries10 import _CO_EDGE_CTES, _co_edges
from .nsqueries import _SHINGLE_CTE
from .operators import corpus, graph, stats, text, timeseries


# ----------------------------------------------------------------- anova
register(
    "ns_stats_anova",
    "WITH g AS (SELECT event_type, CAST(count(v) AS BIGINT) AS ng, "
    " sum(v) AS sg, sum(v * v) AS ssg "
    " FROM (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v "
    "       FROM events WHERE event_type IS NOT NULL "
    "       AND value IS NOT NULL) GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS k, "
    " CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS DOUBLE) AS s, "
    " CAST(sum(ssg) AS DOUBLE) AS ss, "
    " CAST(sum(CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, "
    "  12) AS DECIMAL(28,12))) AS DOUBLE) AS w FROM g) "
    "SELECT k, n, round(w - s * s / n, 6) AS ss_between, "
    "round(ss - w, 6) AS ss_within, "
    "CASE WHEN k >= 2 AND n > k AND ss - w > 0 THEN "
    " round(((w - s * s / n) / (k - 1)) / ((ss - w) / (n - k)), 6) "
    "END AS f_stat, "
    "CASE WHEN k >= 2 AND n > k AND ss - w > 0 THEN "
    " round((w - s * s / n) / ((w - s * s / n) + (ss - w)), 6) "
    "END AS eta_sq FROM t",
    desc=(
        "One-way ANOVA of the event value across event types: F "
        "statistic + eta-squared effect size from one grouped "
        "sufficient-statistics scan (DECIMAL-exact sums, the "
        "welch_ttest discipline generalized to k groups)."
    ),
)(
    lambda spark, sf_dir: stats.anova_oneway(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )
)


# ------------------------------------------------------------- cramers v
register(
    "ns_stats_cramers_v",
    "WITH j AS (SELECT o_orderstatus AS a, o_orderpriority AS b, "
    " CAST(count(*) AS BIGINT) AS o FROM orders "
    " WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL "
    " GROUP BY 1, 2), "
    "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM j GROUP BY 1), "
    "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM j GROUP BY 1), "
    "t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM j), "
    "lv AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r_levels, "
    " (SELECT CAST(count(*) AS BIGINT) FROM cb) AS c_levels), "
    "c2 AS (SELECT sum(CAST(round((o - CAST(na AS DOUBLE) * nb / n) "
    " * (o - CAST(na AS DOUBLE) * nb / n) / (CAST(na AS DOUBLE) * nb / n), "
    " 12) AS DECIMAL(28,12))) AS chi2 "
    " FROM j JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t) "
    "SELECT n, r_levels, c_levels, "
    "round(CAST(chi2 AS DOUBLE), 6) AS chi2, "
    "CASE WHEN least(r_levels, c_levels) - 1 >= 1 THEN "
    " round(sqrt(round(CAST(chi2 AS DOUBLE), 6) "
    "  / (n * (least(r_levels, c_levels) - 1))), 6) "
    "END AS cramers_v FROM t CROSS JOIN lv CROSS JOIN c2",
    desc=(
        "Cramér's V between order status and priority: chi-square "
        "association rescaled to [0,1] for cross-pair comparability; "
        "one cell aggregate, DECIMAL(28,12)-pinned chi2 sum."
    ),
)(
    lambda spark, sf_dir: stats.cramers_v(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )
)


# ------------------------------------------------------- quantile norm
register(
    "ns_stats_quantile_norm",
    "WITH base AS (SELECT event_type, event_id, "
    " CAST(value AS DECIMAL(18,2)) AS v FROM events "
    " WHERE event_type IS NOT NULL AND value IS NOT NULL), "
    "nm AS (SELECT min(c) AS nmin FROM "
    " (SELECT count(*) AS c FROM base GROUP BY event_type)), "
    "r AS (SELECT event_type, event_id, v, CAST(row_number() OVER ("
    " PARTITION BY event_type ORDER BY v, event_id) AS INTEGER) AS rank "
    " FROM base), "
    "tr AS (SELECT event_type, event_id, v, rank FROM r CROSS JOIN nm "
    " WHERE rank <= nmin), "
    "ref AS (SELECT rank, CAST(sum(v) AS DOUBLE) / count(*) AS ref "
    " FROM tr GROUP BY 1) "
    "SELECT event_type, event_id, rank, CAST(v AS DOUBLE) AS value, "
    "round(ref, 6) AS normalized FROM tr JOIN ref USING (rank)",
    desc=(
        "Quantile normalization of the event value across event types "
        "(Bolstad et al. 2003): each type trimmed to the smallest "
        "type's size with a deterministic (value, id) order, every "
        "rank mapped to the cross-type mean order statistic. Rank "
        "window partitioned by type; rank-keyed mean + equi-join."
    ),
)(
    lambda spark, sf_dir: stats.quantile_normalize(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )
)


# ------------------------------------------------------------ label prop
def _label_prop_sql(n_iter: int, min_size: int) -> str:
    ctes = [
        _CO_EDGE_CTES,
        "n0 AS (SELECT DISTINCT src AS node FROM e0)",
        "l0 AS (SELECT node, node AS lab FROM n0)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"v{i} AS (SELECT e.src AS node, l.lab, count(*) AS c "
            f"FROM e0 e JOIN l{i-1} l ON l.node = e.dst GROUP BY 1, 2)"
        )
        ctes.append(
            f"l{i} AS (SELECT node, lab FROM (SELECT node, lab, "
            f"row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) "
            f"AS rn FROM v{i}) WHERE rn = 1)"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT CAST(lab AS BIGINT) AS community, "
        f"CAST(count(*) AS BIGINT) AS n_members FROM l{n_iter} "
        f"GROUP BY 1 HAVING count(*) >= {min_size}"
    )


register(
    "ns_graph_label_prop",
    _label_prop_sql(3, 2),
    desc=(
        "Communities of the repeat-co-order part graph via 3-round "
        "synchronous label propagation (Raghavan et al. 2007), ties "
        "toward the smallest label for engine-exact determinism; "
        "reported as community sizes >= 2. Per round: one edge-keyed "
        "label join, one (node,label) vote count, one node-partitioned "
        "argmax window. Oracle = the same three rounds unrolled as CTEs."
    ),
)(
    lambda spark, sf_dir: graph.label_propagation(
        _co_edges(spark, sf_dir), n_iter=3, min_size=2
    )
)


# --------------------------------------------------------------- novelty
register(
    "ns_text_novelty",
    f"WITH {_SHINGLE_CTE}, "
    "f AS (SELECT s, min(doc_id) AS first FROM e GROUP BY s) "
    "SELECT doc_id, count(*) AS n_grams, "
    "CAST(count(*) FILTER (WHERE first = doc_id) AS BIGINT) AS n_novel, "
    "round(count(*) FILTER (WHERE first = doc_id) * 1.0 / count(*), 6) "
    "AS novelty FROM e JOIN f USING (s) GROUP BY doc_id",
    desc=(
        "Per-document 3-gram novelty under ascending-id ingest order: "
        "fraction of a doc's distinct shingles first seen in THIS doc "
        "— the marginal-contribution curve that shows how fast a crawl "
        "stops adding new phrasing (complement of boilerplate_ratio). "
        "One min-id aggregate on the 60-bit gram hash, one join back."
    ),
)(lambda spark, sf_dir: text.ngram_novelty(_t(spark, sf_dir, "documents")))


# ------------------------------------------------------------ curriculum
register(
    "ns_corpus_curriculum",
    "WITH c AS (SELECT quantile_cont(n_chars, 0.25) AS q0, "
    " quantile_cont(n_chars, 0.5) AS q1, "
    " quantile_cont(n_chars, 0.75) AS q2 FROM documents), "
    "b AS (SELECT doc_id, source, n_chars, CAST(1 "
    " + CASE WHEN n_chars > q0 THEN 1 ELSE 0 END "
    " + CASE WHEN n_chars > q1 THEN 1 ELSE 0 END "
    " + CASE WHEN n_chars > q2 THEN 1 ELSE 0 END AS INTEGER) AS bucket "
    " FROM documents CROSS JOIN c) "
    "SELECT doc_id, source, n_chars, bucket, "
    "CAST(row_number() OVER (PARTITION BY bucket, source "
    " ORDER BY doc_id) AS INTEGER) AS rr FROM b",
    desc=(
        "Curriculum sort key: quartile difficulty stage by document "
        "length (broadcast exact-percentile cutoffs — no global sort) "
        "plus a per-(stage, source) round-robin index; sorting by "
        "(bucket, rr, source, doc_id) materializes the easy-first, "
        "source-interleaved training order at any scale."
    ),
)(lambda spark, sf_dir: corpus.curriculum_order(_t(spark, sf_dir, "documents")))


# ------------------------------------------------------------ epoch audit
_EPOCH_BUDGET = 48000

register(
    "ns_corpus_epoch_audit",
    "WITH t AS (SELECT source, "
    " CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens "
    " FROM documents GROUP BY 1), "
    "k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM t), "
    f"a AS (SELECT source, n_tokens, CAST(floor({_EPOCH_BUDGET} / k) "
    " AS BIGINT) AS allocated_tokens FROM t CROSS JOIN k), "
    "e AS (SELECT *, round(CAST(allocated_tokens AS DOUBLE) / n_tokens, 6) "
    " AS epochs FROM a), "
    "f AS (SELECT *, round(n_tokens * (least(epochs, 1.0) "
    " + 4.0 * (1.0 - exp(-greatest(epochs - 1.0, 0.0) / 4.0))), 6) "
    " AS effective_tokens FROM e) "
    "SELECT source, n_tokens, allocated_tokens, epochs, effective_tokens, "
    "round(effective_tokens / allocated_tokens, 6) AS utilization FROM f",
    desc=(
        "Data-constrained scaling audit (Muennighoff et al. 2023): "
        "uniform 48k-token budget split across sources; per source the "
        "repeat-epoch count and the effective unique-token yield under "
        "the diminishing-returns law (r*=4), utilization = effective / "
        "allocated. One corpus scan; source-cardinality math."
    ),
)(
    lambda spark, sf_dir: corpus.epoch_audit(
        _t(spark, sf_dir, "documents"), budget_tokens=_EPOCH_BUDGET
    )
)


# ---------------------------------------------------------------- funnel
_FUNNEL = ["view", "click", "purchase"]

register(
    "x_funnel_conversion",
    "WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events "
    f" WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1), "
    "u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
    " JOIN u1 ON e.user_id = u1.user_id AND e.ts > u1.t1 "
    f" WHERE e.event_type = '{_FUNNEL[1]}' GROUP BY 1), "
    "u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
    " JOIN u2 ON e.user_id = u2.user_id AND e.ts > u2.t2 "
    f" WHERE e.event_type = '{_FUNNEL[2]}' GROUP BY 1), "
    "c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM u1) AS c1, "
    " (SELECT CAST(count(*) AS BIGINT) FROM u2) AS c2, "
    " (SELECT CAST(count(*) AS BIGINT) FROM u3) AS c3) "
    f"SELECT 1 AS step, '{_FUNNEL[0]}' AS event_type, c1 AS n_users, "
    "CAST(NULL AS DOUBLE) AS conversion FROM c "
    f"UNION ALL SELECT 2, '{_FUNNEL[1]}', c2, "
    "CASE WHEN c1 > 0 THEN round(CAST(c2 AS DOUBLE) / c1, 6) END FROM c "
    f"UNION ALL SELECT 3, '{_FUNNEL[2]}', c3, "
    "CASE WHEN c2 > 0 THEN round(CAST(c3 AS DOUBLE) / c2, 6) END FROM c",
    desc=(
        "Three-stage funnel (view -> click -> purchase) with "
        "first-touch anchoring: per step, users who performed it "
        "strictly after completing the previous step, plus "
        "step-over-step conversion. One min-ts aggregate per step "
        "joined on the user key; 1-row count frames assembled "
        "broadcast-side — no global window, no collect."
    ),
)(
    lambda spark, sf_dir: timeseries.funnel_steps(
        _t(spark, sf_dir, "events"), _FUNNEL
    )
)


# ---------------------------------------------------------- concentration
register(
    "ns_corpus_concentration",
    "WITH t AS (SELECT source, "
    " CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w "
    " FROM documents GROUP BY 1), "
    "r AS (SELECT source, w, CAST(row_number() OVER ("
    " ORDER BY w ASC, source) AS INTEGER) AS i, "
    " CAST(count(*) OVER () AS BIGINT) AS k FROM t) "
    "SELECT CAST(count(*) AS BIGINT) AS k_groups, "
    "CAST(sum(w) AS BIGINT) AS total_tokens, "
    "round(sum(CAST(w AS DOUBLE) * w) "
    " / (CAST(sum(w) AS DOUBLE) * sum(w)), 6) AS hhi, "
    "round(2.0 * CAST(sum(CAST(i AS BIGINT) * w) AS DOUBLE) "
    " / CAST(count(*) * sum(w) AS DOUBLE) "
    " - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini, "
    "round(CAST(sum(CASE WHEN i > k - 3 THEN w ELSE 0 END) AS DOUBLE) "
    " / CAST(sum(w) AS DOUBLE), 6) AS top3_share FROM r",
    desc=(
        "Source-concentration audit of the token mass: HHI (sum of "
        "squared shares), Gini (sorted-rank closed form, integer "
        "rank-weight products), and the top-3 source share in one "
        "report row — the dominance check before trusting a 'diverse "
        "mixture' claim. One corpus scan; rank math on the "
        "source-cardinality frame behind the pmod partition key."
    ),
)(
    lambda spark, sf_dir: corpus.concentration_audit(
        _t(spark, sf_dir, "documents")
    )
)


# ----------------------------------------------------------------- hapax
register(
    "ns_text_hapax",
    "WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w "
    " FROM documents), "
    "v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c "
    " FROM w GROUP BY 1, 2) "
    "SELECT source, CAST(count(*) AS BIGINT) AS vocab_size, "
    "CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax, "
    "round(count(*) FILTER (WHERE c = 1) * 1.0 / count(*), 6) "
    "AS hapax_ratio FROM v GROUP BY 1",
    desc=(
        "Per-source hapax legomena ratio: fraction of the source's "
        "vocabulary occurring exactly once — the lexical-richness / "
        "generated-content tell next to Heaps and word entropy. One "
        "token explode, one (source, word) aggregate, one rollup."
    ),
)(lambda spark, sf_dir: text.hapax_ratio(_t(spark, sf_dir, "documents")))
