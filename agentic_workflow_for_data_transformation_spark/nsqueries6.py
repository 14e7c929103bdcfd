"""Round-8 fifth-session registrations: the per-source duplication-rate
audit (the "which dump is contaminating my corpus" report), the
schema-evolving CSV source round trip that completes the evolving-source
matrix (parquet / JSONL / CSV), the corpus snapshot diff (dataset
version changelog), and the per-label centroid similarity map. All
carry exact DuckDB oracles — the CSV query's oracle recomputes the
aggregate straight from the parquet view the fixture derives from, so
the write -> evolving read trip itself is what's checked (same
contract as x_source_jsonl_evolving). Registered past the 50-slot
driver window (it is full of this round's primary queries); covered by
the registry-wide CORRECTNESS_LOCAL regeneration, next round's
rotation picks them up.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .benchqueries import _t, register
from .operators import corpus, similarity
from .sources import io as sio

register(
    "ns_corpus_dup_by_source",
    "WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents), "
    "o AS (SELECT doc_id, source, "
    " ('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15))::BIGINT AS h "
    " FROM (SELECT doc_id, source, ws, "
    "        unnest(range(1, greatest(len(ws) - 3, 1))) AS i "
    "       FROM w WHERE len(ws) >= 5)), "
    "sg AS (SELECT h, source, CAST(count(*) AS BIGINT) AS occ, "
    " CAST(count(DISTINCT doc_id) AS BIGINT) AS docs FROM o GROUP BY h, source), "
    "gs AS (SELECT h, CAST(sum(docs) AS BIGINT) AS total_docs, "
    " CAST(count(*) AS BIGINT) AS n_sources FROM sg GROUP BY h), "
    "ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_grams, "
    " CAST(sum(occ) AS BIGINT) AS n_gram_occ, "
    " CAST(coalesce(sum(CASE WHEN total_docs > 1 THEN occ END), 0) AS BIGINT) AS dup_occ, "
    " CAST(coalesce(sum(CASE WHEN n_sources > 1 THEN occ END), 0) AS BIGINT) AS cross_occ "
    " FROM sg JOIN gs USING (h) GROUP BY source), "
    "d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source) "
    "SELECT d.source AS source, n_docs, "
    " CAST(coalesce(n_distinct_grams, 0) AS BIGINT) AS n_distinct_grams, "
    " CAST(coalesce(n_gram_occ, 0) AS BIGINT) AS n_gram_occ, "
    " round(dup_occ / CAST(n_gram_occ AS DOUBLE), 6) AS dup_gram_ratio, "
    " round(cross_occ / CAST(n_gram_occ AS DOUBLE), 6) AS cross_source_ratio "
    "FROM d LEFT JOIN ps USING (source)",
    desc=(
        "Per-source duplication audit: fraction of each source's word "
        "5-gram occurrences duplicated across documents and shared with "
        "other sources — the contamination report behind per-source mix "
        "weights; exchanges carry 60-bit gram digests, never gram text."
    ),
)(
    lambda spark, sf_dir: corpus.dup_rate_by_source(
        _t(spark, sf_dir, "documents"), n=5
    )
)


def _q_source_csv(spark, sf_dir: str):
    """Build (idempotently, per scale factor) a two-batch CSV fixture
    derived from the documents table — batch 0 without the ``source``
    header, batch 1 with it, i.e. a header that EVOLVED between dumps —
    then read both through read_csv_evolving with explicit per-batch
    schemas and aggregate. The oracle computes the same aggregate
    straight from the parquet view, so a hash match proves the CSV
    write -> by-name evolving read round trip is lossless including the
    null-fill of the missing column. Only CSV-safe scalar columns are
    written (no free text: embedded newlines need multiLine readers,
    which serialize to one task per file)."""
    import hashlib

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src) if os.path.exists(src) else None
    stamp = f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns if st else 0}|{st.st_size if st else 0}"
    tag = hashlib.md5(stamp.encode()).hexdigest()[:12]
    base = f"/tmp/spark_graft_csv_{tag}"
    docs = _t(spark, sf_dir, "documents")
    if not os.path.exists(base + "/_done"):
        a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
        b = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "n_chars", "source"
        )
        sio.write_csv_dir(a.coalesce(4), base + "/batch0")
        sio.write_csv_dir(b.coalesce(4), base + "/batch1")
        open(base + "/_done", "w").close()
    # build the two schemas independently: StructType.add MUTATES and
    # returns self, so s1 = s0.add(...) would silently widen s0 too
    _base_fields = [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
    s0 = T.StructType(list(_base_fields))
    s1 = T.StructType(list(_base_fields) + [T.StructField("source", T.StringType())])
    u = sio.read_csv_evolving(
        spark, [base + "/batch0", base + "/batch1"], schemas=[s0, s1]
    )
    return u.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("source").cast("long").alias("n_with_source"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


register(
    "x_source_csv_evolving",
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    " CAST(count(CASE WHEN doc_id % 2 = 1 THEN source END) AS BIGINT) AS n_with_source, "
    " CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY lang",
    desc=(
        "Schema-evolving CSV source round trip: two CSV batches (the "
        "second's header gained a column) written from documents, read "
        "back with explicit per-batch schemas via by-name union with "
        "missing-column null-fill, aggregated; oracle recomputes from "
        "the parquet view so the trip itself is checked."
    ),
)(_q_source_csv)


def _q_snapshot_diff(spark, sf_dir: str):
    """Corpus version diff between the documents table (v1) and a
    deterministically mutated v2 derived from it in-plan: doc_id % 17
    removed, % 13 rewritten (suffix appended), % 19 re-keyed high as
    additions. Both engines derive v2 from the same parquet view, so
    the diff itself — full-outer digest join + status classification —
    is what the hash checks."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 19 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
            )
        )
    )
    return corpus.snapshot_diff(docs, v2)


register(
    "ns_corpus_snapshot_diff",
    "WITH v1 AS (SELECT doc_id, md5(text) AS old_md5 FROM documents), "
    "v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' "
    "  ELSE text END) AS new_md5 FROM documents WHERE doc_id % 17 <> 0 "
    " UNION ALL "
    " SELECT doc_id + 10000000, md5(text) FROM documents WHERE doc_id % 19 = 0), "
    "j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, old_md5, new_md5 "
    " FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id) "
    "SELECT doc_id, CASE WHEN old_md5 IS NULL THEN 'added' "
    " WHEN new_md5 IS NULL THEN 'removed' "
    " WHEN old_md5 <> new_md5 THEN 'changed' END AS status, old_md5, new_md5 "
    "FROM j WHERE old_md5 IS NULL OR new_md5 IS NULL OR old_md5 <> new_md5",
    desc=(
        "Corpus version diff (dataset-release changelog): added / removed / "
        "changed documents between two snapshots via a full-outer join of "
        "(id, md5) digests — the exchange carries 16-byte digests, never "
        "documents; unchanged rows never leave the join."
    ),
)(_q_snapshot_diff)


register(
    "ns_sim_centroid_pairs",
    "WITH e AS (SELECT label, unnest(embedding) AS val, "
    " generate_subscripts(embedding, 1) AS i FROM embeddings), "
    "cent AS (SELECT label, i, CAST(round(CAST(SUM(CAST(val AS DECIMAL(20,10))) "
    " AS DOUBLE) / count(*), 6) AS DECIMAL(12,6)) AS c FROM e GROUP BY label, i), "
    "p AS (SELECT a.label AS label_a, b.label AS label_b, "
    " SUM(a.c * b.c) AS dot, SUM(a.c * a.c) AS na, SUM(b.c * b.c) AS nb "
    " FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label "
    " GROUP BY a.label, b.label) "
    "SELECT label_a, label_b, "
    " round(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine "
    "FROM p",
    desc=(
        "Subcorpus semantic-redundancy map: pairwise cosine between "
        "per-label embedding centroids — one posexplode aggregate is the "
        "only corpus-sized pass; the pairwise join runs on labels x dim "
        "rows. Centroids decimal-pinned so both engines sum exactly."
    ),
)(
    lambda spark, sf_dir: similarity.label_centroid_similarity(
        _t(spark, sf_dir, "embeddings")
    )
)
