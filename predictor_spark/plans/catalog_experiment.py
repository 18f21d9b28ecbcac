"""Catalog part — experimentation + incremental-maintenance analytics.

Three shapes an analytics platform runs AROUND the training loop:

- ab_test_cuped           two-arm experiment readout with CUPED
                          variance reduction (Deng et al. 2013, WSDM):
                          deterministic hash-parity assignment,
                          pre-period covariate adjustment
- tfidf_top_terms         per-document top-3 TF-IDF terms (Sparck
                          Jones 1972) — the doc-side keyword vector
                          complementing the query-side BM25 row
- incremental_daily_rollup  incremental view maintenance: merge a
                          pre-aggregated history partition with the
                          newest day's delta and PROVE inside the row
                          that it equals the full recompute

Determinism: the experiment arms come from user_id parity (no RNG);
every moment (mean/var/cov) derives from exact integer-cent sums and
sums of products; TF-IDF ranks on the rounded score with a term
tie-break; the rollup compares exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t
from predictor_spark.operators.text import tokens_col

_SPLIT = "DATE '2024-01-16'"
_CENTS = "CAST(round(value * 100) AS BIGINT)"


@query(
    "ab_test_cuped",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               sum(CASE WHEN ts < {_SPLIT} THEN {_CENTS} ELSE 0 END) AS x,
               sum(CASE WHEN ts >= {_SPLIT} THEN {_CENTS} ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(x) AS DOUBLE) / count(*) AS mx,
               CAST(sum(y) AS DOUBLE) / count(*) AS my,
               CAST(sum(x * y) AS DOUBLE) / count(*) AS mxy,
               CAST(sum(x * x) AS DOUBLE) / count(*) AS mxx
        FROM per_user
    ),
    th AS (
        SELECT (mxy - mx * my) / (mxx - mx * mx) AS theta, mx FROM g
    )
    SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(y) AS DOUBLE) / count(*) / 100, 4) AS mean_y,
           round(CAST(sum(x) AS DOUBLE) / count(*) / 100, 4) AS mean_x,
           round(theta, 6) AS theta,
           round((CAST(sum(y) AS DOUBLE) / count(*)
                  - theta * (CAST(sum(x) AS DOUBLE) / count(*) - mx))
                 / 100, 4) AS cuped_mean
    FROM per_user, th
    GROUP BY arm, theta, mx
    """,
)
def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm experiment readout with CUPED variance reduction (Deng
    et al. 2013): arms by user_id parity (deterministic — the hash-
    bucket assignment every experimentation platform uses), outcome =
    late-period per-user value, covariate = the user's OWN pre-period
    value; cuped_mean = mean(Y − θ(X − E[X])) with θ = cov(X,Y)/var(X)
    estimated on the pooled population.

    Scale: one groupBy(user) reduces the stream to per-user (x, y)
    integer-cent pairs; θ comes from ONE moment aggregate over that
    frame (sums of products — exact integers), broadcast onto the
    2-row arm aggregate.  Nothing driver-side, no RNG anywhere.
    """
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = (ev.groupBy("user_id")
                .agg(F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
                     .alias("x"),
                     F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
                     .alias("y"))
                .select((F.col("user_id") % 2).cast("long").alias("arm"),
                        "x", "y")
                # the moment aggregate and the per-arm readout both read
                # this |users|-row frame; cached -> one stream pass
                .cache())
    n = F.count(F.lit(1))
    g = per_user.agg(
        (F.sum("x").cast("double") / n).alias("mx"),
        (F.sum("y").cast("double") / n).alias("my"),
        (F.sum(F.col("x") * F.col("y")).cast("double") / n).alias("mxy"),
        (F.sum(F.col("x") * F.col("x")).cast("double") / n).alias("mxx"))
    th = g.select(
        ((F.col("mxy") - F.col("mx") * F.col("my"))
         / (F.col("mxx") - F.col("mx") * F.col("mx"))).alias("theta"),
        "mx")
    arm_my = F.sum("y").cast("double") / n
    arm_mx = F.sum("x").cast("double") / n
    return (per_user.crossJoin(F.broadcast(th))
            .groupBy("arm", "theta", "mx")
            .agg(n.cast("long").alias("n_users"),
                 F.round(arm_my / 100, 4).alias("mean_y"),
                 F.round(arm_mx / 100, 4).alias("mean_x"),
                 F.round((arm_my - F.col("theta")
                          * (arm_mx - F.col("mx"))) / 100, 4)
                 .alias("cuped_mean"))
            .select("arm", "n_users", "mean_y", "mean_x",
                    F.round("theta", 6).alias("theta"), "cuped_mean"))


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term, ln((SELECT CAST(count(*) AS DOUBLE) FROM documents)
                        / count(*)) AS idf
        FROM tf GROUP BY term
    ),
    scored AS (
        SELECT doc_id, term, round(tf * idf, 6) AS score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY round(tf * idf, 6) DESC, term)
                   AS rank
        FROM tf JOIN idf USING (term)
    )
    SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, score
    FROM scored WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords (Sparck Jones 1972; idf =
    ln(N/df)) — the doc-side keyword vector: BM25 (bm25_search_topk)
    ranks documents for a query; this ranks TERMS for a document
    (tagging / routing / sparse retrieval indexing).

    Scale: term frequencies are one explode + groupBy; the idf table is
    vocabulary-sized and broadcasts onto it; the per-doc rank window
    partitions on doc_id (the natural data axis).  Ranking is over the
    ROUNDED score with a term tie-break, so both engines agree on ties.
    """
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, bounded
    tf = (docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
          # idf derives from tf; cached so the corpus explodes once
          .cache())
    idf = (tf.groupBy("term")
           .agg(F.log(F.lit(float(n_docs)) / F.count(F.lit(1)))
                .alias("idf")))
    score = F.round(F.col("tf") * F.col("idf"), 6)
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term")))
    return (tf.join(F.broadcast(idf), "term")
            .select("doc_id", "term", score.alias("score"),
                    rank.cast("long").alias("rank"))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "term", "rank", "score"))


@query(
    "incremental_daily_rollup",
    oracle=f"""
    WITH hist AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum({_CENTS}) AS c
        FROM events WHERE ts < TIMESTAMP '2024-01-30 00:00:00'
        GROUP BY event_type
    ),
    delta AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum({_CENTS}) AS c
        FROM events WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        GROUP BY event_type
    ),
    merged AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
               sum(c) AS total_c
        FROM (SELECT * FROM hist UNION ALL SELECT * FROM delta)
        GROUP BY event_type
    ),
    fullagg AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_full,
               sum({_CENTS}) AS c_full
        FROM events GROUP BY event_type
    )
    SELECT m.event_type, n_events,
           round(total_c / 100.0, 2) AS total_value,
           (n_events = n_full AND total_c = c_full) AS matches_full
    FROM merged m JOIN fullagg f ON m.event_type = f.event_type
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-type rollup is produced by
    MERGING a pre-aggregated history partition (days < 30) with the
    newest day's delta — and the row itself carries the proof
    (matches_full) that the merged state equals a full recompute.  At
    100 TB this is THE pattern that makes daily rollups affordable:
    the history side is |types| pre-aggregated rows re-read from the
    materialized store, only the delta partition is scanned.

    Scale: both legs push their day predicate into the scan; counts and
    cents are exact integers, so merge == full is an integer equality,
    not a float tolerance.  (Here both legs scan the same parquet
    because the synthetic store is one file — in production hist comes
    from the materialized rollup table.)
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # raw-ts bounds, not day(ts): the range predicate reaches the scan
    # as a row-group-prunable filter (dayofmonth() never pushes)
    cut = F.lit("2024-01-30 00:00:00").cast("timestamp")
    hist = (ev.filter(F.col("ts") < cut).groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c")))
    delta = (ev.filter(F.col("ts") >= cut).groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c")))
    merged = (hist.unionAll(delta).groupBy("event_type")
              .agg(F.sum("n").cast("long").alias("n_events"),
                   F.sum("c").alias("total_c")))
    full = (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_full"),
                 F.sum(cents).alias("c_full")))
    return (merged.join(F.broadcast(full), "event_type")
            .select("event_type", "n_events",
                    F.round(F.col("total_c") / 100.0, 2).alias("total_value"),
                    ((F.col("n_events") == F.col("n_full"))
                     & (F.col("total_c") == F.col("c_full")))
                    .alias("matches_full")))


@query(
    "entity_resolution_clusters",
    oracle="""
    WITH RECURSIVE names AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS block,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name
    ),
    e0 AS (
        SELECT a.p_name AS x, b.p_name AS y
        FROM names a JOIN names b
          ON a.block = b.block AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    edges AS (SELECT x AS a, y AS b FROM e0
              UNION ALL SELECT y AS a, x AS b FROM e0),
    reach(n, m, hop) AS (
        SELECT p_name, p_name, 0 FROM names
        UNION
        SELECT r.n, e.b, r.hop + 1
        FROM reach r JOIN edges e ON e.a = r.m
        WHERE r.hop < 4
    ),
    rep AS (SELECT n, min(m) AS cluster_rep FROM reach GROUP BY n)
    SELECT nm.p_name, r.cluster_rep,
           CAST(count(*) OVER (PARTITION BY r.cluster_rep) AS BIGINT)
               AS cluster_size,
           nm.n_parts
    FROM names nm JOIN rep r ON r.n = nm.p_name
    """,
)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: the blocked Levenshtein pair graph
    (fuzzy_match_part_names, catalog_quality.py) closed under
    TRANSITIVE reachability — every name labelled with its cluster
    representative (the lexicographic min of its connected component)
    and the component size.  This is the step that turns pairwise
    match candidates into a usable canonical-id mapping ('cold bolt',
    'old bolt' -> one entity key).

    Scale: the pair graph lives on the distinct-name vocabulary (64
    names), so the min-label closure is the same walk-expansion-over-
    a-tiny-leaf shape as bfs_hops_trade_graph — 4 capped levels in one
    lazy plan, mirrored exactly by the oracle's recursive CTE; min()
    recovers the component representative.  For web-scale graphs the
    repo's large/small-star connected components (operators/dedup.py)
    is the O(log n)-round variant of this same closure.
    """
    from predictor_spark.plans.catalog_quality import fuzzy_match_part_names

    names = (_t(spark, sf_dir, "part")
             .groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
             .cache())
    e0 = fuzzy_match_part_names(spark, sf_dir).select("name_a", "name_b")
    edges = (e0.select(F.col("name_a").alias("a"), F.col("name_b").alias("b"))
             .unionAll(e0.select(F.col("name_b").alias("a"),
                                 F.col("name_a").alias("b")))
             .coalesce(1).localCheckpoint(eager=True))
    seed = names.select(F.col("p_name").alias("n"), F.col("p_name").alias("m"))
    levels, frontier = [seed], seed
    for _ in range(4):  # cap mirrored by the oracle's hop < 4
        frontier = (frontier.join(edges, frontier.m == edges.a)
                    .select(F.col("n"), F.col("b").alias("m"))
                    .distinct())
        levels.append(frontier)
    walk = levels[0]
    for lv in levels[1:]:
        walk = walk.unionAll(lv)
    rep = walk.groupBy("n").agg(F.min("m").alias("cluster_rep"))
    size = Window.partitionBy("cluster_rep")
    return (names.join(F.broadcast(rep), names.p_name == rep.n)
            .select("p_name", "cluster_rep",
                    F.count(F.lit(1)).over(size).cast("long")
                    .alias("cluster_size"),
                    "n_parts"))
