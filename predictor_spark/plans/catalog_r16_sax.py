"""Catalog part — SAX symbolization (STAGED r10).

Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu 2003) —
the discretization layer under time-series motif mining, anomaly
search, and symbolic indexing: z-normalize the series, cut it at the
equiprobable Gaussian breakpoints, and work on the resulting string.
Two rows over the daily cents bars per event type (alphabet size 4,
breakpoints -0.6745 / 0 / +0.6745 — the N(0,1) quartiles):

- sax_symbol_histogram  per (type, symbol) day counts + share: an
                        honest SAX cut leaves each symbol near 25%;
                        heavy skew flags non-Gaussian level shifts
- sax_bigram_motifs     the top-3 consecutive symbol bigrams per type
                        with counts (ties break lexicographically) —
                        the length-2 motif table, the first thing a
                        motif miner builds

Determinism: bars are exact integer cents; z-scores are identical
double expressions of exact HUGEINT/decimal moments on both engines,
and symbol assignment compares those identical doubles to literal
constants. Counts are exact; shares round to 6 dp.

Scale: one events scan -> the shared daily rollup (calendar-bounded);
z-scoring attaches the 5-row moment frame by key; the bigram pass is
one lead() over the same (type, date) partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from predictor_spark.plans.catalog import query, _t

#: daily cents bars z-scored per type and cut into the 4-symbol alphabet
_SAX_BASE = """
    bars AS (
        SELECT event_type, CAST(ts AS DATE) AS ddate,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS s,
               sum(CAST(x AS HUGEINT) * x) AS q
        FROM bars GROUP BY event_type
    ),
    z AS (
        SELECT b.event_type, b.ddate,
               (b.x - CAST(m.s AS DOUBLE) / m.n)
                 / sqrt((CAST(m.q AS DOUBLE) * m.n
                         - CAST(m.s AS DOUBLE) * m.s)
                        / (CAST(m.n AS DOUBLE) * m.n)) AS zval
        FROM bars b JOIN m ON m.event_type = b.event_type
    ),
    sym AS (
        SELECT event_type, ddate,
               CASE WHEN zval < -0.6745 THEN 'a'
                    WHEN zval < 0.0     THEN 'b'
                    WHEN zval < 0.6745  THEN 'c'
                    ELSE 'd' END AS symbol
        FROM z
    )"""


def _symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, ddate, symbol): the SAX string, one day per row."""
    # cached: the ~150-row daily frame feeds both the moment aggregate
    # and the z-score branch — one events scan, not two (plan audit)
    bars = (_t(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("ddate"))
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("x"))
            .cache())
    dec = F.col("x").cast("decimal(38,0)")
    m = bars.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * F.col("x")).alias("q"))
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    q = F.col("q").cast("double")
    z = (bars.join(F.broadcast(m), "event_type")
         .select("event_type", "ddate",
                 ((F.col("x") - s / F.col("n"))
                  / F.sqrt((q * F.col("n") - s * s) / (n * n)))
                 .alias("zval")))
    return z.select(
        "event_type", "ddate",
        F.when(F.col("zval") < -0.6745, "a")
        .when(F.col("zval") < 0.0, "b")
        .when(F.col("zval") < 0.6745, "c")
        .otherwise("d").alias("symbol"))


@query(
    "sax_symbol_histogram",
    oracle=f"""
    WITH {_SAX_BASE}
    SELECT event_type, symbol,
           CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY event_type), 6)
               AS share
    FROM sym GROUP BY event_type, symbol
    ORDER BY event_type, symbol
    """,
)
def sax_symbol_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbol histogram per event type (alphabet abcd at the N(0,1)
    quartile breakpoints): day counts and shares per symbol.

    Scale: daily rollup + one aggregate; the share window runs over
    ≤4 rows per type."""
    sym = _symbols(spark, sf_dir)
    w = Window.partitionBy("event_type")
    c = sym.groupBy("event_type", "symbol").agg(
        F.count(F.lit(1)).alias("n_days"))
    return (c.select(
        "event_type", "symbol", F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("n_days").cast("double")
                / F.sum("n_days").over(w), 6).alias("share"))
        .orderBy("event_type", "symbol"))


@query(
    "sax_bigram_motifs",
    oracle=f"""
    WITH {_SAX_BASE},
    big AS (
        SELECT event_type,
               symbol || lead(symbol) OVER (PARTITION BY event_type
                                            ORDER BY ddate) AS bigram
        FROM sym
    ),
    cnt AS (
        SELECT event_type, bigram, CAST(count(*) AS BIGINT) AS n
        FROM big WHERE bigram IS NOT NULL GROUP BY event_type, bigram
    ),
    ranked AS (
        SELECT event_type, bigram, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, bigram) AS rnk
        FROM cnt
    )
    SELECT event_type, CAST(rnk AS BIGINT) AS rnk, bigram, n
    FROM ranked WHERE rnk <= 3 ORDER BY event_type, rnk
    """,
)
def sax_bigram_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 consecutive SAX symbol bigrams per event type — the
    length-2 motif table (count-ranked, lexicographic tie-break). 'dd'
    or 'aa' on top means persistent extremes; 'bc'/'cb' means mean
    reversion around the center.

    Scale: one lead() on the (type, date) partitioning + a ≤16-row
    aggregate per type."""
    sym = _symbols(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("ddate")
    big = (sym.select("event_type",
                      F.concat("symbol",
                               F.lead("symbol").over(wd)).alias("bigram"))
           .filter(F.col("bigram").isNotNull()))
    cnt = big.groupBy("event_type", "bigram").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    wr = Window.partitionBy("event_type").orderBy(F.col("n").desc(),
                                                  F.col("bigram"))
    return (cnt.withColumn("rnk", F.row_number().over(wr).cast("long"))
            .filter(F.col("rnk") <= 3)
            .select("event_type", "rnk", "bigram", "n")
            .orderBy("event_type", "rnk"))
