"""Catalog part — index-number economics (STAGED for r7).

Price/trade index analytics a BI deployment runs over the order fact —
a family the catalog did not cover at all:

- fisher_price_index   Laspeyres (1871), Paasche (1874) and Fisher
                       (1922) "ideal" price indexes of each ship year
                       against the 1995 base, over the common part
                       basket, with unit values as prices (the standard
                       trade-statistics practice when transaction
                       prices are unobserved)
- rca_balassa_index    Balassa (1965) revealed comparative advantage:
                       each supplier nation's share of a part class's
                       exports relative to its share of ALL exports

Determinism: per-(part, year) price/quantity state is exact integer
cents and units; every index term is quantized to a fixed-point
integer per part BEFORE the cross-part sum (round(1e4 * sp_t * sq_0 /
sq_t) etc.), so the basket sums are exact bigints and each index is
one closed-form double; RCA cells and margins are exact cent sums with
one-shot share divisions.

Scale: the Fisher index is ONE lineitem scan -> (part, year) rollup,
then the base-year slice joins each year slice on the part key (both
sides of the self-join come from the cached rollup — no fact re-scan);
RCA is one fact scan with two broadcast dims reduced to a 150-cell
table plus cached margins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from predictor_spark.plans.catalog import query, _t

_BASE_YEAR = 1995

# per-(part, year) unit-value state (oracle CTE): exact cents + units
_PY_SQL = """
    py AS MATERIALIZED (
        SELECT l_partkey AS pk, CAST(year(l_shipdate) AS INTEGER) AS yr,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sp,
               sum(CAST(round(l_quantity) AS BIGINT)) AS sq
        FROM lineitem GROUP BY 1, 2
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 0
    )"""


@query(
    "fisher_price_index",
    oracle=f"""
    WITH {_PY_SQL},
    j AS (
        SELECT t.yr,
               b.sp AS sp0, b.sq AS sq0, t.sp AS spt, t.sq AS sqt
        FROM py t JOIN py b ON b.pk = t.pk AND b.yr = {_BASE_YEAR}
        WHERE t.yr > {_BASE_YEAR}
    ),
    s AS (
        SELECT yr, count(*) AS n_parts,
               sum(CAST(round(1e4 * spt * sq0 / sqt) AS BIGINT)) AS l_num,
               sum(sp0) * 10000 AS l_den,
               sum(spt) * 10000 AS p_num,
               sum(CAST(round(1e4 * sp0 * sqt / sq0) AS BIGINT)) AS p_den
        FROM j GROUP BY yr
    )
    SELECT yr AS ship_year, CAST(n_parts AS BIGINT) AS n_parts,
           round(CAST(l_num AS DOUBLE) / l_den, 6) AS laspeyres,
           round(CAST(p_num AS DOUBLE) / p_den, 6) AS paasche,
           round(sqrt((CAST(l_num AS DOUBLE) / l_den)
                      * (CAST(p_num AS DOUBLE) / p_den)), 6) AS fisher
    FROM s
    """,
)
def fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indexes of each ship year vs
    the 1995 base over the common part basket, prices = unit values
    (cents per unit).  Both index legs sum PER-PART fixed-point terms
    (the p*q cross products quantized at 1e4), so basket sums are
    exact integers and each index is one division; Fisher is their
    geometric mean.

    Scale: one lineitem scan -> (part, year) rollup (cached); the
    base-year slice joins the other years on the part key WITHIN the
    cached rollup — the fact is never re-scanned; output is one row
    per year."""
    li = _t(spark, sf_dir, "lineitem")
    py = (li.groupBy(F.col("l_partkey").alias("pk"),
                     F.year("l_shipdate").cast("int").alias("yr"))
          .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0)
                     .cast("long")).alias("sp"),
               F.sum(F.round("l_quantity", 0).cast("long")).alias("sq"))
          .filter(F.col("sq") > 0)
          .cache())
    base = (py.filter(F.col("yr") == _BASE_YEAR)
            .select(F.col("pk").alias("bpk"), F.col("sp").alias("sp0"),
                    F.col("sq").alias("sq0")))
    j = (py.filter(F.col("yr") > _BASE_YEAR)
         .join(base, F.col("pk") == F.col("bpk"))
         .select("yr", "sp0", "sq0", F.col("sp").alias("spt"),
                 F.col("sq").alias("sqt")))
    s = j.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.round(F.lit(1e4) * F.col("spt") * F.col("sq0")
                      / F.col("sqt"), 0).cast("long")).alias("l_num"),
        (F.sum("sp0") * 10000).alias("l_den"),
        (F.sum("spt") * 10000).alias("p_num"),
        F.sum(F.round(F.lit(1e4) * F.col("sp0") * F.col("sqt")
                      / F.col("sq0"), 0).cast("long")).alias("p_den"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lasp, paas = d("l_num") / d("l_den"), d("p_num") / d("p_den")
    return s.select(
        F.col("yr").alias("ship_year"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"))


@query(
    "rca_balassa_index",
    oracle="""
    WITH cells AS MATERIALIZED (
        SELECT sn.n_name AS nation,
               string_split(p.p_type, ' ')[1] AS type_class,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS x
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    nat AS (SELECT nation, sum(x) AS xn FROM cells GROUP BY nation),
    cls AS (SELECT type_class, sum(x) AS xp FROM cells GROUP BY 1),
    tot AS (SELECT sum(x) AS xt FROM cells)
    SELECT c.nation, c.type_class,
           round(CAST(c.x AS DOUBLE) / 100, 2) AS export_value,
           round((CAST(c.x AS DOUBLE) / nat.xn)
                 / (CAST(cls.xp AS DOUBLE) / tot.xt), 6) AS rca
    FROM cells c
    JOIN nat ON nat.nation = c.nation
    JOIN cls ON cls.type_class = c.type_class
    CROSS JOIN tot
    """,
)
def rca_balassa_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa (1965) revealed comparative advantage per (supplier
    nation, part class): RCA = (x_np / x_n) / (x_p / x) — above 1 means
    the nation's export mix leans into that class.  Part class is the
    leading p_type word (6 classes), so the cell table is ~150 rows.

    Scale: one fact scan with the supplier/nation/part dims broadcast,
    reduced to exact-cent cells; the nation/class/total margins are
    regroups of the CACHED cell table (no fact re-scan) broadcast back
    onto it; every RCA is one closed-form division pair."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_extendedprice")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("type_class"))
    cells = (li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
             .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
             .groupBy(F.col("n_name").alias("nation"), "type_class")
             .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0)
                        .cast("long")).alias("x"))
             .cache())
    natm = cells.groupBy("nation").agg(F.sum("x").alias("xn"))
    clsm = cells.groupBy("type_class").agg(F.sum("x").alias("xp"))
    tot = cells.agg(F.sum("x").alias("xt"))
    return (cells
            .join(F.broadcast(natm), "nation")
            .join(F.broadcast(clsm), "type_class")
            .crossJoin(F.broadcast(tot))
            .select("nation", "type_class",
                    F.round(F.col("x").cast("double") / 100, 2)
                    .alias("export_value"),
                    F.round((F.col("x").cast("double") / F.col("xn"))
                            / (F.col("xp").cast("double") / F.col("xt")),
                            6).alias("rca")))
