"""Bucketed co-located joins — the storage-layout half of the 100 TB
join story (SCALING.md): two tables bucketed+sorted on the join key are
joined by Spark WITHOUT any exchange (each bucket pair joins in place),
which is the difference between re-shuffling 100 TB per join and reading
pre-partitioned data.  Asserts the plan shape AND result equality with
the plain shuffle join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_bucketed_join_has_no_exchange_and_matches_shuffle_join(spark, tmp_path):
    from predictor_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: broadcast would hide the exchange
        # question entirely (and is not available at real fact×fact scale)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for df, name, key in [(li, "bt_li", "l_orderkey"),
                              (orders, "bt_orders", "o_orderkey")]:
            (df.write.bucketBy(8, key).sortBy(key)
             .option("path", str(tmp_path / name))
             .mode("overwrite").saveAsTable(name))

        a, b = spark.table("bt_li"), spark.table("bt_orders")
        bucketed = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderkey").agg(
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2)
            .alias("v"))
        plan = _plan(a.join(b, a.l_orderkey == b.o_orderkey))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        shuffled = li.join(orders, li.l_orderkey == orders.o_orderkey) \
            .groupBy("o_orderkey").agg(
                F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2)
                .alias("v"))
        got = {(r.o_orderkey, r.v) for r in bucketed.collect()}
        want = {(r.o_orderkey, r.v) for r in shuffled.collect()}
        assert got == want and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in ("bt_li", "bt_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
