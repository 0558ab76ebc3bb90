"""Bucketed co-located join: pins the claim (COVERAGE §2.5 / README) that
pre-bucketing both sides of a recurring join key eliminates the join-time
shuffle entirely.

Spark bucketing requires managed tables (saveAsTable); the test builds a
scratch warehouse, writes orders+customer bucketed by the join key, and
asserts the bucketed join plan contains NO Exchange while the plain-parquet
join of the same data shuffles — with identical results.  This is the
pattern a 100 TB deployment uses for dimension/fact keys that join every
run (bucket once at ingest, never shuffle again).
"""

import pytest

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.01"

_JOIN = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM {cust} c JOIN {orders} o ON c.c_custkey = o.o_custkey
"""


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # spark.sql.warehouse.dir is static config — point the DATABASE at the
    # scratch dir instead (location is a create-time property)
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketed_test LOCATION '{tmp_path / 'warehouse'}'"
    )
    try:
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        (
            cust.write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable("bucketed_test.customer_b")
        )
        (
            orders.write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("bucketed_test.orders_b")
        )
        # force the shuffle-elision decision to be structural, not size-based
        prior_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bucketed = spark.sql(
                _JOIN.format(cust="bucketed_test.customer_b", orders="bucketed_test.orders_b")
            )
            plan_b = _plan_of(bucketed)
            assert "Exchange" not in plan_b, f"bucketed join still shuffles:\n{plan_b}"

            cust.createOrReplaceTempView("cust_plain")
            orders.createOrReplaceTempView("orders_plain")
            plain = spark.sql(_JOIN.format(cust="cust_plain", orders="orders_plain"))
            assert "Exchange" in _plan_of(plain), "control join unexpectedly shuffle-free"

            assert sorted(map(tuple, bucketed.collect())) == sorted(
                map(tuple, plain.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_threshold)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")
