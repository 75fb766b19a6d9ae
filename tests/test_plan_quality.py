"""Physical-plan assertions: the plans we'd want at 100 TB, not just
plans that produce correct rows at sf0.001.

- dataset reads must push residual predicates into the parquet scan
  (PushedFilters) and prune both columns (ReadSchema) and files.
- the star-join bench queries must broadcast their small dimensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plateau_spark.sources.dataset import read_table, store_dataframe_as_dataset

SF_DIR = "/root/testdata/sf0.001"


def test_pruned_read_pushdown_and_projection(spark, store):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    store_dataframe_as_dataset(
        spark, store, "li", li, partition_on=["l_returnflag"]
    )
    out = read_table(
        spark,
        store,
        "li",
        predicates=[[("l_returnflag", "==", "R"), ("l_quantity", ">", 45.0)]],
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    )
    # file pruning happened driver-side: only the R partition is scanned
    assert out.inputFiles(), "expected at least one input file"
    assert all("l_returnflag=R" in f for f in out.inputFiles())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # residual predicate reached the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # column projection reached the scan: payload columns not requested
    # must be absent from ReadSchema
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_star_join_broadcasts_small_dimension(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
