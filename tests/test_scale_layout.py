"""Storage-layout proofs for the 100 TB claims in PLANS.md: bucketed tables
co-locate joins (no exchange), and partition columns prune scans. Verified
against the physical plan, not argued in prose."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    df.collect()  # force AQE to finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed+sorted on the join key → SortMergeJoin reads
    bucket files directly; the plan contains no shuffle exchange. This is
    the co-located-join layout for repeated fact-fact joins at scale."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for name, df, key in [("li_b", li, "l_orderkey"), ("ord_b", orders, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_b")
            .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        # the only exchange allowed is the one for the final groupBy —
        # the JOIN itself must read co-located buckets with no shuffle
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # sanity: same answer as the unbucketed join
        plain = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_partitioned_ivf_cells_prune_scan(spark, tmp_path):
    """Materialize embeddings partitioned by their IVF cell, then read with
    a cell filter: the scan must show partition pruning (PartitionFilters)
    and touch only the probed cells' files — the 'probing n_probe/n_cells
    cells is partition pruning' claim from operators/similarity.py."""
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cent = F.broadcast(
        emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cvec"),
            V.norm(F.col("embedding")).alias("cent_norm"),
        )
    )
    from pyspark.sql import Window

    scored = emb.select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("n")
    ).crossJoin(cent).select(
        "vec_id",
        "embedding",
        "cent_id",
        V.cosine_from_norms(
            F.col("embedding"), F.col("cvec"), F.col("n"), F.col("cent_norm")
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
    cells = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cell"))
    )
    out = str(tmp_path / "emb_by_cell")
    cells.write.partitionBy("cell").mode("overwrite").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("cell").isin(0, 1))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # only the probed cells' rows come back, and no payload was lost
    total = spark.read.parquet(out).count()
    kept = pruned.count()
    per_cell = dict(
        spark.read.parquet(out).groupBy("cell").count().collect()
    )
    assert kept == per_cell.get(0, 0) + per_cell.get(1, 0)
    assert total == emb.count()
