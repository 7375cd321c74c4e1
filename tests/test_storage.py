"""Physical-design queries: bucketed co-located joins must not shuffle
their inputs, and partition-pruned scans must prune at planning time
(SURVEY.md §2.12 storage rows; the 100 TB shuffle/IO-elimination axis)."""

from __future__ import annotations

import os

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.scratch import scratch_root
from tests.conftest import SF_SMOKE


def _formatted_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_exchange_on_join_inputs(spark):
    plan = _formatted_plan(spark, "join_bucketed_colocated")
    smj = plan.find("SortMergeJoin")
    assert smj != -1, plan
    # The join subtree (everything the SMJ consumes, i.e. the plan text
    # after the join node up to the first aggregate over it) must contain
    # no shuffle: bucket-to-bucket reads feed the merge directly. The only
    # Exchange allowed in the whole plan is the one on the 5-row aggregate
    # ABOVE the join.
    tree = plan.split("\n\n")[0]
    join_line = [ln for ln in tree.splitlines() if "SortMergeJoin" in ln][0]
    join_depth = len(join_line) - len(join_line.lstrip())
    below = tree.splitlines()[tree.splitlines().index(join_line) + 1 :]
    for ln in below:
        depth = len(ln) - len(ln.lstrip())
        if ln.strip() and depth <= join_depth:
            break
        assert "Exchange" not in ln, f"shuffle under bucketed join:\n{tree}"


def test_partition_pruned_scan_reads_single_partition(spark):
    plan = _formatted_plan(spark, "scan_partition_pruned")
    assert "PartitionFilters" in plan
    # the predicate must appear as a partition filter on the scan
    assert any(
        "PartitionFilters" in ln and "purchase" in ln for ln in plan.splitlines()
    ), plan
    # and the layout on disk is one directory per event_type
    from news_ingestion_data_pipeline_spark.plans.storage import _ROOT, _sfx

    path = f"{_ROOT}/events_by_type_{_sfx(SF_SMOKE)}"
    parts = [d for d in os.listdir(path) if d.startswith("event_type=")]
    assert len(parts) >= 2 and "event_type=purchase" in parts


def test_bucketed_tables_have_bucket_files(spark):
    REGISTRY["join_bucketed_colocated"].fn(spark, SF_SMOKE).collect()
    from news_ingestion_data_pipeline_spark.plans.storage import _ROOT, _sfx

    d = f"{_ROOT}/bkt_orders_{_sfx(SF_SMOKE)}"
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    # 8 buckets -> bucket ids 00000..00007 in file names
    buckets = {f.split("_")[1][:5] for f in files if "_" in f}
    assert len(buckets) == 8, sorted(files)[:10]


def test_zonemap_layout_enables_row_group_skipping(spark):
    """The sort-clustered rewrite must (a) push the date filter to the
    parquet scan and (b) produce a layout where most row groups'
    min/max stats fall wholly outside the filter range — the stats
    parquet readers use to skip row groups without decoding them."""
    import datetime as dt
    import glob
    import hashlib

    import pyarrow.parquet as pq

    plan = _formatted_plan(spark, "scan_zonemap_skip")
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300], plan

    path = (
        scratch_root("storage") + "/lineitem_zonemap_"
        + hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    )
    lo = dt.datetime(1996, 7, 1)
    hi = dt.datetime(1996, 10, 1)
    total = overlapping = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index("l_shipdate")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            assert st is not None and st.has_min_max
            total += 1
            if st.min < hi and st.max >= lo:
                overlapping += 1
    assert total >= 4, f"expected a multi-row-group layout, got {total}"
    # sorted layout => the 3-month band covers a strict minority of groups
    assert overlapping * 2 < total, (
        f"{overlapping}/{total} row groups overlap the filter — layout "
        "is not date-clustered"
    )


def test_dpp_join_has_runtime_pruning_subquery(spark):
    """The partitioned-fact x filtered-dim join must carry a dynamic
    partition pruning expression: the partition filter is only known at
    runtime (it comes from the dim side), so the scan node embeds a
    dynamicpruning subquery instead of reading every partition."""
    plan = _formatted_plan(spark, "join_dpp_runtime_pruned")
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_compaction_reduces_file_count_preserving_rows(spark):
    import glob
    import hashlib

    REGISTRY["storage_compact_small_files"].fn(spark, SF_SMOKE).collect()
    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    frag = glob.glob(f"{scratch_root('storage2')}/events_fragmented_{sfx}/*.parquet")
    comp = glob.glob(f"{scratch_root('storage2')}/events_compacted_{sfx}/*.parquet")
    assert len(frag) == 64 and len(comp) == 4, (len(frag), len(comp))
    n_frag = spark.read.parquet(*frag).count()
    n_comp = spark.read.parquet(*comp).count()
    assert n_frag == n_comp


def test_delete_where_previous_snapshot_retains_deleted_rows(spark):
    import hashlib

    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    REGISTRY["pipeline_delete_where"].fn(spark, SF_SMOKE).collect()
    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    path = f"{scratch_root('storage2')}/delete_where_{sfx}"
    cur = UP.read_articles(spark, path)
    prev = UP.read_previous_snapshot(spark, path)
    assert cur.filter("lang = 'de'").count() == 0
    assert prev.filter("lang = 'de'").count() > 0
    # survivors untouched by the delete are byte-identical across versions
    assert (
        prev.filter("lang != 'de'").exceptAll(cur).count() == 0
        and cur.exceptAll(prev.filter("lang != 'de'")).count() == 0
    )
