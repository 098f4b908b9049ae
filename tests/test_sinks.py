"""Sink layout semantics: partition pruning actually prunes, bucketed
joins actually skip the shuffle, and round-trips preserve data."""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sinks import (
    overwrite_partitions,
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from web_attack_detection_spark.io.sources import load_table

from .conftest import SF_SMOKE


def _plan(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_write_prunes_on_read(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as d:
        write_partitioned(orders, f"{d}/orders_p", ["o_orderstatus"])
        back = read_partitioned(spark, f"{d}/orders_p")
        # round-trip fidelity
        assert back.count() == orders.count()
        filtered = back.filter(F.col("o_orderstatus") == "F")
        plan = _plan(filtered)
        # the status filter must land in PartitionFilters (directory
        # pruning), NOT PushedFilters (row-group skipping after I/O)
        assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
        want = orders.filter(F.col("o_orderstatus") == "F").count()
        assert filtered.count() == want


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_dyn"
        write_partitioned(orders, path, ["o_orderstatus"])
        # materialize the pre-image count NOW: a DataFrame created
        # before an in-place overwrite pins the old file listing and
        # must not be reused afterwards
        before_count = read_partitioned(spark, path).count()
        # "backfill" partition F with doubled prices; O and P untouched
        patch = orders.filter(F.col("o_orderstatus") == "F").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        overwrite_partitions(patch, path, ["o_orderstatus"])
        after = read_partitioned(spark, path)
        assert after.count() == before_count
        f_sum_before = (
            orders.filter(F.col("o_orderstatus") == "F").agg(F.sum("o_totalprice")).first()[0]
        )
        f_sum_after = (
            after.filter(F.col("o_orderstatus") == "F").agg(F.sum("o_totalprice")).first()[0]
        )
        assert abs(f_sum_after - 2 * f_sum_before) < 1e-6
        o_before = orders.filter(F.col("o_orderstatus") == "O").agg(F.sum("o_totalprice")).first()[0]
        o_after = after.filter(F.col("o_orderstatus") == "O").agg(F.sum("o_totalprice")).first()[0]
        assert o_before == o_after  # untouched partition bit-identical


def test_bucketed_join_skips_shuffle(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "t_orders_b", "o_custkey", n_buckets=4)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "t_cust_b", "o_custkey", n_buckets=4
    )
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_cust_b")
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "o_custkey").groupBy("c_mktsegment").count()
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # both sides pre-hashed on the bucket key: no Exchange feeds the join
        join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in join_section
        # correctness of the bucketed result
        want = (
            orders.join(
                customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
            )
            .groupBy("c_mktsegment")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_dynamic_partition_pruning_from_dim_filter(spark):
    """Dynamic partition pruning: when the partition key is only
    constrained THROUGH a join (a filter on the dimension side), Spark
    must inject a runtime subquery filter into the fact scan so
    non-matching partitions are never read — the mechanism that turns
    a star join over a 100 TB partitioned fact into a partial scan.
    Static pruning can't help here because the fact query itself has
    no literal predicate on the partition column."""
    orders = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as d:
        write_partitioned(orders, f"{d}/orders_p", ["o_orderstatus"])
        fact = read_partitioned(spark, f"{d}/orders_p")
        dim = spark.createDataFrame(
            [("F", "finished"), ("O", "open"), ("P", "pending")],
            "o_orderstatus string, label string",
        ).filter(F.col("label") == "finished")
        joined = fact.join(F.broadcast(dim), "o_orderstatus")
        plan = _plan(joined)
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        want = orders.filter(F.col("o_orderstatus") == "F").count()
        assert joined.count() == want


def test_catalog_ddl_saveastable_insert_sql(spark, tmp_path):
    """Catalog surface: saveAsTable -> INSERT INTO -> SQL over the
    managed table -> DROP. The reference never touches a catalog (flat
    CSV paths only); a real deployment manages datasets as tables, so
    the engine must round-trip through spark_catalog."""
    name = "wad_catalog_smoke"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    src = load_table(spark, SF_SMOKE, "region")
    src.write.saveAsTable(name)
    try:
        spark.sql(
            f"INSERT INTO {name} VALUES (99, 'added-region')"
        )
        got = {
            (r["r_regionkey"], r["r_name"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        want = {(r["r_regionkey"], r["r_name"]) for r in src.collect()} | {
            (99, "added-region")
        }
        assert got == want
        # catalog metadata visible
        assert any(t.name == name for t in spark.catalog.listTables())
        # predicate over the managed table goes through the same scan path
        assert (
            spark.sql(f"SELECT COUNT(*) AS n FROM {name} WHERE r_regionkey = 99")
            .first()["n"]
            == 1
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_io_partitioned_prune_query_plan_and_rows(spark):
    """The registered io_partitioned_prune query's scan must carry the
    two-type filter as a PARTITION filter (directory pruning), and its
    aggregate must match re-aggregating the origin events."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    df = QUERIES["io_partitioned_prune"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PartitionFilters: [event_type#" in plan
    assert "IN (error,purchase)" in plan
    ev = load_table(spark, SF_SMOKE, "events")
    want = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type")
        .count()
    )
    got = {r["event_type"]: 0 for r in want.collect()}
    for r in df.collect():
        got[r["event_type"]] += r["n"]
    assert got == {r["event_type"]: r["count"] for r in want.collect()}


def test_sorted_export_files_are_position_ordered(spark):
    """pipe_sorted_export's deployment claim, checked ON DISK: each
    written shard holds one contiguous position range (NTILE cut) and
    its parquet rows are position-sorted (sortWithinPartitions rides
    the write), so a reader streaming shard k's files sequentially
    sees exactly positions [first_k, last_k] of the epoch permutation
    in order."""
    import glob

    import pyarrow.parquet as pq

    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.ioq import _stable_dir
    from web_attack_detection_spark.plans.registry import QUERIES

    from .conftest import SF_SMOKE

    manifest = {
        r["shard"]: r
        for r in QUERIES["pipe_sorted_export"].fn(spark, SF_SMOKE).collect()
    }
    loc = _stable_dir(spark, "epoch_export", SF_SMOKE)
    seen_total = 0
    for shard, row in manifest.items():
        files = sorted(glob.glob(f"{loc}/shard={shard}/*.parquet"))
        assert files, f"shard {shard} wrote no files"
        pos = []
        for f in files:
            pos.extend(pq.read_table(f, columns=["pos"])["pos"].to_pylist())
        assert pos == sorted(pos), f"shard {shard} not position-ordered"
        assert pos[0] == row["first_pos"] and pos[-1] == row["last_pos"]
        assert len(pos) == row["n_docs"]
        # contiguity: the shard covers its manifest range exactly
        assert pos == list(range(row["first_pos"], row["last_pos"] + 1))
        seen_total += len(pos)
    # shards partition the whole corpus: positions 1..n with no gaps
    firsts = sorted(r["first_pos"] for r in manifest.values())
    lasts = sorted(r["last_pos"] for r in manifest.values())
    assert firsts[0] == 1
    for f_next, l_prev in zip(firsts[1:], lasts[:-1]):
        assert f_next == l_prev + 1
    assert seen_total == lasts[-1]
