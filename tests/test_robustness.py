"""Robustness at the storage boundary: schema evolution across parquet
files, malformed CSV rows, and streaming restart-from-checkpoint
(exactly-once across process restarts)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, read_csv
from web_attack_detection_spark.streaming.windows import stream_events_from_dir

from .conftest import SF_SMOKE


def test_schema_evolution_merge_on_read(spark):
    """A table whose later files gained a column must read as the
    unified schema with nulls for old files — the 100 TB reality of
    long-lived datasets (mergeSchema costs a footer scan per file, so
    it's opt-in; at scale declare the evolved schema explicitly)."""
    with tempfile.TemporaryDirectory() as d:
        v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
        v1.write.parquet(f"{d}/t/batch=1")
        v2 = spark.createDataFrame(
            [(3, "c", 9.5)], "id long, name string, score double"
        )
        v2.write.parquet(f"{d}/t/batch=2")

        merged = spark.read.option("mergeSchema", "true").parquet(f"{d}/t")
        assert set(merged.columns) == {"id", "name", "score", "batch"}
        rows = {r["id"]: r["score"] for r in merged.collect()}
        assert rows == {1: None, 2: None, 3: 9.5}


def test_csv_malformed_rows_permissive_and_drop(spark):
    """PERMISSIVE (default) nulls unparsable fields; DROPMALFORMED
    removes the rows — both must be deliberate choices, never silent
    data loss at scale."""
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "m.csv"
        p.write_text("id,val\n1,10\n2,not_a_number\n3,30\n")
        schema = "id int, val int"
        permissive = spark.read.schema(schema).option("header", "true").csv(str(p))
        got = {r["id"]: r["val"] for r in permissive.collect()}
        assert got == {1: 10, 2: None, 3: 30}

        dropped = (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "DROPMALFORMED")
            .csv(str(p))
        )
        assert {r["id"] for r in dropped.collect()} == {1, 3}


def test_streaming_restart_from_checkpoint_no_duplicates(spark):
    """Stop a streaming query, add data, restart with the SAME
    checkpoint: the restarted query must process only the new file —
    source offsets live in the checkpoint, giving exactly-once output
    to an idempotent sink across restarts."""
    events = load_table(spark, SF_SMOKE, "events")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)

    with tempfile.TemporaryDirectory() as d:
        src, ckpt, out = f"{d}/in", f"{d}/ckpt", f"{d}/out"
        half1.coalesce(1).write.parquet(src)

        def run_once():
            q = (
                stream_events_from_dir(spark, src)
                .select("event_id")
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()  # processes half1, then terminates (availableNow)
        n1 = spark.read.parquet(out).count()
        assert n1 == half1.count()

        half2.coalesce(1).write.mode("append").parquet(src)
        run_once()  # restart: must pick up ONLY the new file
        final = spark.read.parquet(out)
        assert final.count() == events.count()  # no duplicates, no loss
        assert final.select("event_id").distinct().count() == events.count()


def test_observation_metrics_piggyback_on_action(spark):
    """``df.observe`` collects dataset metrics DURING the action — the
    mechanism for row-count/quality accounting at scale without a
    second scan of the input."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    from .conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("audit")
    out = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"),
    ).filter(F.col("l_quantity") > 25)
    kept = out.count()
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["n_rows"] > kept  # metrics observed pre-filter
    expected_qty = li.agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
    ).first()[0]
    assert got["qty_c"] == expected_qty


def test_observation_audit_piggybacks_on_action(spark):
    """Data-quality audits via df.observe(): null-rate and row-count
    metrics computed DURING the main action — no second scan. This is
    the 100 TB way to gate a pipeline stage on quality counters (a
    separate audit query would re-read the input)."""
    from pyspark.sql import Observation
    from web_attack_detection_spark.io.sources import load_table

    from .conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.min("l_shipdate").alias("min_ship"),
    )
    # the main "pipeline stage": an unrelated aggregate
    out = observed.groupBy("l_returnflag").count().collect()
    assert len(out) > 0
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["null_qty"] == 0
    assert got["min_ship"] is not None


def test_corrupt_csv_records_quarantined_not_fatal(spark, tmp_path):
    """Malformed rows must neither kill the scan (PERMISSIVE) nor leak
    into the clean data: the corrupt-record column captures them for
    quarantine, and DROPMALFORMED yields only the clean subset — the
    two dirty-data policies a 100 TB CSV ingest actually uses."""
    p = tmp_path / "dirty.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\nbroken-line-no-comma\n4,40\n")
    schema = "id int, qty int, _corrupt_record string"
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(str(p))
        .cache()  # required: corrupt-record column + filter needs the raw row
    )
    clean = df.filter(F.col("_corrupt_record").isNull()).collect()
    dirty = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert {r["id"] for r in clean} == {1, 3, 4}
    assert len(dirty) == 2
    dropped = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema("id int, qty int")
        .csv(str(p))
        .collect()
    )
    assert {r["id"] for r in dropped} == {1, 3, 4}
    df.unpersist()
