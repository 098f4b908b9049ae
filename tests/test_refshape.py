"""The reference's real input shape (UNSW-NB15-shaped CSVs) end to end:
header quirk, label-leak divergence, S2 single-scan ingest, and the
whole run_pipeline battery over the 49-column workload."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import classify_columns
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.io.unsw import (
    UNSW_COLUMNS,
    load_unsw,
    unsw_fixture_dir,
)

from .conftest import SF_SMOKE


def test_fixture_is_49_headerless_columns_roundtrip(spark):
    d = unsw_fixture_dir(spark, SF_SMOKE)
    train, test = load_unsw(spark, d)
    assert train.columns == UNSW_COLUMNS and len(UNSW_COLUMNS) == 49
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert train.count() + test.count() == n_events
    # planted NULLs survive the CSV round trip for the imputer to find
    assert train.filter(F.col("ct_flw_http_mthd").isNull()).count() > 0
    # every attack category appears in BOTH splits (fit-on-train must
    # see the full label vocabulary)
    assert train.select("attack_cat").distinct().count() == 10
    assert test.select("attack_cat").distinct().count() == 10


def test_header_quirk_swallows_first_row(spark):
    """main.py:34 reads headerless CSVs with header=True. Two facets:

    (a) verbatim (header=True + inferSchema): the first DATA row
        becomes the column names — and since a real flow row repeats
        values (e.g. swin == dwin == 255), Spark rejects the duplicate
        stolen names outright (COLUMN_ALREADY_EXISTS). The reference
        as-written cannot load its own dataset on modern Spark.
    (b) header=True with an explicit schema: no crash, but the first
        row of every file is silently lost as a presumed header.
    """
    import pytest
    from pyspark.errors import AnalysisException

    from web_attack_detection_spark.io.unsw import unsw_schema

    d = unsw_fixture_dir(spark, SF_SMOKE)
    good_train, good_test = load_unsw(spark, d)

    # (a) verbatim reproduction: duplicate stolen header names → error
    # (raised eagerly — schema inference runs at read time)
    with pytest.raises(AnalysisException):
        load_unsw(spark, d, as_reference_wrote_it=True)

    # (b) header=True + schema: one row per file silently swallowed
    def header_read(n: int):
        return (
            spark.read.schema(unsw_schema())
            .option("header", "true")
            .csv(f"{d}/UNSW-NB15_{n}.csv")
        )

    swallowed_test = header_read(2)
    assert swallowed_test.count() == good_test.count() - 1
    swallowed_train = header_read(1).union(header_read(3)).union(header_read(4))
    assert swallowed_train.count() == good_train.count() - 3


def test_label_leak_divergence_flags(spark):
    """SURVEY.md §1.3: the binary integer `label` passes the
    reference's integer/double whitelist and lands in the FEATURES.
    classify_columns reproduces that under reference_compat; dropping
    the column first is the engine's documented clean path."""
    d = unsw_fixture_dir(spark, SF_SMOKE)
    train, _ = load_unsw(spark, d)
    cats, nums = classify_columns(train, "attack_cat", reference_compat=True)
    assert "label" in nums and len(nums) == 43  # the leak, reproduced
    assert sorted(cats) == ["dstip", "proto", "service", "srcip", "state"]
    _, clean = classify_columns(
        train.drop("label"), "attack_cat", reference_compat=True
    )
    assert "label" not in clean and len(clean) == 42
    # default (non-compat) classification widens beyond the whitelist
    # but still never swallows the named label column
    cats2, _ = classify_columns(train, "attack_cat")
    assert "attack_cat" not in cats2


def test_corrected_ingest_is_single_scan_no_union(spark):
    """S2: the corrected 3-file train read must be ONE FileScan (no
    Union nodes) with the explicit schema — no inference pass."""
    import contextlib
    import io

    d = unsw_fixture_dir(spark, SF_SMOKE)
    train, _ = load_unsw(spark, d)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train.explain("formatted")
    plan = buf.getvalue()
    assert "Union" not in plan
    # formatted plans name each node twice (tree + details section)
    import re

    assert len(re.findall(r"\(\d+\) Scan csv", plan)) == 1


def test_run_pipeline_on_unsw_shape(spark):
    """M7 over the reference's real input: the battery runs through the
    SAME run_pipeline code path, produces the model×prep summary, and
    the raw prep keeps the full 42-dim clean numeric array."""
    from web_attack_detection_spark.plans.refshape import ref_unsw_battery

    out = ref_unsw_battery(spark, SF_SMOKE).collect()
    assert {(r["model"], r["prep"]) for r in out} == {
        ("nb", "raw"),
        ("nb", "processed"),
    }
    for r in out:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["train_seconds"] > 0


def test_unsw_prepared_raw_width(spark):
    """The raw preparation over the UNSW shape emits the full clean
    42-dim numeric array (regression companion to the events-shape
    ADVICE r2 test)."""
    from web_attack_detection_spark.runner import prepare_raw

    d = unsw_fixture_dir(spark, SF_SMOKE)
    train, _ = load_unsw(spark, d)
    clean = train.drop("label")
    _, nums = classify_columns(clean, "attack_cat", reference_compat=True)
    label_map = {"Normal": 0.0}
    out = prepare_raw(clean, label_map, nums, "attack_cat")
    widths = out.select(F.size("features").alias("w")).distinct().collect()
    assert [r["w"] for r in widths] == [42]
