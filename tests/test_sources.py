"""Source semantics: CSV round-trip with explicit schema vs inference,
multi-file single-scan ingest, unionByName column alignment."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import (
    load_split,
    load_table,
    read_csv,
    union_by_name,
)

from .conftest import SF_SMOKE


def test_csv_roundtrip_explicit_schema(spark):
    part = load_table(spark, SF_SMOKE, "part")
    with tempfile.TemporaryDirectory() as d:
        part.coalesce(1).write.option("header", "true").csv(f"{d}/part_csv")
        back = read_csv(spark, f"{d}/part_csv", schema=part.schema)
        assert back.schema == part.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, part.collect()))


def test_csv_infer_schema_flag(spark):
    """inferSchema mirrors the reference's read
    (/root/reference/main.py:34); numeric columns must come back
    numeric, not string."""
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_size", "p_brand")
    with tempfile.TemporaryDirectory() as d:
        part.coalesce(1).write.option("header", "true").csv(f"{d}/c")
        inferred = read_csv(spark, f"{d}/c", infer_schema=True)
        dtypes = dict(inferred.dtypes)
        assert dtypes["p_partkey"] in ("int", "bigint")
        assert dtypes["p_brand"] == "string"
        uninferred = read_csv(spark, f"{d}/c")
        assert dict(uninferred.dtypes)["p_partkey"] == "string"


def test_load_split_single_scan(spark):
    """Multi-file ingest (S2): N files, ONE scan node — not N unions
    (the reference unions per-file DataFrames, main.py:39,42)."""
    orders = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as d:
        for i, part in enumerate([orders.filter(F.col("o_orderkey") % 3 == k) for k in range(3)]):
            part.write.parquet(f"{d}/f{i}")
        merged = load_split(spark, [f"{d}/f{i}" for i in range(3)])
        assert merged.count() == orders.count()
        assert "Union" not in merged._jdf.queryExecution().executedPlan().toString()


def test_union_by_name_handles_column_order_drift(spark):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([("y", 2)], "name string, id long")
    out = union_by_name(a, b)
    assert sorted(map(tuple, out.collect())) == [(1, "x"), (2, "y")]


def test_json_lines_source_round_trip(spark, tmp_path):
    """JSON-lines ingestion with an explicit schema: no inference pass,
    and the schema-declared columns survive the round trip exactly."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    path = str(tmp_path / "docs_json")
    docs.write.json(path)
    back = spark.read.schema(docs.schema).json(path)
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    assert back.schema == docs.schema


def test_text_source_one_row_per_line(spark, tmp_path):
    """spark.read.text: raw-corpus ingestion (one row per line) — the
    entry format for text pipelines before any parsing."""
    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\n\ndelta epsilon zeta\n")
    df = spark.read.text(str(p))
    lines = [r["value"] for r in df.collect()]
    assert lines == ["alpha beta", "gamma", "", "delta epsilon zeta"]


def test_orc_source_round_trip(spark, tmp_path):
    """ORC round trip: the second columnar format Spark ships natively.
    Values and schema must survive exactly (same predicate-pushdown /
    column-pruning machinery as parquet via the vectorized reader)."""
    from web_attack_detection_spark.io.sources import load_table

    cust = load_table(spark, SF_SMOKE, "customer").limit(100)
    path = str(tmp_path / "cust_orc")
    cust.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == cust.schema
    assert sorted(r["c_custkey"] for r in back.collect()) == sorted(
        r["c_custkey"] for r in cust.collect()
    )


def test_xml_source_round_trip(spark, tmp_path):
    """XML round trip (native in Spark 4, absorbed from spark-xml):
    rowTag-delimited records with attribute/element mapping."""
    from web_attack_detection_spark.io.sources import load_table

    nat = load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    path = str(tmp_path / "nation_xml")
    nat.write.format("xml").option("rowTag", "nation").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(nat.schema)
        .load(path)
    )
    assert sorted((r["n_nationkey"], r["n_name"]) for r in back.collect()) == sorted(
        (r["n_nationkey"], r["n_name"]) for r in nat.collect()
    )


def test_warc_python_datasource_roundtrip(spark, tmp_path):
    """WARC crawl-archive ingestion via the Spark 4 Python Data Source
    API: two archives -> one input partition each (file-parallel scan),
    records round-trip byte-exact, and the DataFrame feeds the normal
    JVM pipeline (filter/agg) downstream."""
    from web_attack_detection_spark.io.warc import WarcDataSource, write_warc

    recs1 = [
        {"url": "https://a.example/1", "payload": b"hello corpus one"},
        {"url": "https://a.example/2", "payload": b"x" * 300,
         "content_type": "application/octet-stream"},
    ]
    recs2 = [{"url": "https://b.example/1", "payload": "unicode éà".encode()}]
    write_warc(str(tmp_path / "a.warc"), recs1)
    write_warc(str(tmp_path / "b.warc"), recs2)

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 3
    assert bytes(rows["https://a.example/1"]["payload"]) == b"hello corpus one"
    assert rows["https://a.example/2"]["length"] == 300
    assert rows["https://a.example/2"]["content_type"] == "application/octet-stream"
    assert bytes(rows["https://b.example/1"]["payload"]).decode() == "unicode éà"
    # downstream JVM processing over the Python-sourced frame
    agg = df.groupBy("warc_type").count().collect()
    assert agg[0]["count"] == 3


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on read: files written before and after adding
    a column merge into one frame (mergeSchema), old rows null-filled —
    the append-only layout reality of a long-lived 100 TB dataset."""
    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double")
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")
    got = (
        spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
        .orderBy("id")
        .collect()
    )
    assert [r["score"] for r in got] == [None, 9.5]
    assert set(got[0].asDict()) == {"id", "v", "score"}


def test_jsonl_source_reads_with_explicit_schema(spark, tmp_path):
    """JSON-lines ingestion (the other common corpus interchange format
    next to parquet and WARC): explicit schema (no inference pass),
    nested field access, and corrupt-line tolerance."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "hello world", "meta": {"lang": "en", "score": 0.9}}\n'
        '{"id": 2, "text": "bonjour", "meta": {"lang": "fr", "score": 0.7}}\n'
        "this line is not json\n"
        '{"id": 3, "text": "ok", "meta": {"lang": "en", "score": 0.5}}\n'
    )
    schema = (
        "id long, text string, meta struct<lang: string, score: double>, "
        "_corrupt_record string"
    )
    df = spark.read.schema(schema).json(str(p)).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    assert good.count() == 3
    by_lang = {
        r["lang"]: r["n"]
        for r in good.groupBy(F.col("meta.lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_lang == {"en": 2, "fr": 1}
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    df.unpersist()


def test_csv_roundtrip_preserves_quotes_newlines_delims(spark, tmp_path):
    """CSV writer/reader round-trip with hostile content: embedded
    quotes, commas, and newlines must survive (multiLine read)."""
    rows = [
        (1, 'say "hi", ok?'),
        (2, "line1\nline2"),
        (3, "plain"),
        (4, 'both, "quoted"\nand split'),
    ]
    df = spark.createDataFrame(rows, "id long, v string")
    out = str(tmp_path / "csv")
    df.coalesce(1).write.option("header", "true").csv(out)
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .schema("id long, v string")
        .csv(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)
