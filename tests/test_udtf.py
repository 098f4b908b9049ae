"""Python UDTF surface (Spark 4): SQL-callable table functions.

API-surface coverage only — UDTFs are row-at-a-time Python and stay
out of bench-registered hot paths (SCALE.md Python-boundary policy).
"""

from __future__ import annotations

from web_attack_detection_spark.functions.udtf_ops import register_udtfs
from web_attack_detection_spark.io.sources import register_views

from .conftest import SF_SMOKE


def test_sentence_split_udtf_sql(spark):
    register_udtfs(spark)
    register_views(spark, SF_SMOKE, "documents")
    out = spark.sql(
        """
        SELECT s.doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM documents d,
             LATERAL sentence_split(d.doc_id, d.text) s
        WHERE d.doc_id < 5
        ORDER BY s.doc_id, s.sentence_idx
        """
    ).collect()
    assert len(out) > 0
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        # indices are dense from 0 and lengths are consistent
        assert [r["sentence_idx"] for r in rows] == list(range(len(rows)))
        assert all(r["n_chars"] == len(r["sentence"]) > 0 for r in rows)
        assert all("." not in r["sentence"] for r in rows)


def test_sentence_split_skips_null_and_empty(spark):
    register_udtfs(spark)
    out = spark.sql(
        "SELECT * FROM sentence_split(1::bigint, CAST(NULL AS STRING))"
    ).collect()
    assert out == []
    out2 = spark.sql("SELECT * FROM sentence_split(2::bigint, '...')").collect()
    assert out2 == []


def test_dynamic_schema_udtf_analyze(spark):
    """ParseDelimited: output schema is derived from the constant
    column-name argument at analysis time; short rows null-fill and
    long rows truncate."""
    from web_attack_detection_spark.functions.udtf_ops import register_dynamic_udtfs

    register_dynamic_udtfs(spark)
    out = spark.sql(
        """
        SELECT t.* FROM VALUES ('a|b|c'), ('x|y'), ('p|q|r|EXTRA') v(s),
        LATERAL parse_delimited(v.s, 'c1, c2, c3') t
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        ("a", "b", "c"),
        ("x", "y", None),
        ("p", "q", "r"),
    ]
    # different call site, different schema
    cols = spark.sql(
        "SELECT t.* FROM VALUES ('1|2') v(s), LATERAL parse_delimited(v.s, 'k,v') t"
    ).columns
    assert cols == ["k", "v"]
