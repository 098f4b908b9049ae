"""Python UDTF surface (Spark 4): table-valued functions for the rare
shapes plain generators can't express — per-row expansion with
Python-side logic AND per-call state.

Policy note (SCALE.md "Python boundary"): UDTFs are row-at-a-time
Python and never belong in a hot path — everything bench-registered
stays JVM-side or Arrow-batched. This module exists as API surface: a
user porting a Postgres set-returning function or a DuckDB table
function gets the idiomatic Spark 4 equivalent, usable from SQL via
``SELECT * FROM sentence_split(TABLE(docs))``.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, sentence_idx: int, sentence: string, n_chars: int")
class SentenceSplit:
    """Split a document into sentences on '.', '!', '?' boundaries,
    emitting one row per non-empty sentence with its index and length.

    The regex-free scan keeps it dependency-light; the class form (vs a
    lambda UDTF) is deliberate — it is where per-partition state (e.g.
    a loaded segmentation model) would live in a real deployment.
    """

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        idx = 0
        start = 0
        for i, ch in enumerate(text):
            if ch in ".!?":
                sent = text[start:i].strip()
                if sent:
                    yield doc_id, idx, sent, len(sent)
                    idx += 1
                start = i + 1
        tail = text[start:].strip()
        if tail:
            yield doc_id, idx, tail, len(tail)


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL use on the given session."""
    spark.udtf.register("sentence_split", SentenceSplit)


class ParseDelimited:
    """Dynamic-schema Python UDTF (Spark 4 ``analyze`` API): splits a
    delimited string into N named columns where N and the names come
    from a CONSTANT argument at ANALYSIS time — the output schema is
    computed per call site, not fixed at registration. This is the
    UDTF surface CSV-ish sidecar columns and log lines need: schema
    follows the caller's column list, rows stay lazily generated.

    SQL: ``SELECT * FROM parse_delimited(col, 'a,b,c')`` yields columns
    a, b, c (strings; missing fields NULL, extras dropped).
    """

    @staticmethod
    def analyze(row: "AnalyzeArgument", names: "AnalyzeArgument"):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if not names.isConstantExpression:
            raise ValueError("column-name list must be a constant string")
        schema = StructType()
        for c in str(names.value).split(","):
            schema = schema.add(c.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, row: str, names: str):  # noqa: D102
        n = len(names.split(","))
        parts = (row or "").split("|")
        yield tuple((parts[i] if i < len(parts) else None) for i in range(n))


def register_dynamic_udtfs(spark) -> None:
    """Register the analyze-API UDTFs (separate from register_udtfs so
    environments on Spark <4 can still import the fixed-schema ones)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("parse_delimited", udtf(ParseDelimited))
