"""web_attack_detection_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``huunhan1804/web-attack-detection`` (a ~800-LoC
PySpark + Keras batch ML pipeline over UNSW-NB15; see SURVEY.md), plus
the relational / streaming / LLM-data-pipeline operator set the north
star demands (dedup, similarity search, multimodal columns, text
analysis) — every operator designed for 100 TB scale:

- declarative DataFrame/SQL plans so Catalyst does pushdown/pruning;
- fit statistics computed as aggregation queries (DuckDB-oracle
  checkable), broadcast-joined back for transform;
- no driver-side collects in any transform path;
- Pandas UDFs (Arrow) only where built-ins can't express the op.

Package layout:
    session      — tuned SparkSession builders
    io           — sources (parquet/csv/json) and sinks
    functions    — column-level function library (feature, text, vector)
    operators    — relational + extension operators (dedup, similarity,
                   top-k, as-of join, multimodal)
    plans        — end-to-end query plans (flagship pipeline, TPC-H-ish)
    ml           — MLlib pipeline, models, evaluation
    streaming    — Structured Streaming paths
"""

__version__ = "0.1.0"
