from web_attack_detection_spark.io.sources import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_csv,
    register_views,
)
