from web_attack_detection_spark.functions.feature import (  # noqa: F401
    apply_imputer,
    apply_one_hot,
    apply_scaler,
    apply_string_indexer,
    assemble_array,
    classify_columns,
    fit_imputer_mean,
    fit_scaler,
    fit_string_indexer,
)
