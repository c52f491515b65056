from macrobase_spark.functions.metrics import (  # noqa: F401
    global_ratio_expr,
    prevalence_ratio_expr,
    ratio_metric_expr,
    risk_ratio_expr,
    support_expr,
)
