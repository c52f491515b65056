"""Explanation quality metrics as Catalyst column expressions.

Semantics match the reference implementations exactly (including 0 / +Inf
edge cases), so golden outputs carrying ``Infinity`` reproduce:

- support            reference lib/.../qualitymetrics/SupportQualityMetric.java:27-34
- global_ratio       reference lib/.../qualitymetrics/GlobalRatioQualityMetric.java:22-35
- risk_ratio         reference lib/.../fpg/RiskRatio.java:4-31 (edge cases) via
                     RiskRatioQualityMetric.java:27-44
- prevalence_ratio   reference lib/.../qualitymetrics/PrevalenceRatioQualityMetric.java:20-43

All are pure column expressions over the grouped aggregates
(outlier_count, total_count) plus broadcast global scalars — they run inside
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INF = float("inf")


def support_expr(outlier_count: Column, total_outliers: float) -> Column:
    """support = matched_outliers / total_outliers (monotonic)."""
    return outlier_count / F.lit(float(total_outliers))


def global_ratio_expr(
    outlier_count: Column, total_count: Column, total_outliers: float, total_rows: float
) -> Column:
    """(a/m) / (O/N): subgroup outlier rate over the global outlier rate."""
    base_rate = float(total_outliers) / float(total_rows)
    return (outlier_count / total_count) / F.lit(base_rate)


def risk_ratio_expr(
    outlier_count: Column, total_count: Column, total_outliers: float, total_rows: float
) -> Column:
    """(a/m) / ((O-a)/(N-m)) with the reference's exact edge cases:

    m == 0 → 0; m == N (everything matched) → 0; O == a (no unexposed
    outliers) → +Infinity.
    """
    a = outlier_count
    m = total_count
    o = F.lit(float(total_outliers))
    n = F.lit(float(total_rows))
    unexposed_outliers = o - a
    unexposed_total = n - m
    return (
        F.when(m == 0, F.lit(0.0))
        .when(unexposed_total == 0, F.lit(0.0))
        .when(unexposed_outliers == 0, F.lit(INF))
        .otherwise((a / m) / (unexposed_outliers / unexposed_total))
    )


def prevalence_ratio_expr(
    outlier_count: Column, total_count: Column, total_outliers: float, total_rows: float
) -> Column:
    """odds-style ratio with the reference's +1 smoothing on zero denominators.

    All-outliers relation (n == o): the reference divides by zero in Java
    double arithmetic — base rate = +Infinity, every value = 0.0."""
    o = float(total_outliers)
    if o == 0.0:
        o += 1.0
    if float(total_rows) - o == 0.0:
        return F.lit(0.0)
    base_rate = o / (float(total_rows) - o)
    a = outlier_count
    m = F.when(total_count == outlier_count, total_count + 1.0).otherwise(total_count)
    return (a / (m - a)) / F.lit(base_rate)


RATIO_METRICS = {
    "global_ratio": global_ratio_expr,
    "risk_ratio": risk_ratio_expr,
    "prevalence_ratio": prevalence_ratio_expr,
}


def ratio_metric_expr(
    name: str,
    outlier_count: Column,
    total_count: Column,
    total_outliers: float,
    total_rows: float,
) -> Column:
    try:
        fn = RATIO_METRICS[name]
    except KeyError:
        raise ValueError(f"unknown ratio metric {name!r}; one of {sorted(RATIO_METRICS)}")
    return fn(outlier_count, total_count, total_outliers, total_rows)


def ratio_metric_py(name: str, a: float, m: float, o: float, n: float) -> float:
    """Driver-side rendering of the same metric, for computing final
    explanation rows from collected survivor aggregates. MUST stay
    edge-case-identical to the column expressions above."""
    if name == "support":
        return a / o
    if name == "global_ratio":
        return (a / m) / (o / n)
    if name == "risk_ratio":
        if m == 0 or n - m == 0:
            return 0.0
        if o - a == 0:
            return INF
        return (a / m) / ((o - a) / (n - m))
    if name == "prevalence_ratio":
        o_s = o if o != 0.0 else 1.0
        m_s = m + 1.0 if m == a else m
        if n - o_s == 0.0:
            return 0.0  # base rate = +inf in Java double semantics
        return (a / (m_s - a)) / (o_s / (n - o_s))
    raise ValueError(f"unknown ratio metric {name!r}")


def ratio_metric_sql(name: str, a: str, m: str, o: str, n: str) -> str:
    """ANSI-SQL rendering of the same metric (for DuckDB oracles).

    ``a``/``m`` are SQL expressions for the subgroup outlier/total counts;
    ``o``/``n`` for the global outlier/total counts.
    """
    if name == "support":
        return f"(({a}) / ({o}))"
    if name == "global_ratio":
        return f"((({a}) / ({m})) / (({o}) / ({n})))"
    if name == "risk_ratio":
        return (
            f"(CASE WHEN ({m}) = 0 THEN 0.0 "
            f"WHEN ({n}) - ({m}) = 0 THEN 0.0 "
            f"WHEN ({o}) - ({a}) = 0 THEN CAST('Infinity' AS DOUBLE) "
            f"ELSE (({a}) / ({m})) / ((({o}) - ({a})) / (({n}) - ({m}))) END)"
        )
    if name == "prevalence_ratio":
        m_s = f"(CASE WHEN ({m}) = ({a}) THEN ({m}) + 1.0 ELSE ({m}) END)"
        o_s = f"(CASE WHEN ({o}) = 0 THEN 1.0 ELSE ({o}) END)"
        return (
            f"(CASE WHEN ({n}) - {o_s} = 0 THEN 0.0 "
            f"ELSE (({a}) / ({m_s} - ({a}))) / ({o_s} / (({n}) - {o_s})) END)"
        )
    raise ValueError(f"unknown ratio metric {name!r}")
