"""CSV ingestion with the reference's conventions (reference
lib/.../ingest/CSVDataFrameParser.java:72-148):

- only declared/required columns are projected (column pruning at the scan);
- string columns: missing values become the literal "NULL";
- double columns: missing/unparseable values become NaN;
- undeclared columns default to STRING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_csv(
    spark: SparkSession,
    path: str,
    double_cols: list[str] | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read a headered CSV; `double_cols` parse as double (NaN on failure),
    everything else as string ("NULL" when missing). `columns` limits the
    projection (reference requiredColumns)."""
    raw = spark.read.option("header", True).csv(path)
    doubles = set(double_cols or [])
    names = columns if columns is not None else raw.columns
    out = []
    for cn in names:
        c = F.col(cn)
        if cn in doubles:
            out.append(F.coalesce(c.cast("double"), F.lit(float("nan"))).alias(cn))
        else:
            out.append(F.coalesce(c.cast("string"), F.lit("NULL")).alias(cn))
    return raw.select(*out)
