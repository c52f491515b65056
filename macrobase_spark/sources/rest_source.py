"""HTTP/REST ingestion (reference alexp/.../ingest/HttpCsvStreamReader.java
:1-80 + Uri.java HTTP scheme): fetch CSV over HTTP; a multi-part stream is
split on `_END_PART_` sentinel lines, each part delivered to a callback as
its own DataFrame — the reference's StreamingDataFrameLoader contract.

The fetch is a driver-side edge ingest (like the reference's URLConnection
loop); each delivered part becomes a normal distributed DataFrame with the
engine's CSV conventions (missing strings → "NULL", bad doubles → NaN).
"""

from __future__ import annotations

import io
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _parse_csv_part(
    spark: SparkSession, text: str, double_cols: list[str] | None, columns: list[str] | None
) -> DataFrame:
    import csv as _csv

    rdr = _csv.reader(io.StringIO(text))
    rows = [r for r in rdr if r]
    if not rows:
        raise ValueError("empty CSV part")
    header = rows[0]
    names = columns if columns is not None else header
    keep = [header.index(c) for c in names]
    doubles = set(double_cols or [])
    out = []
    for r in rows[1:]:
        vals = []
        for c, i in zip(names, keep):
            v = r[i] if i < len(r) and r[i] != "" else None
            if c in doubles:
                try:
                    vals.append(float(v) if v is not None else float("nan"))
                except ValueError:
                    vals.append(float("nan"))
            else:
                vals.append(v if v is not None else "NULL")
        out.append(tuple(vals))
    schema = ", ".join(f"`{c}` {'double' if c in doubles else 'string'}" for c in names)
    return spark.createDataFrame(out, schema)


def load_http_csv(
    spark: SparkSession,
    url: str,
    double_cols: list[str] | None = None,
    columns: list[str] | None = None,
    timeout: float = 30.0,
) -> DataFrame:
    """One-shot HTTP CSV fetch → DataFrame."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        text = resp.read().decode("utf-8")
    return _parse_csv_part(spark, text, double_cols, columns)


def stream_http_csv(
    spark: SparkSession,
    url: str,
    callback: Callable[[DataFrame], None],
    double_cols: list[str] | None = None,
    columns: list[str] | None = None,
    timeout: float = 30.0,
) -> int:
    """Reference HttpCsvStreamReader.load: read the HTTP stream line by
    line; every `_END_PART_` sentinel closes a part, parsed and handed to
    `callback`; a trailing unterminated part is delivered too. Returns the
    number of parts delivered."""
    parts = 0
    buf: list[str] = []
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        for raw in io.TextIOWrapper(resp, encoding="utf-8"):
            line = raw.rstrip("\n")
            if line.strip().upper() == "_END_PART_":
                if buf:
                    callback(_parse_csv_part(spark, "\n".join(buf), double_cols, columns))
                    parts += 1
                buf = []
            else:
                buf.append(line)
    if buf and any(ln.strip() for ln in buf):
        callback(_parse_csv_part(spark, "\n".join(buf), double_cols, columns))
        parts += 1
    return parts
