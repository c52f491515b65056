"""XLSX ingestion (reference alexp/.../ingest/XlsxDataFrameReader.java:1-120):
first sheet by default, header row + required-column projection, cell type
inferred from the first data row (numeric → double, else string) with
explicit overrides.

Implementation: xlsx is a zip of OOXML parts — parsed with stdlib zipfile +
ElementTree (no external xlsx library in the runtime). A spreadsheet is a
driver-sized artifact by nature (the reference loads it single-threaded
too); the resulting DataFrame is distributed as usual. For a DIRECTORY of
many xlsx files, parallelize with one task per file via `load_xlsx_many`.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB3' → 27."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(path: str, sheet_index: int = 0) -> list[list]:
    """Raw cell grid of one sheet: list of rows, each a dense list (None for
    absent cells), shared strings resolved."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
        sheets = sorted(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheets[sheet_index]))
        rows: list[list] = []
        width = 0
        for row_el in root.find("m:sheetData", _NS).findall("m:row", _NS):
            cells: dict[int, object] = {}
            for c in row_el.findall("m:c", _NS):
                ci = _col_index(c.get("r", "A1"))
                t = c.get("t", "n")
                v = c.find("m:v", _NS)
                if t == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    val = "".join(
                        tt.text or "" for tt in is_el.iter(f"{{{_NS['m']}}}t")
                    ) if is_el is not None else None
                elif v is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t in ("str", "b"):
                    val = v.text
                else:  # numeric
                    val = float(v.text)
                cells[ci] = val
                width = max(width, ci + 1)
            rows.append(cells)
        return [[r.get(i) for i in range(width)] for r in rows]


def load_xlsx(
    spark: SparkSession,
    path: str,
    required_columns: list[str] | None = None,
    sheet_index: int = 0,
    double_cols: list[str] | None = None,
) -> DataFrame:
    """First row = header; `required_columns` projects (reference
    requiredColumns); a column is double when every first-data-row cell is
    numeric or it is listed in `double_cols`, else string (reference
    sheetCellTypeToSchemaColType + setColumnTypes)."""
    grid = read_xlsx_rows(path, sheet_index)
    if not grid:
        raise ValueError(f"empty sheet in {path!r}")
    header = [str(h) for h in grid[0]]
    data = grid[1:]
    keep = [
        i
        for i, h in enumerate(header)
        if required_columns is None or h in set(required_columns)
    ]
    forced = set(double_cols or [])
    is_double = {}
    first = data[0] if data else []
    for i in keep:
        h = header[i]
        is_double[i] = h in forced or (
            i < len(first) and isinstance(first[i], float)
        )
    out_rows = []
    for r in data:
        row = []
        for i in keep:
            v = r[i] if i < len(r) else None
            if is_double[i]:
                try:
                    row.append(float(v) if v is not None else float("nan"))
                except (TypeError, ValueError):
                    row.append(float("nan"))
            else:
                row.append(str(v) if v is not None else "NULL")
        out_rows.append(tuple(row))
    schema = ", ".join(
        f"`{header[i]}` {'double' if is_double[i] else 'string'}" for i in keep
    )
    return spark.createDataFrame(out_rows, schema)
