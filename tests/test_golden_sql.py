"""Golden-output SQL corpus: run the reference's own 20 test queries through
the MacroBase-SQL dialect engine and compare against its checked-in expected
CSVs (reference sql/src/test/java/.../MacroBaseSQLTest.java:81-241).

The fixtures are read from /root/reference at test time (read-only); the
whole module skips if the reference tree is absent."""

import math
import os
import re

import pandas as pd
import pytest

from macrobase_spark.sql import MacroBaseSQL

RES = "/root/reference/sql/src/test/resources"
SAMPLE = "/root/reference/core/demo/sample.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(RES) and os.path.isfile(SAMPLE)),
    reason="reference golden corpus not available",
)

# 11/12 carry ORDER BY (single-key; row order must respect it); others are
# set-compared. 3 uses ON * auto-selection.
ALL_QUERIES = list(range(1, 21))


@pytest.fixture(scope="module")
def engine(spark):
    eng = MacroBaseSQL(spark)
    eng.execute(
        f"IMPORT FROM CSV FILE '{SAMPLE}' INTO sample"
        "(usage double, latency double, location string, version string)"
    )
    return eng


def _rows(pdf: pd.DataFrame):
    out = []
    for t in pdf.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append(None)
                elif math.isinf(v):
                    row.append("inf" if v > 0 else "-inf")
                else:
                    row.append(round(v, 6))
            elif v is None or (isinstance(v, float) and pd.isna(v)):
                row.append(None)
            else:
                row.append(v)
        out.append(tuple(row))
    return out


def _expected(qnum: int) -> pd.DataFrame:
    pdf = pd.read_csv(f"{RES}/{qnum}.csv")
    return pdf


@pytest.mark.parametrize("qnum", ALL_QUERIES)
def test_golden_query(engine, qnum):
    sql = open(f"{RES}/{qnum}.sql").read()
    sql = re.sub(r"(?is)\s+INTO\s+OUTFILE\s+'[^']+'", "", sql)
    got_df = engine.execute(sql)
    got = got_df.toPandas()
    exp = _expected(qnum)

    # schema: same column names in the same order
    assert list(got.columns) == list(exp.columns), (
        f"q{qnum} columns {list(got.columns)} != {list(exp.columns)}"
    )
    # attr columns: empty CSV fields are nulls
    got_rows = _rows(got)
    exp_rows = _rows(exp)
    if qnum in (11, 12):
        # ORDER BY support: compare the ordered support column exactly and
        # the full relation as a multiset (ties may permute)
        assert [r[2] for r in got_rows] == [r[2] for r in exp_rows], f"q{qnum} order"
        assert sorted(got_rows, key=str) == sorted(exp_rows, key=str), f"q{qnum} rows"
    else:
        assert sorted(got_rows, key=str) == sorted(exp_rows, key=str), (
            f"q{qnum}: {sorted(got_rows, key=str)[:4]} != {sorted(exp_rows, key=str)[:4]}"
        )


def test_write_csv_distributed_spill_contract(spark, tmp_path, monkeypatch):
    """ADVICE r2: the >MAX_COLLECT_ROWS spill must keep the single-file
    output contract and the pandas-path spellings (null/NaN -> empty,
    inf -> 'inf')."""
    import math

    from macrobase_spark.sql import MacroBaseSQL

    sql = MacroBaseSQL(spark)
    monkeypatch.setattr(MacroBaseSQL, "MAX_COLLECT_ROWS", 5)
    # rows chosen to hit every spelling divergence between pandas repr and
    # Spark/Java toString: NaN/inf/null, booleans (True vs true), doubles
    # in Java's sci-notation ranges (>=1e7, <1e-3)
    rows = (
        [(i, float(i), False) for i in range(8)]
        + [
            (8, float("nan"), True),
            (9, float("inf"), True),
            (10, None, False),
            (11, 12000000.0, True),
            (12, 0.0001, False),
        ]
    )
    df = spark.createDataFrame(rows, "id long, v double, flag boolean")
    small = spark.createDataFrame(rows[8:], "id long, v double, flag boolean")
    big_path, small_path = str(tmp_path / "big.csv"), str(tmp_path / "small.csv")
    sql.write_csv(df, big_path)
    sql.write_csv(small, small_path)

    import os
    assert os.path.isfile(big_path)  # ONE file, not a directory
    lines = sorted(open(big_path).read().strip().split("\n")[1:])
    # same spellings as the pandas path for EVERY shared row
    small_lines = sorted(open(small_path).read().strip().split("\n")[1:])
    by_id = {ln.split(",")[0]: ln.split(",", 1)[1] for ln in lines}
    small_by_id = {ln.split(",")[0]: ln.split(",", 1)[1] for ln in small_lines}
    for rid in small_by_id:
        assert by_id[rid] == small_by_id[rid], rid
    assert len(lines) == 13


def test_predicate_between_in_like_null(engine, spark):
    """The grammar's remaining predicate forms (SqlBase.g4:231-238 — lexed
    by the reference but never executed by QueryEngine.getMask): BETWEEN /
    IN (list) / LIKE / IS [NOT] NULL, each with its NOT variant, lowered to
    native Column ops and cross-checked against spark.sql on the same
    relation."""
    df = engine.tables["sample"]
    df.createOrReplaceTempView("mb_sample_pred")
    cases = [
        ("usage BETWEEN 20 AND 60", "usage BETWEEN 20 AND 60"),
        ("usage NOT BETWEEN 20 AND 60", "usage NOT BETWEEN 20 AND 60"),
        ("location IN ('AUS', 'CAN')", "location IN ('AUS', 'CAN')"),
        ("location NOT IN ('AUS', 'CAN')", "location NOT IN ('AUS', 'CAN')"),
        ("version LIKE 'v%'", "version LIKE 'v%'"),
        ("version NOT LIKE '%3'", "version NOT LIKE '%3'"),
        ("location IS NOT NULL", "location IS NOT NULL"),
        ("location IS NULL", "location IS NULL"),
        (
            "usage BETWEEN 20 AND 60 AND location IN ('AUS') OR latency > 1000",
            "usage BETWEEN 20 AND 60 AND location IN ('AUS') OR latency > 1000",
        ),
    ]
    for mb_where, sql_where in cases:
        got = engine.execute(f"SELECT * FROM sample WHERE {mb_where}").count()
        want = spark.sql(
            f"SELECT * FROM mb_sample_pred WHERE {sql_where}"
        ).count()
        assert got == want, (mb_where, got, want)
    # sanity: the predicates actually select strict, non-empty subsets
    n = df.count()
    sel = engine.execute("SELECT * FROM sample WHERE usage BETWEEN 20 AND 60").count()
    assert 0 < sel < n
