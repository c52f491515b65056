"""XLSX / HTTP-CSV / JDBC source surfaces."""

import threading
import zipfile

import pytest

from macrobase_spark.sources.jdbc_source import jdbc_reader_options
from macrobase_spark.sources.rest_source import load_http_csv, stream_http_csv
from macrobase_spark.sources.xlsx_source import load_xlsx


def _write_xlsx(path: str, header, rows):
    """Minimal OOXML workbook (inline strings, one sheet)."""

    def cell(ref, v):
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    def row(rid, vals):
        cells = "".join(
            cell(f"{chr(65 + i)}{rid}", v) for i, v in enumerate(vals) if v is not None
        )
        return f'<r r="{rid}">{cells}</r>'.replace("<r ", "<row ").replace("</r>", "</row>")

    body = "".join(row(i + 1, vals) for i, vals in enumerate([header, *rows]))
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", "<workbook/>")
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_load_xlsx(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    _write_xlsx(
        p,
        ["name", "usage", "note"],
        [["a", 1.5, "x"], ["b", 2.0, None], ["c", 3.25, "z"]],
    )
    df = load_xlsx(spark, p)
    rows = {r["name"]: r for r in df.collect()}
    assert df.schema["usage"].dataType.simpleString() == "double"
    assert df.schema["name"].dataType.simpleString() == "string"
    assert rows["a"]["usage"] == 1.5
    assert rows["b"]["note"] == "NULL"  # missing string → "NULL" convention
    # projection (reference requiredColumns)
    df2 = load_xlsx(spark, p, required_columns=["name", "usage"])
    assert df2.columns == ["name", "usage"]


@pytest.fixture()
def http_csv_server():
    import http.server

    payload = (
        b"name,usage\nalpha,1.5\nbeta,2.5\n_END_PART_\n"
        b"name,usage\ngamma,9.0\n_END_PART_\nname,usage\ndelta,4.0\n"
    )

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/data.csv"
    srv.shutdown()


def test_load_http_csv(spark, http_csv_server):
    df = load_http_csv(spark, http_csv_server, double_cols=["usage"])
    # one-shot load sees the whole body as one CSV (sentinels become rows)
    assert "name" in df.columns and "usage" in df.columns


def test_stream_http_csv_parts(spark, http_csv_server):
    parts = []
    n = stream_http_csv(
        spark, http_csv_server, lambda df: parts.append(df.collect()), double_cols=["usage"]
    )
    assert n == 3
    assert [len(p) for p in parts] == [2, 1, 1]
    assert parts[1][0]["name"] == "gamma" and parts[1][0]["usage"] == 9.0
    assert parts[2][0]["name"] == "delta"  # trailing unterminated part


def test_jdbc_reader_options():
    opts = jdbc_reader_options(
        "jdbc:postgresql://h/db", "events",
        partition_column="event_id", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64, fetch_size=5000, user="u",
    )
    assert opts["partitionColumn"] == "event_id"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "5000"
    assert opts["user"] == "u"
    with pytest.raises(ValueError):
        jdbc_reader_options("jdbc:x", "t", partition_column="a")


def test_load_table_uris(spark, tmp_path):
    from macrobase_spark.sources.table_source import load_table

    p = str(tmp_path / "t.parquet")
    spark.range(5).write.parquet(p)
    assert load_table(spark, f"parquet://{p}").count() == 5
    assert load_table(spark, p).count() == 5
    spark.range(7).createOrReplaceTempView("tbl_src_test")
    assert load_table(spark, "table://tbl_src_test").count() == 7
    with pytest.raises(ValueError):
        load_table(spark, "ftp://x")


def test_stream_jdbc_polling(spark):
    """SqlStreamReader contract: offset-predicate paging, maxId advance,
    batch-size cap, growing-source pickup, empty-poll stop."""
    from macrobase_spark.sources.jdbc_source import stream_jdbc

    # fake page reader over an in-memory table that GROWS between polls
    source_rows = [(i, float(i * 10)) for i in range(7)]

    def fetch(spark_, offset, limit):
        page = sorted((r for r in source_rows if r[0] > offset))[:limit]
        return spark_.createDataFrame(page or [], "id long, v double")

    batches = []
    n = stream_jdbc(
        spark, "jdbc:ignored", "SELECT * FROM t", "id",
        lambda df: batches.append([r["id"] for r in df.orderBy("id").collect()]),
        max_batch_size=3, poll_interval=0.0, stop_after_empty_polls=2,
        fetch=fetch,
    )
    # one growth mid-stream: appended rows arrive in a later poll
    assert batches[0] == [0, 1, 2] and batches[1] == [3, 4, 5] and batches[2] == [6]
    assert n == 3

    # resumes past the old maxId when new rows appear
    source_rows.extend([(7, 70.0), (8, 80.0)])
    more = []
    n2 = stream_jdbc(
        spark, "jdbc:ignored", "SELECT * FROM t", "id",
        lambda df: more.append([r["id"] for r in df.orderBy("id").collect()]),
        max_batch_size=3, poll_interval=0.0, max_batches=3,
        stop_after_empty_polls=1, fetch=fetch,
    )
    assert more[-1] == [6, 7, 8] or more == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    assert n2 == 3


def test_stream_jdbc_single_snapshot(spark):
    """Each poll must execute its page query exactly once — the count, the
    max-id advance and the callback's rows all come from ONE snapshot (the
    reference reads one cursor). A lazy page would re-run the query per
    action and could skip/duplicate rows on a live table."""
    from macrobase_spark.sources.jdbc_source import stream_jdbc

    acc = spark.sparkContext.accumulator(0)

    def fetch(spark_, offset, limit):
        def bump(batches):
            for pdf in batches:
                acc.add(1)
                yield pdf[pdf["id"] > offset].head(limit)

        base = spark_.createDataFrame([(i,) for i in range(5)], "id long").coalesce(1)
        return base.mapInPandas(bump, "id long")

    seen = []
    n = stream_jdbc(
        spark, "jdbc:ignored", "q", "id",
        lambda df: seen.append(df.count()),
        max_batch_size=10, poll_interval=0.0, stop_after_empty_polls=1,
        fetch=fetch,
    )
    assert n == 1 and seen == [5]
    # one execution for the delivering poll + one for the empty stop poll
    assert acc.value == 2


def test_line_stream_blank_line_not_eof(spark, tmp_path):
    """A mid-file blank line must not masquerade as the EOF sentinel: the
    fixed-size batch replay previously stopped there, silently dropping
    every remaining line."""
    from macrobase_spark.sources.line_stream import stream_csv_lines

    p = tmp_path / "b.csv"
    p.write_text("name,usage\nr0,0.5\n\nr1,1.5\nr2,2.5\n")
    got = []
    n = stream_csv_lines(
        spark, str(p),
        lambda df: got.extend(r["name"] for r in df.collect()),
        double_cols=["usage"], batch_lines=2,
    )
    assert got == ["r0", "r1", "r2"]
    assert n == 2


def test_line_stream_generator(spark, tmp_path):
    """StreamGenerator contract: header consumed once, line-at-a-time fetch
    with "" at EOF, seeded chunk replay covering every line exactly once."""
    from macrobase_spark.sources.line_stream import LineStreamGenerator, stream_csv_lines

    p = tmp_path / "s.csv"
    rows = [f"r{i},{i}.5" for i in range(23)]
    p.write_text("\n".join(["name,usage", *rows]) + "\n")

    gen = LineStreamGenerator(str(p))
    assert gen.header == "name,usage"
    assert gen.fetch() == "r0,0.5"
    assert gen.fetch() == "r1,1.5"
    gen.close()

    got = []
    n = stream_csv_lines(
        spark, str(p),
        lambda df: got.extend(r["name"] for r in df.collect()),
        double_cols=["usage"], seed=11,
    )
    assert got == [f"r{i}" for i in range(23)]  # full replay, in order
    assert n >= 3  # chunked, not one big batch

    # same seed → same batch boundaries (deterministic replay)
    sizes = []
    stream_csv_lines(spark, str(p), lambda df: sizes.append(df.count()), seed=11)
    sizes2 = []
    stream_csv_lines(spark, str(p), lambda df: sizes2.append(df.count()), seed=11)
    assert sizes == sizes2


def test_pipeline_stream_load_dispatch(spark, tmp_path):
    """Pipelines.getStreamingDataLoader parity: scheme-dispatched minibatch
    streams with the maxReadBatchSize contract."""
    from macrobase_spark.pipelines import stream_load

    p = tmp_path / "u.csv"
    p.write_text("\n".join(["name,usage", *[f"r{i},{i}.0" for i in range(12)]]) + "\n")

    sizes = []
    n = stream_load(
        spark,
        {"inputURI": f"csv://{p}", "metric": "usage", "maxReadBatchSize": 5},
        lambda df: sizes.append(df.count()),
    )
    assert sizes == [5, 5, 2] and n == 3

    with pytest.raises(ValueError):
        stream_load(spark, {"inputURI": "ftp://x"}, lambda df: None)
