"""REST query endpoint (reference core RestServer.java: POST /query with a
pipeline config -> explanation JSON)."""

import json
import urllib.request

import numpy as np
import pytest

from macrobase_spark.server import make_server


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    rows = [
        (
            int(i),
            "hot" if i < 12 else ("ios" if i % 2 == 0 else "android"),
            round(float(rng.normal(0, 1)), 3) + (60.0 if i < 12 else 0.0),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "rid long, dev string, m double")
    src = str(tmp_path_factory.mktemp("rest") / "in.parquet")
    df.write.mode("overwrite").parquet(src)
    srv = make_server(spark, port=0)  # ephemeral port
    import threading

    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, src
    srv.shutdown()


def _post(srv, path, obj):
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_query_endpoint_runs_pipeline(server):
    srv, src = server
    conf = {
        "pipeline": "BasicBatchPipeline",
        "inputURI": f"parquet://{src}",
        "classifier": "percentile",
        "metric": "m",
        "cutoff": 2.0,
        "includeLo": False,
        "attributes": ["dev"],
        "summarizer": "apriori",
        "minSupport": 0.5,
        "minRatioMetric": 2.0,
    }
    status, body = _post(srv, "/query", conf)
    assert status == 200
    assert body["classified"] == 400
    assert body["numRows"] == len(body["explanation"]) > 0
    assert any(r.get("dev") == "hot" for r in body["explanation"])


def test_query_endpoint_errors(server):
    srv, _ = server
    status, body = _post(srv, "/nope", {})
    assert status == 404
    status, body = _post(srv, "/query", {"pipeline": "BasicBatchPipeline"})
    assert status == 500 and "error" in body
