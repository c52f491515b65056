"""REST query endpoint (reference core/.../rest/RestServer.java:14-39):
POST /query with a pipeline-config JSON body → explanation rows as JSON.

stdlib-only (http.server); the handler delegates to pipelines.run_config, so
the JSON body is exactly the reference's PipelineConfig shape. One Spark
session serves all requests (Spark scheduling handles concurrency); this is
a control-plane convenience, not a data-plane component — violation rows at
scale go to tables, not HTTP responses.
"""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from macrobase_spark.pipelines import run_config


def _json_safe(v):
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
    return v


def make_server(
    spark: SparkSession, port: int = 0, base_dir: str = ""
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 picks a free port."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            if self.path != "/query":
                self.send_error(404)
                return
            try:
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                conf = json.loads(body)
                res = run_config(spark, conf, base_dir=base_dir)
                rows = [
                    {k: _json_safe(v) for k, v in r.asDict().items()}
                    for r in res.explanation.collect()
                ]
                payload = json.dumps({"explanation": rows}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as exc:  # mirror the reference's exception logging
                msg = json.dumps({"error": str(exc)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(
    spark: SparkSession, port: int = 0, base_dir: str = ""
) -> tuple[ThreadingHTTPServer, int]:
    """Start the server on a daemon thread; returns (server, bound_port)."""
    srv = make_server(spark, port, base_dir)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
