"""REST query server (reference core/.../rest/RestServer.java:15-40):
POST /query with a pipeline-config JSON body runs the configured
pipeline and returns the explanation as JSON.

Port notes:
- The reference is a SparkJava (web framework) endpoint around
  PipelineUtils.createPipeline; here the same contract wraps
  `pipelines.run_config` over a shared SparkSession — stdlib
  ThreadingHTTPServer, no extra dependencies.
- Response shape: {"explanation": [row objects...], "numRows": N}, plus
  {"classified": N} row count (the reference serializes its Explanation
  POJO via Jackson; the explanation relation rows are the payload).
- Errors return HTTP 500 with {"error": ...} (the reference logs and
  returns an empty body via its exception handler).

This is a driver-side control-plane endpoint — the heavy lifting stays
in Spark jobs; the server only shuttles configs in and (small)
explanation relations out, so it adds no data-path bottleneck at scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _json_safe(v):
    import datetime
    import math

    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def make_server(spark, host: str = "127.0.0.1", port: int = 4567,
                base_dir: str = "") -> ThreadingHTTPServer:
    """Build (not start) the server; reference default port is SparkJava's
    4567. Call .serve_forever() or use `serve(...)`."""
    from macrobase_spark.pipelines import run_config

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") != "/query":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                conf = json.loads(self.rfile.read(n).decode())
                res = run_config(spark, conf, base_dir=base_dir)
                rows = [
                    {k: _json_safe(v) for k, v in r.asDict().items()}
                    for r in res.explanation.collect()
                ]
                self._reply(
                    200,
                    {
                        "explanation": rows,
                        "numRows": len(rows),
                        "classified": res.classified.count(),
                    },
                )
            except Exception as ex:  # mirror the reference's catch-all
                self._reply(500, {"error": repr(ex)[:500]})

    return ThreadingHTTPServer((host, port), Handler)


def serve(spark, host: str = "127.0.0.1", port: int = 4567,
          base_dir: str = "", background: bool = False):
    srv = make_server(spark, host, port, base_dir)
    if background:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv
    srv.serve_forever()
    return srv


if __name__ == "__main__":
    import argparse

    from macrobase_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=4567)
    ap.add_argument("--base-dir", default="")
    args = ap.parse_args()
    serve(get_spark("macrobase-rest"), args.host, args.port, args.base_dir)
