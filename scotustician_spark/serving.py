"""Dashboard serving surface (reference §3.3: services/visualization/
app.py — a Streamlit app over the exported cluster results).

The reference serves its dashboard as a Streamlit process reading the
pipeline's CSV/JSON exports (visualization/app.py:14-33, helpers.py:
20-114). Spark-first restatement: the PANELS are the DataFrame
aggregations in ``visualization.py`` (the part that must scale — they
run on the cluster); the SERVING is deliberately thin — a stdlib
``http.server`` process that materializes each panel once (the
exports are small, aggregated tables; collecting them is the
presentation layer's job, mirroring st.cache_data) and serves JSON +
a minimal HTML index. No web framework dependency: the container has
none, and a dashboard over pre-aggregated results needs none.

Endpoints:
    /healthz                     -> {"ok": true, "panels": [...]}
    /api/panels                  -> list of panel names
    /api/panel/<name>            -> {"columns": [...], "rows": [[...]]}
    /                            -> HTML index rendering every panel

Usage::

    panels = build_panels(spark, out_dir)          # DataFrames
    srv = DashboardServer(panels, port=8501)       # collects once
    srv.start()                                    # background thread
    ...
    srv.stop()
"""

from __future__ import annotations

import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from . import visualization as VZ


def build_panels(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """The dashboard's panel set as LAZY DataFrames over a pipeline
    run's exports — the same aggregations the reference's Streamlit
    panels compute (helpers.py:236-319), composed from
    ``visualization.py``."""
    res = VZ.load_results(spark, out_dir)
    return {
        "cluster_sizes": VZ.cluster_size_distribution(res["cluster_results"]),
        "term_trend": VZ.term_trend(res["utterances"]),
        "representatives": VZ.representative_table(
            res["cluster_results"], res["cluster_report"]
        ),
    }


def _materialize(panels: dict[str, DataFrame]) -> dict[str, dict]:
    """Collect each panel once (st.cache_data analog): dashboards read
    small aggregated tables, so a one-time driver materialization is
    the correct shape — the heavy lifting already happened in the
    pipeline that wrote the exports."""
    out = {}
    for name, df in panels.items():
        rows = df.collect()
        out[name] = {
            "columns": df.columns,
            "rows": [[None if v is None else v for v in r] for r in rows],
        }
    return out


def _render_index(data: dict[str, dict]) -> str:
    parts = ["<html><head><title>scotustician dashboard</title></head><body>"]
    parts.append("<h1>scotustician: oral argument cluster dashboard</h1>")
    for name, panel in data.items():
        parts.append(f"<h2>{html.escape(name)}</h2><table border='1'><tr>")
        parts.extend(f"<th>{html.escape(str(c))}</th>" for c in panel["columns"])
        parts.append("</tr>")
        for row in panel["rows"][:200]:
            parts.append(
                "<tr>"
                + "".join(f"<td>{html.escape(str(v))}</td>" for v in row)
                + "</tr>"
            )
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


class DashboardServer:
    """Threaded stdlib HTTP server over materialized panels. ``port=0``
    binds an ephemeral port (tests); ``srv.port`` reports the bound
    one."""

    def __init__(
        self,
        panels: dict[str, DataFrame],
        port: int = 8501,
        index_html: str | None = None,
    ):
        self._data = _materialize(panels)
        data = self._data
        index = index_html  # e.g. dashboard.render_dashboard_html(...)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet server
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 - stdlib API
                if self.path == "/healthz":
                    body = json.dumps(
                        {"ok": True, "panels": sorted(data)}
                    ).encode()
                    return self._send(200, body, "application/json")
                if self.path == "/api/panels":
                    return self._send(
                        200, json.dumps(sorted(data)).encode(),
                        "application/json",
                    )
                if self.path.startswith("/api/panel/"):
                    name = self.path.removeprefix("/api/panel/")
                    if name not in data:
                        return self._send(
                            404, b'{"error": "no such panel"}',
                            "application/json",
                        )
                    return self._send(
                        200, json.dumps(data[name], default=str).encode(),
                        "application/json",
                    )
                if self.path == "/":
                    page = index if index is not None else _render_index(data)
                    return self._send(200, page.encode(), "text/html")
                return self._send(404, b"not found", "text/plain")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
