"""HTTP liveness endpoint (SURVEY §2.5 R8).

Mirrors kpipe's HttpHealthServer (HttpHealthServer.java:18-75): a tiny
stdlib HTTP server exposing one GET path that k8s probes can point at —
200 + ``{"status": "OK", ...}`` when the supplied health check passes,
503 + ``"UNHEALTHY"`` when it doesn't (or the supplier throws), 405 for
non-GET. The suppliers are plain callables so the server composes with
any ``Handle``: ``health_supplier=lambda: handle.query.isActive``,
``in_flight_supplier=lambda: handle.lag()``,
``paused_supplier=lambda: handle.governor.paused``.
"""

from __future__ import annotations

import json
import logging
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

log = logging.getLogger(__name__)

DEFAULT_PATH = "/health"


def _normalize_path(path: str | None) -> str:
    if not path or not path.strip():
        return DEFAULT_PATH
    return path if path.startswith("/") else "/" + path


class HttpHealthServer:
    """Idempotent start/close liveness server over a health supplier.

    Response contract (HttpHealthServer.java:128-158): GET only (405
    otherwise); JSON body with status / inFlight / paused; HTTP 200
    when healthy, 503 when not; a throwing health supplier counts as
    unhealthy rather than erroring the probe.
    """

    def __init__(
        self,
        host: str = "0.0.0.0",
        port: int = 0,
        path: str = DEFAULT_PATH,
        health_supplier: Callable[[], bool] = lambda: True,
        in_flight_supplier: Callable[[], int] | None = None,
        paused_supplier: Callable[[], bool] | None = None,
        app_name: str = "kpipe-app",
    ) -> None:
        self._health = health_supplier
        self._in_flight = in_flight_supplier or (lambda: 0)
        self._paused = paused_supplier or (lambda: False)
        self._path = _normalize_path(path)
        self._app_name = app_name
        self._started = False
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt: str, *args) -> None:  # noqa: A003
                log.debug("health http: " + fmt, *args)

            def do_GET(self) -> None:  # noqa: N802
                if self.path.split("?")[0] != outer._path:
                    self._send(404, {"error": "not found"})
                    return
                # EVERY supplier is contained, not just the health
                # check: serve_handle_health wires in_flight to
                # handle.lag(), which raises on a dead session — an
                # unguarded call would drop the connection with no
                # HTTP response at all (probe error), instead of the
                # documented 503 UNHEALTHY body
                try:
                    healthy = bool(outer._health())
                except Exception:  # noqa: BLE001
                    log.warning("health check failed for %s", outer._app_name)
                    healthy = False
                try:
                    in_flight = int(outer._in_flight())
                except Exception:  # noqa: BLE001
                    log.warning("in-flight supplier failed for %s", outer._app_name)
                    in_flight, healthy = -1, False
                try:
                    paused = bool(outer._paused())
                except Exception:  # noqa: BLE001
                    log.warning("paused supplier failed for %s", outer._app_name)
                    paused, healthy = False, False
                body = {
                    "status": "OK" if healthy else "UNHEALTHY",
                    "inFlight": in_flight,
                    "paused": paused,
                }
                self._send(200 if healthy else 503, body)

            def do_POST(self) -> None:  # noqa: N802
                self._send(405, {"error": "Method Not Allowed"})

            do_PUT = do_DELETE = do_PATCH = do_POST  # noqa: N815

            def _send(self, status: int, body: dict) -> None:
                payload = json.dumps(body).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json; charset=utf-8")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._server = ThreadingHTTPServer((host, port), _Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        """Actual bind (host, port) — port is resolved when 0 was asked."""
        return self._server.server_address[:2]

    @property
    def path(self) -> str:
        return self._path

    def start(self) -> None:
        if self._started:
            return
        self._started = True
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="kpipe-health", daemon=True
        )
        self._thread.start()
        log.info("health HTTP server started on %s%s", self.address, self._path)

    def close(self) -> None:
        if not self._started:
            return
        self._started = False
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        log.info("health HTTP server stopped")

    def __enter__(self) -> HttpHealthServer:
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def serve_handle_health(handle, host: str = "127.0.0.1", port: int = 0) -> HttpHealthServer:
    """Wire a ``Handle`` to a started liveness server — the one-liner a
    deployment calls next to ``runner.start(...)``."""
    srv = HttpHealthServer(
        host=host,
        port=port,
        health_supplier=lambda: handle.query.isActive,
        in_flight_supplier=handle.lag,
        paused_supplier=lambda: bool(handle.governor and handle.governor.paused),
    )
    srv.start()
    return srv
