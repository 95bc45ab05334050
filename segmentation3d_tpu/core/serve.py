"""Warm-session segmentation server (the ``seg_serve`` CLI).

The reference toolkit's deployment story is "run ``seg_infer`` per batch of
cases" (``segmentation3d/seg_infer.py:main()`` ≈L1-40): every invocation
pays model load and — on TPU — program compilation. A cold
``segmentation()`` call costs seconds-to-minutes of XLA compilation, while
a warm-session repeat costs ~0.06 s of dispatch plus device compute
(BASELINE.md, session-reuse measurement). For production serving this
module keeps ONE process alive with the ``core.seg_infer`` session cache
warm and serves segmentation requests over a newline-delimited-JSON
protocol on a Unix-domain or TCP socket.

Protocol — one JSON object per line, one JSON response line each:

    {"input": <image|list.txt|csv|folder>, "output_dir": <dir>
     [, "seg_name": "seg.mha", "save_image": false, "save_prob": false]}
        -> {"ok": true, "results": [[case, secs], ...], "secs": total}
    {"cmd": "ping"}      -> {"ok": true, "pong": true, "model_dir": ...,
                             "served": N, "uptime_s": ...}
    {"cmd": "shutdown"}  -> {"ok": true, "shutdown": true}   (server exits)

Engine-shaping options (model, partitioning, dtype, quant, TTA, mesh) are
fixed at server start, so every request after the first reuses the compiled
programs; per-request fields are limited to input/output naming. Requests
are handled serially — the device is a serial resource, and admission
control belongs in front of the socket, not inside the process.
"""
from __future__ import annotations

import json
import os
import socket
import time

# per-request fields accepted by a segmentation request; anything else is
# rejected loudly (engine options cannot change per-request — they would
# recompile, which is exactly what serving exists to avoid)
_REQUEST_KEYS = {"input", "output_dir", "seg_name", "save_image",
                 "save_prob", "cmd"}


class SegmentationServer:
    """Request handler around a fixed segmentation pipeline.

    ``run_fn(input_path, output_dir, seg_name, save_image, save_prob)``
    performs one batch of cases and returns ``[(case_name, secs), ...]`` —
    built by the CLI as a closure over ``core.seg_infer.segmentation`` (or
    the coarse-to-fine driver), so this class stays transport-only.
    """

    def __init__(self, run_fn, model_dir: str, seg_name: str = "seg.mha"):
        self.run_fn = run_fn
        self.model_dir = model_dir
        self.seg_name = seg_name
        self.served = 0
        self._t0 = time.time()

    def handle(self, req: dict) -> tuple[dict, bool]:
        """One request -> (response, keep_running)."""
        try:
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            unknown = set(req) - _REQUEST_KEYS
            if unknown:
                raise ValueError(
                    f"unknown request field(s) {sorted(unknown)}; engine "
                    "options are fixed at server start (restart seg_serve "
                    "to change them)")
            cmd = req.get("cmd")
            if cmd == "ping":
                return {"ok": True, "pong": True,
                        "model_dir": self.model_dir,
                        "served": self.served,
                        "uptime_s": round(time.time() - self._t0, 1)}, True
            if cmd == "shutdown":
                return {"ok": True, "shutdown": True}, False
            if cmd is not None:
                raise ValueError(f"unknown cmd {cmd!r}")
            if "input" not in req or "output_dir" not in req:
                raise ValueError("request needs 'input' and 'output_dir'")
            t0 = time.time()
            results = self.run_fn(
                str(req["input"]), str(req["output_dir"]),
                str(req.get("seg_name", self.seg_name)),
                bool(req.get("save_image", False)),
                bool(req.get("save_prob", False)))
            self.served += len(results)
            return {"ok": True,
                    "results": [[n, round(float(s), 3)] for n, s in results],
                    "secs": round(time.time() - t0, 3)}, True
        except Exception as e:  # per-request isolation: the server survives
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}, True


def _probe_alive(socket_path: str) -> bool:
    """True if a server is currently accepting on ``socket_path``."""
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(1.0)
    try:
        c.connect(socket_path)
        return True
    except OSError:
        return False
    finally:
        c.close()


def _bind(socket_path: str | None, host: str | None, port: int | None):
    if socket_path is not None:
        if os.path.exists(socket_path):
            # only remove a STALE socket (dead server); a live server must
            # not have its address silently stolen by a second instance
            if _probe_alive(socket_path):
                raise OSError(
                    f"a seg_serve server is already listening on "
                    f"{socket_path}; shut it down first or choose another "
                    "--socket path")
            os.unlink(socket_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(socket_path)
        return srv, socket_path
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host or "127.0.0.1", port or 0))
    return srv, srv.getsockname()


def serve_forever(server: SegmentationServer, socket_path: str | None = None,
                  host: str | None = None, port: int | None = None,
                  ready=None, log=print, idle_timeout: float = 30.0,
                  max_request_bytes: int = 1 << 20):
    """Accept-loop until a shutdown request. ``ready(address)`` is called
    once listening (tests use it to learn the ephemeral TCP port).

    Connections are handled serially (the device is a serial resource), so a
    single wedged client must not block the queue: a connection that sends no
    complete request line within ``idle_timeout`` seconds is dropped, and a
    request line longer than ``max_request_bytes`` is rejected with an error
    response and the connection closed (a request is a file path + options —
    anything near a megabyte is a protocol violation, not a workload)."""
    srv, address = _bind(socket_path, host, port)
    srv.listen(4)
    if log:
        log(f"seg_serve: listening on {address} (model {server.model_dir})")
    if ready is not None:
        ready(address)
    running = True
    try:
        while running:
            conn, _ = srv.accept()
            with conn:
                # <= 0 means NO timeout (settimeout(0) would mean
                # non-blocking, which drops every client immediately)
                conn.settimeout(idle_timeout if idle_timeout
                                and idle_timeout > 0 else None)
                rf = conn.makefile("rb")
                wf = conn.makefile("w", encoding="utf-8")
                while True:
                    try:
                        # +2: the cap must admit a payload of EXACTLY
                        # max_request_bytes plus its newline
                        raw = rf.readline(max_request_bytes + 2)
                    except (TimeoutError, socket.timeout, OSError):
                        if log:
                            log("seg_serve: dropping idle connection "
                                f"(no request within {idle_timeout}s)")
                        break
                    if not raw:
                        break  # client closed
                    if len(raw.rstrip(b"\n")) > max_request_bytes:
                        resp, keep = {"ok": False, "error":
                                      f"request exceeds {max_request_bytes} "
                                      "bytes"}, True
                        try:
                            wf.write(json.dumps(resp) + "\n")
                            wf.flush()
                        except OSError:
                            pass
                        break  # the rest of the oversized line is unread: drop
                    line = raw.decode("utf-8", errors="replace").strip()
                    if not line:
                        continue
                    try:
                        req = json.loads(line)
                    except json.JSONDecodeError as e:
                        resp, keep = {"ok": False,
                                      "error": f"bad JSON: {e}"}, True
                    else:
                        resp, keep = server.handle(req)
                    try:
                        wf.write(json.dumps(resp) + "\n")
                        wf.flush()
                    except OSError:
                        break  # client went away mid-reply; keep serving
                    if not keep:
                        running = False
                        break
    finally:
        srv.close()
        if socket_path is not None and os.path.exists(socket_path):
            os.unlink(socket_path)
    if log:
        log(f"seg_serve: shut down after {server.served} case(s)")


def request(address, obj: dict, timeout: float = 600.0) -> dict:
    """One-shot client: connect, send ``obj``, return the response dict.
    ``address`` is a Unix-socket path or a ``(host, port)`` tuple."""
    if isinstance(address, str):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    else:
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        address = tuple(address)
    c.settimeout(timeout)
    with c:
        c.connect(address)
        c.sendall((json.dumps(obj) + "\n").encode("utf-8"))
        rf = c.makefile("r", encoding="utf-8")
        line = rf.readline()
    if not line:
        raise ConnectionError("server closed the connection without a reply")
    return json.loads(line)
