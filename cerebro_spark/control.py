"""Out-of-process control surface: the reference's status socket (C3).

The reference daemon serves a line protocol on a unix socket
(`/root/reference/cerebro/cerebro.py:369-375` starts it at
``/tmp/cerebro.sock``; `cerebro.py:430-460` handles it):

    ``status``          → one JSON line ``{"source": running_bool, ...}``
    ``metrics``         → one JSON line of per-source throughput/progress
    ``restart <name>``  → ``true`` / ``false``
    ``exit``            → closes the connection

Same wire protocol here, wrapping :class:`IngestRunner` (whose queries are
Structured Streaming queries, so "running" = ``StreamingQuery.isActive``).
A plain blocking ``socketserver`` on a daemon thread is the right tool: the
control plane is driver-local, human-rate traffic — Spark never sees it.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import threading


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):  # noqa: D102 — protocol documented in module docstring
        runner = self.server.runner  # type: ignore[attr-defined]
        while True:
            line = self.rfile.readline()
            if not line:
                return
            command = line.decode().strip()
            if command == "status":
                self.wfile.write(
                    json.dumps(runner.status(), indent=None).encode() + b"\n"
                )
            elif command == "metrics":
                self.wfile.write(
                    json.dumps(runner.metrics(), indent=None).encode() + b"\n"
                )
            elif command.startswith("restart"):
                parts = command.split()
                try:
                    runner.restart(parts[1])
                    self.wfile.write(b"true\n")
                except BaseException:  # noqa: BLE001 — mirror reference's
                    # catch-all false reply (cerebro.py:451-456)
                    self.wfile.write(b"false\n")
            elif command == "exit":
                return
            else:
                self.wfile.write(b"false\n")


class _Server(socketserver.ThreadingMixIn, socketserver.UnixStreamServer):
    daemon_threads = True
    allow_reuse_address = True


class ControlServer:
    """Serve runner status/restart on a unix socket, off-thread.

    >>> ctl = ControlServer(runner, "/tmp/cerebro_spark.sock").start()
    ...   $ echo status | nc -U /tmp/cerebro_spark.sock
    >>> ctl.stop()
    """

    def __init__(self, runner, path: str = "/tmp/cerebro_spark.sock"):
        self.runner = runner
        self.path = path
        self._server: _Server | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "ControlServer":
        if os.path.exists(self.path):
            os.unlink(self.path)
        self._server = _Server(self.path, _Handler)
        self._server.runner = self.runner  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="cerebro-control", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if os.path.exists(self.path):
            os.unlink(self.path)


def query(path: str, command: str, timeout: float = 5.0) -> str:
    """One-shot client: send ``command``, return the reply line (the
    reference's interactive ``nc -U`` usage, programmatic)."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(path)
        s.sendall(command.encode() + b"\n")
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(4096)
            if not chunk:
                break
            buf += chunk
        return buf.decode().strip()
