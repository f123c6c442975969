"""End-to-end: launch the real server entrypoint as a subprocess (the
documented `python -m duck_server_spark.server` command) and drive both
protocol ports."""

import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

from tests.pg_client import PgClient


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server_proc(sf_dir):
    pg_port, ch_port = _free_port(), _free_port()
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "duck_server_spark.server",
            "--pg-port",
            str(pg_port),
            "--ch-port",
            str(ch_port),
            "--sf-dir",
            sf_dir,
        ],
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    # wait for both ports to accept
    deadline = time.monotonic() + 120
    for port in (ch_port, pg_port):
        while time.monotonic() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=1).close()
                break
            except OSError:
                if proc.poll() is not None:
                    pytest.fail("server process exited early")
                time.sleep(0.5)
        else:
            proc.kill()
            pytest.fail(f"port {port} never came up")
    yield pg_port, ch_port
    proc.terminate()
    proc.wait(timeout=30)


def test_both_protocols_serve_fixture_queries(server_proc):
    pg_port, ch_port = server_proc
    # ClickHouse HTTP
    url = f"http://127.0.0.1:{ch_port}/?query=SELECT%20count(*)%20AS%20n%20FROM%20lineitem"
    with urllib.request.urlopen(url, timeout=120) as r:
        assert r.status == 200
        assert int(r.read().decode().strip()) > 0
    # PostgreSQL wire
    c = PgClient("127.0.0.1", pg_port)
    _, rows, tag = c.simple_query(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY 1"
    )
    assert len(rows) == 3 and tag == "(3 row)"
    c.terminate()
