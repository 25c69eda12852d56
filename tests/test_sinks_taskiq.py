"""Taskiq sink over a loopback RESP (Redis-protocol) server
(reference TaskiqPipeline, pipelines.py:812-917; wire shape =
taskiq-redis ListQueueBroker: LPUSH of the JSON TaskiqMessage)."""

from __future__ import annotations

import json
import socket
import threading

import pytest


class FakeRedis(threading.Thread):
    """Minimal RESP server: AUTH, PING, LPUSH into in-memory lists."""

    def __init__(self, password: str | None = None):
        super().__init__(daemon=True)
        self.password = password
        self.lists: dict[str, list[bytes]] = {}
        self.lock = threading.Lock()
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]

    def stop(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def run(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        buf = b""

        def line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            out, buf = buf.split(b"\r\n", 1)
            return out

        authed = self.password is None
        try:
            while True:
                head = line()
                if not head.startswith(b"*"):
                    conn.sendall(b"-ERR protocol\r\n")
                    return
                args = []
                for _ in range(int(head[1:])):
                    n = int(line()[1:])
                    while len(buf) < n + 2:
                        buf += conn.recv(65536)
                    args.append(buf[:n])
                    buf = buf[n + 2:]
                cmd = args[0].upper()
                if cmd == b"AUTH":
                    if args[1].decode() == (self.password or ""):
                        authed = True
                        conn.sendall(b"+OK\r\n")
                    else:
                        conn.sendall(b"-ERR invalid password\r\n")
                elif not authed:
                    conn.sendall(b"-NOAUTH Authentication required.\r\n")
                elif cmd == b"PING":
                    conn.sendall(b"+PONG\r\n")
                elif cmd == b"LPUSH":
                    with self.lock:
                        lst = self.lists.setdefault(args[1].decode(), [])
                        for v in args[2:]:
                            lst.insert(0, v)
                        n = len(lst)
                    conn.sendall(b":%d\r\n" % n)
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()


@pytest.fixture(scope="module")
def redis_server():
    srv = FakeRedis()
    srv.start()
    yield srv
    srv.stop()


def test_taskiq_sink_enqueues_task_messages(redis_server, spark):
    from silkworm_spark.operators.sinks import write_taskiq_redis

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    n = write_taskiq_redis(
        df, "127.0.0.1", redis_server.port,
        queue_name="crawl_items", task_name=".:process_item",
    )
    assert n == 3
    msgs = [json.loads(m) for m in redis_server.lists["crawl_items"]]
    assert len(msgs) == 3
    for m in msgs:
        assert m["task_name"] == ".:process_item"
        assert m["kwargs"] == {} and m["labels"] == {}
        assert len(m["args"]) == 1
    names = sorted(m["args"][0]["name"] for m in msgs)
    assert names == ["alpha", "beta", "gamma"]
    # deterministic distinct task ids
    ids = {m["task_id"] for m in msgs}
    assert len(ids) == 3


def test_taskiq_sink_auth(spark):
    from silkworm_spark.operators.sinks import write_taskiq_redis

    srv = FakeRedis(password="hunter2")
    srv.start()
    try:
        df = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(RuntimeError, match="invalid password"):
            write_taskiq_redis(df, "127.0.0.1", srv.port, password="wrong")
        assert write_taskiq_redis(df, "127.0.0.1", srv.port, password="hunter2") == 1
    finally:
        srv.stop()
