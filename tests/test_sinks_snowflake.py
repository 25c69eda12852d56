"""Snowflake sink over a loopback SQL REST API v2 fake (reference
SnowflakePipeline, pipelines.py:2122-2249).

The fake is not a mock of our client — it independently verifies the
key-pair JWT's RS256 signature with the account's PUBLIC key, checks
that the ``iss`` claim embeds the real SHA256 fingerprint of that key
(the part of the Snowflake spec that catches a wrong-key client),
enforces the ``KEYPAIR_JWT`` token-type header, and executes the
submitted statements (DDL + bound INSERTs) against an in-memory
table. So the whole chain — JWT build → statements API → positional
bindings → SELECT-from-VALUES PARSE_JSON insert — runs against real
wire bytes, the same standard as the other loopback sinks.
"""

from __future__ import annotations

import base64
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class FakeSnowflake(ThreadingHTTPServer):
    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa

        self.key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        der = self.key.public_key().public_bytes(
            serialization.Encoding.DER,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        h = hashes.Hash(hashes.SHA256())
        h.update(der)
        self.fingerprint = base64.b64encode(h.finalize()).decode()
        self.statements: list[dict] = []  # raw request payloads, in order
        self.rows: list[tuple[str, dict]] = []  # (spider, item) applied inserts
        self.created: list[str] = []  # DDL statements seen
        self.lock = threading.Lock()
        # async_mode: every POST answers 202 + a handle; the statement
        # only APPLIES when the client polls GET /statements/{handle}
        # (first poll returns 202 again to force a real wait loop).
        self.async_mode = False
        self.pending: dict[str, dict] = {}
        self.poll_counts: dict[str, int] = {}
        self._next_handle = 0

    @property
    def base(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def private_key_file(self, tmp_path, key=None) -> str:
        from cryptography.hazmat.primitives import serialization

        pem = (key or self.key).private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        ).decode()
        path = tmp_path / "rsa_key.p8"
        path.write_text(pem)
        return str(path)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        srv: FakeSnowflake = self.server  # type: ignore[assignment]
        if not self.path.startswith("/api/v2/statements"):
            return self._json(404, {"message": "not_found"})
        if self.headers.get("x-snowflake-authorization-token-type") != "KEYPAIR_JWT":
            return self._json(401, {"message": "missing KEYPAIR_JWT header"})
        auth = self.headers.get("authorization", "")
        if not auth.startswith("Bearer "):
            return self._json(401, {"message": "no bearer"})
        h, c, sig = auth[len("Bearer "):].split(".")
        claims = json.loads(_b64url_decode(c))
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding

        try:
            srv.key.public_key().verify(
                _b64url_decode(sig), f"{h}.{c}".encode(),
                padding.PKCS1v15(), hashes.SHA256(),
            )
        except Exception:
            return self._json(401, {"message": "invalid_signature"})
        if claims["iss"] != f"{claims['sub']}.SHA256:{srv.fingerprint}":
            return self._json(401, {"message": "fingerprint_mismatch"})
        if claims["exp"] <= claims["iat"]:
            return self._json(401, {"message": "expired"})

        n = int(self.headers.get("content-length", 0))
        payload = json.loads(self.rfile.read(n))
        with srv.lock:
            srv.statements.append(payload)
            if srv.async_mode:
                srv._next_handle += 1
                handle = f"01b0-async-{srv._next_handle}"
                srv.pending[handle] = payload
                srv.poll_counts[handle] = 0
                return self._json(202, {"statementHandle": handle,
                                        "message": "Statement executing."})
            err = self._apply(srv, payload)
            if err:
                return err
        return self._json(200, {"statementHandle": "01b0-fake",
                                "sqlState": "00000",
                                "message": "Statement executed successfully."})

    def do_GET(self):  # noqa: N802
        srv: FakeSnowflake = self.server  # type: ignore[assignment]
        m = re.match(r"^/api/v2/statements/([\w-]+)$", self.path)
        if not m:
            return self._json(404, {"message": "not_found"})
        handle = m.group(1)
        with srv.lock:
            if handle not in srv.pending:
                return self._json(422, {"message": "unknown handle"})
            srv.poll_counts[handle] += 1
            if srv.poll_counts[handle] < 2:
                return self._json(202, {"statementHandle": handle,
                                        "message": "Statement executing."})
            payload = srv.pending.pop(handle)
            err = self._apply(srv, payload)
            if err:
                return err
        return self._json(200, {"statementHandle": handle,
                                "sqlState": "00000",
                                "message": "Statement executed successfully."})

    def _apply(self, srv, payload):
        """Execute a DDL/INSERT payload against the in-memory table;
        returns an error response or None. Caller holds srv.lock."""
        stmt = payload["statement"]
        if stmt.lstrip().upper().startswith("CREATE TABLE"):
            srv.created.append(stmt)
            return None
        m = re.search(r"FROM VALUES (.+)$", stmt)
        if not m:
            return self._json(400, {"message": "unsupported statement"})
        n_rows = m.group(1).count("(")
        b = payload.get("bindings", {})
        for i in range(n_rows):
            spider = b[str(2 * i + 1)]["value"]
            item = json.loads(b[str(2 * i + 2)]["value"])
            srv.rows.append((spider, item))
        return None


@pytest.fixture(scope="module")
def sfserver():
    srv = FakeSnowflake()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_snowflake_sink_ddl_batches_and_rows(sfserver, spark, tmp_path):
    from silkworm_spark.operators.sinks import write_snowflake

    df = spark.createDataFrame(
        [(1, "alpha", ["t1", "t2"]), (2, "beta", ["t3"]), (3, "gamma", [])],
        "id long, name string, tags array<string>",
    )
    n = write_snowflake(
        df, account="myacct", user="crawler",
        private_key_file=sfserver.private_key_file(tmp_path),
        database="DB", schema="PUBLIC", warehouse="WH",
        spider="newsbot", batch_size=2, api_base=sfserver.base,
    )
    assert n == 3
    # DDL first (reference table shape), then ceil(3/2)=2 bound inserts
    assert len(sfserver.created) == 1
    ddl = sfserver.created[0]
    for frag in ("CREATE TABLE IF NOT EXISTS items",
                 "NUMBER AUTOINCREMENT PRIMARY KEY",
                 "data VARIANT NOT NULL",
                 "TIMESTAMP_NTZ DEFAULT CURRENT_TIMESTAMP()"):
        assert frag in ddl
    inserts = [p for p in sfserver.statements
               if p["statement"].startswith("INSERT")]
    assert len(inserts) == 2
    # session context travels with every statement
    assert {(p["database"], p["schema"], p["warehouse"]) for p in sfserver.statements} \
        == {("DB", "PUBLIC", "WH")}
    # applied rows: same spider, items round-trip through VARIANT JSON
    assert [s for s, _ in sfserver.rows] == ["newsbot"] * 3
    byname = {item["name"]: item for _, item in sfserver.rows}
    assert byname["alpha"]["tags"] == ["t1", "t2"]
    assert byname["gamma"]["tags"] == [] and byname["beta"]["id"] == 2


def test_snowflake_sink_polls_202_until_complete(sfserver, spark, tmp_path):
    """The SQL API answers 202 + statementHandle while a statement is
    still executing; the sink must poll GET /statements/{handle} and
    only count rows once the poll returns 200 — otherwise CREATE TABLE
    → INSERT races and async failures count as written."""
    from silkworm_spark.operators.sinks import write_snowflake

    rows_before = len(sfserver.rows)
    sfserver.async_mode = True
    try:
        df = spark.createDataFrame([(10, "delta"), (11, "eps")],
                                   "id long, name string")
        n = write_snowflake(
            df, account="myacct", user="crawler",
            private_key_file=sfserver.private_key_file(tmp_path),
            database="DB", schema="PUBLIC", warehouse="WH",
            spider="asyncbot", batch_size=10, api_base=sfserver.base,
        )
    finally:
        sfserver.async_mode = False
    assert n == 2
    applied = sfserver.rows[rows_before:]
    assert sorted(item["name"] for _, item in applied) == ["delta", "eps"]
    # every handle was polled to completion (≥2 polls: first re-202s)
    assert sfserver.pending == {}
    assert all(c >= 2 for c in sfserver.poll_counts.values())


def test_snowflake_sink_rejects_rogue_key(sfserver, spark, tmp_path):
    """A JWT signed by a different key fails both the signature and
    the iss-fingerprint check — proving the fake really verifies."""
    import urllib.error

    from cryptography.hazmat.primitives.asymmetric import rsa

    from silkworm_spark.operators.sinks import write_snowflake

    rogue = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(urllib.error.HTTPError):
        write_snowflake(
            df, account="myacct", user="crawler",
            private_key_file=sfserver.private_key_file(tmp_path, key=rogue),
            database="DB", schema="PUBLIC", warehouse="WH",
            api_base=sfserver.base,
        )
