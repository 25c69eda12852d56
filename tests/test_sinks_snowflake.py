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
        stmt = payload["statement"]
        with srv.lock:
            srv.statements.append(payload)
            if stmt.lstrip().upper().startswith("CREATE TABLE"):
                srv.created.append(stmt)
            else:
                m = re.search(r"FROM VALUES (.+)$", stmt)
                if not m:
                    return self._json(400, {"message": "unsupported statement"})
                n_rows = m.group(1).count("(")
                b = payload.get("bindings", {})
                for i in range(n_rows):
                    spider = b[str(2 * i + 1)]["value"]
                    item = json.loads(b[str(2 * i + 2)]["value"])
                    srv.rows.append((spider, item))
        return self._json(200, {"statementHandle": "01b0-fake",
                                "sqlState": "00000",
                                "message": "Statement executed successfully."})


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
