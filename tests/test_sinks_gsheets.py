"""GoogleSheets sink over a loopback OAuth2 + Sheets v4 fake
(reference GoogleSheetsPipeline, pipelines.py:1949-2120).

The fake is not a mock of our client — it independently verifies the
service-account JWT's RS256 signature with the account's PUBLIC key,
checks the audience/expiry claims, issues a bearer token, and rejects
append calls without it. So the whole auth chain (JWT build → token
exchange → Bearer-authorized values:append) runs against real wire
bytes, the same standard as the other loopback wire-protocol sinks.
"""

from __future__ import annotations

import base64
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class FakeGoogle(ThreadingHTTPServer):
    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        from cryptography.hazmat.primitives.asymmetric import rsa

        self.key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        self.token = "tok-" + base64.b16encode(b"fixed").decode()
        self.appends: list[tuple[str, str, list]] = []  # (sheet_id, range, values)
        self.lock = threading.Lock()

    @property
    def base(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def credentials_file(self, tmp_path) -> str:
        from cryptography.hazmat.primitives import serialization

        pem = self.key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        ).decode()
        path = tmp_path / "service_account.json"
        path.write_text(json.dumps({
            "type": "service_account",
            "client_email": "crawler@example.iam.gserviceaccount.com",
            "private_key": pem,
            "token_uri": f"{self.base}/token",
        }))
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
        srv: FakeGoogle = self.server  # type: ignore[assignment]
        n = int(self.headers.get("content-length", 0))
        body = self.rfile.read(n)
        if self.path == "/token":
            form = urllib.parse.parse_qs(body.decode())
            if form.get("grant_type") != ["urn:ietf:params:oauth:grant-type:jwt-bearer"]:
                return self._json(400, {"error": "unsupported_grant_type"})
            assertion = form["assertion"][0]
            h, c, sig = assertion.split(".")
            claims = json.loads(_b64url_decode(c))
            if claims["aud"] != f"{srv.base}/token" or claims["exp"] <= claims["iat"]:
                return self._json(400, {"error": "invalid_claims"})
            from cryptography.hazmat.primitives import hashes
            from cryptography.hazmat.primitives.asymmetric import padding

            try:
                srv.key.public_key().verify(
                    _b64url_decode(sig), f"{h}.{c}".encode(),
                    padding.PKCS1v15(), hashes.SHA256(),
                )
            except Exception:
                return self._json(401, {"error": "invalid_signature"})
            return self._json(200, {"access_token": srv.token,
                                    "token_type": "Bearer", "expires_in": 3600})
        if "/values/" in self.path and self.path.endswith("valueInputOption=RAW"):
            if self.headers.get("authorization") != f"Bearer {srv.token}":
                return self._json(401, {"error": "unauthorized"})
            parts = self.path.split("/")
            sheet_id = parts[3]
            rng = urllib.parse.unquote(parts[5].split(":append")[0])
            with srv.lock:
                srv.appends.append((sheet_id, rng, json.loads(body)["values"]))
            return self._json(200, {"updates": {"updatedRows": 1}})
        return self._json(404, {"error": "not_found"})


@pytest.fixture(scope="module")
def gserver():
    srv = FakeGoogle()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_gsheets_sink_header_flatten_and_batches(gserver, spark, tmp_path):
    from silkworm_spark.operators.sinks import write_google_sheets

    df = spark.createDataFrame(
        [(1, "alpha", (9.5, "x"), ["t1", "t2"]),
         (2, "beta", (8.0, "y"), ["t3"]),
         (3, "gamma", (7.5, "z"), [])],
        "id long, name string, meta struct<score double, tag string>, tags array<string>",
    )
    n = write_google_sheets(
        df, "sheet-abc123", gserver.credentials_file(tmp_path),
        sheet_name="Crawl", batch_size=2, api_base=gserver.base,
    )
    assert n == 3
    appends = [a for a in gserver.appends if a[0] == "sheet-abc123"]
    # header once at A1, then ceil(3/2)=2 data batches at A2
    assert [a[1] for a in appends] == ["Crawl!A1", "Crawl!A2", "Crawl!A2"]
    header = appends[0][2][0]
    assert header == ["id", "name", "meta_score", "meta_tag", "tags"]
    rows = appends[1][2] + appends[2][2]
    assert len(rows) == 3
    byname = {r[1]: r for r in rows}
    # nested struct flattened, list joined with ", " (reference rule)
    assert byname["alpha"][2] == 9.5 and byname["alpha"][3] == "x"
    assert byname["alpha"][4] == "t1, t2" and byname["gamma"][4] == ""


def test_gsheets_sink_rejects_bad_signature(gserver, spark, tmp_path):
    """Credentials signed by a DIFFERENT key must fail the token
    exchange — proving the fake really checks the signature."""
    import urllib.error

    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    from silkworm_spark.operators.sinks import write_google_sheets

    rogue = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = rogue.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    bad = tmp_path / "bad_creds.json"
    bad.write_text(json.dumps({
        "client_email": "rogue@example.iam.gserviceaccount.com",
        "private_key": pem,
        "token_uri": f"{gserver.base}/token",
    }))
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(urllib.error.HTTPError):
        write_google_sheets(df, "sheet-abc123", str(bad), api_base=gserver.base)
