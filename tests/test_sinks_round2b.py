"""Sinks added late in round 2: RSS, MsgPack, Elasticsearch bulk,
S3 JSONL (reference pipelines.py:578-735, 388-467, 1249-1312,
1391-1475). ES and S3 run against loopback fake services."""

from __future__ import annotations

import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from silkworm_spark.operators.sinks import (
    msgpack_packb,
    write_elasticsearch,
    write_msgpack,
    write_rss,
    write_s3_jsonl,
)

ROWS = [
    dict(title="T1", link="http://x/1", description="D1", author="a1"),
    dict(title="T2", link="http://x/2", description="D2", author=None),
    dict(title=None, link="http://x/3", description="D3", author=None),  # skipped
]


@pytest.fixture()
def feed_df(spark):
    return spark.createDataFrame(
        ROWS, "title string, link string, description string, author string"
    )


def test_rss_sink(feed_df, tmp_path):
    import xml.etree.ElementTree as ET

    p = str(tmp_path / "feed.xml")
    n = write_rss(
        feed_df, p, channel_title="CT", channel_link="http://x/",
        channel_description="CD", item_author_field="author",
    )
    assert n == 2  # the title-less row is skipped like the reference
    root = ET.parse(p).getroot()
    assert root.tag == "rss" and root.attrib["version"] == "2.0"
    ch = root.find("channel")
    assert ch.find("title").text == "CT"
    items = ch.findall("item")
    assert [i.find("title").text for i in items] == ["T1", "T2"]
    assert items[0].find("author").text == "a1"
    assert items[1].find("author") is None  # absent optional field

    with pytest.raises(ValueError):
        write_rss(feed_df, p, channel_title="", channel_link="x",
                  channel_description="y")


def _unpack_stream(buf: bytes):
    """Tiny spec decoder for the encoder's type subset — independent
    re-derivation from the MessagePack spec, so the test catches
    encode-side mistakes rather than mirroring them."""
    pos = 0

    def rd(n):
        nonlocal pos
        b = buf[pos:pos + n]
        pos += n
        return b

    def one():
        b = rd(1)[0]
        if b <= 0x7F:
            return b
        if b >= 0xE0:
            return b - 0x100
        if 0xA0 <= b <= 0xBF:
            return rd(b & 0x1F).decode()
        if 0x90 <= b <= 0x9F:
            return [one() for _ in range(b & 0x0F)]
        if 0x80 <= b <= 0x8F:
            return {one(): one() for _ in range(b & 0x0F)}
        if b == 0xC0:
            return None
        if b == 0xC2:
            return False
        if b == 0xC3:
            return True
        if b == 0xCB:
            return struct.unpack("!d", rd(8))[0]
        if b == 0xCC:
            return rd(1)[0]
        if b == 0xCD:
            return struct.unpack("!H", rd(2))[0]
        if b == 0xCE:
            return struct.unpack("!I", rd(4))[0]
        if b == 0xCF:
            return struct.unpack("!Q", rd(8))[0]
        if b == 0xD0:
            return struct.unpack("!b", rd(1))[0]
        if b == 0xD1:
            return struct.unpack("!h", rd(2))[0]
        if b == 0xD2:
            return struct.unpack("!i", rd(4))[0]
        if b == 0xD3:
            return struct.unpack("!q", rd(8))[0]
        if b == 0xD9:
            return rd(rd(1)[0]).decode()
        if b == 0xDA:
            return rd(struct.unpack("!H", rd(2))[0]).decode()
        if b == 0xC4:
            return rd(rd(1)[0])
        if b == 0xDC:
            return [one() for _ in range(struct.unpack("!H", rd(2))[0])]
        if b == 0xDE:
            n = struct.unpack("!H", rd(2))[0]
            return {one(): one() for _ in range(n)}
        raise AssertionError(f"unhandled marker {b:#x}")

    out = []
    while pos < len(buf):
        out.append(one())
    return out


def test_msgpack_golden_bytes():
    # spec-mandated encodings (msgpack.org format spec)
    assert msgpack_packb(None) == b"\xc0"
    assert msgpack_packb(True) == b"\xc3"
    assert msgpack_packb(127) == b"\x7f"
    assert msgpack_packb(-1) == b"\xff"
    assert msgpack_packb(-32) == b"\xe0"
    assert msgpack_packb(255) == b"\xcc\xff"
    assert msgpack_packb(65536) == b"\xce\x00\x01\x00\x00"
    assert msgpack_packb(-33) == b"\xd0\xdf"
    assert msgpack_packb(1.5) == b"\xcb" + struct.pack("!d", 1.5)
    assert msgpack_packb("abc") == b"\xa3abc"
    assert msgpack_packb({"a": 1}) == b"\x81\xa1a\x01"
    assert msgpack_packb([1, "x"]) == b"\x92\x01\xa1x"
    s40 = "y" * 40
    assert msgpack_packb(s40) == b"\xd9\x28" + s40.encode()


def test_msgpack_sink_roundtrip(feed_df, tmp_path):
    p = str(tmp_path / "items.msgpack")
    assert write_msgpack(feed_df, p) == 3
    items = _unpack_stream(open(p, "rb").read())
    assert len(items) == 3
    assert sorted(i["link"] for i in items) == \
        ["http://x/1", "http://x/2", "http://x/3"]
    # append mode concatenates like the reference's 'ab' open
    assert write_msgpack(feed_df, p, mode="append") == 3
    assert len(_unpack_stream(open(p, "rb").read())) == 6
    with pytest.raises(ValueError):
        write_msgpack(feed_df, p, mode="nope")


class _FakeServices(BaseHTTPRequestHandler):
    """One loopback server playing Elasticsearch (POST /_bulk), an
    S3-compatible store (PUT /bucket/key), CouchDB (PUT /db +
    POST /db/_bulk_docs), and DynamoDB (POST / BatchWriteItem)."""

    docs: list = []
    objects: dict = {}
    couch_docs: list = []
    couch_dbs: list = []
    dynamo_items: list = []
    lock = threading.Lock()

    def _reply(self, status: int, payload: bytes = b"") -> None:
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        target = self.headers.get("X-Amz-Target", "")
        if self.path.endswith("/_bulk"):
            lines = [ln for ln in body.decode().split("\n") if ln]
            with self.lock:
                for action, doc in zip(lines[::2], lines[1::2]):
                    assert "index" in json.loads(action)
                    self.docs.append(json.loads(doc))
            self._reply(200, json.dumps({"errors": False, "items": []}).encode())
        elif self.path.endswith("/_bulk_docs"):
            with self.lock:
                self.couch_docs.extend(json.loads(body)["docs"])
            self._reply(201, b"[]")
        elif target.endswith("BatchWriteItem"):
            req = json.loads(body)["RequestItems"]
            with self.lock:
                for table, puts in req.items():
                    for p in puts:
                        self.dynamo_items.append((table, p["PutRequest"]["Item"]))
            self._reply(200, json.dumps({"UnprocessedItems": {}}).encode())
        else:
            self._reply(404)

    def do_PUT(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if self.path.startswith("/couch-"):  # CouchDB create database
            with self.lock:
                created = self.path in self.couch_dbs
                if not created:
                    self.couch_dbs.append(self.path)
            self._reply(412 if created else 201, b"{}")
            return
        with self.lock:
            self.objects[self.path] = body
        self.send_response(200)
        self.send_header("ETag", '"fake"')
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def services():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeServices)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_elasticsearch_sink(feed_df, services):
    _FakeServices.docs.clear()
    n = write_elasticsearch(feed_df, services, index="quotes", batch_size=2)
    assert n == 3
    assert sorted(d["link"] for d in _FakeServices.docs) == \
        ["http://x/1", "http://x/2", "http://x/3"]


def test_s3_jsonl_sink(feed_df, services):
    pytest.importorskip("boto3")
    _FakeServices.objects.clear()
    n = write_s3_jsonl(feed_df, "mybucket", "data/items.jl",
                       endpoint=services, access_key_id="k",
                       secret_access_key="s")
    assert n == 3
    body = _FakeServices.objects["/mybucket/data/items.jl"].decode()
    got = sorted(json.loads(ln)["link"] for ln in body.splitlines())
    assert got == ["http://x/1", "http://x/2", "http://x/3"]


def test_excel_sink(spark, tmp_path):
    import xml.etree.ElementTree as ET
    import zipfile

    from silkworm_spark.operators.sinks import write_excel

    df = spark.createDataFrame(
        [("d1", 1.5, ["a", "b"], (1, "x")), ("d2", None, [], (2, "y"))],
        "doc_id string, score double, tags array<string>, "
        "meta struct<n:int, s:string>",
    )
    p = str(tmp_path / "items.xlsx")
    assert write_excel(df, p, sheet_name="docs") == 2

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        assert wb.find(".//m:sheet", ns).attrib["name"] == "docs"
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))

    rows = sheet.findall(".//m:row", ns)
    assert len(rows) == 3  # header + 2 items

    def cellvals(row):
        out = []
        for c in row.findall("m:c", ns):
            t = c.find("m:is/m:t", ns)
            v = c.find("m:v", ns)
            out.append(t.text if t is not None
                       else (v.text if v is not None else None))
        return out

    # nested struct flattened to meta_n/meta_s, array joined with ", "
    assert cellvals(rows[0]) == ["doc_id", "score", "tags", "meta_n", "meta_s"]
    assert cellvals(rows[1]) == ["d1", "1.5", "a, b", "1", "x"]
    assert cellvals(rows[2]) == ["d2", None, None, "2", "y"]


class _FtpSim(threading.Thread):
    """Minimal loopback FTP server: USER/PASS/TYPE/PASV/STOR/QUIT —
    exactly the command sequence ftplib.storbinary emits."""

    def __init__(self):
        super().__init__(daemon=True)
        import socket as _s
        self.stored: dict[str, bytes] = {}
        self.srv = _s.socket()
        self.srv.setsockopt(_s.SOL_SOCKET, _s.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]

    def run(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        import socket as _s
        f = conn.makefile("rb")
        conn.sendall(b"220 fake ftp\r\n")
        data_srv = None
        while True:
            line = f.readline()
            if not line:
                break
            cmd, _, arg = line.decode().strip().partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                conn.sendall(b"331 need password\r\n")
            elif cmd == "PASS":
                conn.sendall(b"230 logged in\r\n")
            elif cmd == "TYPE":
                conn.sendall(b"200 ok\r\n")
            elif cmd == "PASV":
                data_srv = _s.socket()
                data_srv.bind(("127.0.0.1", 0))
                data_srv.listen(1)
                p = data_srv.getsockname()[1]
                conn.sendall(
                    f"227 entering passive (127,0,0,1,{p >> 8},{p & 255})\r\n"
                    .encode())
            elif cmd == "STOR":
                conn.sendall(b"150 ok send data\r\n")
                d, _ = data_srv.accept()
                chunks = []
                while True:
                    c = d.recv(65536)
                    if not c:
                        break
                    chunks.append(c)
                d.close()
                data_srv.close()
                self.stored[arg] = b"".join(chunks)
                conn.sendall(b"226 transfer complete\r\n")
            elif cmd == "QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"502 not implemented\r\n")
        conn.close()
        self.srv.close()


def test_ftp_jsonl_sink(feed_df):
    from silkworm_spark.operators.sinks import write_ftp_jsonl

    sim = _FtpSim()
    sim.start()
    n = write_ftp_jsonl(feed_df, "127.0.0.1", "u", "p",
                        "data/items.jl", port=sim.port)
    sim.join(timeout=5)
    assert n == 3
    body = sim.stored["data/items.jl"].decode()
    got = sorted(json.loads(ln)["link"] for ln in body.splitlines())
    assert got == ["http://x/1", "http://x/2", "http://x/3"]


def test_couchdb_sink(feed_df, services):
    from silkworm_spark.operators.sinks import write_couchdb

    _FakeServices.couch_docs.clear()
    n = write_couchdb(feed_df, services, database="couch-scrape",
                      spider="quotes", username="u", password="p",
                      batch_size=2)
    assert n == 3
    assert "/couch-scrape" in _FakeServices.couch_dbs
    assert all(d["spider"] == "quotes" for d in _FakeServices.couch_docs)
    got = sorted(d["data"]["link"] for d in _FakeServices.couch_docs)
    assert got == ["http://x/1", "http://x/2", "http://x/3"]
    # idempotent re-run: database already exists (412) is accepted
    assert write_couchdb(feed_df, services, database="couch-scrape") == 3


def test_dynamodb_sink(feed_df, services):
    pytest.importorskip("boto3")
    from silkworm_spark.operators.sinks import write_dynamodb

    _FakeServices.dynamo_items.clear()
    n = write_dynamodb(feed_df, "crawl-items", spider="quotes",
                       endpoint_url=services, aws_access_key_id="k",
                       aws_secret_access_key="s")
    assert n == 3
    assert all(t == "crawl-items" for t, _ in _FakeServices.dynamo_items)
    items = [i for _, i in _FakeServices.dynamo_items]
    assert all(i["spider"]["S"] == "quotes" for i in items)
    got = sorted(json.loads(i["data"]["S"])["link"] for i in items)
    assert got == ["http://x/1", "http://x/2", "http://x/3"]
    # deterministic ids: same data -> same id prefix on re-run
    ids1 = sorted(i["id"]["S"] for i in items)
    _FakeServices.dynamo_items.clear()
    write_dynamodb(feed_df, "crawl-items", spider="quotes",
                   endpoint_url=services, aws_access_key_id="k",
                   aws_secret_access_key="s")
    ids2 = sorted(i["id"]["S"] for _, i in _FakeServices.dynamo_items)
    assert ids1 == ids2


def _bson_decode(buf: bytes, pos: int = 0):
    """Independent spec-based BSON decoder (subset) for the test."""
    (total,) = struct.unpack_from("<i", buf, pos)
    end = pos + total - 1
    pos += 4
    out = {}
    while pos < end:
        t = buf[pos]
        pos += 1
        z = buf.index(b"\x00", pos)
        name = buf[pos:z].decode()
        pos = z + 1
        if t == 0x01:
            (v,) = struct.unpack_from("<d", buf, pos); pos += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", buf, pos)
            v = buf[pos + 4:pos + 4 + ln - 1].decode(); pos += 4 + ln
        elif t in (0x03, 0x04):
            (ln,) = struct.unpack_from("<i", buf, pos)
            v, _ = _bson_decode(buf, pos)
            if t == 0x04:
                v = [v[str(i)] for i in range(len(v))]
            pos += ln
        elif t == 0x08:
            v = buf[pos] == 1; pos += 1
        elif t == 0x0A:
            v = None
        elif t == 0x10:
            (v,) = struct.unpack_from("<i", buf, pos); pos += 4
        elif t == 0x12:
            (v,) = struct.unpack_from("<q", buf, pos); pos += 8
        else:
            raise AssertionError(f"unhandled bson type {t:#x}")
        out[name] = v
    return out, end + 1


def test_bson_golden_bytes():
    from silkworm_spark.operators.sinks import bson_encode

    # hand-computed from the BSON spec
    assert bson_encode({"a": 1}) == bytes.fromhex("0c0000001061000100000000")
    assert bson_encode({}) == bytes.fromhex("0500000000")
    # 0x0f total = 4(len) + [02 's' 00  03000000 'hi' 00] (10) + 00
    assert bson_encode({"s": "hi"}) == bytes.fromhex(
        "0f00000002730003000000686900" + "00")
    doc = {"f": 1.5, "b": True, "n": None, "big": 1 << 40,
           "l": [1, "x"], "d": {"k": "v"}}
    got, _ = _bson_decode(bson_encode(doc))
    assert got == doc


class _MongoSim(threading.Thread):
    """Loopback OP_MSG server: parses insert commands, stores docs."""

    def __init__(self):
        super().__init__(daemon=True)
        import socket as _s
        self.inserted: list = []
        self.srv = _s.socket()
        self.srv.setsockopt(_s.SOL_SOCKET, _s.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]

    def run(self):
        from silkworm_spark.operators.sinks import bson_encode
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        while True:
            head = b""
            while len(head) < 16:
                c = conn.recv(16 - len(head))
                if not c:
                    conn.close()
                    self.srv.close()
                    return
                head += c
            length, req_id, _resp, opcode = struct.unpack("<iiii", head)
            assert opcode == 2013
            body = b""
            while len(body) < length - 16:
                body += conn.recv(length - 16 - len(body))
            assert body[4] == 0  # section kind 0
            cmd, _ = _bson_decode(body, 5)
            assert cmd["insert"] and cmd["$db"]
            self.inserted.extend(
                (cmd["$db"], cmd["insert"], d) for d in cmd["documents"])
            ok = bson_encode({"ok": 1.0, "n": len(cmd["documents"])})
            payload = struct.pack("<i", 0) + b"\x00" + ok
            conn.sendall(struct.pack("<iiii", 16 + len(payload), 1,
                                     req_id, 2013) + payload)


def test_mongodb_sink(feed_df):
    from silkworm_spark.operators.sinks import write_mongodb

    sim = _MongoSim()
    sim.start()
    n = write_mongodb(feed_df, "127.0.0.1", sim.port,
                      database="scrape", collection="quotes", batch_size=2)
    assert n == 3
    assert all(db == "scrape" and c == "quotes" for db, c, _ in sim.inserted)
    got = sorted(d["link"] for _, _, d in sim.inserted)
    assert got == ["http://x/1", "http://x/2", "http://x/3"]


class _PgSim(threading.Thread):
    """Loopback PostgreSQL v3 server: startup + cleartext auth +
    simple-query. Records every SQL statement received."""

    def __init__(self, auth: int = 0):
        super().__init__(daemon=True)
        import socket as _s
        self.auth = auth  # 0 = trust, 3 = cleartext
        self.queries: list = []
        self.password: str | None = None
        self.srv = _s.socket()
        self.srv.setsockopt(_s.SOL_SOCKET, _s.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]

    @staticmethod
    def _read_exact(conn, n):
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise ConnectionError
            buf += c
        return buf

    def run(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        try:
            (ln,) = struct.unpack("!i", self._read_exact(conn, 4))
            startup = self._read_exact(conn, ln - 4)
            (proto,) = struct.unpack_from("!i", startup)
            assert proto == 196608
            conn.sendall(b"R" + struct.pack("!ii", 8, self.auth))
            if self.auth == 3:
                t = self._read_exact(conn, 1)
                assert t == b"p"
                (pl,) = struct.unpack("!i", self._read_exact(conn, 4))
                self.password = self._read_exact(conn, pl - 4)[:-1].decode()
                conn.sendall(b"R" + struct.pack("!ii", 8, 0))
            conn.sendall(b"Z" + struct.pack("!i", 5) + b"I")
            while True:
                t = self._read_exact(conn, 1)
                if t == b"X":
                    return
                assert t == b"Q"
                (ql,) = struct.unpack("!i", self._read_exact(conn, 4))
                sql = self._read_exact(conn, ql - 4)[:-1].decode()
                self.queries.append(sql)
                tag = b"INSERT 0 1\x00" if sql.startswith("INSERT") \
                    else b"CREATE TABLE\x00"
                conn.sendall(b"C" + struct.pack("!i", 4 + len(tag)) + tag)
                conn.sendall(b"Z" + struct.pack("!i", 5) + b"I")
        except (ConnectionError, OSError, AssertionError):
            pass
        finally:
            conn.close()
            self.srv.close()


@pytest.mark.parametrize("auth", [0, 3], ids=["trust", "cleartext"])
def test_postgresql_sink(feed_df, auth):
    from silkworm_spark.operators.sinks import write_postgresql

    sim = _PgSim(auth=auth)
    sim.start()
    n = write_postgresql(feed_df, "127.0.0.1", sim.port, user="u",
                         password="sekrit", database="db",
                         table="crawl_items", spider="quotes", batch_size=2)
    sim.join(timeout=5)
    assert n == 3
    if auth == 3:
        assert sim.password == "sekrit"
    assert sim.queries[0].startswith("CREATE TABLE IF NOT EXISTS crawl_items")
    inserts = [q for q in sim.queries if q.startswith("INSERT")]
    assert len(inserts) == 2  # batch_size=2 -> 2 + 1 rows
    joined = " ".join(inserts)
    for link in ("http://x/1", "http://x/2", "http://x/3"):
        assert link in joined
    assert "'quotes'" in joined
    with pytest.raises(ValueError):
        write_postgresql(feed_df, "127.0.0.1", sim.port, table="bad;drop")


def _avro_read(path: str):
    """Independent spec-based OCF reader (null codec, the writer's
    type subset) — validates the container framing and record bytes."""
    buf = open(path, "rb").read()
    pos = 0

    def rd(n):
        nonlocal pos
        b = buf[pos:pos + n]
        pos += n
        return b

    def zz():
        nonlocal pos
        shift = acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    assert rd(4) == b"Obj\x01"
    meta = {}
    while True:
        cnt = zz()
        if cnt == 0:
            break
        for _ in range(abs(cnt)):
            k = rd(zz()).decode()
            meta[k] = rd(zz())
    schema = json.loads(meta["avro.schema"])
    assert meta["avro.codec"] == b"null"
    sync = rd(16)

    def read_val(t):
        if isinstance(t, list):  # union
            return None if zz() == 0 else read_val(t[1])
        if t == "string":
            return rd(zz()).decode()
        if t == "long":
            return zz()
        if t == "double":
            return struct.unpack("<d", rd(8))[0]
        if t == "boolean":
            return rd(1) == b"\x01"
        if isinstance(t, dict) and t["type"] == "array":
            out = []
            while True:
                c = zz()
                if c == 0:
                    return out
                out.extend(read_val(t["items"]) for _ in range(abs(c)))
        raise AssertionError(f"unhandled avro type {t}")

    records = []
    while pos < len(buf):
        cnt, _size = zz(), zz()
        for _ in range(cnt):
            records.append({f["name"]: read_val(f["type"])
                            for f in schema["fields"]})
        assert rd(16) == sync
    return schema, records


def test_avro_sink(spark, tmp_path):
    from silkworm_spark.operators.sinks import write_avro

    df = spark.createDataFrame(
        [("d1", 5, 1.5, True, ["a", "b"], (7, "x")),
         ("d2", None, None, None, [], None)],
        "doc_id string, n long, score double, ok boolean, "
        "tags array<string>, meta struct<k:int, s:string>",
    )
    p = str(tmp_path / "items.avro")
    assert write_avro(df, p, block_rows=1) == 2  # multi-block container
    schema, records = _avro_read(p)
    assert schema["name"] == "ScrapedItem"
    assert [f["type"] for f in schema["fields"]] == [
        ["null", "string"], ["null", "long"], ["null", "double"],
        ["null", "boolean"], ["null", {"type": "array", "items": "string"}],
        ["null", "string"],  # struct -> JSON string
    ]
    by_id = {r["doc_id"]: r for r in records}
    assert by_id["d1"]["n"] == 5 and by_id["d1"]["score"] == 1.5
    assert by_id["d1"]["tags"] == ["a", "b"]
    assert json.loads(by_id["d1"]["meta"]) == {"k": 7, "s": "x"}
    assert by_id["d2"]["n"] is None and by_id["d2"]["tags"] == []


class _MySqlSim(threading.Thread):
    """Loopback MySQL server: protocol-v10 greeting, verifies the
    mysql_native_password scramble, answers COM_QUERY with OK."""

    SALT = b"12345678abcdefghijkl"  # 20 bytes

    def __init__(self, password: str):
        super().__init__(daemon=True)
        import socket as _s
        self.password = password
        self.queries: list = []
        self.auth_ok = False
        self.srv = _s.socket()
        self.srv.setsockopt(_s.SOL_SOCKET, _s.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]

    @staticmethod
    def _read_exact(conn, n):
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise ConnectionError
            buf += c
        return buf

    def _read_packet(self, conn):
        head = self._read_exact(conn, 4)
        ln = head[0] | head[1] << 8 | head[2] << 16
        return head[3], self._read_exact(conn, ln)

    @staticmethod
    def _send_packet(conn, seq, payload):
        ln = len(payload)
        conn.sendall(bytes((ln & 0xFF, (ln >> 8) & 0xFF, (ln >> 16) & 0xFF,
                            seq)) + payload)

    def _expected_token(self):
        import hashlib
        sha_pw = hashlib.sha1(self.password.encode()).digest()
        stage2 = hashlib.sha1(hashlib.sha1(sha_pw).digest()).digest()
        mix = hashlib.sha1(self.SALT + stage2).digest()
        return bytes(a ^ b for a, b in zip(sha_pw, mix))

    def run(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        try:
            greeting = (bytes([10]) + b"8.0-fake\x00"
                        + struct.pack("<I", 99)
                        + self.SALT[:8] + b"\x00"
                        + struct.pack("<H", 0xFFFF) + bytes([45])
                        + struct.pack("<H", 2) + struct.pack("<H", 0xFFFF)
                        + bytes([21]) + b"\x00" * 10
                        + self.SALT[8:] + b"\x00"
                        + b"mysql_native_password\x00")
            self._send_packet(conn, 0, greeting)
            _, resp = self._read_packet(conn)
            # parse handshake response: caps(4) maxpkt(4) charset(1) 23x0
            pos = 4 + 4 + 1 + 23
            z = resp.index(b"\x00", pos)
            user = resp[pos:z].decode()
            pos = z + 1
            tln = resp[pos]
            token = resp[pos + 1:pos + 1 + tln]
            self.auth_ok = (token == self._expected_token()
                            if self.password else token == b"")
            if not self.auth_ok:
                self._send_packet(
                    conn, 2, b"\xff" + struct.pack("<H", 1045)
                    + b"#28000Access denied")
                return
            self._send_packet(conn, 2, b"\x00\x00\x00\x02\x00\x00\x00")  # OK
            while True:
                _, pkt = self._read_packet(conn)
                if pkt[:1] == b"\x01":  # COM_QUIT
                    return
                assert pkt[:1] == b"\x03"
                self.queries.append(pkt[1:].decode())
                self._send_packet(conn, 1, b"\x00\x01\x00\x02\x00\x00\x00")
        except (ConnectionError, OSError, AssertionError):
            pass
        finally:
            conn.close()
            self.srv.close()


def test_mysql_sink(feed_df):
    from silkworm_spark.operators.sinks import write_mysql

    sim = _MySqlSim(password="sekrit")
    sim.start()
    n = write_mysql(feed_df, "127.0.0.1", sim.port, user="u",
                    password="sekrit", database="db", table="crawl_items",
                    spider="quotes", batch_size=2)
    sim.join(timeout=5)
    assert n == 3 and sim.auth_ok
    assert sim.queries[0].startswith("CREATE TABLE IF NOT EXISTS crawl_items")
    inserts = [q for q in sim.queries if q.startswith("INSERT")]
    assert len(inserts) == 2
    joined = " ".join(inserts)
    for link in ("http://x/1", "http://x/2", "http://x/3"):
        assert link in joined


def test_mysql_sink_bad_password(feed_df):
    from silkworm_spark.operators.sinks import write_mysql

    sim = _MySqlSim(password="right")
    sim.start()
    with pytest.raises(RuntimeError, match="auth failed"):
        write_mysql(feed_df, "127.0.0.1", sim.port, user="u",
                    password="wrong", database="db")


class _CassandraSim(threading.Thread):
    """Loopback CQL native-protocol-v4 server: STARTUP →
    READY/AUTHENTICATE, SASL PLAIN check, QUERY → RESULT void."""

    def __init__(self, password: str | None = None):
        super().__init__(daemon=True)
        import socket as _s
        self.password = password
        self.queries: list = []
        self.auth_seen: tuple | None = None
        self.srv = _s.socket()
        self.srv.setsockopt(_s.SOL_SOCKET, _s.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]

    @staticmethod
    def _read_exact(conn, n):
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise ConnectionError
            buf += c
        return buf

    def run(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        try:
            while True:
                head = self._read_exact(conn, 9)
                ver, _fl, stream, opcode, ln = struct.unpack("!BBhBI", head)
                assert ver == 0x04
                body = self._read_exact(conn, ln)

                def reply(op, payload=b""):
                    conn.sendall(struct.pack("!BBhBI", 0x84, 0, stream, op,
                                             len(payload)) + payload)

                if opcode == 0x01:  # STARTUP
                    reply(0x03 if self.password else 0x02,
                          b"\x00\x2forg.apache.cassandra.auth.PasswordAuthenticator"
                          if self.password else b"")
                elif opcode == 0x0F:  # AUTH_RESPONSE
                    (tln,) = struct.unpack_from("!i", body)
                    _, user, pw = body[4:4 + tln].split(b"\x00")
                    self.auth_seen = (user.decode(), pw.decode())
                    if pw.decode() == self.password:
                        reply(0x10, struct.pack("!i", -1))  # AUTH_SUCCESS
                    else:
                        msg = b"bad credentials"
                        reply(0x00, struct.pack("!i", 0x0100)
                              + struct.pack("!H", len(msg)) + msg)
                        return
                elif opcode == 0x07:  # QUERY
                    (qln,) = struct.unpack_from("!i", body)
                    self.queries.append(body[4:4 + qln].decode())
                    reply(0x08, struct.pack("!i", 1))  # RESULT void
                else:
                    return
        except (ConnectionError, OSError, AssertionError):
            pass
        finally:
            conn.close()
            self.srv.close()


@pytest.mark.parametrize("password", [None, "sekrit"], ids=["noauth", "plain"])
def test_cassandra_sink(feed_df, password):
    from silkworm_spark.operators.sinks import write_cassandra

    sim = _CassandraSim(password=password)
    sim.start()
    n = write_cassandra(feed_df, "127.0.0.1", sim.port, keyspace="scrape",
                        table="crawl_items", spider="quotes",
                        username="u", password=password, batch_size=2)
    sim.join(timeout=5)
    assert n == 3
    if password:
        assert sim.auth_seen == ("u", password)
    assert sim.queries[0].startswith("CREATE KEYSPACE IF NOT EXISTS scrape")
    assert "CREATE TABLE IF NOT EXISTS scrape.crawl_items" in sim.queries[1]
    batches = [q for q in sim.queries if q.startswith("BEGIN UNLOGGED BATCH")]
    assert len(batches) == 2  # batch_size=2 over 3 rows
    joined = " ".join(batches)
    for link in ("http://x/1", "http://x/2", "http://x/3"):
        assert link in joined
    # deterministic uuid5 ids: identical re-run produces identical CQL
    sim2 = _CassandraSim(password=password)
    sim2.start()
    write_cassandra(feed_df, "127.0.0.1", sim2.port, keyspace="scrape",
                    table="crawl_items", spider="quotes",
                    username="u", password=password, batch_size=2)
    sim2.join(timeout=5)
    b1 = [q for q in sim.queries if q.startswith("BEGIN")]
    b2 = [q for q in sim2.queries if q.startswith("BEGIN")]
    assert b1 == b2


def test_vortex_sink_standin_roundtrip_and_gate(spark, tmp_path):
    """write_vortex reproduces the reference's buffer-all →
    pa.Table.from_pylist → single-file write (pipelines.py:1478-1555).
    Without the optional vortex package it must raise ImportError like
    the reference's constructor; the explicit Parquet stand-in writes
    the identical Arrow table (labeled, no fake Vortex bytes)."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from silkworm_spark.operators.sinks import write_vortex

    df = spark.createDataFrame(
        [(1, "a", ["x", "y"]), (2, "b", ["z"])], "id long, name string, tags array<string>"
    )
    try:
        import vortex  # noqa: F401

        have_vortex = True
    except ImportError:
        have_vortex = False

    p = str(tmp_path / "items.vortex")
    if have_vortex:  # env-gated real path (absent in this sandbox)
        n = write_vortex(df, p)
        assert n == 2
        return
    with _pytest.raises(ImportError, match="vortex is required"):
        write_vortex(df, p)
    n = write_vortex(df, p, parquet_standin=True)
    assert n == 2
    got = pq.read_table(p).to_pylist()
    assert sorted(r["id"] for r in got) == [1, 2]
    assert {r["name"]: r["tags"] for r in got} == {"a": ["x", "y"], "b": ["z"]}
