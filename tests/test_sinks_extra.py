"""Sinks added in round 2: SQLite, DuckDB, XML, YAML, Webhook
(reference pipelines.py:468-512, 2838-2929, 514-576, 1094-1142,
1773-1947)."""

from __future__ import annotations

import json
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from silkworm_spark.operators.sinks import (
    write_duckdb,
    write_sqlite,
    write_webhook,
    write_xml,
    write_yaml,
)

ROWS = [
    dict(doc_id="d1", score=1.5, tags=["a", "b"]),
    dict(doc_id="d2", score=None, tags=[]),
    dict(doc_id="d3", score=-2.0, tags=["x"]),
]


@pytest.fixture()
def items_df(spark):
    return spark.createDataFrame(ROWS, "doc_id string, score double, tags array<string>")


def test_sqlite_sink(items_df, tmp_path):
    p = str(tmp_path / "items.db")
    assert write_sqlite(items_df, p, spider="quotes") == 3
    conn = sqlite3.connect(p)
    rows = conn.execute("SELECT spider, data FROM items ORDER BY id").fetchall()
    conn.close()
    assert len(rows) == 3 and rows[0][0] == "quotes"
    got = sorted(json.loads(d)["doc_id"] for _, d in rows)
    assert got == ["d1", "d2", "d3"]


def test_duckdb_sink(items_df, tmp_path):
    import duckdb

    p = str(tmp_path / "items.duckdb")
    assert write_duckdb(items_df, p) == 3
    conn = duckdb.connect(p)
    rows = conn.execute("SELECT doc_id, score FROM items ORDER BY doc_id").fetchall()
    conn.close()
    assert [r[0] for r in rows] == ["d1", "d2", "d3"]
    assert rows[0][1] == 1.5 and rows[1][1] is None


def test_xml_sink(items_df, tmp_path):
    import xml.etree.ElementTree as ET

    p = str(tmp_path / "items.xml")
    assert write_xml(items_df, p) == 3
    root = ET.parse(p).getroot()
    assert root.tag == "items" and len(root) == 3
    ids = sorted(e.findtext("doc_id") for e in root)
    assert ids == ["d1", "d2", "d3"]
    d1 = [e for e in root if e.findtext("doc_id") == "d1"][0]
    assert [v.text for v in d1.find("tags")] == ["a", "b"]


def test_yaml_sink(items_df, tmp_path):
    import yaml

    p = str(tmp_path / "items.yaml")
    assert write_yaml(items_df, p) == 3
    docs = [d for d in yaml.safe_load_all(open(p)) if d is not None]
    assert sorted(d["doc_id"] for d in docs) == ["d1", "d2", "d3"]


def test_webhook_sink(items_df):
    received = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.extend(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/hook"
        assert write_webhook(items_df, url, batch_size=2) == 3
        assert sorted(r["doc_id"] for r in received) == ["d1", "d2", "d3"]
    finally:
        srv.shutdown()
