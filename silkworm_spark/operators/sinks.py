"""Item sinks — all 25 of the reference's pipelines.

The reference threads each item through an ordered pipeline chain
(pipelines.py:197-200, engine.py:270-278); here a "pipeline" is a
DataFrame transform and a "sink" is a writer. Implemented: JSONL,
CSV (struct flattening), Parquet (the checkpointed ``documents``
table is the canonical columnar output, standing in for Polars/
Vortex, pipelines.py:920-993,1478-1555), SQLite, DuckDB, XML, YAML,
RSS, MsgPack, Excel, Avro, webhook, Elasticsearch, S3, FTP, SFTP
(from-scratch SSH-2 transport, operators/ssh.py), CouchDB, DynamoDB,
MongoDB, PostgreSQL, MySQL, Cassandra, Taskiq (RESP broker enqueue),
GoogleSheets (RS256 JWT → OAuth2 → REST), Snowflake (public SQL REST
API v2, key-pair JWT) — format sinks via stdlib encoders where the
helper lib is absent (msgpack/OOXML/BSON/Avro-OCF), service sinks
speaking the real wire protocol or published REST spec against
loopback test servers that verify bytes and signatures. On a real
cluster several of these become ``df.write`` connector swaps (JDBC
jars, spark-es); the drivers here mirror the reference's driver-side
pipeline semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_for_tabular(df: DataFrame, list_sep: str = ", ") -> DataFrame:
    """Flatten nested structs to ``a_b`` columns and join arrays with
    ", " — the reference's dict-flattening for CSV/Excel/Sheets
    (pipelines.py:792-809,1074-1092,2102-2120)."""

    def cols(prefix: str, schema: T.StructType) -> list[Column]:
        out: list[Column] = []
        for f in schema.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            name = path.replace(".", "_")
            if isinstance(f.dataType, T.StructType):
                out.extend(cols(path, f.dataType))
            elif isinstance(f.dataType, T.ArrayType):
                elem = f.dataType.elementType
                c = F.col(path)
                if isinstance(elem, T.StructType):
                    c = F.transform(c, lambda x: F.to_json(x))
                out.append(F.concat_ws(list_sep, c.cast("array<string>")).alias(name))
            else:
                out.append(F.col(path).alias(name))
        return out

    return df.select(*cols("", df.schema))


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """Streaming JSONL append (reference JsonLinesPipeline,
    pipelines.py:295-385). Spark's json writer is line-delimited."""
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header after struct/array flattening (reference
    CSVPipeline, pipelines.py:735-809 — header inference is obsolete
    here: schemas are declared)."""
    flatten_for_tabular(df).write.mode(mode).option("header", "true").csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "append") -> None:
    """Columnar sink (reference PolarsPipeline/VortexPipeline analog)."""
    df.write.mode(mode).parquet(path)


SINKS = {
    "jsonl": write_jsonl,
    "csv": write_csv,
    "parquet": write_parquet,
}


# ---- single-writer / service sinks (reference pipelines.py:388-2929) ----
#
# The reference's embedded-DB and feed pipelines are SERIAL writers by
# nature (one sqlite/duckdb connection, one XML file, one RSS feed).
# Their Spark analogs drain the DataFrame through the driver in Arrow
# batches — the right shape for an embedded single-writer target.
# Fan-in SERVICE sinks (webhook, elasticsearch) post executor-side,
# per partition — the distributed shape. The DB/cloud connectors
# below (CouchDB/DynamoDB/Mongo/PG/MySQL/S3/FTP) are driver-protocol
# writers matching the reference's single-client pipelines; the JVM
# connector route (`df.write.jdbc`, spark-es) is the cluster-scale
# fan-in alternative when the driver jars are available.


def _json_rows(df: DataFrame):
    """Arrow-batched driver-side iterator of dicts (no per-row JVM
    round trips — toLocalIterator on the JSON projection)."""
    import json as _json

    for row in df.select(F.to_json(F.struct(*df.columns)).alias("j")).toLocalIterator():
        yield _json.loads(row["j"])


def write_sqlite(df: DataFrame, path: str, table: str = "items",
                 spider: str = "spark") -> int:
    """SQLitePipeline (pipelines.py:468-512): items JSON-encoded into
    (id, spider, data) — same schema, same single-connection write."""
    import json as _json
    import sqlite3

    conn = sqlite3.connect(path)
    try:
        conn.execute(
            f"CREATE TABLE IF NOT EXISTS {table} "
            "(id INTEGER PRIMARY KEY AUTOINCREMENT, spider TEXT NOT NULL, "
            "data TEXT NOT NULL)"
        )
        n = 0
        cur = conn.cursor()
        for item in _json_rows(df):
            cur.execute(
                f"INSERT INTO {table} (spider, data) VALUES (?, ?)",
                (spider, _json.dumps(item, ensure_ascii=False)),
            )
            n += 1
        conn.commit()
        return n
    finally:
        conn.close()


def write_duckdb(df: DataFrame, path: str, table: str = "items") -> int:
    """DuckDBPipeline (pipelines.py:2838-2929), upgraded from row-wise
    JSON inserts to one Arrow hand-off: DuckDB ingests the DataFrame's
    Arrow table zero-copy."""
    import duckdb

    tbl = df.toArrow()  # driver-side Arrow table (Spark 4)
    conn = duckdb.connect(path)
    try:
        conn.register("_spark_arrow", tbl)
        conn.execute(f"CREATE TABLE IF NOT EXISTS {table} AS "
                     "SELECT * FROM _spark_arrow WHERE 1=0")
        conn.execute(f"INSERT INTO {table} SELECT * FROM _spark_arrow")
        conn.unregister("_spark_arrow")
        return tbl.num_rows
    finally:
        conn.close()


def write_xml(df: DataFrame, path: str, root_element: str = "items",
              item_element: str = "item") -> int:
    """XMLPipeline (pipelines.py:514-576): one <item> element per row,
    nested dicts/lists as nested elements."""
    from xml.sax.saxutils import escape

    def node(tag: str, v, depth: int) -> str:
        pad = "  " * depth
        if isinstance(v, dict):
            inner = "".join(node(k, x, depth + 1) for k, x in v.items())
            return f"{pad}<{tag}>\n{inner}{pad}</{tag}>\n"
        if isinstance(v, list):
            inner = "".join(node("value", x, depth + 1) for x in v)
            return f"{pad}<{tag}>\n{inner}{pad}</{tag}>\n"
        s = "" if v is None else escape(str(v))
        return f"{pad}<{tag}>{s}</{tag}>\n"

    n = 0
    with open(path, "w", encoding="utf-8") as fp:
        fp.write(f'<?xml version="1.0" encoding="UTF-8"?>\n<{root_element}>\n')
        for item in _json_rows(df):
            fp.write(node(item_element, item, 1))
            n += 1
        fp.write(f"</{root_element}>\n")
    return n


def write_yaml(df: DataFrame, path: str) -> int:
    """YAMLPipeline (pipelines.py:1094-1142): one YAML document per
    item, '---'-separated. Import-gated on pyyaml like the reference."""
    try:
        import yaml
    except ImportError as exc:  # mirror reference's optional-dep error
        raise ImportError("pyyaml is required for write_yaml") from exc

    n = 0
    with open(path, "w", encoding="utf-8") as fp:
        for item in _json_rows(df):
            fp.write("---\n")
            yaml.safe_dump(item, fp, allow_unicode=True, sort_keys=False)
            n += 1
    return n


def write_webhook(df: DataFrame, url: str, batch_size: int = 100,
                  timeout_s: float = 10.0) -> int:
    """WebhookPipeline (pipelines.py:1773-1947): POST items as JSON to
    an HTTP endpoint. Runs DISTRIBUTED — each partition posts its own
    batches (the reference is a single async client; a webhook endpoint
    is a fan-in service, so executor-side posting is the scale shape).
    DataFrame API throughout (SURVEY §1.2 "no RDDs"): the per-partition
    poster is a mapInPandas stage yielding one count row per task."""

    def post_batches(batches):
        import json as _json
        import urllib.request

        import pandas as _pd

        sent = 0
        buf = []

        def flush():
            nonlocal sent, buf
            if not buf:
                return
            req = urllib.request.Request(
                url, data=_json.dumps(buf).encode("utf-8"),
                headers={"content-type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout_s):
                pass
            sent += len(buf)
            buf = []

        for pdf in batches:
            for j in pdf["j"]:
                buf.append(_json.loads(j))
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield _pd.DataFrame({"sent": [sent]})

    counts = (
        df.select(F.to_json(F.struct(*df.columns)).alias("j"))
        .mapInPandas(post_batches, schema="sent long")
        .agg(F.sum("sent")).first()[0]
    )
    return int(counts or 0)


def write_rss(
    df: DataFrame, path: str, *,
    channel_title: str, channel_link: str, channel_description: str,
    max_items: int | None = 50,
    item_title_field: str = "title", item_link_field: str = "link",
    item_description_field: str = "description",
    item_pub_date_field: str | None = None,
    item_guid_field: str | None = None,
    item_author_field: str | None = None,
) -> int:
    """RssPipeline (pipelines.py:578-735): RSS 2.0 feed of the LAST
    ``max_items`` rows (the reference buffers into a deque(maxlen) —
    newest survive), rows missing title/link/description skipped,
    dict/list field values JSON-stringified, datetime pub dates
    RFC-2822 formatted. A feed is a bounded single document, so this is
    a driver-side writer by nature; ``df.tail`` pulls only max_items
    rows."""
    import json as _json
    import xml.etree.ElementTree as ET
    from datetime import date, datetime, timezone
    from email.utils import format_datetime

    if not channel_title or not channel_link or not channel_description:
        raise ValueError(
            "channel_title, channel_link, and channel_description are required"
        )

    def stringify(v):
        if v is None:
            return None
        if isinstance(v, (dict, list)):
            return _json.dumps(v, ensure_ascii=False)
        return str(v)

    def pub_date(v):
        if v is None:
            return None
        if isinstance(v, datetime):
            return format_datetime(v if v.tzinfo else v.replace(tzinfo=timezone.utc))
        if isinstance(v, date):
            return format_datetime(
                datetime(v.year, v.month, v.day, tzinfo=timezone.utc))
        return str(v)

    rows = df.tail(max_items) if max_items else df.collect()
    rss = ET.Element("rss", {"version": "2.0"})
    channel = ET.SubElement(rss, "channel")
    ET.SubElement(channel, "title").text = channel_title
    ET.SubElement(channel, "link").text = channel_link
    ET.SubElement(channel, "description").text = channel_description
    n = 0
    for row in rows:
        d = row.asDict(recursive=True)
        title = stringify(d.get(item_title_field))
        link = stringify(d.get(item_link_field))
        desc = stringify(d.get(item_description_field))
        if title is None or link is None or desc is None:
            continue  # reference skips with a warning
        el = ET.SubElement(channel, "item")
        ET.SubElement(el, "title").text = title
        ET.SubElement(el, "link").text = link
        ET.SubElement(el, "description").text = desc
        if item_pub_date_field and (pd := pub_date(d.get(item_pub_date_field))):
            ET.SubElement(el, "pubDate").text = pd
        if item_guid_field and (g := stringify(d.get(item_guid_field))):
            ET.SubElement(el, "guid").text = g
        if item_author_field and (a := stringify(d.get(item_author_field))):
            ET.SubElement(el, "author").text = a
        n += 1
    tree = ET.ElementTree(rss)
    ET.indent(tree, space="  ")
    with open(path, "wb") as fp:
        tree.write(fp, encoding="utf-8", xml_declaration=True)
    return n


def msgpack_packb(obj) -> bytes:
    """Spec-conformant MessagePack encoder for the JSON-item subset
    (nil/bool/int/float/str/bytes/list/dict) — the sandbox has no
    msgpack/ormsgpack package, and the format is small enough that a
    stdlib encoder beats an import gate (reference MsgPackPipeline,
    pipelines.py:388-467, serializes with ormsgpack). Output is
    byte-identical to ``msgpack.packb`` for this type subset."""
    import struct as _s

    out = bytearray()

    def pack(v):
        if v is None:
            out.append(0xC0)
        elif v is True:
            out.append(0xC3)
        elif v is False:
            out.append(0xC2)
        elif isinstance(v, int):
            if 0 <= v <= 0x7F:
                out.append(v)
            elif -32 <= v < 0:
                out.append(0x100 + v)
            elif 0 < v <= 0xFF:
                out.extend(b"\xcc" + _s.pack("!B", v))
            elif 0 < v <= 0xFFFF:
                out.extend(b"\xcd" + _s.pack("!H", v))
            elif 0 < v <= 0xFFFFFFFF:
                out.extend(b"\xce" + _s.pack("!I", v))
            elif 0 < v <= 0xFFFFFFFFFFFFFFFF:
                out.extend(b"\xcf" + _s.pack("!Q", v))
            elif -0x80 <= v < 0:
                out.extend(b"\xd0" + _s.pack("!b", v))
            elif -0x8000 <= v < 0:
                out.extend(b"\xd1" + _s.pack("!h", v))
            elif -0x80000000 <= v < 0:
                out.extend(b"\xd2" + _s.pack("!i", v))
            else:
                out.extend(b"\xd3" + _s.pack("!q", v))
        elif isinstance(v, float):
            out.extend(b"\xcb" + _s.pack("!d", v))
        elif isinstance(v, str):
            b = v.encode("utf-8")
            n = len(b)
            if n <= 31:
                out.append(0xA0 | n)
            elif n <= 0xFF:
                out.extend(b"\xd9" + _s.pack("!B", n))
            elif n <= 0xFFFF:
                out.extend(b"\xda" + _s.pack("!H", n))
            else:
                out.extend(b"\xdb" + _s.pack("!I", n))
            out.extend(b)
        elif isinstance(v, (bytes, bytearray)):
            n = len(v)
            if n <= 0xFF:
                out.extend(b"\xc4" + _s.pack("!B", n))
            elif n <= 0xFFFF:
                out.extend(b"\xc5" + _s.pack("!H", n))
            else:
                out.extend(b"\xc6" + _s.pack("!I", n))
            out.extend(bytes(v))
        elif isinstance(v, (list, tuple)):
            n = len(v)
            if n <= 15:
                out.append(0x90 | n)
            elif n <= 0xFFFF:
                out.extend(b"\xdc" + _s.pack("!H", n))
            else:
                out.extend(b"\xdd" + _s.pack("!I", n))
            for x in v:
                pack(x)
        elif isinstance(v, dict):
            n = len(v)
            if n <= 15:
                out.append(0x80 | n)
            elif n <= 0xFFFF:
                out.extend(b"\xde" + _s.pack("!H", n))
            else:
                out.extend(b"\xdf" + _s.pack("!I", n))
            for k, x in v.items():
                pack(k if isinstance(k, str) else str(k))
                pack(x)
        else:
            raise TypeError(f"msgpack: unsupported type {type(v).__name__}")

    pack(obj)
    return bytes(out)


def write_msgpack(df: DataFrame, path: str, mode: str = "write") -> int:
    """MsgPackPipeline (pipelines.py:388-467): concatenated MessagePack
    objects, one per item — the stream `msgpack.Unpacker` reads back.
    ``mode`` is 'write' (overwrite) or 'append', like the reference."""
    if mode not in ("write", "append"):
        raise ValueError(f"mode must be 'write' or 'append', got '{mode}'")
    n = 0
    with open(path, "ab" if mode == "append" else "wb") as fp:
        for item in _json_rows(df):
            fp.write(msgpack_packb(item))
            n += 1
    return n


def write_elasticsearch(
    df: DataFrame, hosts: str | list = "http://localhost:9200",
    index: str = "items", batch_size: int = 500, timeout_s: float = 10.0,
) -> int:
    """ElasticsearchPipeline (pipelines.py:1249-1312). The reference
    indexes one document per async call; the scale shape is the `_bulk`
    NDJSON API posted DISTRIBUTED — each partition batches its own rows
    straight to ES (a fan-in service), no driver funnel. Multiple hosts
    round-robin by partition id. DataFrame API throughout (SURVEY §1.2
    "no RDDs"): the per-partition poster is a mapInPandas stage
    yielding one count row per task, like ``write_webhook``."""
    host_list = [hosts] if isinstance(hosts, str) else list(hosts)

    def post_batches(batches):
        import json as _json
        import urllib.request

        import pandas as _pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = host_list[pid % len(host_list)].rstrip("/")
        sent = 0
        buf = []

        def flush():
            nonlocal sent, buf
            if not buf:
                return
            lines = []
            for doc in buf:
                lines.append(_json.dumps({"index": {"_index": index}}))
                lines.append(doc)
            body = ("\n".join(lines) + "\n").encode("utf-8")
            req = urllib.request.Request(
                f"{base}/_bulk", data=body,
                headers={"content-type": "application/x-ndjson"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                out = _json.loads(resp.read())
            if out.get("errors"):
                raise RuntimeError(f"elasticsearch bulk errors on {base}/{index}")
            sent += len(buf)
            buf = []

        for pdf in batches:
            for j in pdf["j"]:
                buf.append(j)
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield _pd.DataFrame({"sent": [sent]})

    counts = (
        df.select(F.to_json(F.struct(*df.columns)).alias("j"))
        .mapInPandas(post_batches, "sent long")
        .collect()
    )
    return sum(r["sent"] for r in counts)


def write_s3_jsonl(
    df: DataFrame, bucket: str, key: str = "items.jl", *,
    region: str = "us-east-1", endpoint: str | None = None,
    access_key_id: str | None = None, secret_access_key: str | None = None,
) -> int:
    """S3JsonLinesPipeline (pipelines.py:1391-1475): all items as one
    JSONL object at ``s3://bucket/key`` (the reference buffers and
    writes once on close). Import-gated on boto3 standing in for the
    reference's opendal; custom ``endpoint`` supports S3-compatible
    stores. For partitioned multi-object output at scale, use
    ``write_jsonl`` against an s3a:// path instead — this sink is the
    single-object reference behavior."""
    try:
        import boto3
        from botocore.config import Config
    except ImportError as exc:
        raise ImportError("boto3 is required for write_s3_jsonl") from exc
    import json as _json

    client = boto3.client(
        "s3", region_name=region, endpoint_url=endpoint,
        aws_access_key_id=access_key_id or "anonymous",
        aws_secret_access_key=secret_access_key or "anonymous",
        # plain Content-Length bodies (no aws-chunked trailing
        # checksums) so S3-compatible stores without flexible-checksum
        # support work
        config=Config(s3={"addressing_style": "path"},
                      retries={"max_attempts": 2},
                      request_checksum_calculation="when_required"),
    )
    lines = [
        _json.dumps(item, ensure_ascii=False) for item in _json_rows(df)
    ]
    client.put_object(Bucket=bucket, Key=key,
                      Body="\n".join(lines).encode("utf-8"))
    return len(lines)


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def write_excel(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> int:
    """ExcelPipeline (pipelines.py:996-1093): header row of flattened
    field names (nested dicts → ``a_b``, lists → ", "-joined — the
    same rule as ``flatten_for_tabular``), one row per item. openpyxl
    isn't available in this sandbox, so this writes the minimal OOXML
    package directly (stdlib zipfile + hand-built sheet XML with
    inline strings) — byte-level .xlsx, readable by Excel/openpyxl/
    pandas."""
    import zipfile
    from xml.sax.saxutils import escape

    flat = flatten_for_tabular(df)
    header = flat.columns
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

    def cell(ref: str, v) -> str:
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    rows_xml = []

    def row_xml(rno: int, values) -> str:
        cells = "".join(
            cell(f"{_col_letter(ci)}{rno}", v) for ci, v in enumerate(values)
        )
        return f'<row r="{rno}">{cells}</row>'

    rows_xml.append(row_xml(1, header))
    n = 0
    for r in flat.toLocalIterator():
        n += 1
        rows_xml.append(row_xml(n + 1, [r[c] for c in header]))

    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(rows_xml)}</sheetData>'
        f"</worksheet>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet\" "
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument\" "
        'Target="xl/workbook.xml"/></Relationships>'
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/><Default Extension='
        '"xml" ContentType="application/xml"/><Override PartName="/xl/'
        'workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/><Override PartName='
        '"/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return n


def write_ftp_jsonl(
    df: DataFrame, host: str, user: str, password: str,
    remote_path: str = "items.jl", port: int = 21, timeout_s: float = 30.0,
) -> int:
    """FTPPipeline (pipelines.py:2251-2345): buffer all items as JSONL,
    connect → login → upload to ``remote_path`` → quit. stdlib ftplib
    stands in for the reference's aioftp; one remote object, so a
    driver-side writer like the reference."""
    import io
    import json as _json
    from ftplib import FTP

    lines = [_json.dumps(item, ensure_ascii=False) for item in _json_rows(df)]
    if not lines:
        return 0
    ftp = FTP()
    try:
        ftp.connect(host, port, timeout=timeout_s)
        ftp.login(user, password)
        buf = io.BytesIO(("\n".join(lines) + "\n").encode("utf-8"))
        ftp.storbinary(f"STOR {remote_path}", buf)
    finally:
        try:
            ftp.quit()
        except Exception:
            ftp.close()
    return len(lines)


def google_service_account_jwt(
    creds: dict, scope: str, now: int | None = None, lifetime_s: int = 3600,
) -> str:
    """RS256-signed service-account JWT (RFC 7519 + Google's OAuth2
    jwt-bearer profile), built from the credentials-file fields with
    pyca cryptography — no google-auth in this sandbox. The loopback
    test verifies the signature against the account's PUBLIC key, so
    the signing path is checked for real."""
    import base64
    import json as _json
    import time

    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    def b64url(b: bytes) -> bytes:
        return base64.urlsafe_b64encode(b).rstrip(b"=")

    iat = int(now if now is not None else time.time())
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {
        "iss": creds["client_email"],
        "scope": scope,
        "aud": creds["token_uri"],
        "iat": iat,
        "exp": iat + lifetime_s,
    }
    signing_input = (
        b64url(_json.dumps(header, separators=(",", ":")).encode())
        + b"."
        + b64url(_json.dumps(claims, separators=(",", ":")).encode())
    )
    key = serialization.load_pem_private_key(
        creds["private_key"].encode(), password=None
    )
    sig = key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256())
    return (signing_input + b"." + b64url(sig)).decode()


def write_google_sheets(
    df: DataFrame, spreadsheet_id: str, credentials_file: str,
    sheet_name: str = "Sheet1", batch_size: int = 100,
    api_base: str = "https://sheets.googleapis.com",
    timeout_s: float = 30.0,
) -> int:
    """GoogleSheetsPipeline (pipelines.py:1949-2120): flatten items
    (nested dicts → ``a_b`` keys, lists → ", "-joined — the shared
    ``flatten_for_tabular`` rule, pipelines.py:2102-2120), append a
    header row once to ``{sheet}!A1`` then data rows to ``{sheet}!A2``
    in ``batch_size`` batches with ``valueInputOption=RAW``
    (pipelines.py:2060-2081).

    Auth is the real service-account flow, not a mock: RS256 JWT
    assertion → OAuth2 token endpoint (the ``token_uri`` from the
    credentials file) → Bearer token on the Sheets v4 ``values:append``
    calls. ``api_base`` is overridable so the loopback test can stand
    in for ``sheets.googleapis.com``; the fake verifies the JWT
    SIGNATURE with the account's public key and enforces the Bearer
    token, so both hops are exercised against real wire bytes."""
    import json as _json
    import urllib.parse
    import urllib.request

    rows_df = flatten_for_tabular(df)
    fieldnames = rows_df.columns
    data_rows = [
        [None if r[c] is None else r[c] for c in fieldnames]
        for r in rows_df.collect()
    ]
    if not data_rows:
        return 0

    with open(credentials_file) as f:
        creds = _json.load(f)
    assertion = google_service_account_jwt(
        creds, "https://www.googleapis.com/auth/spreadsheets"
    )
    token_req = urllib.request.Request(
        creds["token_uri"],
        data=urllib.parse.urlencode({
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": assertion,
        }).encode(),
        headers={"content-type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(token_req, timeout=timeout_s) as resp:
        token = _json.loads(resp.read())["access_token"]

    def append(range_: str, values: list) -> None:
        url = (
            f"{api_base}/v4/spreadsheets/{urllib.parse.quote(spreadsheet_id)}"
            f"/values/{urllib.parse.quote(range_, safe='')}"
            ":append?valueInputOption=RAW"
        )
        req = urllib.request.Request(
            url, data=_json.dumps({"values": values}).encode(),
            headers={
                "authorization": f"Bearer {token}",
                "content-type": "application/json",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout_s):
            pass

    append(f"{sheet_name}!A1", [fieldnames])  # header once
    for pos in range(0, len(data_rows), batch_size):
        append(f"{sheet_name}!A2", data_rows[pos:pos + batch_size])
    return len(data_rows)


def snowflake_keypair_jwt(
    account: str, user: str, private_key_pem: str,
    now: int | None = None, lifetime_s: int = 3540,
) -> str:
    """Key-pair JWT for Snowflake's public SQL REST API
    (docs.snowflake.com/en/developer-guide/sql-api/authenticating —
    "Using key-pair authentication"): RS256 over
    ``iss = <ACCOUNT>.<USER>.SHA256:<b64(sha256(pubkey DER))>``,
    ``sub = <ACCOUNT>.<USER>``, account/user uppercased per the spec.
    Built with pyca cryptography (no snowflake-connector here); the
    loopback test verifies both the signature and the fingerprint
    against the account's real public key."""
    import base64
    import json as _json
    import time

    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    def b64url(b: bytes) -> bytes:
        return base64.urlsafe_b64encode(b).rstrip(b"=")

    key = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None
    )
    pub_der = key.public_key().public_bytes(
        serialization.Encoding.DER,
        serialization.PublicFormat.SubjectPublicKeyInfo,
    )
    digest = hashes.Hash(hashes.SHA256())
    digest.update(pub_der)
    fp = base64.b64encode(digest.finalize()).decode()
    qualified = f"{account.upper()}.{user.upper()}"
    iat = int(now if now is not None else time.time())
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {
        "iss": f"{qualified}.SHA256:{fp}",
        "sub": qualified,
        "iat": iat,
        "exp": iat + lifetime_s,
    }
    signing_input = (
        b64url(_json.dumps(header, separators=(",", ":")).encode())
        + b"."
        + b64url(_json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256())
    return (signing_input + b"." + b64url(sig)).decode()


def write_snowflake(
    df: DataFrame, account: str, user: str, private_key_file: str,
    database: str, schema: str, warehouse: str,
    table: str = "items", role: str | None = None, spider: str = "spark",
    batch_size: int = 100, api_base: str | None = None,
    timeout_s: float = 30.0,
) -> int:
    """SnowflakePipeline (pipelines.py:2122-2249): auto-creates
    ``{table} (id NUMBER AUTOINCREMENT PRIMARY KEY, spider
    VARCHAR(255) NOT NULL, data VARIANT NOT NULL, created_at
    TIMESTAMP_NTZ DEFAULT CURRENT_TIMESTAMP())`` and inserts
    ``(spider, data=json(item))`` rows — same DDL, same row shape.

    The reference drives snowflake-connector-python (JDBC-style
    session + per-item ``INSERT ... VALUES (%s, %s)``); that client
    stack doesn't exist in this sandbox, so this speaks Snowflake's
    PUBLIC SQL REST API v2 instead (``POST /api/v2/statements``,
    key-pair JWT auth with the documented
    ``X-Snowflake-Authorization-Token-Type: KEYPAIR_JWT`` header and
    positional ``bindings``). Per-item inserts become batched
    ``INSERT ... SELECT column1, PARSE_JSON(column2) FROM VALUES``
    (VARIANT can't be a VALUES literal, hence the documented
    SELECT-from-VALUES form). ``api_base`` is overridable so the
    loopback fake can stand in for ``<account>.snowflakecomputing.com``;
    the fake verifies the JWT signature AND the public-key fingerprint
    embedded in ``iss``, so the whole auth chain runs on real bytes."""
    import json as _json
    import urllib.request

    if not table.replace("_", "").isalnum():
        raise ValueError(f"invalid table name: {table}")
    base = (api_base or f"https://{account}.snowflakecomputing.com").rstrip("/")
    with open(private_key_file) as f:
        jwt = snowflake_keypair_jwt(account, user, f.read())
    headers = {
        "authorization": f"Bearer {jwt}",
        "content-type": "application/json",
        "accept": "application/json",
        "x-snowflake-authorization-token-type": "KEYPAIR_JWT",
    }

    def submit(statement: str, bindings: dict | None = None) -> None:
        # The SQL API returns 200 only when the statement FINISHED; 202
        # means "still executing" with a statementHandle to poll
        # (docs.snowflake.com/en/developer-guide/sql-api/handling-responses).
        # Without the poll, CREATE TABLE → INSERT can race and an
        # asynchronously failed statement would still count as written.
        import time as _time

        payload = {
            "statement": statement,
            "timeout": int(timeout_s),
            "database": database,
            "schema": schema,
            "warehouse": warehouse,
        }
        if role:
            payload["role"] = role
        if bindings:
            payload["bindings"] = bindings
        req = urllib.request.Request(
            f"{base}/api/v2/statements",
            data=_json.dumps(payload).encode(), headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            status = resp.status
            body = _json.loads(resp.read() or b"{}")
        deadline = _time.monotonic() + timeout_s
        while status == 202:
            handle = body.get("statementHandle")
            if not handle:
                raise RuntimeError("snowflake: 202 without statementHandle")
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"snowflake: statement {handle} still executing after "
                    f"{timeout_s}s"
                )
            _time.sleep(min(0.2, timeout_s / 10))
            poll = urllib.request.Request(
                f"{base}/api/v2/statements/{handle}", headers=headers,
                method="GET",
            )
            with urllib.request.urlopen(poll, timeout=timeout_s) as resp:
                status = resp.status
                body = _json.loads(resp.read() or b"{}")
        if status != 200:
            raise RuntimeError(
                f"snowflake: unexpected status {status}: "
                f"{body.get('message', '')!r}"
            )

    submit(
        f"CREATE TABLE IF NOT EXISTS {table} ("
        " id NUMBER AUTOINCREMENT PRIMARY KEY,"
        " spider VARCHAR(255) NOT NULL,"
        " data VARIANT NOT NULL,"
        " created_at TIMESTAMP_NTZ DEFAULT CURRENT_TIMESTAMP())"
    )

    n = 0
    buf: list[dict] = []

    def flush() -> None:
        nonlocal n, buf
        if not buf:
            return
        values = ", ".join("(?, ?)" for _ in buf)
        bindings = {}
        for i, item in enumerate(buf):
            bindings[str(2 * i + 1)] = {"type": "TEXT", "value": spider}
            bindings[str(2 * i + 2)] = {
                "type": "TEXT",
                "value": _json.dumps(item, ensure_ascii=False),
            }
        submit(
            f"INSERT INTO {table} (spider, data)"
            f" SELECT column1, PARSE_JSON(column2) FROM VALUES {values}",
            bindings,
        )
        n += len(buf)
        buf = []

    for item in _json_rows(df):
        buf.append(item)
        if len(buf) >= batch_size:
            flush()
    flush()
    return n


def write_taskiq_redis(
    df: DataFrame, host: str, port: int = 6379,
    queue_name: str = "taskiq", task_name: str = ".:process_item",
    password: str | None = None, timeout_s: float = 30.0,
) -> int:
    """TaskiqPipeline (pipelines.py:812-917): enqueue every scraped
    item as a task invocation instead of writing a file. The reference
    calls ``task.kiq(item)`` against a Taskiq broker; the dominant
    production broker is taskiq-redis's ListQueueBroker, whose wire
    behavior is ``LPUSH queue_name <serialized TaskiqMessage>`` with
    the default JSON message shape
    ``{"task_id", "task_name", "labels", "args": [item], "kwargs"}``.
    Spoken here as raw RESP from the stdlib (no redis client in this
    sandbox), one pipelined connection, deterministic uuid5 task ids —
    loopback-verified against a fake RESP server in
    tests/test_sinks_taskiq.py. Driver-side single connection like the
    reference's single broker."""
    import json as _json
    import socket
    import uuid

    items = list(_json_rows(df))
    if not items:
        return 0

    def enc(*args) -> bytes:
        out = b"*%d\r\n" % len(args)
        for a in args:
            b = a if isinstance(a, bytes) else str(a).encode("utf-8")
            out += b"$%d\r\n%s\r\n" % (len(b), b)
        return out

    class _Resp:
        def __init__(self, sock: socket.socket) -> None:
            self.sock, self.buf = sock, b""

        def _line(self) -> bytes:
            while b"\r\n" not in self.buf:
                chunk = self.sock.recv(65536)
                if not chunk:
                    raise ConnectionError("redis connection closed")
                self.buf += chunk
            line, self.buf = self.buf.split(b"\r\n", 1)
            return line

        def reply(self):
            line = self._line()
            t, body = line[:1], line[1:]
            if t == b"+":
                return body.decode()
            if t == b":":
                return int(body)
            if t == b"-":
                raise RuntimeError(f"redis error: {body.decode()}")
            if t == b"$":
                n = int(body)
                if n < 0:
                    return None
                while len(self.buf) < n + 2:
                    self.buf += self.sock.recv(65536)
                out, self.buf = self.buf[:n], self.buf[n + 2:]
                return out
            raise RuntimeError(f"unexpected RESP reply {line!r}")

    sock = socket.create_connection((host, port), timeout=timeout_s)
    try:
        r = _Resp(sock)
        if password is not None:
            sock.sendall(enc("AUTH", password))
            r.reply()
        # pipelined: all LPUSHes on the wire, then drain the replies
        payload = bytearray()
        for i, item in enumerate(items):
            msg = _json.dumps({
                "task_id": str(uuid.uuid5(uuid.NAMESPACE_URL, f"taskiq:{i}")),
                "task_name": task_name,
                "labels": {},
                "args": [item],
                "kwargs": {},
            }, ensure_ascii=False)
            payload += enc("LPUSH", queue_name, msg)
        sock.sendall(bytes(payload))
        for _ in items:
            r.reply()
    finally:
        sock.close()
    return len(items)


def write_sftp_jsonl(
    df: DataFrame, host: str, user: str, password: str,
    remote_path: str = "items.jl", port: int = 22, timeout_s: float = 30.0,
    expected_host_key: bytes | None = None,
) -> int:
    """SFTPPipeline (pipelines.py:2347-2467): buffer all items as
    JSONL, connect → authenticate → mkdir -p the parent directories →
    upload → close. The reference wraps asyncssh; no SSH stack ships in
    this sandbox, so ``operators/ssh.py`` implements the SSH-2
    transport (curve25519-sha256 kex, ed25519 host keys, aes128-ctr +
    hmac-sha2-256, password auth) and the SFTP v3 client from the
    stdlib + pyca cryptography primitives, loopback-verified in
    tests/test_sinks_sftp.py. One remote object → driver-side writer
    like the reference. ``expected_host_key``: optional pinned raw
    ed25519 server key (known-hosts semantics); the host-key SIGNATURE
    over the exchange hash is verified unconditionally."""
    import json as _json

    from silkworm_spark.operators.ssh import SSHError, sftp_connect

    lines = [_json.dumps(item, ensure_ascii=False) for item in _json_rows(df)]
    if not lines:
        return 0
    cli = sftp_connect(host, port, user, password, timeout_s, expected_host_key)
    try:
        parts = [p for p in remote_path.split("/")[:-1] if p]
        cur = ""
        for p in parts:
            cur = f"{cur}/{p}" if cur else p
            try:
                cli.mkdir(cur)
            except SSHError:
                pass  # already exists
        cli.put_bytes(remote_path, ("\n".join(lines) + "\n").encode("utf-8"))
    finally:
        cli.close()
    return len(lines)


def write_couchdb(
    df: DataFrame, url: str = "http://localhost:5984",
    database: str = "scraping", spider: str = "spark",
    username: str | None = None, password: str | None = None,
    batch_size: int = 500, timeout_s: float = 10.0,
) -> int:
    """CouchDBPipeline (pipelines.py:2607-2702): each item stored as
    ``{"spider": name, "data": item}``; the database is created if
    absent. The reference creates one doc per async call; here the
    CouchDB ``_bulk_docs`` API takes driver-batched Arrow chunks —
    same documents, two orders of magnitude fewer round trips."""
    import base64 as _b64
    import json as _json
    import urllib.request

    headers = {"content-type": "application/json"}
    if username and password:
        headers["authorization"] = "Basic " + _b64.b64encode(
            f"{username}:{password}".encode()).decode()
    base = url.rstrip("/")

    def req(method: str, path: str, payload=None):
        r = urllib.request.Request(
            f"{base}{path}",
            data=_json.dumps(payload).encode() if payload is not None else None,
            headers=headers, method=method,
        )
        try:
            with urllib.request.urlopen(r, timeout=timeout_s) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    status = req("PUT", f"/{database}")  # create-if-absent
    if status not in (201, 202, 412):  # 412 = already exists
        raise RuntimeError(f"couchdb create database failed: HTTP {status}")
    n = 0
    buf = []

    def flush():
        nonlocal n, buf
        if not buf:
            return
        status = req("POST", f"/{database}/_bulk_docs", {"docs": buf})
        if status not in (201, 202):
            raise RuntimeError(f"couchdb _bulk_docs failed: HTTP {status}")
        n += len(buf)
        buf = []

    for item in _json_rows(df):
        buf.append({"spider": spider, "data": item})
        if len(buf) >= batch_size:
            flush()
    flush()
    return n


def write_dynamodb(
    df: DataFrame, table_name: str = "items", *, spider: str = "spark",
    region_name: str = "us-east-1", endpoint_url: str | None = None,
    aws_access_key_id: str | None = None,
    aws_secret_access_key: str | None = None,
) -> int:
    """DynamoDBPipeline (pipelines.py:2705-2835): each item stored as
    ``{id, spider, data=json(item)}``. The reference's per-item
    ``put_item`` with a ``uuid4`` id becomes ``batch_write_item`` in
    25-item pages (the API maximum) with a DETERMINISTIC id
    (md5(data) + sequence) so resumed crawls overwrite rather than
    duplicate. Import-gated on boto3 (reference: aioboto3)."""
    try:
        import boto3
        from botocore.config import Config
    except ImportError as exc:
        raise ImportError("boto3 is required for write_dynamodb") from exc
    import hashlib as _h
    import json as _json

    client = boto3.client(
        "dynamodb", region_name=region_name, endpoint_url=endpoint_url,
        aws_access_key_id=aws_access_key_id or "anonymous",
        aws_secret_access_key=aws_secret_access_key or "anonymous",
        config=Config(retries={"max_attempts": 2}),
    )
    n = 0
    page = []

    def flush():
        nonlocal n, page
        if not page:
            return
        resp = client.batch_write_item(RequestItems={table_name: page})
        left = resp.get("UnprocessedItems", {}).get(table_name)
        if left:
            client.batch_write_item(RequestItems={table_name: left})
        n += len(page)
        page = []

    for i, item in enumerate(_json_rows(df)):
        data = _json.dumps(item, ensure_ascii=False)
        page.append({"PutRequest": {"Item": {
            "id": {"S": f"{_h.md5(data.encode()).hexdigest()[:16]}-{i}"},
            "spider": {"S": spider},
            "data": {"S": data},
        }}})
        if len(page) == 25:  # batch_write_item hard cap
            flush()
    flush()
    return n


def bson_encode(doc: dict) -> bytes:
    """Spec-conformant BSON encoder for the JSON-item subset
    (str/float/int/bool/None/dict/list) — no pymongo in this sandbox,
    and the MongoDB wire protocol needs only this much. Ints fit into
    int32 when they can (0x10), else int64 (0x12), matching driver
    behavior."""
    import struct as _s

    def elem(name: str, v) -> bytes:
        key = name.encode("utf-8") + b"\x00"
        if v is None:
            return b"\x0a" + key
        if isinstance(v, bool):
            return b"\x08" + key + (b"\x01" if v else b"\x00")
        if isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                return b"\x10" + key + _s.pack("<i", v)
            return b"\x12" + key + _s.pack("<q", v)
        if isinstance(v, float):
            return b"\x01" + key + _s.pack("<d", v)
        if isinstance(v, str):
            b = v.encode("utf-8") + b"\x00"
            return b"\x02" + key + _s.pack("<i", len(b)) + b
        if isinstance(v, dict):
            return b"\x03" + key + bson_encode(v)
        if isinstance(v, (list, tuple)):
            return b"\x04" + key + bson_encode(
                {str(i): x for i, x in enumerate(v)})
        raise TypeError(f"bson: unsupported type {type(v).__name__}")

    body = b"".join(elem(k, v) for k, v in doc.items())
    return _s.pack("<i", len(body) + 5) + body + b"\x00"


def write_mongodb(
    df: DataFrame, host: str = "localhost", port: int = 27017,
    database: str = "scraping", collection: str = "items",
    batch_size: int = 500, timeout_s: float = 10.0,
) -> int:
    """MongoDBPipeline (pipelines.py:1315-1388): items inserted into
    ``database.collection``. The reference's per-item ``insert_one``
    becomes batched ``insert`` commands spoken directly over the
    OP_MSG wire protocol (stdlib socket + the BSON encoder above —
    neither pymongo nor motor exists in this sandbox). One connection,
    driver-side like the reference."""
    import socket as _sock
    import struct as _s

    OP_MSG = 2013
    conn = _sock.create_connection((host, port), timeout=timeout_s)
    req_id = 0

    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise RuntimeError("mongodb connection closed mid-reply")
            buf += c
        return buf

    def insert(docs: list) -> None:
        nonlocal req_id
        req_id += 1
        body = bson_encode({
            "insert": collection, "$db": database, "ordered": True,
            "documents": docs,
        })
        payload = _s.pack("<i", 0) + b"\x00" + body  # flagBits + section 0
        msg = _s.pack("<iiii", 16 + len(payload), req_id, 0, OP_MSG) + payload
        conn.sendall(msg)
        (length,) = _s.unpack("<i", read_exact(4))
        reply = read_exact(length - 4)
        # header remainder(12) + flagBits(4) + kind(1) + bson: ok is a
        # double at a fixed-enough offset only in theory — scan for it
        doc = reply[17:]
        if b"\x01ok\x00" not in doc:
            raise RuntimeError("mongodb insert: malformed reply")
        off = doc.index(b"\x01ok\x00") + 4
        (ok,) = _s.unpack("<d", doc[off:off + 8])
        if ok != 1.0:
            raise RuntimeError(f"mongodb insert failed (ok={ok})")

    n = 0
    buf: list = []
    try:
        for item in _json_rows(df):
            buf.append(item)
            if len(buf) >= batch_size:
                insert(buf)
                n += len(buf)
                buf = []
        if buf:
            insert(buf)
            n += len(buf)
    finally:
        conn.close()
    return n


def write_postgresql(
    df: DataFrame, host: str = "localhost", port: int = 5432,
    user: str = "postgres", password: str | None = None,
    database: str = "postgres", table: str = "items",
    spider: str = "spark", batch_size: int = 500, timeout_s: float = 10.0,
) -> int:
    """PostgreSQLPipeline (pipelines.py:1667-1770): auto-creates
    ``{table} (id SERIAL PRIMARY KEY, spider VARCHAR(255), data JSONB,
    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)`` and inserts
    ``(spider, data=json(item))`` rows. Speaks the v3 simple-query
    protocol over a stdlib socket (no asyncpg/psycopg here): trust and
    cleartext auth; the reference's per-item ``$1,$2`` execute becomes
    batched multi-row VALUES inserts. For cluster-scale fan-in use
    ``df.write.jdbc`` with the PG driver jar instead — this mirrors
    the reference's driver-side pipeline."""
    import socket as _sock
    import struct as _s

    if not table.replace("_", "").isalnum():
        raise ValueError(f"invalid table name: {table}")

    conn = _sock.create_connection((host, port), timeout=timeout_s)

    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise RuntimeError("postgresql connection closed")
            buf += c
        return buf

    def read_msg() -> tuple[bytes, bytes]:
        t = read_exact(1)
        (ln,) = _s.unpack("!i", read_exact(4))
        return t, read_exact(ln - 4)

    def wait_ready() -> None:
        while True:
            t, body = read_msg()
            if t == b"E":
                fields = body.split(b"\x00")
                msg = next((f[1:].decode() for f in fields
                            if f[:1] == b"M"), "unknown")
                raise RuntimeError(f"postgresql error: {msg}")
            if t == b"Z":
                return

    # startup: protocol 3.0 + user/database params
    params = f"user\x00{user}\x00database\x00{database}\x00\x00".encode()
    conn.sendall(_s.pack("!ii", 8 + len(params), 196608) + params)
    while True:
        t, body = read_msg()
        if t == b"R":
            (code,) = _s.unpack_from("!i", body)
            if code == 0:  # trust / auth ok
                continue
            if code == 3:  # cleartext password
                if password is None:
                    raise RuntimeError("postgresql requires a password")
                p = password.encode() + b"\x00"
                conn.sendall(b"p" + _s.pack("!i", 4 + len(p)) + p)
                continue
            raise RuntimeError(
                f"postgresql auth method {code} unsupported "
                "(trust/cleartext only)")
        if t == b"E":
            raise RuntimeError("postgresql startup rejected")
        if t == b"Z":
            break  # ReadyForQuery

    def query(sql: str) -> None:
        b = sql.encode() + b"\x00"
        conn.sendall(b"Q" + _s.pack("!i", 4 + len(b)) + b)
        wait_ready()

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    import json as _json

    n = 0
    buf: list[str] = []

    def flush():
        nonlocal n, buf
        if not buf:
            return
        query(f"INSERT INTO {table} (spider, data) VALUES "
              + ", ".join(buf))
        n += len(buf)
        buf = []

    try:
        query(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "id SERIAL PRIMARY KEY, spider VARCHAR(255) NOT NULL, "
            "data JSONB NOT NULL, "
            "created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)"
        )
        for item in _json_rows(df):
            data = _json.dumps(item, ensure_ascii=False)
            buf.append(f"({lit(spider)}, {lit(data)})")
            if len(buf) >= batch_size:
                flush()
        flush()
        conn.sendall(b"X" + _s.pack("!i", 4))  # Terminate
    finally:
        conn.close()
    return n


def _avro_zigzag(v: int) -> bytes:
    """Avro long: zigzag + base-128 varint (spec 'Primitive Types')."""
    n = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_avro(df: DataFrame, path: str, record_name: str = "ScrapedItem",
               block_rows: int = 1000) -> int:
    """AvroPipeline (pipelines.py:1144-1244): items as an Avro Object
    Container File. fastavro isn't available here, so this writes the
    OCF format directly (stdlib): null codec, deterministic sync
    marker (md5 of the schema JSON — replay-stable), one data block
    per ``block_rows``. The reference infers a nullable-union schema
    from the FIRST ITEM; here it derives from the DataFrame schema
    (strictly more reliable) with the same mapping — string/long/
    double/boolean, arrays element-wise, structs/maps JSON-stringified
    — and every field as ``["null", T]``."""
    import hashlib as _h
    import json as _json
    import struct as _s

    def avro_type(dt: T.DataType):
        if isinstance(dt, (T.StringType,)):
            return "string"
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return "long"
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return "double"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": avro_type(dt.elementType)}
        return "string"  # struct/map/binary → JSON string (reference rule)

    fields = [{"name": f.name, "type": ["null", avro_type(f.dataType)]}
              for f in df.schema.fields]
    schema = {"type": "record", "name": record_name, "fields": fields}
    schema_json = _json.dumps(schema)

    def enc_value(t, v) -> bytes:
        if t == "string":
            if not isinstance(v, str):
                v = _json.dumps(v, ensure_ascii=False)
            b = v.encode("utf-8")
            return _avro_zigzag(len(b)) + b
        if t == "long":
            return _avro_zigzag(int(v))
        if t == "double":
            return _s.pack("<d", float(v))
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if isinstance(t, dict) and t.get("type") == "array":
            if not v:
                return _avro_zigzag(0)
            items = b"".join(enc_value(t["items"], x) for x in v)
            return _avro_zigzag(len(v)) + items + _avro_zigzag(0)
        raise TypeError(f"avro: unsupported type {t}")

    def enc_record(row: dict) -> bytes:
        out = []
        for f in fields:
            v = row.get(f["name"])
            if v is None:
                out.append(_avro_zigzag(0))  # union branch: null
            else:
                out.append(_avro_zigzag(1) + enc_value(f["type"][1], v))
        return b"".join(out)

    sync = _h.md5(schema_json.encode()).digest()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    n = 0
    with open(path, "wb") as fp:
        fp.write(b"Obj\x01")
        fp.write(_avro_zigzag(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            fp.write(_avro_zigzag(len(kb)) + kb + _avro_zigzag(len(v)) + v)
        fp.write(_avro_zigzag(0))  # end of metadata map
        fp.write(sync)

        block: list[bytes] = []

        def flush():
            nonlocal block, n
            if not block:
                return
            payload = b"".join(block)
            fp.write(_avro_zigzag(len(block)) + _avro_zigzag(len(payload)))
            fp.write(payload + sync)
            n += len(block)
            block = []

        for row in df.toLocalIterator():
            block.append(enc_record(row.asDict(recursive=True)))
            if len(block) >= block_rows:
                flush()
        flush()
    return n


def write_mysql(
    df: DataFrame, host: str = "localhost", port: int = 3306,
    user: str = "root", password: str = "", database: str = "scraping",
    table: str = "items", spider: str = "spark", batch_size: int = 500,
    timeout_s: float = 10.0,
) -> int:
    """MySQLPipeline (pipelines.py:1557-1664): auto-creates
    ``{table} (id INT AUTO_INCREMENT PRIMARY KEY, spider VARCHAR(255),
    data JSON, created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)`` and
    inserts ``(spider, data=json(item))`` rows. Speaks the MySQL
    client/server protocol over a stdlib socket (no aiomysql here):
    protocol-v10 handshake with ``mysql_native_password`` scramble
    (SHA1(pass) XOR SHA1(salt+SHA1(SHA1(pass)))), then COM_QUERY with
    batched multi-row VALUES. caching_sha2 servers must have the user
    set to mysql_native_password; cluster-scale fan-in belongs to
    ``df.write.jdbc`` with the MySQL driver jar."""
    import hashlib as _h
    import json as _json
    import socket as _sock
    import struct as _s

    if not table.replace("_", "").isalnum():
        raise ValueError(f"invalid table name: {table}")

    conn = _sock.create_connection((host, port), timeout=timeout_s)

    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise RuntimeError("mysql connection closed")
            buf += c
        return buf

    def read_packet() -> tuple[int, bytes]:
        head = read_exact(4)
        ln = head[0] | head[1] << 8 | head[2] << 16
        return head[3], read_exact(ln)

    def send_packet(seq: int, payload: bytes) -> None:
        ln = len(payload)
        conn.sendall(bytes((ln & 0xFF, (ln >> 8) & 0xFF, (ln >> 16) & 0xFF,
                            seq)) + payload)

    def check_ok(body: bytes, what: str) -> None:
        if body[:1] == b"\xff":
            code = _s.unpack_from("<H", body, 1)[0]
            raise RuntimeError(
                f"mysql {what} failed (errno {code}): "
                f"{body[9:].decode(errors='replace')}")

    try:
        # --- protocol v10 greeting ---
        _, greet = read_packet()
        if greet[:1] == b"\xff":
            check_ok(greet, "connect")
        assert greet[0] == 10, "unsupported mysql protocol version"
        p = greet.index(b"\x00", 1) + 1  # skip server version
        p += 4  # thread id
        salt = greet[p:p + 8]
        p += 8 + 1 + 2 + 1 + 2 + 2  # filler, caps low, charset, status, caps high
        auth_len = greet[p]
        p += 1 + 10
        salt += greet[p:p + max(13, auth_len - 8)].rstrip(b"\x00")
        salt = salt[:20]

        if password:
            sha_pw = _h.sha1(password.encode()).digest()
            stage2 = _h.sha1(_h.sha1(sha_pw).digest())  # SHA1(SHA1(pass))
            mix = _h.sha1(salt + stage2.digest()).digest()
            token = bytes(a ^ b for a, b in zip(sha_pw, mix))
        else:
            token = b""

        CAPS = 0x0200 | 0x8000 | 0x80000 | 0x8  # PROTO41|SECURE|PLUGIN_AUTH|WITH_DB
        resp = (_s.pack("<IIB", CAPS, 1 << 24, 45) + b"\x00" * 23
                + user.encode() + b"\x00"
                + bytes([len(token)]) + token
                + database.encode() + b"\x00"
                + b"mysql_native_password\x00")
        send_packet(1, resp)
        _, body = read_packet()
        check_ok(body, "auth")

        def query(sql: str) -> None:
            send_packet(0, b"\x03" + sql.encode())
            _, body = read_packet()
            check_ok(body, "query")

        def lit(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        query(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "id INT AUTO_INCREMENT PRIMARY KEY, "
            "spider VARCHAR(255) NOT NULL, data JSON NOT NULL, "
            "created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)"
        )
        n = 0
        buf: list[str] = []

        def flush():
            nonlocal n, buf
            if not buf:
                return
            query(f"INSERT INTO {table} (spider, data) VALUES "
                  + ", ".join(buf))
            n += len(buf)
            buf = []

        for item in _json_rows(df):
            data = _json.dumps(item, ensure_ascii=False)
            buf.append(f"({lit(spider)}, {lit(data)})")
            if len(buf) >= batch_size:
                flush()
        flush()
        send_packet(0, b"\x01")  # COM_QUIT
        return n
    finally:
        conn.close()


def write_cassandra(
    df: DataFrame, host: str = "localhost", port: int = 9042,
    keyspace: str = "scraping", table: str = "items", spider: str = "spark",
    username: str | None = None, password: str | None = None,
    batch_size: int = 100, timeout_s: float = 10.0,
) -> int:
    """CassandraPipeline (pipelines.py:2469-2604): creates the
    keyspace (SimpleStrategy rf=1) and ``{table} (id uuid PRIMARY KEY,
    spider text, data text, created_at timestamp)``, then inserts
    ``(uuid, spider, json(item), now)`` rows. Speaks CQL native
    protocol v4 over a stdlib socket (no cassandra-driver here):
    STARTUP → READY/AUTHENTICATE (SASL PLAIN), QUERY frames; the
    reference's per-item execute becomes UNLOGGED BATCHes. The
    reference's ``uuid4`` id is replaced by a DETERMINISTIC uuid5 of
    (data, index) so resumed crawls overwrite rather than duplicate."""
    import json as _json
    import socket as _sock
    import struct as _s
    import uuid as _uuid

    if not table.replace("_", "").isalnum():
        raise ValueError(f"invalid table name: {table}")
    if not keyspace.replace("_", "").isalnum():
        raise ValueError(f"invalid keyspace name: {keyspace}")

    conn = _sock.create_connection((host, port), timeout=timeout_s)
    stream = 0

    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise RuntimeError("cassandra connection closed")
            buf += c
        return buf

    def send_frame(opcode: int, body: bytes) -> None:
        conn.sendall(_s.pack("!BBhBI", 0x04, 0, stream, opcode, len(body))
                     + body)

    def read_frame() -> tuple[int, bytes]:
        ver, _flags, _stream, opcode, ln = _s.unpack("!BBhBI", read_exact(9))
        body = read_exact(ln)
        if opcode == 0x00:  # ERROR
            (code,) = _s.unpack_from("!i", body)
            (sl,) = _s.unpack_from("!H", body, 4)
            raise RuntimeError(
                f"cassandra error {code}: {body[6:6 + sl].decode()}")
        return opcode, body

    def short_str(s: str) -> bytes:
        b = s.encode()
        return _s.pack("!H", len(b)) + b

    # STARTUP with the required CQL_VERSION option
    send_frame(0x01, _s.pack("!H", 1) + short_str("CQL_VERSION")
               + short_str("3.0.0"))
    opcode, _body = read_frame()
    if opcode == 0x03:  # AUTHENTICATE → SASL PLAIN
        if not (username and password):
            raise RuntimeError("cassandra requires credentials")
        token = b"\x00" + username.encode() + b"\x00" + password.encode()
        send_frame(0x0F, _s.pack("!i", len(token)) + token)
        opcode, _body = read_frame()
        if opcode != 0x10:  # AUTH_SUCCESS
            raise RuntimeError("cassandra auth failed")
    elif opcode != 0x02:  # READY
        raise RuntimeError(f"cassandra startup: unexpected opcode {opcode}")

    def query(cql: str) -> None:
        b = cql.encode()
        body = (_s.pack("!i", len(b)) + b
                + _s.pack("!H", 0x0001)  # consistency ONE
                + b"\x00")  # no flags
        send_frame(0x07, body)
        opcode, _body = read_frame()
        if opcode != 0x08:  # RESULT
            raise RuntimeError(f"cassandra query: unexpected opcode {opcode}")

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    try:
        query(f"CREATE KEYSPACE IF NOT EXISTS {keyspace} WITH replication"
              " = {'class': 'SimpleStrategy', 'replication_factor': 1}")
        query(
            f"CREATE TABLE IF NOT EXISTS {keyspace}.{table} ("
            "id uuid PRIMARY KEY, spider text, data text, "
            "created_at timestamp)"
        )
        n = 0
        buf: list[str] = []

        def flush():
            nonlocal n, buf
            if not buf:
                return
            query("BEGIN UNLOGGED BATCH " + " ".join(buf) + " APPLY BATCH;")
            n += len(buf)
            buf = []

        for i, item in enumerate(_json_rows(df)):
            data = _json.dumps(item, ensure_ascii=False)
            rid = _uuid.uuid5(_uuid.NAMESPACE_URL, f"{data}#{i}")
            buf.append(
                f"INSERT INTO {keyspace}.{table} "
                "(id, spider, data, created_at) VALUES "
                f"({rid}, {lit(spider)}, {lit(data)}, toTimestamp(now()));"
            )
            if len(buf) >= batch_size:
                flush()
        flush()
        return n
    finally:
        conn.close()


SINKS.update({
    "avro": write_avro,
    "cassandra": write_cassandra,
    "mysql": write_mysql,
    "excel": write_excel,
    "ftp_jsonl": write_ftp_jsonl,
    "couchdb": write_couchdb,
    "dynamodb": write_dynamodb,
    "mongodb": write_mongodb,
    "postgresql": write_postgresql,
    "sqlite": write_sqlite,
    "duckdb": write_duckdb,
    "xml": write_xml,
    "yaml": write_yaml,
    "webhook": write_webhook,
    "rss": write_rss,
    "msgpack": write_msgpack,
    "elasticsearch": write_elasticsearch,
    "s3_jsonl": write_s3_jsonl,
})


def write_vortex(df: DataFrame, path: str, parquet_standin: bool = False) -> int:
    """VortexPipeline (reference pipelines.py:1478-1555): buffer all
    items, build ``pa.Table.from_pylist(items)``, write one Vortex file
    via ``vortex.io.write`` on close — reproduced call-for-call when the
    ``vortex`` package is importable (it is an optional extra in the
    reference too: ``pip install silkworm-rs[vortex]``,
    pipelines.py:1514-1517).

    WAIVER (recorded with the same rigor as the former Snowflake one,
    inverse outcome): the sandbox has no ``vortex`` package and no
    network, and the Vortex on-disk footer is defined by FlatBuffers
    schema files (layout + dtype tables) that are not reproducible from
    memory — hand-guessed footer bytes would claim spec conformance no
    independent decoder here could check, unlike Avro OCF/MsgPack/GIF
    whose byte layouts are fully specified in their RFC/spec prose.
    So: with the library absent this raises ImportError exactly like
    the reference, unless ``parquet_standin=True`` explicitly opts into
    writing the SAME buffered Arrow table as a clearly-labeled Parquet
    file (identical rows, no fake Vortex magic bytes)."""
    import pyarrow as pa

    items = list(_json_rows(df))
    table = pa.Table.from_pylist(items)
    # the optional-dependency check covers ONLY the import: an
    # ImportError raised lazily inside vortex.io.write (e.g. a missing
    # native extension, possibly after a partial file write) must
    # propagate, not be silently replaced by the parquet stand-in
    try:
        import vortex  # optional, as in the reference
    except ImportError:
        if not parquet_standin:
            raise ImportError(
                "vortex is required for write_vortex. Install it with: "
                "pip install vortex-data (or pass parquet_standin=True "
                "for a labeled Parquet stand-in)"
            ) from None
    else:
        vortex.io.write(table, str(path))
        return len(items)
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    return len(items)


SINKS.update({"vortex": write_vortex})
