"""Item sinks — the v1 subset of the reference's 24 pipelines.

The reference threads each item through an ordered pipeline chain
(pipelines.py:197-200, engine.py:270-278); here a "pipeline" is a
DataFrame transform and a "sink" is a writer. The two most-used
reference sinks are mirrored natively (JSONL pipelines.py:295-385,
CSV with struct flattening pipelines.py:735-809); the canonical
output remains the checkpointed ``documents`` table (Parquet —
standing in for the reference's Polars/Vortex columnar sinks,
pipelines.py:920-993,1478-1555). Every other reference pipeline is a
connector swap on ``df.write`` (JDBC for SQLite/MySQL/PG/Snowflake,
spark-avro for Avro, es/mongo connectors), not engine semantics.
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
# nature (one sqlite/duckdb connection, one XML file). Their Spark
# analogs drain the DataFrame through the driver in Arrow batches —
# the right shape for an embedded single-writer target; distributed
# fan-in sinks (JDBC servers, ES, Mongo, S3) remain `df.write`
# connector swaps and are out of scope in this sandbox (no jars, no
# network).


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
    is a fan-in service, so executor-side posting is the scale shape)."""
    from pyspark.sql import types as T2

    def post_partition(it):
        import json as _json
        import urllib.request

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

        for row in it:
            buf.append(_json.loads(row["j"]))
            if len(buf) >= batch_size:
                flush()
        flush()
        yield sent

    counts = (
        df.select(F.to_json(F.struct(*df.columns)).alias("j"))
        .rdd.mapPartitions(post_partition)
        .collect()
    )
    return sum(counts)


SINKS.update({
    "sqlite": write_sqlite,
    "duckdb": write_duckdb,
    "xml": write_xml,
    "yaml": write_yaml,
    "webhook": write_webhook,
})
