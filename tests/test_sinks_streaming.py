"""Sinks + streaming surface + packaging."""

from __future__ import annotations

import json
import os
import zipfile


def test_flatten_and_csv_jsonl(spark, tmp_path):
    from silkworm_spark.operators.sinks import flatten_for_tabular, write_csv, write_jsonl

    df = spark.createDataFrame(
        [("d1", {"a": 1, "b": "x"}, ["u", "v"], [{"kind": "text"}])],
        "doc_id string, meta struct<a:int,b:string>, tags array<string>, spans array<struct<kind:string>>",
    )
    flat = flatten_for_tabular(df)
    assert set(flat.columns) == {"doc_id", "meta_a", "meta_b", "tags", "spans"}
    row = flat.first()
    assert row["meta_a"] == 1 and row["tags"] == "u, v" and "text" in row["spans"]

    write_csv(df, str(tmp_path / "csv"))
    assert spark.read.option("header", True).csv(str(tmp_path / "csv")).count() == 1
    write_jsonl(df.select("doc_id"), str(tmp_path / "jsonl"))
    lines = []
    for fn in os.listdir(tmp_path / "jsonl"):
        if fn.endswith(".json"):
            lines += open(tmp_path / "jsonl" / fn).read().splitlines()
    assert json.loads(lines[0])["doc_id"] == "d1"


def test_documents_stream_sees_crawl_output(spark, small_web, tmp_path):
    from silkworm_spark.plans.engine import CrawlConfig, run_crawl
    from silkworm_spark.schemas import WEB_SCHEMA
    from silkworm_spark.sources.webgen import seeds_df
    from silkworm_spark.streaming import documents_stream, span_texts_stream

    web = spark.createDataFrame(small_web["web"], WEB_SCHEMA)
    seeds = seeds_df(spark, small_web["seeds"])
    eng = run_crawl(spark, web, seeds, None, str(tmp_path / "c"), CrawlConfig(max_rounds=2))
    n_docs = eng.documents().count()

    stream = documents_stream(spark, str(tmp_path / "c"))
    assert stream.isStreaming
    q = (
        span_texts_stream(stream)
        .writeStream.format("memory").queryName("spans_t")
        .option("checkpointLocation", str(tmp_path / "sc"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_docs = spark.sql("select count(distinct doc_id) c from spans_t").first()["c"]
    assert got_docs == spark.createDataFrame(eng.documents().select("doc_id").distinct().collect()).count()
    assert n_docs > 0


def test_package_zip_importable(tmp_path):
    from silkworm_spark.package import build_zip

    out = build_zip("dist")
    assert os.path.exists(out)
    names = zipfile.ZipFile(out).namelist()
    assert "silkworm_spark/__init__.py" in names
    assert "silkworm_spark/plans/engine.py" in names
    assert not any("__pycache__" in n for n in names)
