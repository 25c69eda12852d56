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
