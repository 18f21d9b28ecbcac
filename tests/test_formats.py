"""Source-format breadth: the engine's frames round-trip through ORC and
JSON-lines losslessly (the two interchange formats a reference user is
most likely to bring besides CSV/parquet, both built into Spark), and the
ORC scan keeps predicate pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in
                  df.select("doc_id", "text", "lang", "source", "n_chars")
                  .collect())


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    assert _rows(back) == _rows(docs)
    plan = back.filter(F.col("n_chars") > 300)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode
                       .fromString("formatted"))
    assert "GreaterThan(n_chars,300)" in plan  # reaches the ORC scan


def test_jsonlines_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    docs.write.json(path)
    # schema-stable read: types come from the parquet schema, not inference
    back = spark.read.schema(docs.schema).json(path)
    assert _rows(back) == _rows(docs)
