"""JSONL / CSV round-trips: write the documents table out in each format,
read it back with a declared schema, and require exact row equality --
including text with embedded commas, quotes, and newlines for CSV."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from sentiment_analysis_data_pipeline_spark.sources import files

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    files.write_jsonl(docs, path)
    back = files.read_jsonl(spark, path, DOC_SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_csv_roundtrip_with_hostile_text(spark, tmp_path):
    rows = [
        (1, 'comma, "quoted", done', "en", "s1", 21),
        (2, "line one\nline two", "en", "s2", 17),
        (3, None, "de", "s3", 0),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    path = str(tmp_path / "docs_csv")
    files.write_csv(df, path)
    back = files.read_csv(spark, path, DOC_SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_jsonl_corrupt_line_tolerated(spark, tmp_path):
    good = '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}'
    bad = "{this is not json"
    p = tmp_path / "mixed.jsonl"
    p.write_text(good + "\n" + bad + "\n")
    back = files.read_jsonl(spark, str(p), DOC_SCHEMA)
    rows = [r for r in back.collect() if r["doc_id"] is not None]
    assert len(rows) == 1 and rows[0]["text"] == "ok"


def test_orc_round_trip_with_pushdown(spark):
    from sentiment_analysis_data_pipeline_spark.sources.files import read_orc, write_orc

    root = Path(tempfile.mkdtemp(prefix="orc-"))
    try:
        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        write_orc(src, str(root / "o"))
        back = read_orc(spark, str(root / "o"))
        assert back.count() == src.count()
        assert [f.name for f in back.schema.fields] == [f.name for f in src.schema.fields]
        # predicate reaches the ORC scan like parquet
        q = back.where("o_orderstatus = 'F'").select("o_orderkey")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "o_orderstatus" in plan
        n_f = src.where("o_orderstatus = 'F'").count()
        assert q.count() == n_f
    finally:
        shutil.rmtree(root, ignore_errors=True)
