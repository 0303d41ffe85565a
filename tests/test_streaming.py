"""Structured Streaming ingest tests: file-source envelopes, availableNow
drain, idempotent MERGE sink (exactly-once landing + URL dedup -- the
streaming semantics T1-T5 from SURVEY.md §2.10)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest

from sentiment_analysis_data_pipeline_spark.streaming import run_file_ingest


def _envelope(i: int, url: str | None = None, corrupt: bool = False) -> str:
    if corrupt:
        return '{"not": "an envelope"}'
    return json.dumps(
        {
            "source_api": "newsapi" if i % 2 == 0 else "gnews",
            "fetched_at": f"2024-01-01T0{i % 10}:00:00.000Z",
            "article": {
                "title": f"title {i}",
                "url": url or f"https://example.com/{i}",
                "publishedAt": "2024-01-01T00:00:00.000Z",
            },
        }
    )


@pytest.fixture()
def dirs():
    root = Path(tempfile.mkdtemp(prefix="ingest-test-"))
    (root / "src").mkdir()
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _drop(root: Path, name: str, lines: list[str]) -> None:
    (root / "src" / name).write_text("\n".join(lines) + "\n")


def test_ingest_dedup_and_exactly_once(spark, dirs):
    src, sink, ckpt = dirs / "src", str(dirs / "sink"), str(dirs / "ckpt")

    # epoch 1: 4 valid (one duplicate URL inside the batch) + 1 corrupt
    _drop(dirs, "a.json", [_envelope(0), _envelope(1), _envelope(1), _envelope(2), _envelope(0, corrupt=True)])
    run_file_ingest(spark, str(src), sink, ckpt).awaitTermination(120)
    landed = spark.read.parquet(sink)
    assert landed.count() == 3  # intra-batch URL dedup + corrupt dropped
    assert set(landed.select("url").toPandas()["url"]) == {
        "https://example.com/0", "https://example.com/1", "https://example.com/2"
    }

    # epoch 2: re-delivery of url 1 (cross-history dup) + one new article
    _drop(dirs, "b.json", [_envelope(1), _envelope(3)])
    run_file_ingest(spark, str(src), sink, ckpt).awaitTermination(120)
    landed = spark.read.parquet(sink)
    assert landed.count() == 4  # url 1 NOT landed twice
    assert landed.select("url").distinct().count() == 4

    # restart with same checkpoint and no new data: nothing re-lands
    run_file_ingest(spark, str(src), sink, ckpt).awaitTermination(120)
    assert spark.read.parquet(sink).count() == 4


def test_envelope_typing(spark, dirs):
    src, sink, ckpt = dirs / "src", str(dirs / "sink"), str(dirs / "ckpt")
    _drop(dirs, "a.json", [_envelope(7)])
    run_file_ingest(spark, str(src), sink, ckpt).awaitTermination(120)
    row = spark.read.parquet(sink).collect()[0]
    assert row["source_api"] in ("newsapi", "gnews")
    assert row["article"]["title"] == "title 7"
    assert row["fetched_at"] is not None  # parsed to a real timestamp
