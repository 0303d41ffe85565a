"""Spark 4 Python DataSource for the reference's NewsAPI fetch protocol.

The reference's producers (producers/newsapi_producer.py:29-63,
producers/gnews_producer.py) run a driver-side HTTP pagination loop and push
each article through Kafka one message at a time. The Spark-native shape for
"a paginated article API" is a DataSource V2: each PAGE is an
InputPartition, so fetching parallelizes across executors, the result is a
DataFrame with the typed ENVELOPE_SCHEMA from the first row, and everything
downstream (validation, dedup, sentiment) is the same single lineage the
batch pipeline uses -- no per-message client loop anywhere.

No network exists in this environment, so the source reads the SAME
response protocol from local fixture page files
(``page-<n>.json`` holding ``{"status": "ok", "totalResults": N,
"articles": [...]}`` -- the exact NewsAPI body shape the reference parses
at newsapi_producer.py:44-52). Swapping the file read for an HTTP GET in
``_load_page`` is the only network-facing change a real deployment needs;
the partition planning, envelope construction, and schema stay identical.

Usage:
    spark.dataSource.register(NewsApiFixtureDataSource)
    df = (spark.read.format("newsapi_fixture")
          .option("path", fixture_dir).option("source_api", "newsapi").load())
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import ENVELOPE_SCHEMA

FORMAT_NAME = "newsapi_fixture"
GNEWS_FORMAT_NAME = "gnews_fixture"

# Both reference producers speak "paginated article API", but the page
# BODIES differ (round-8: GNews promoted to a first-class source twin):
# - NewsAPI (producers/newsapi_producer.py:44-52): {"status": "ok",
#   "totalResults": N, "articles": [...]}; a non-ok status is a hard
#   producer error.
# - GNews (producers/gnews_producer.py:33-37): {"totalArticles": N,
#   "articles": [...]} -- NO status field; the producer's validity check is
#   the presence of the "articles" key ("Invalid response format" error).
# Article-shape differences (image vs urlToImage, source{name,url} vs
# source{id,name}) are absorbed by the union-reconciled ENVELOPE_SCHEMA --
# _page_rows reads both spellings; absent fields stay null.
_PROTOCOLS = {"newsapi": "newsapi", "gnews": "gnews"}


def _check_body(body: dict, protocol: str, path: str) -> None:
    if protocol == "gnews":
        if "articles" not in body:
            raise ValueError(f"page {path}: invalid GNews response format")
    else:
        if body.get("status") != "ok":
            raise ValueError(f"page {path}: status={body.get('status')}")


def write_fixture_pages(path: str, articles: list[dict], page_size: int = 20) -> int:
    """Test/demo helper: serialize `articles` into the NewsAPI page-response
    protocol, one ``page-<n>.json`` per `page_size` articles. Returns the
    page count."""
    os.makedirs(path, exist_ok=True)
    pages = [articles[i : i + page_size] for i in range(0, len(articles), page_size)]
    for n, page in enumerate(pages, start=1):
        body = {"status": "ok", "totalResults": len(articles), "articles": page}
        with open(os.path.join(path, f"page-{n}.json"), "w") as f:
            json.dump(body, f)
    return len(pages)


def write_gnews_fixture_pages(
    path: str, articles: list[dict], page_size: int = 20
) -> int:
    """GNews twin of write_fixture_pages: the body carries totalArticles and
    no status field (producers/gnews_producer.py:33-37's shape)."""
    os.makedirs(path, exist_ok=True)
    pages = [articles[i : i + page_size] for i in range(0, len(articles), page_size)]
    for n, page in enumerate(pages, start=1):
        body = {"totalArticles": len(articles), "articles": page}
        with open(os.path.join(path, f"page-{n}.json"), "w") as f:
            json.dump(body, f)
    return len(pages)


def _parse_ts(v):
    if v is None:
        return None
    return _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00")).replace(
        tzinfo=None
    )


class _PageReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("newsapi_fixture requires .option('path', <dir>)")
        self.source_api = options.get("source_api", "newsapi")

    def partitions(self):
        # one partition per API page -- the unit the reference's loop fetches
        # serially becomes the unit Spark fans out across executors
        pages = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("page-") and f.endswith(".json")
        )
        if not pages:
            raise ValueError(f"no page-*.json fixtures under {self.path}")
        return [InputPartition(os.path.join(self.path, p)) for p in pages]

    def read(self, partition) -> Iterator[tuple]:
        # executor-side: parse ONE page body (the HTTP GET analog) and emit
        # envelope rows -- producers/newsapi_producer.py:59-63's dict build,
        # typed. A page whose "status" is not ok is a hard error, mirroring
        # the producer's response check (newsapi_producer.py:44-46).
        yield from _page_rows(partition.value, self.source_api)


def _page_rows(path: str, source_api: str) -> Iterator[tuple]:
    """Shared page-body -> envelope-row conversion (batch partitions and
    stream micro-batches emit identical rows for identical pages). The
    body validity check follows the source's protocol (_check_body);
    article fields are read under BOTH producers' spellings, mirroring the
    unionByName reconciliation the batch layer does."""
    with open(path) as f:
        body = json.load(f)
    _check_body(body, _PROTOCOLS.get(source_api, "newsapi"), path)
    fetched_at = _dt.datetime(2024, 1, 1)
    for a in body.get("articles", []):
        src = a.get("source") or {}
        yield (
            source_api,
            fetched_at,
            None,
            (
                a.get("title"),
                a.get("description"),
                a.get("content"),
                a.get("url"),
                _parse_ts(a.get("publishedAt")),
                a.get("author"),
                (src.get("id"), src.get("name"), src.get("url")),
                a.get("urlToImage"),
                a.get("image"),
            ),
        )


class _PageStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: pages land in the fixture dir over time (the polled
    NewsAPI cadence, scripts/start_producers.py's 5-minute loop) and each
    micro-batch consumes every page beyond the committed offset. The offset
    is {'pages_done': k} over the SORTED page list, so readBetweenOffsets
    replays any epoch deterministically from the same files -- the
    exactly-once property the engine's MERGE sinks assume upstream."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("newsapi_fixture requires .option('path', <dir>)")
        self.source_api = options.get("source_api", "newsapi")

    def _pages(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.startswith("page-") and f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"pages_done": 0}

    def read(self, start: dict):
        pages = self._pages()
        k = int(start["pages_done"])
        new = pages[k:]
        end = {"pages_done": k + len(new)}
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator (datasource_internal.py), and
        # generators are not copyable -- a list iterator is
        rows = [r for p in new for r in _page_rows(p, self.source_api)]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        pages = self._pages()[int(start["pages_done"]) : int(end["pages_done"])]
        for p in pages:
            yield from _page_rows(p, self.source_api)


class NewsApiFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PageReader(self.options, schema)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _PageStreamReader(self.options)


class GnewsFixtureDataSource(DataSource):
    """GNews twin (producers/gnews_producer.py:17-46): same page-per
    -partition planning and envelope rows, GNews body protocol (no status
    field; articles-key presence is the validity check) and article shape
    (image / source{name,url}) -- the remaining differences the batch
    layer's unionByName used to absorb are handled at the source, so BOTH
    reference producers are first-class Spark sources."""

    @classmethod
    def name(cls) -> str:
        return GNEWS_FORMAT_NAME

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        opts = dict(self.options)
        opts.setdefault("source_api", "gnews")
        return _PageReader(opts, schema)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        opts = dict(self.options)
        opts.setdefault("source_api", "gnews")
        return _PageStreamReader(opts)
