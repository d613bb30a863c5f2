"""S1 as a first-class Spark 4 Python DataSource — the "real
connector" form of the paginated REST backfill
(reference Lead_Ingestion_CRM_SQLite.py:48–66): plan offset ranges as
input partitions, fetch pages inside executors, expose filter-ready
rows to Catalyst like any other source.

`spark.dataSource.register(PagedApiDataSource)` then

    spark.read.format("paged_api")
         .option("total", 257).option("page_size", 50)
         .option("min_id", 100)                  # S2 pushed predicate
         .load()

The fetch here is a deterministic synthetic API (this container has no
network); a production subclass overrides ``_fetch_page`` with an HTTP
client + retry/backoff (S4) and politeness throttle (S3). The planning
logic — the part that matters — is identical either way: one
InputPartition per page range, so a 2,000-page backfill fans out
across the cluster instead of looping in the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page


class PagedApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.total = int(options.get("total", "0"))
        self.page_size = int(options.get("page_size", "100"))
        self.pages_per_task = int(options.get("pages_per_task", "10"))
        self.min_id = int(options.get("min_id", "0"))

    def partitions(self) -> Sequence[InputPartition]:
        n_pages = max(1, -(-self.total // self.page_size))
        return [
            _PageRange(p, min(p + self.pages_per_task, n_pages))
            for p in range(0, n_pages, self.pages_per_task)
        ]

    def _fetch_page(self, limit: int, offset: int) -> list[tuple]:
        """Synthetic deterministic API (production: HTTP GET with
        limit/offset params, retries, and a token-bucket throttle)."""
        return [
            (i, f"lead-{i}")
            for i in range(offset, min(offset + limit, self.total))
            if i >= self.min_id
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            offset = page * self.page_size
            if offset >= self.total:
                # past the end of the dataset — NOT the same as a page
                # whose rows were all filtered out server-side
                break
            yield from self._fetch_page(self.page_size, offset)


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "id bigint, name string"

    def reader(self, schema: StructType) -> PagedApiReader:
        return PagedApiReader(schema, self.options)
