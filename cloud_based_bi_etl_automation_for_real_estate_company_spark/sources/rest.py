"""S1–S4 — paginated REST batch source, distributed.

The reference backfills by looping GET ?limit=100&offset=N in the
driver process, sleeping 0.2 s between pages and accumulating
everything in memory (reference Lead_Ingestion_CRM_SQLite.py:45–66).
That caps ingest at ~500 leads/s and one machine's RAM.

The Spark-native shape: plan the offset ranges up front, distribute
page fetches across executors with ``mapInPandas`` (one task fetches a
contiguous page range, politeness-sleeping locally — S3), and return a
DataFrame parsed against the declared schema. The fetch function is
injected so tests (and this container, which has no network) run
against a synthetic page server; a real deployment passes a
requests-based fetcher with retry/backoff (S4).

Date-range predicates (S2, Lead_Ingestion_CRM_SQLite.py:41–43) are
passed to the fetcher — source-side pushdown, same as the reference
sending start_date/end_date to the API.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# A fetcher takes (limit, offset, params) and returns a list of JSON
# records (dicts); empty list ⇒ past the last page.
Fetcher = Callable[[int, int, dict], list[dict]]

PAGE_SIZE = 100  # reference LIMIT, Lead_Ingestion_CRM_SQLite.py:15
SLEEP_S = 0.0  # reference politeness 0.2s, Lead_Ingestion_CRM_SQLite.py:66


def with_retries(
    fetcher: Fetcher,
    max_tries: int = 3,
    backoff_s: float = 0.5,
    sleep=time.sleep,
) -> Fetcher:
    """S4 — wrap a fetcher with bounded retry + exponential backoff.

    The reference stops the whole backfill on the first non-200
    (Lead_Ingestion_CRM_SQLite.py:57–59); here a page gets
    ``max_tries`` attempts and then the exception propagates, failing
    only that Spark task — which Spark itself retries on another
    executor before failing the job. ``sleep`` is injectable for
    deterministic tests.
    """

    def wrapped(limit: int, offset: int, params: dict) -> list[dict]:
        last: Exception | None = None
        for attempt in range(max_tries):
            try:
                return fetcher(limit, offset, params)
            except Exception as e:  # noqa: BLE001 — fetchers raise transport errors
                last = e
                if attempt < max_tries - 1:
                    sleep(backoff_s * (2**attempt))
        raise last  # type: ignore[misc]

    return wrapped


def fetch_paginated(
    spark: SparkSession,
    fetcher: Fetcher,
    schema: StructType,
    total_hint: int,
    page_size: int = PAGE_SIZE,
    pages_per_task: int = 10,
    params: dict | None = None,
    sleep_s: float = SLEEP_S,
) -> DataFrame:
    """Distributed paginated fetch: offset ranges are planned from
    ``total_hint`` (an upper bound — a cheap COUNT endpoint or quota
    math), fanned out one range per task, fetched with local
    politeness sleep, and parsed via from_json against ``schema``.

    Overshooting total_hint is safe (empty pages yield no rows).
    """
    params = params or {}
    n_pages = max(1, -(-total_hint // page_size))
    n_tasks = max(1, -(-n_pages // pages_per_task))
    params_json = json.dumps(params)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = json.loads(params_json)
        for pdf in batches:
            for task_id in pdf["id"]:
                rows: list[str] = []
                for page in range(pages_per_task):
                    offset = (int(task_id) * pages_per_task + page) * page_size
                    if offset >= total_hint:
                        break
                    recs = fetcher(page_size, offset, p)
                    if not recs:
                        break
                    rows.extend(json.dumps(r) for r in recs)
                    if sleep_s:
                        time.sleep(sleep_s)
                yield pd.DataFrame({"raw": rows})

    raw = spark.range(n_tasks).mapInPandas(run, "raw string")
    parsed = raw.select(F.from_json("raw", schema).alias("rec")).select("rec.*")
    return parsed
