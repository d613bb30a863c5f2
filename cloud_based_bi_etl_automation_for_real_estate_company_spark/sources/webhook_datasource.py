"""S5 push receiver as a first-class Spark 4 Python STREAMING
DataSource — the pull-based dual of the reference's Flask POST
endpoint (reference webhook_app.py:152–164): the receiver edge
enqueues raw POST bodies, and this source drains the queue into
micro-batches with replayable offsets, which is exactly the
Kafka-shaped contract a production webhook edge feeds.

`spark.dataSource.register(WebhookPushDataSource)` then

    spark.readStream.format("webhook_push")
         .option("events_per_batch", 50)
         .option("max_events", 200)
         .load()                       # → (offset bigint, body string)

Offsets are a monotone sequence number; ``read`` advances the offset
and ``readBetweenOffsets`` replays any committed range
deterministically, giving exactly-once-capable recovery semantics
(the engine re-reads uncommitted ranges after a crash). The queue
here is a deterministic synthetic generator (no network in this
container); a production subclass overrides ``_body`` to pop a real
durable queue. Parse the bodies with ``parse_push_bodies`` — the
same permissive envelope parse as the file route — and everything
downstream (whitelist, unwrap, route, dedup, sink) is the shared
silver path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import ALLOWED_ACCOUNTS, HANDLED_EVENTS, WEBHOOK_ENVELOPE_SCHEMA
from .webhook import CORRUPT_COL

_STEPS = ("Referidos", "Ingresados", "Autorizados", "Rechazados", "Firmados")


def synthetic_body(i: int) -> str:
    """Deterministic webhook POST body for sequence number ``i`` —
    same envelope shape the reference receives (webhook_app.py:161)."""
    stamp = f"2025-01-01T00:{(i // 60) % 60:02d}:{i % 60:02d}.000000Z"
    data = {
        "id": i % 500,
        "title": f"Lead {i % 500}",
        "step": _STEPS[(i * 31) % len(_STEPS)],
        "amount": ((i * 7919) % 1000000) / 100.0,
        "created_at": stamp,
        "updated_at": stamp,
        "user": {"email": f"agent{i % 25}@example.com"},
        "client_folder": {"id": i % 200, "name": f"folder-{i % 200}"},
        "tags": ["synthetic", "hot" if i % 2 == 0 else "cold"],
    }
    envelope = {
        "id": i,
        "event": HANDLED_EVENTS[(i * 17) % len(HANDLED_EVENTS)],
        "signature": f"sig-{i}",
        "has_succeeded": True,
        "try_count": 1,
        "last_returned_code": 200,
        "data": data,
    }
    return json.dumps(
        {"webhook_event": envelope, "account": ALLOWED_ACCOUNTS[i % len(ALLOWED_ACCOUNTS)]}
    )


class WebhookPushStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.per_batch = int(options.get("events_per_batch", "50"))
        self.max_events = int(options.get("max_events", "200"))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a LIST, not a generator: the engine pickles the prefetched
        # rows into its offset log for replay
        return [(i, synthetic_body(i)) for i in range(start, end)]

    def read(self, start: dict):
        s = start["seq"]
        e = min(s + self.per_batch, self.max_events)
        return self._rows(s, e), {"seq": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        # deterministic replay of a committed range — crash recovery
        return self._rows(start["seq"], end["seq"])

    def commit(self, end: dict) -> None:
        # synthetic queue needs no ack; a real one would delete ≤ end
        pass


class WebhookPushDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webhook_push"

    def schema(self) -> str:
        return "offset bigint, body string"

    def simpleStreamReader(self, schema: StructType) -> WebhookPushStreamReader:
        return WebhookPushStreamReader(self.options)


def parse_push_bodies(raw: DataFrame) -> DataFrame:
    """Parse (offset, body) push rows through the SAME permissive
    envelope schema as the file route (``read_webhook_json``) —
    malformed bodies land in the corrupt-record column, never dropped."""
    schema = StructType(
        list(WEBHOOK_ENVELOPE_SCHEMA.fields)
        + [StructField("account", StringType()), StructField(CORRUPT_COL, StringType())]
    )
    return raw.select(
        F.from_json(
            "body",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    ).select("r.*")


def push_webhook_source(
    spark: SparkSession, events_per_batch: int = 50, max_events: int = 200
) -> DataFrame:
    """Streaming DataFrame of parsed webhook envelopes from the push
    DataSource — feed to ``streaming.pipeline.stream_silver(raw=...)``
    exactly like the rate-source adapter."""
    spark.dataSource.register(WebhookPushDataSource)
    raw = (
        spark.readStream.format("webhook_push")
        .option("events_per_batch", events_per_batch)
        .option("max_events", max_events)
        .load()
    )
    return parse_push_bodies(raw)
