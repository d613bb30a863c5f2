"""Shared fixtures: one session-scoped SparkSession and a deterministic
CRM-shaped webhook JSON corpus (FIXTURES.md §3)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _lead(i: int, step: str = "Firmados", **over):
    lead = {
        "id": i,
        "title": f"Lead {i}",
        "pipeline": "Ventas",
        "step": step,
        "step_id": 5,
        "status": "won",
        "amount": 1000.0 * (i + 1),
        "probability": 0.8,
        "currency": "MXN",
        "starred": i % 2 == 0,
        "created_at": "2025-08-01T09:30:00.000000Z",
        "updated_at": "2025-09-30T18:00:00.000000Z",
        "tags": ["vip", "referral"],
        "attachment_count": 0,
        "created_by_id": 10,
        "user_id": 10 + i,
        "user": {"email": f"agent{i}@x.com"},
        "permalink": f"https://crm/lead/{i}",
        "client_folder": {"id": 7, "name": "Folder A"},
        "client": {"id": 7, "name": "Folder A"},
        "team_id": 1,
        "team_name": "office_a",
    }
    lead.update(over)
    return lead


def _event(eid: int, account: str, event: str, data: dict):
    return {
        "account": account,
        "webhook_event": {
            "id": eid,
            "event": event,
            "signature": "sig",
            "has_succeeded": True,
            "try_count": 1,
            "last_returned_code": 200,
            "data": data,
        },
    }


@pytest.fixture(scope="session")
def webhook_corpus(tmp_path_factory):
    """Deterministic webhook JSONL: 3 accounts × 4 event types, plus an
    unhandled event, a non-whitelisted account, duplicate ids,
    out-of-order arrival, edge-case payloads (FIXTURES.md §3 edge list).
    Returns (path, expected) where expected has hand-computed goldens.
    """
    d = tmp_path_factory.mktemp("webhooks")
    lines = []
    eid = 1000
    accounts = ("office_a", "office_b", "office_c")
    events = (
        "lead.step.changed",
        "lead.creation",
        "lead.deleted",
        "client_folder.created",
    )
    for ai, acc in enumerate(accounts):
        for ev in events:
            for k in range(3):
                lines.append(_event(eid, acc, ev, _lead(eid % 100, step="Firmados")))
                eid += 1
    # duplicate delivery of an existing id (retry) — must dedup
    dup = _event(1000, "office_a", "lead.step.changed", _lead(0))
    lines.append(dup)
    lines.append(dup)
    # unhandled event type — routed to _unhandled, kept out of silver tables
    lines.append(_event(eid, "office_a", "lead.note.created", _lead(1)))
    eid += 1
    # non-whitelisted account — dropped by P5
    lines.append(_event(eid, "office_evil", "lead.creation", _lead(2)))
    eid += 1
    # edge payloads: empty tags, bare-date created_at, unparseable
    # updated_at, missing user, client instead of client_folder
    lines.append(
        _event(
            eid,
            "office_b",
            "lead.creation",
            _lead(
                3,
                tags=[],
                created_at="2025-08-15",
                updated_at="never",
                user=None,
                client_folder=None,
                client={"id": 42, "name": "Fallback"},
            ),
        )
    )
    eid += 1
    # corrupt line — must land in quarantine, not crash
    path = d / "events.jsonl"
    with open(path, "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
        f.write("{this is not json\n")
    # return the directory: the streaming file source requires a dir,
    # and the batch reader accepts one equally
    path = d
    expected = {
        # 36 grid events + 1 edge event are valid & unique; the two
        # duplicate deliveries of id 1000 collapse into the original;
        # unhandled event id is valid (dedup counts it) but routed away.
        "n_valid_unique": 36 + 1 + 1,  # incl. unhandled type, excl. evil account
        "n_quarantined": 1,
        "n_step_changed": 9,
        "n_unhandled": 1,
    }
    return str(path), expected
