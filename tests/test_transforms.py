"""Unit tests for the scalar transform family (SURVEY.md §5 item 2) —
tiny literal DataFrames, edge cases from the reference's behavior."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions import (
    transforms as X,
)


def test_p8_multiformat_and_null_fallback(spark):
    df = spark.createDataFrame(
        [
            ("2025-08-01T09:30:00.000000Z",),
            ("2025-08-01T09:30:00.123Z",),
            ("2025-08-15",),
            ("not-a-date",),
            (None,),
        ],
        "raw string",
    )
    out = [r[0] for r in df.select(X.parse_multiformat_ts("raw")).collect()]
    assert out[0] == datetime.datetime(2025, 8, 1, 9, 30)
    assert out[1] == datetime.datetime(2025, 8, 1, 9, 30, 0, 123000)
    assert out[2] == datetime.datetime(2025, 8, 15)
    assert out[3] is None  # warn+NULL, never throws (ANSI-safe)
    assert out[4] is None


def test_p9_tz_convert_is_minus_6_in_2024(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 15, 12, 0, 0),)], "ts timestamp"
    )
    out = df.select(X.to_business_tz("ts")).collect()[0][0]
    assert out == datetime.datetime(2024, 1, 15, 6, 0, 0)


def test_p11_tags_empty_and_absent_to_null(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), ([],), (None,)], "tags array<string>"
    )
    out = [r[0] for r in df.select(X.tags_to_csv("tags")).collect()]
    assert out == ["a,b", None, None]


def test_p12_bool_cast_null_preserving(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    out = [r[0] for r in df.select(X.bool_to_int("b")).collect()]
    assert out == [1, 0, None]


def test_p3_coalescing_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"other": 1}',), (None,)], "props string"
    )
    out = [
        r[0]
        for r in df.select(
            X.coalesce_nested(X.json_get_int("props", "$.k"), F.lit(-1))
        ).collect()
    ]
    assert out == [5, -1, -1]


def test_a4_ratio_zero_denominator_null(spark):
    df = spark.createDataFrame([(1, 0), (4, 2)], "num int, den int")
    out = [r[0] for r in df.select(X.ratio(F.col("num"), F.col("den"))).collect()]
    assert out == [None, 2.0]


def test_luhn_card_redaction(spark):
    """Round-9: redact_cards replaces card-shaped digit runs ONLY when
    the Luhn checksum validates; invalid runs keep their bytes (and
    fall through to the phone pattern in the full redact_pii chain,
    the pre-existing behavior). Known vectors: 4532015112830366 and
    1234567890123452 validate; flipping one digit breaks each."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        luhn_valid,
        redact_cards,
        redact_pii,
    )

    rows = [
        (1, "pay 4532015112830366 now"),
        (2, "order 4532015112830367 shipped"),
        (3, "ref 1234567890123452 ok"),
        (4, "short 123456 long 12345678901234567890"),
        (5, "two 4532015112830366 and 1234567890123452 here"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: (r["lv"], r["rc"], r["rp"])
        for r in df.select(
            "id",
            luhn_valid("t").alias("lv"),
            redact_cards("t").alias("rc"),
            redact_pii("t").alias("rp"),
        ).collect()
    }
    assert got[1][1] == "pay <CARD> now"
    assert got[2][1] == "order 4532015112830367 shipped"
    assert got[2][2] == "order <PHONE> shipped"  # chain fallback intact
    assert got[3][1] == "ref <CARD> ok"
    assert got[4][1] == rows[3][1]  # 6 and 20 digits: not card-shaped
    assert got[5][1] == "two <CARD> and <CARD> here"
    # round-10: the fold replaces at WORD BOUNDARIES only — a valid
    # card that also occurs inside a longer digit run (order id) must
    # not be rewritten mid-token
    emb = spark.createDataFrame(
        [(9, "card 4532015112830366 ref 94532015112830366321")],
        "id int, t string",
    )
    got9 = emb.select(redact_cards("t").alias("rc")).collect()[0]["rc"]
    assert got9 == "card <CARD> ref 94532015112830366321"
    # luhn_valid over the whole string strips non-digits first: row 1
    # has exactly one 16-digit run -> True; row 4 concatenates to 26
    # digits -> False by the 13-19 length gate
    assert got[1][0] is True and got[4][0] is False


def test_mojibake_count_and_repair(spark):
    """Round-10 encoding QA: mojibake_count counts double-encoding
    digraphs + replacement chars; demojibake repairs the enumerated
    digraphs and strips replacement chars — pure replace arithmetic."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        demojibake,
        mojibake_count,
    )

    rows = [
        (1, "clean text"),
        (2, "cafÃ© and â€™quotesâ€œ"),
        (3, "bad � byte �"),
        # the 'à' digraph is 'Ã' + NBSP (U+00C3 U+00A0) — written as
        # escapes because an editor normalizing NBSP→space would
        # silently change the fixture
        (4, "Ã¼ber naÃ±a Ã¶ko \u00c3\u00a0la carte"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: (r["n"], r["fix"])
        for r in df.select(
            "id",
            mojibake_count("t").alias("n"),
            demojibake("t").alias("fix"),
        ).collect()
    }
    assert got[1] == (0, "clean text")
    assert got[2] == (3, "café and ’quotes“")
    assert got[3] == (2, "bad  byte ")
    assert got[4] == (4, "über naña öko àla carte")


def test_demojibake_full_repairs_out_of_map_tail(spark):
    """Round-11 FULL repair: the generic cp1252→UTF-8 round trip fixes
    signatures OUTSIDE the enumerated map (š, €, em dash, double-
    encoded é) on detector-flagged rows, passes clean / CJK / genuine
    accented text through unchanged, and keeps the Python node on the
    flagged branch only."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        demojibake_full,
        repair_mojibake_text,
    )

    # pure function first: out-of-map tail + double encoding + NBSP
    # digraph ('Ã'+NBSP), all written as escapes
    assert repair_mojibake_text("caf\xc3\xa9 \xc5\xa1 \xe2‚\xac") == "café š €"
    assert repair_mojibake_text("\xc3ƒ\xc2\xa9") == "é"  # twice-encoded é
    assert repair_mojibake_text("\xc3\xa0") == "à"  # NBSP digraph
    # identity: ASCII, genuine accents (invalid UTF-8 as cp1252 bytes), CJK
    assert repair_mojibake_text("plain ascii 123") == "plain ascii 123"
    assert repair_mojibake_text("café naïve") == "café naïve"
    assert repair_mojibake_text("中文 text") == "中文 text"

    rows = [
        # flagged (in-map Ã© present) with an out-of-map tail the
        # enumerated chain cannot reach
        (1, "see caf\xc3\xa9 and \xc5\xa1 here"),
        (2, "clean ascii stays put"),
        (3, None),
        # NOT flagged: only out-of-map signatures -> documented
        # detection-scope limit, row passes through unrepaired
        (4, "lonely \xc5\xa1 tail"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = demojibake_full(df, "text")
    got = {r["id"]: r["text"] for r in out.collect()}
    assert got[1] == "see café and š here"
    assert got[2] == "clean ascii stays put"
    assert got[3] is None
    assert got[4] == "lonely \xc5\xa1 tail"
    # the Arrow/pandas node exists exactly once -- on the flagged
    # branch; the clean branch stays JVM-only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_canonical_url_rules(spark):
    """Round-11 URL canonicalization: host/scheme case, default ports,
    fragments, tracking params, and param order collapse; non-default
    ports, path case, and real params are preserved."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        canonical_url,
    )

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&b=2&a=1#frag"),
        (2, "https://www.example.com/Path/To?a=1&b=2"),
        (3, "http://Host.org:80"),          # empty path -> '/'
        (4, "http://host.org/"),
        (5, "https://h.io/p?fbclid=abc&ref=tw"),
        (6, "https://h.io/p"),
        (7, "https://h.io:8443/CaseSensitive/P?z=1&y=2"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_url("url").alias("c")).collect()
    }
    assert got[1] == got[2] == "https://www.example.com/Path/To?a=1&b=2"
    assert got[3] == got[4] == "http://host.org/"
    assert got[5] == got[6] == "https://h.io/p"
    # non-default port + path case preserved; params sorted
    assert got[7] == "https://h.io:8443/CaseSensitive/P?y=2&z=1"
