"""Oracle-checked queries for the scalar transform operators
(SURVEY.md §2.2 P3/P8/P9/P10/P11/P12/P14) — each builds reference-shaped
input from the fixtures, applies the Column helper from
functions.transforms, and has a DuckDB oracle replaying the semantics.

P9 timezone note: America/Mexico_City abolished DST in 2022 and the
events fixture spans 2024-01, so UTC−6 is exact for the whole data
window; the oracle uses interval arithmetic because DuckDB's session
timezone is not under our control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import transforms as X
from .measures import t


def q_p3_coalesce_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P1 — null-safe JSON extraction with coalescing fallback
    (webhook_app.py:23–32 `_get_client_folder`): props.k, else
    props.missing, else −1."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        X.coalesce_nested(
            X.json_get_int("props", "$.k"),
            X.json_get_int("props", "$.missing"),
            F.lit(-1),
        ).alias("k_value"),
    )


def q_p8_multiformat_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — multi-format timestamp parse with NULL fallback
    (Lead_Ingestion_CRM_SQLite.py:20–33). Orders dates are re-formatted
    ISO-with-micros / bare-date / garbage by orderkey mod 3, then parsed
    back through the fallback chain; garbage → NULL, never throws."""
    o = t(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        )
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.lit("not-a-date"))
        .alias("raw_ts"),
    )
    return raw.select("o_orderkey", X.parse_multiformat_ts("raw_ts").alias("parsed_ts"))


def q_p9_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — UTC → business timezone (Lead_Ingestion_CRM_SQLite.py:35–38)."""
    ev = t(spark, sf_dir, "events")
    return ev.select("event_id", X.to_business_tz("ts").alias("local_ts"))


def q_p10_format_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — presentation-edge formatting (Lead_Ingestion_CRM_SQLite.py:38)."""
    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", X.format_local("o_orderdate").alias("created_at_str"))


def q_p11_tags_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — array → CSV with empty → NULL
    (Lead_Ingestion_CRM_SQLite.py:110): p_name split to a tag array,
    emptied for every 7th part to exercise the NULL branch."""
    p = t(spark, sf_dir, "part")
    tagged = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 7 == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.col("p_name"), " "))
        .alias("tags"),
    )
    return tagged.select("p_partkey", X.tags_to_csv("tags").alias("tags_csv"))


def q_p12_bool_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — null-preserving bool→int (Lead_Ingestion_CRM_SQLite.py:121):
    starred = (status='F'), NULL for every 11th order."""
    o = t(spark, sf_dir, "orders")
    starred = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("o_orderstatus") == "F")
        .alias("starred"),
    )
    return starred.select("o_orderkey", X.bool_to_int("starred").alias("starred_int"))


def q_p14_reserialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — raw-payload retention: rebuild a raw_data JSON envelope
    (webhook_app.py:61: json.dumps of meta + data)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_id"), F.col("event_type"), F.col("user_id"))
        ).alias("raw_data"),
    )


def q_p17_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML tag stripping — the reference stores both description and
    html_description (Lead_Ingestion_CRM_SQLite.py:93–94); deriving
    clean text from the HTML variant is the P-family transform a text
    pipeline needs. Input HTML is synthesized around p_name."""
    p = t(spark, sf_dir, "part")
    html = F.concat(
        F.lit("<p><b>"), F.col("p_name"), F.lit("</b> &amp; more</p>")
    )
    return p.select(
        "p_partkey",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(html, "<[^>]*>", ""), "&amp;", "&"
            )
        ).alias("clean_text"),
    )


def q_p20_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide measure columns to long (measure, val) rows
    (`DataFrame.unpivot`, the inverse of the A17 pivot; map-side only,
    output = rows × measures). Filtered to a deterministic order
    subset to keep the gate comparison small."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


ORACLES: dict[str, str] = {
    "p20_unpivot": """
        SELECT l_orderkey, l_linenumber, measure, val
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem WHERE l_orderkey % 97 = 0)
        UNPIVOT (val FOR measure IN
                 (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
    "p17_html_strip": """
        SELECT p_partkey,
               trim(replace(regexp_replace('<p><b>' || p_name || '</b> &amp; more</p>',
                                           '<[^>]*>', '', 'g'),
                            '&amp;', '&')) AS clean_text
        FROM part
    """,
    "p3_coalesce_extract": """
        SELECT event_id,
               COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INT),
                        TRY_CAST(json_extract_string(props, '$.missing') AS INT),
                        -1) AS k_value
        FROM events
    """,
    "p8_multiformat_ts": """
        WITH raw AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%fZ')
                        WHEN o_orderkey % 3 = 1
                        THEN strftime(o_orderdate, '%Y-%m-%d')
                        ELSE 'not-a-date' END AS raw_ts
            FROM orders)
        SELECT o_orderkey,
               COALESCE(TRY_CAST(try_strptime(raw_ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS TIMESTAMP),
                        TRY_CAST(try_strptime(raw_ts, '%Y-%m-%d') AS TIMESTAMP)) AS parsed_ts
        FROM raw
    """,
    "p9_tz_convert": """
        SELECT event_id,
               CAST(ts AS TIMESTAMP) - INTERVAL 6 HOUR AS local_ts
        FROM events
    """,
    "p10_format_local": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS created_at_str
        FROM orders
    """,
    "p11_tags_csv": """
        SELECT p_partkey,
               CASE WHEN p_partkey % 7 = 0 THEN NULL
                    ELSE replace(p_name, ' ', ',') END AS tags_csv
        FROM part
    """,
    "p12_bool_cast": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL
                    ELSE CAST(o_orderstatus = 'F' AS INT) END AS starred_int
        FROM orders
    """,
    "p14_reserialize": """
        SELECT event_id,
               '{"event_id":' || event_id
               || ',"event_type":"' || event_type
               || '","user_id":' || user_id || '}' AS raw_data
        FROM events
    """,
}

QUERIES = {
    "p3_coalesce_extract": q_p3_coalesce_extract,
    "p8_multiformat_ts": q_p8_multiformat_ts,
    "p9_tz_convert": q_p9_tz_convert,
    "p10_format_local": q_p10_format_local,
    "p11_tags_csv": q_p11_tags_csv,
    "p12_bool_cast": q_p12_bool_cast,
    "p14_reserialize": q_p14_reserialize,
    "p17_html_strip": q_p17_html_strip,
    "p20_unpivot": q_p20_unpivot,
}
