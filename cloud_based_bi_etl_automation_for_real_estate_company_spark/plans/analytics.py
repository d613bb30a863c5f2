"""Additional analytic query shapes rounding out the measure library:
pivoted funnel (the dashboard's month × stage matrix), exact
percentile measures, and the composite training-data quality-filter
pipeline. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from .measures import t

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_a17_pivot_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted month × event-type counts — the wide dashboard matrix
    (A1 × A10). Explicit pivot values keep the plan a single pass
    (no extra distinct-values job) and the schema static for the
    oracle."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.trunc("ts", "month").alias("month_start"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "month_start",
            *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in EVENT_TYPES],
        )
    )


def q_a18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per status
    (median ticket / p90 — the DAX MEDIAN/PERCENTILE.INC measures)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_amount"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_amount"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_x_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data quality gate: keep documents with
    reasonable length, token count, mean token length and stopword
    presence; report retention per language. The filter is pure
    column arithmetic — it fuses into the scan, no extra pass."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.avg_token_len("text").alias("atl"),
        T.stopword_ratio("text").alias("swr"),
    )
    kept = scored.filter(
        (F.col("n_chars") >= 50)
        & (F.col("n_tokens") >= 10)
        & (F.col("atl") >= 2.0)
        & (F.col("atl") <= 12.0)
        & (F.col("swr") >= 0.01)
    )
    per_lang = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept_lang = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        per_lang.join(kept_lang, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.try_divide(F.coalesce(F.col("n_kept"), F.lit(0)), F.col("n_total")).alias(
                "retention"
            ),
        )
    )


_SW = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

ORACLES: dict[str, str] = {
    "a17_pivot_funnel": """
        SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month_start,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY 1
    """,
    "a18_percentiles": """
        SELECT o_orderstatus AS status,
               quantile_cont(o_totalprice, 0.5) AS p50_amount,
               quantile_cont(o_totalprice, 0.9) AS p90_amount,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "x_quality_filter": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   CASE WHEN len(string_split(trim(text), ' ')) = 0 THEN NULL
                        ELSE CAST(length(trim(text))
                                  - (len(string_split(trim(text), ' ')) - 1) AS DOUBLE)
                             / len(string_split(trim(text), ' '))
                   END AS atl,
                   CASE WHEN len(string_split(trim(text), ' ')) = 0 THEN NULL
                        ELSE CAST(len(list_filter(string_split(trim(text), ' '),
                                                  x -> x IN ({_SW}))) AS DOUBLE)
                             / len(string_split(trim(text), ' '))
                   END AS swr
            FROM documents),
        kept AS (
            SELECT lang, COUNT(*) AS n_kept FROM scored
            WHERE n_chars >= 50 AND n_tokens >= 10
              AND atl >= 2.0 AND atl <= 12.0 AND swr >= 0.01
            GROUP BY lang),
        total AS (SELECT lang, COUNT(*) AS n_total FROM scored GROUP BY lang)
        SELECT t.lang, t.n_total,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / t.n_total AS retention
        FROM total t LEFT JOIN kept k USING (lang)
    """,
}

QUERIES = {
    "a17_pivot_funnel": q_a17_pivot_funnel,
    "a18_percentiles": q_a18_percentiles,
    "x_quality_filter": q_x_quality_filter,
}
