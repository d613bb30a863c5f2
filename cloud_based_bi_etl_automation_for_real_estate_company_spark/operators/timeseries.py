"""Timeseries downsampling — the hypertable/continuous-aggregate
rollup class of operator (TimescaleDB-style OHLC bars), re-expressed
as one Spark tumbling-window hash aggregation.

Design for 100 TB: a single groupBy (key, window) — ONE shuffle with
map-side partial aggregation on a uniform composite key. Open/close
are min/max over a (ts, seq, value) struct (lexicographic struct
ordering = earliest/latest row, seq breaking ts ties), so they merge
associatively like any other partial aggregate — no window function,
no per-key sort, no second pass. Volume accumulates in DECIMAL
(functions.transforms.dsum) so a 1000-partition parallel sum equals
the single-threaded oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.transforms import dsum


def ohlc_downsample(
    df: DataFrame,
    bucket: str = "5 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """Downsample an event stream into per-key OHLC bars per tumbling
    ``bucket``: open/close = value at the earliest/latest event in the
    bucket (ties on ``ts`` broken by ``seq_col``), high/low = extrema,
    plus event count and decimal-exact volume.

    Returns (key_col, bucket_start, open_val, high_val, low_val,
    close_val, n_events, volume).
    """
    edge = F.struct(F.col(ts_col), F.col(seq_col), F.col(val_col))
    return (
        df.groupBy(F.col(key_col), F.window(F.col(ts_col), bucket).alias("__w"))
        .agg(
            F.min(edge).getField(val_col).alias("open_val"),
            F.max(F.col(val_col)).alias("high_val"),
            F.min(F.col(val_col)).alias("low_val"),
            F.max(edge).getField(val_col).alias("close_val"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(val_col, 6).alias("volume"),
        )
        .select(
            key_col,
            F.col("__w.start").alias("bucket_start"),
            "open_val",
            "high_val",
            "low_val",
            "close_val",
            "n_events",
            "volume",
        )
    )
