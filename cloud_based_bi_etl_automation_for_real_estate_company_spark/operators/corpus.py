"""Corpus-level analytics for the training-data-pipeline extension:
TF-IDF term weighting and cross-source shingle-overlap (contamination
between corpus slices).

Design for 100 TB:

- **tfidf_by_group**: two aggregations over the exploded token stream
  (term frequency per group, document frequency per term), both with
  map-side partial aggregation on uniform hash keys; the corpus size
  N is a 1-row broadcast scalar, never a driver collect. Vocabulary
  joins are term-keyed — high-cardinality and uniform, so no skew.
- **source_overlap**: the pairwise Jaccard matrix between corpus
  slices, computed from the *distinct* (group, shingle) set. The
  self-join key is the shingle (high cardinality); per-group sizes
  are a tiny aggregate joined broadcast-style. Output is O(groups²),
  input shuffle is O(distinct shingles) — no doc×doc blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def tfidf_by_group(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Term weights per corpus slice: for every (group, term),
    tf = term occurrences in the group's documents, doc_freq = number
    of distinct documents (corpus-wide) containing the term, and
    tfidf = tf · ln(N / doc_freq) with N the corpus document count.

    Returns (group_col, term, tf, doc_freq, tfidf). Natural-log IDF,
    no smoothing — replayable exactly in ANSI SQL for the oracle.
    """
    tok = df.select(
        F.col(id_col), F.col(group_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = tok.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = (
        tok.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(doc_freq, "term")
        .join(F.broadcast(n_docs))
        .select(
            group_col,
            "term",
            "tf",
            "doc_freq",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq"))
            ).alias("tfidf"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_k: int = 3,
) -> DataFrame:
    """Pairwise shingle-set Jaccard between corpus slices — the
    standard check for leakage/duplication *across* sources before
    mixing them into a training set.

    Returns (source_a, source_b, n_common, jaccard) for every slice
    pair sharing at least one word-k-gram, with source_a < source_b.
    Zero-overlap pairs are absent by construction (inner join).
    """
    sh = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("sh"),
        )
        .distinct()
    )
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("source_a"), F.col("b.g").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(F.broadcast(sizes).withColumnRenamed("g", "source_a"), "source_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(F.broadcast(sizes).withColumnRenamed("g", "source_b"), "source_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
