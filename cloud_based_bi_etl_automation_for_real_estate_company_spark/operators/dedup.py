"""Deduplication operators for the training-data-pipeline extension:
exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup.

Design for 100 TB:

- **exact**: md5(content) → hash-groupBy. One shuffle on the digest
  (uniform by construction — no skew), map-side partial agg.
- **minhash_lsh**: per-doc signature of K md5-min-hashes → banded into
  B band-keys → candidate pairs only join within a band bucket. The
  cross-join never happens; the shuffle key is the band hash. md5 is
  used as the hash family so the DuckDB oracle can replay it exactly.
- **simhash**: 16-bit simhash from per-token md5 bits; near-dups =
  bucket collisions. Bit-twiddling via conv(); no UDFs.
- **ngram_jaccard**: exact Jaccard over word-k-gram shingles via
  explode + self-equi-join on the shingle — the verification baseline
  for the sketch methods. Quadratic only within identical-shingle
  groups, so still shuffle-bounded, but the sketches are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one surviving (min-id) row per distinct content
    digest, with the duplicate count. Returns (keep_id, content_hash,
    n_copies)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: hash_i = min over shingles of
    md5(i || '|' || shingle). String-min over hex digests is a valid
    uniform min-hash and is replayable in ANSI SQL (the oracle).
    Output: (id_col, mh_0..mh_{K-1}).
    """
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: signature split into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band key are candidates.
    Join happens per-band-bucket — never all-pairs. Returns distinct
    (id_a, id_b) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("key"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-token md5 → first ``bits`` bits; the
    fingerprint's bit b is 1 iff more tokens have bit b set than not.
    Expressed with higher-order array functions (no UDF): per doc,
    sum (+1/-1) votes per bit over tokens, then reassemble.
    Output: (id_col, simhash bigint).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    # token → integer whose low `bits` bits come from md5 hex prefix
    hx = F.conv(F.substring(F.md5(F.col("tok")), 1, bits // 4), 16, 10).cast("bigint")
    votes = tok.select(
        F.col(id_col),
        *[
            F.when(F.shiftright(hx, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"v_{i}")
            for i in range(bits)
        ],
    )
    summed = votes.groupBy(id_col).agg(
        *[F.sum(f"v_{i}").alias(f"s_{i}") for i in range(bits)]
    )
    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        fp = fp + F.when(F.col(f"s_{i}") > 0, F.lit(2 ** i).cast("bigint")).otherwise(F.lit(0))
    return summed.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct shingles,
    self-equi-join on the shingle, |A∩B| = join count, |A∪B| = |A|+|B|−∩.
    Returns (id_a, id_b, jaccard) for pairs ≥ threshold.
    """
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_common").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
