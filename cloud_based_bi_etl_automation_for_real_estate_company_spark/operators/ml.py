"""In-engine model training as DataFrame algebra: full-batch
logistic-regression gradient descent.

The quality-classifier step of a curation pipeline (FastText-style
linear scorer) usually means exporting features to a separate trainer;
for a LINEAR model on engine-resident features that round trip is
unnecessary — one GD iteration is a map-side score + one d-sized
gradient aggregation, the same shuffle profile as any rollup, so the
engine can train where the data lives. Weights stay a 1-row frame
cross-joined into the next iteration (never collected); a fixed
iteration count keeps the plan static and the result a deterministic
function of the input.

Cross-engine/partition determinism (the PageRank recipe,
operators/graph.py): per-row gradient contributions round to 9
decimals and accumulate as DECIMAL — this both makes the parallel sum
order-invariant and absorbs the last-ulp differences between the JVM's
and DuckDB's ``exp``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Train w for P(y=1|x) = sigmoid(w0 + w·x) by ``iterations``
    full-batch gradient-ascent steps from w = 0:

        w_j += lr/n · Σ_i x_ij · (y_i − sigmoid(z_i))

    Returns a 1-row DataFrame (w0, w_<feature>..., n_rows). Every
    iteration is one broadcast of the 1-row weight frame + one
    aggregation of d+1 decimal gradient sums — at 100 TB that is d+1
    numbers of shuffle traffic per step."""
    feats = list(feature_cols)
    # pinned: every gradient step re-reads data, so without the
    # checkpoint the caller's feature lineage re-executes once per
    # iteration (nested inside the chained weight plan, it actually
    # multiplies — round-9 plan audit); the count below was already
    # paying a materializing action anyway
    data = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(c) for c in feats],
    ).localCheckpoint(eager=True)
    n = data.count()
    weights = data.sparkSession.range(1).select(
        F.lit(0.0).alias("w0"), *[F.lit(0.0).alias(f"w_{c}") for c in feats]
    )
    for _ in range(iterations):
        joined = data.join(F.broadcast(weights))
        z = F.col("w0")
        for c in feats:
            z = z + F.col(f"w_{c}") * F.col(c)
        resid = F.col("__y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        grads = joined.agg(
            F.sum(F.round(resid, 9).cast("decimal(38,9)")).alias("g0"),
            *[
                F.sum(F.round(resid * F.col(c), 9).cast("decimal(38,9)")).alias(
                    f"g_{c}"
                )
                for c in feats
            ],
        )
        weights = weights.join(F.broadcast(grads)).select(
            (
                F.col("w0")
                + F.lit(lr) / F.lit(float(n)) * F.col("g0").cast("double")
            ).alias("w0"),
            *[
                (
                    F.col(f"w_{c}")
                    + F.lit(lr)
                    / F.lit(float(n))
                    * F.col(f"g_{c}").cast("double")
                ).alias(f"w_{c}")
                for c in feats
            ],
        )
    return weights.select("*", F.lit(n).cast("bigint").alias("n_rows"))


def logreg_score(
    df: DataFrame, weights: DataFrame, feature_cols: Sequence[str]
) -> DataFrame:
    """Map-side scoring with a broadcast 1-row weight frame: adds
    ``p`` = sigmoid(w0 + w·x). Fuses into the scan — the trained
    classifier IS a projection."""
    joined = df.join(F.broadcast(weights))
    z = F.col("w0")
    for c in feature_cols:
        z = z + F.col(f"w_{c}") * F.col(c).cast("double")
    return joined.select(
        *df.columns, (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("p")
    )


def nb_train(
    train: DataFrame,
    text_col: str = "text",
    class_col: str = "lang",
) -> dict[str, DataFrame]:
    """Multinomial Naive Bayes with add-1 smoothing, trained as three
    aggregations over one tokenized pass: per-(class, token) counts,
    per-class token totals + doc priors, and the vocabulary size (a
    1-row frame — never a driver scalar). All tables are
    vocabulary/class-sized; the fact-scale work is the single explode
    scan."""
    from ..functions.text import tokens

    toks = train.select(
        F.col(class_col).alias("cls"), F.explode(tokens(text_col)).alias("w")
    )
    counts = toks.groupBy("cls", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = toks.groupBy("cls").agg(F.count(F.lit(1)).alias("total"))
    priors = train.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    vocab = toks.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    return {"counts": counts, "totals": totals, "priors": priors, "vocab": vocab}


def nb_score(
    model: dict[str, DataFrame],
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log-likelihood argmax per test doc: explode tokens, cross the
    small class set, left-join the count table (miss → the smoothing
    floor ln(1/(total+V))), decimal-sum the 9-dp-rounded log terms per
    (doc, class) — partition-order invariant and ln()-ulp tolerant,
    the logreg/PageRank determinism recipe — add the log prior, take
    the deterministic argmax. Returns (id, pred_cls, logscore)."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    toks = test.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    classes = model["totals"].join(F.broadcast(model["vocab"]))
    expanded = toks.join(F.broadcast(classes))
    term = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("total") + F.col("v")).cast("double")
    )
    scored = (
        expanded.join(F.broadcast(model["counts"]), ["cls", "w"], "left")
        .select(
            F.col(id_col),
            "cls",
            F.round(term, 9).cast("decimal(38,9)").alias("t"),
        )
        .groupBy(id_col, "cls")
        .agg(F.sum("t").alias("ll"))
    )
    n_total = model["priors"].agg(F.sum("n_docs").alias("n_all"))
    with_prior = (
        scored.join(F.broadcast(model["priors"]), "cls")
        .join(F.broadcast(n_total))
        .select(
            F.col(id_col),
            "cls",
            (
                F.col("ll").cast("double")
                + F.log(
                    F.col("n_docs").cast("double") / F.col("n_all").cast("double")
                )
            ).alias("logscore"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("logscore"), F.asc("cls"))
    return (
        with_prior.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") == 1)
        .select(id_col, F.col("cls").alias("pred_cls"), "logscore")
    )
