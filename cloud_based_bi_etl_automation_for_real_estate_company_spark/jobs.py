"""End-to-end pipeline jobs — the composition layer that replaces the
reference's cron-ish operational loop (backfill script + webhook
receiver + 8×/day Power BI refresh, reference README.md:511–513).

``refresh_gold`` is the scheduled batch: silver event log → current
snapshot → every dashboard measure materialized as partition-pruned
gold parquet + SQL views. Incremental by construction: dynamic
partition overwrite only rewrites changed months.

``run_backfill_merge`` is the U2/J4 flow: merge a historical bulk load
with live silver, latest-per-key, write the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .operators.generations import read_current, write_generation
from .operators.snapshot import upsert_merge
from .plans import gold
from .sources.sinks import materialize_gold


def refresh_gold(
    spark: SparkSession,
    silver_path: str,
    gold_path: str,
    prefix: str = "gold_",
    atomic: bool = False,
) -> dict[str, DataFrame]:
    """The 8×/day dashboard refresh as one Spark job.

    ``atomic=False`` (default) refreshes in place with dynamic
    partition overwrite — incremental (only changed months rewrite)
    but a concurrent reader can catch a partition mid-rewrite.
    ``atomic=True`` publishes each table as a fresh generation
    directory behind a manifest (operators/generations.py): full
    rewrite per refresh, but readers see old-or-new, never a mix —
    the right trade for the dashboard gold layer, which is small
    relative to silver."""

    def _publish(df: DataFrame, name: str, partition_by=None) -> DataFrame:
        path = os.path.join(gold_path, name)
        if atomic:
            write_generation(df, path, partition_by=partition_by)
            out = read_current(spark, path)
            out.createOrReplaceTempView(f"{prefix}{name}")
            return out
        return materialize_gold(
            df, path, view_name=f"{prefix}{name}", partition_by=partition_by
        )

    silver = spark.read.parquet(silver_path)
    snap = gold.lead_snapshot(silver)
    out: dict[str, DataFrame] = {}
    out["lead_snapshot"] = _publish(snap, "lead_snapshot", partition_by=["account"])
    builders = {
        "funnel": gold.funnel,
        "conversion_rates": gold.conversion_rates,
        "sales_totals": gold.sales_totals,
        "agent_table": gold.agent_table,
        "agent_ranking": gold.agent_ranking,
        "monthly_trend": gold.monthly_trend,
        "detail_listing": gold.detail_listing,
    }
    for name, fn in builders.items():
        out[name] = _publish(fn(snap), name)
    return out


def run_backfill_merge(
    backfill: DataFrame, live: DataFrame, out_path: str
) -> DataFrame:
    """U2/J4 — one-time history merge: bulk-loaded backfill ∪ live
    stream → last-write-wins snapshot (reference README.md:149)."""
    merged = upsert_merge(backfill, live, ["lead_id"], ["received_at", "id"])
    return materialize_gold(merged, out_path, partition_by=["account"])


def run_curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    entropy_gate: tuple[float, float] | None = None,
    span_dedup_spans: int | None = None,
    mixture_alpha: float | None = None,
    substring_min_len: int | None = None,
    domain_cap_per_source: int | None = None,
    sort_output_by: str | None = None,
    soft_dedup: bool = False,
    full_mojibake_repair: bool = False,
    drift_report: bool = False,
    lsh_max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end training-data curation — the composition the
    individual oracle-checked operators exist for:

    0. encoding hygiene (mojibake digraph repair + replacement-char
       strip — map-only replace chain, so mis-decoded crawls of the
       same document hash together at the dedup stages);
    1. quality gate (map-side column filter, fuses into the scan);
    2. repetition gate (Gopher-style dup-token/bigram thresholds);
    3. exact dedup (one content-hash groupBy; canonical = min doc_id);
    4. near-dup pruning (MinHash→LSH candidates, gated to signature
       agreement ≥ 0.5 so band-collision false positives never merge
       clusters → connected components; only the cluster
       representative survives);
    5. benchmark decontamination (broadcast eval shingle set,
       left-anti on overlap);
    6. PII redaction (map-only regexp chain on the survivors);
    7. stratified downsampling (content-hash bucket, map-side);
    8. deterministic train/val/test split;
    9. write partitioned by split (dynamic partition overwrite).

    Stage order is deliberate for scale: the cheap map-side gates run
    first so the shuffling stages (3, 4) see the smallest possible
    input; the near-dup stage — the only quadratic-ish one — runs on
    already exactly-deduped text; redaction runs last-but-one so the
    regexes only touch rows that will actually be written.

    Optional stages (off by default, so the pinned default output is
    stable): ``entropy_gate=(lo, hi)`` drops degenerate/gibberish
    documents by unigram entropy between the repetition gate and
    dedup; ``span_dedup_spans=k`` rewrites text with globally repeated
    k-token spans removed (and drops fully-redundant documents)
    BEFORE exact dedup, since cleaning changes content hashes.
    ``mixture_alpha=a`` adds a temperature-``a`` source-mixture
    rebalance between redaction and the stratified sample: the
    per-slice ``source_mixture`` audit is MATERIALIZED to
    ``{out_path}__mixture_audit`` (the artifact a corpus build keeps
    for provenance) and fed back through ``mixture_apply``, so the
    rebalance pass itself scans the corpus exactly once — the
    single-scan 100 TB path, plan-asserted in
    tests/test_curation.py. ``substring_min_len=L`` rewrites text
    with CHARACTER-exact duplicated blocks ≥ L chars removed
    (operators/suffixes.suffix_removal — the SA-grade alternative to
    ``span_dedup_spans``; same pipeline position, before exact dedup,
    since cleaning changes content hashes; mutually exclusive with
    ``span_dedup_spans``). ``domain_cap_per_source=k`` caps each
    source at its k longest SURVIVING documents (C4/RefinedWeb
    practice) right after decontamination — the cap counts unique,
    clean content, not crawl duplicates — and before redaction, so
    the regexes only touch capped survivors. ``sort_output_by=col``
    writes each split directory with operators/ranking.sorted_write
    instead of the plain partitioned write: output files TILE the
    column (globally sorted layout), so downstream range reads over
    the curated corpus prune to O(1) files via the layout manifest —
    the write-side half of the file-skipping story.
    ``soft_dedup=True`` switches stage 4 from hard pruning to SOFT
    deduplication: near-duplicates are RETAINED with sampling weight
    1/|near-dup cluster| (the x_softdedup_weights semantics — used
    when duplicates carry signal), and — because retained near-dups
    make the per-doc modulus split leak near-identical text across
    the train/test boundary — stage 8 splits by the near-dup CLUSTER
    via operators/corpus.cluster_split, reusing the components
    already computed here. A whole near-dup family lands in one
    split by construction (tested in test_curation.py).
    ``full_mojibake_repair=True`` upgrades stage 0 from the enumerated
    digraph chain to the generic cp1252→UTF-8 round-trip repair
    (pandas_udf over ONLY the detector-flagged rows — see
    functions/text.demojibake_full).
    ``drift_report=True`` materializes a per-source distribution-shift
    report over the ARRIVING corpus (post-encoding-hygiene, before any
    gate drops rows — the point where a mis-crawled slice should trip
    an alert, not after curation has partially masked it) to
    ``{out_path}__drift_report``: the two-sample KS statistic and the
    PSI score of each source's n_chars distribution against the rest
    of the corpus (operators/quality.ks_drift / psi_drift), one row
    per source with both rejection flags.
    """
    from pyspark.sql import functions as F

    from .operators.cacheutil import release_cached
    from .operators.dedup import (
        exact_dedup,
        minhash_estimate_pairs,
    )
    from .functions.text import redact_pii
    from .operators.quality import (
        decontaminate,
        quality_gate,
        repetition_stats,
        stratified_sample,
    )
    from .plans.measures import t

    d = t(spark, sf_dir, "documents")
    # stage 0 (round 10): encoding hygiene — repair double-encoding
    # mojibake digraphs and strip replacement chars BEFORE any hash is
    # taken, so the same document crawled once clean and once
    # mis-decoded dedups together. Default path is the map-only replace
    # chain (fuses into the scan; x_mojibake oracle-gates the
    # arithmetic). ``full_mojibake_repair=True`` (round 11) swaps in
    # the generic cp1252→UTF-8 round-trip repair for rows the detector
    # flags — an Arrow-batched pandas_udf that sees ONLY the flagged
    # sliver (functions/text.demojibake_full; x_mojibake_full
    # oracle-gates the repair). INSTEAD of, not after, the chain: the
    # chain would consume the in-map digraphs that make a mixed row
    # flag, hiding its out-of-map tail from the full repair's gate.
    if full_mojibake_repair:
        from .functions.text import demojibake_full

        d = demojibake_full(d, "text")
    else:
        from .functions.text import demojibake

        d = d.withColumn("text", demojibake(F.col("text")))
    if drift_report:
        from .operators.quality import chi2_drift, ks_drift, psi_drift, w1_drift

        # numeric family over n_chars (KS sup + W1 integral + PSI
        # buckets) plus the categorical language-mix test — one row
        # per source with every score and flag side by side
        ks_drift(d).join(
            psi_drift(d), ["source", "n_source", "n_rest"]
        ).join(
            w1_drift(d), ["source", "n_source", "n_rest"]
        ).join(
            # chi2's n_source counts lang-not-null rows (vs n_chars
            # for the numeric family) — keep only its scores to avoid
            # a silent count collision on the join keys
            # LEFT join (round-13 ADVICE): a source whose rows all
            # have NULL lang yields no chi2 row (NULL categories are
            # filtered) — an inner join would silently drop that
            # source's ENTIRE report row including its KS/W1/PSI
            # stats; left keeps the numeric row with NULL chi2 fields
            chi2_drift(d).select(
                "source",
                "df_chi2",
                F.col("chi2").alias("lang_chi2"),
                F.col("reject_95").alias("lang_reject_95"),
            ),
            ["source"],
            "left",
        ).write.mode("overwrite").parquet(out_path + "__drift_report")
    gated = quality_gate(d)
    repetitive = (
        repetition_stats(gated)
        .filter(
            (F.col("dup_token_ratio") > 0.9)
            | (F.coalesce(F.col("dup_bigram_ratio"), F.lit(0.0)) > 0.9)
        )
        .select("doc_id")
    )
    gated = gated.join(repetitive, "doc_id", "left_anti")
    if entropy_gate is not None:
        from .operators.corpus import doc_entropy

        lo, hi = entropy_gate
        ok = (
            doc_entropy(gated)
            .filter((F.col("entropy") >= lo) & (F.col("entropy") <= hi))
            .select("doc_id")
        )
        gated = gated.join(ok, "doc_id", "left_semi")
    if span_dedup_spans is not None and substring_min_len is not None:
        raise ValueError(
            "span_dedup_spans and substring_min_len are alternative "
            "cleaning stages — pass one"
        )
    if span_dedup_spans is not None or substring_min_len is not None:
        if span_dedup_spans is not None:
            from .operators.dedup import span_dedup

            cleaned = span_dedup(gated, span=span_dedup_spans)
        else:
            from .operators.suffixes import suffix_removal

            cleaned = suffix_removal(gated, min_len=substring_min_len)
        cleaned = cleaned.select("doc_id", F.col("clean_text").alias("__clean"))
        gated = (
            gated.join(cleaned, "doc_id")
            .withColumn("text", F.col("__clean"))
            .drop("__clean")
            .filter(F.length("text") > 0)
        )
    canon = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    uniq = gated.join(canon, "doc_id", "left_semi")
    # lsh_max_bucket (round 12): the defensive band-bucket bound for
    # unattended runs over degenerate corpora — the curation soak's
    # shared-shingle-pool staging drove the candidate set to 9.1e7
    # pairs from 1.2e5 docs (one bucket = b^2/2 pairs). Docs in a
    # skipped mega-bucket still pair through their other bands;
    # default None keeps exact recall.
    near = minhash_estimate_pairs(
        uniq, threshold=0.5, max_bucket=lsh_max_bucket
    )
    near_pairs = near.select("id_a", "id_b")
    # Both dedup modes cluster with star contraction (round 10): a
    # drifting-text CHAIN longer than min-label's propagation bound
    # would silently under-merge — ship duplicates into the training
    # set — which round 9 guarded with require_convergence's loud
    # raise; star converges on any diameter, so the failure mode is
    # gone rather than detected.
    components = None
    if soft_dedup:
        from .operators.dedup import connected_components_star

        # KEEP near-dups (soft dedup): no pruning here — the cluster
        # components are computed once (star CC always converges, so
        # no require_convergence knob) and reused below both as the
        # leakage-safe split key and as the 1/|cluster| weight key.
        # Weights are assigned at the END, over the documents that
        # actually survive decontamination + sampling, so per-cluster
        # probability mass in the DELIVERED corpus sums to exactly 1.
        components = connected_components_star(near_pairs).select(
            "doc_id", "cluster_id"
        )
        pruned = uniq
    else:
        from .operators.dedup import connected_components_star as _star

        # round 10: star contraction replaces the strict min-label
        # loop — it converges on ANY chain diameter (the failure mode
        # require_convergence existed to catch) and the size-gated
        # local finish makes the post-LSH graph cheap. Same output
        # contract (cluster_id = component min), so losers are
        # identical rows.
        losers = (
            _star(near_pairs)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        pruned = uniq.join(losers, "doc_id", "left_anti")
    # pseudo eval split: the held-out benchmark the training set must
    # not leak (same doc_id % 50 convention as x_decontaminate)
    eval_docs = d.filter(F.col("doc_id") % 50 == 0)
    # 8-gram overlap, not 3-gram: long shingles keep the false-positive
    # rate of common phrases near zero (the usual 8–13-gram practice)
    pruned = decontaminate(
        pruned.filter(F.col("doc_id") % 50 != 0), eval_docs, k=8
    )
    if domain_cap_per_source is not None:
        from .operators.quality import domain_cap

        pruned = domain_cap(
            pruned.withColumn("__len", F.length("text")),
            domain_cap_per_source,
            order_by=[F.col("__len").desc(), F.col("doc_id").asc()],
        ).drop("__len", "rk")
    pruned = pruned.withColumn("text", redact_pii(F.col("text")))
    if mixture_alpha is not None:
        from .operators.corpus import mixture_apply, source_mixture

        audit_path = out_path + "__mixture_audit"
        source_mixture(pruned, alpha=mixture_alpha).write.mode(
            "overwrite"
        ).parquet(audit_path)
        pruned = mixture_apply(pruned, spark.read.parquet(audit_path))
    sampled = stratified_sample(
        pruned, "lang", {"en": 100, "zh": 50}, default_rate=50
    )
    if soft_dedup:
        from pyspark import StorageLevel

        from .operators.corpus import cluster_split

        # near-dups were RETAINED above — a per-doc modulus would put
        # two near-identical documents on opposite sides of the
        # train/test boundary. Split by the near-dup CLUSTER instead
        # (corpus.cluster_split), reusing the components star CC
        # already produced, then weight each doc 1/|cluster ∩ final
        # corpus|. The labeled frame is referenced twice (size agg +
        # join-back), so pin it once — unpersisted with the signature
        # cache below.
        labeled = cluster_split(sampled, near_pairs, cc=components)
        labeled = labeled.persist(StorageLevel.MEMORY_AND_DISK)
        sizes = labeled.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("__n_dups")
        )
        curated = (
            labeled.join(sizes, "cluster_id")
            .withColumn("weight", F.round(F.lit(1.0) / F.col("__n_dups"), 9))
            .drop("__n_dups")
        )
    else:
        # losers were dropped at the near-dup stage, so no surviving
        # pair of near-identical docs exists to straddle the boundary
        # and the cheap per-doc modulus is leakage-safe here
        bucket = F.pmod(F.col("doc_id"), F.lit(100))
        curated = sampled.withColumn(
            "split",
            F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("val"))
            .otherwise(F.lit("test")),
        )
    if sort_output_by is not None:
        from .operators.ranking import sorted_write

        # sorted_write runs ~2 actions per split (cuts aggregate +
        # write); without a pin the whole curation lineage — exact
        # dedup, connected components, decontamination — recomputes
        # each time (only the MinHash signature cache is persisted).
        # persist + eager count pins it once; unlike localCheckpoint
        # (whose RDD blocks DataFrame.unpersist cannot release), the
        # finally-block unpersist below actually frees the storage.
        from pyspark import StorageLevel

        curated = curated.persist(StorageLevel.MEMORY_AND_DISK)
        curated.count()
        try:
            for split in ("train", "val", "test"):
                part = curated.filter(F.col("split") == split).drop(
                    "split"
                )
                sorted_write(
                    part,
                    sort_output_by,
                    os.path.join(out_path, f"split={split}"),
                    tiebreaks=(
                        ["doc_id"] if sort_output_by != "doc_id" else ()
                    ),
                )
        finally:
            curated.unpersist()
    else:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        curated.write.mode("overwrite").partitionBy("split").parquet(out_path)
    # the write above is the last action over the near-dup candidates;
    # release the MinHash signature cache they pinned (and the soft-
    # dedup path's pinned labeled frame)
    release_cached(near)
    if soft_dedup:
        labeled.unpersist()
    return spark.read.parquet(out_path)


def refresh_drift_dashboard(
    spark: SparkSession,
    events: DataFrame,
    gold_path: str,
    ref_weeks: int = 4,
    prefix: str = "gold_",
    atomic: bool = True,
) -> dict[str, DataFrame]:
    """Materialize the rolling drift PANEL as gold tables (round 13 —
    the refresh_gold posture applied to the monitoring family): the
    numeric per-(series, week) KS/W1/PSI panel
    (quality.rolling_drift over integer-floored event values) and the
    weekly categorical mix panel (quality.rolling_chi2 over
    event_type), each published behind the generation manifest by
    default — dashboards read old-or-new, never a mid-rewrite mix,
    and both frames are week-grain-small so the full rewrite is the
    right trade. Registers ``{prefix}drift_panel`` /
    ``{prefix}mix_panel`` temp views like the BI gold layer. Returns
    the published frames."""
    from pyspark.sql import functions as F

    from .operators.quality import rolling_chi2, rolling_drift

    def _publish(df: DataFrame, name: str) -> DataFrame:
        path = os.path.join(gold_path, name)
        if atomic:
            write_generation(df, path)
            out = read_current(spark, path)
            out.createOrReplaceTempView(f"{prefix}{name}")
            return out
        return materialize_gold(df, path, view_name=f"{prefix}{name}")

    out: dict[str, DataFrame] = {}
    out["drift_panel"] = _publish(
        rolling_drift(
            events.withColumn("value", F.floor("value")),
            "value",
            ref_weeks=ref_weeks,
        ),
        "drift_panel",
    )
    out["mix_panel"] = _publish(
        rolling_chi2(events, ref_weeks=ref_weeks), "mix_panel"
    )
    return out


def run_packing_pipeline(
    curated: DataFrame,
    window: int = 64,
    stride: int = 48,
    budget: int = 512,
    partitions: int = 8,
) -> DataFrame:
    """Curated corpus → model-ready sequences: the composition that
    follows ``run_curation_pipeline`` in a training-data build.

    1. context-window chunking (map-only; window/stride token spans);
    2. greedy packing of the chunks into ``budget``-token bins inside
       md5 pack-groups (one hash shuffle + per-group local sort — no
       global order at any scale).

    Returns one row per chunk: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text, pack_group, bin_id). A writer partitions by
    (pack_group, bin_id) to lay sequences out contiguously.
    """
    from pyspark.sql import functions as F

    from .operators.corpus import chunk_documents, pack_sequences

    chunks = chunk_documents(curated, window, stride)
    # zero-padded chunk_id: packing orders by the string chunk_key, and
    # unpadded '1:10' would sort before '1:2', interleaving the bins of
    # any document with >= 10 chunks
    keyed = chunks.withColumn(
        "chunk_key",
        F.format_string("%s:%012d", F.col("doc_id"), F.col("chunk_id")),
    )
    packed = pack_sequences(
        keyed,
        budget,
        text_col="chunk_text",
        id_col="chunk_key",
        partitions=partitions,
        ntokens_col="n_chunk_tokens",
    )
    return (
        keyed.join(packed.select("chunk_key", "pack_group", "bin_id"), "chunk_key")
        .select(
            "doc_id",
            "chunk_id",
            "n_chunk_tokens",
            "chunk_text",
            "pack_group",
            "bin_id",
        )
    )
