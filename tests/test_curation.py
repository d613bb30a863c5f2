"""End-to-end curation pipeline: the composed quality → dedup →
near-dup → sample → split job produces a clean, deterministic corpus."""

from __future__ import annotations

import pytest

# round 16: slow tier — end-to-end curation-pipeline soaks (multi-stage jobs over the full fixture)
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
    run_curation_pipeline,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t

SF = "/root/testdata/sf0.001"


def test_curation_pipeline_end_to_end(spark, tmp_path):
    out = run_curation_pipeline(spark, SF, str(tmp_path / "curated"))
    total = t(spark, SF, "documents").count()
    n = out.count()
    assert 0 < n < total
    # no exact duplicates survive
    assert out.select(F.md5("text")).distinct().count() == n
    # split labels are exactly the three partitions
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert "train" in splits
    # deterministic: a second run yields the identical doc set
    out2 = run_curation_pipeline(spark, SF, str(tmp_path / "curated2"))
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    assert ids(out) == ids(out2)


def test_curation_pipeline_respects_sampling_rates(spark, tmp_path):
    out = run_curation_pipeline(spark, SF, str(tmp_path / "curated3"))
    kept = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # en keeps everything that survives dedup; others are downsampled,
    # so en must dominate its fixture share
    assert kept.get("en", 0) > max(v for k, v in kept.items() if k != "en")


def test_packing_pipeline_end_to_end(spark, tmp_path):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
        run_packing_pipeline,
    )

    curated = run_curation_pipeline(spark, SF, str(tmp_path / "c"))
    packed = run_packing_pipeline(curated, window=64, stride=48, budget=256)
    rows = packed.collect()
    assert len(rows) > 0
    # every chunk gets exactly one (pack_group, bin) assignment
    keys = [(r["doc_id"], r["chunk_id"]) for r in rows]
    assert len(keys) == len(set(keys))
    # chunks are bounded by the window and never empty
    assert all(0 < r["n_chunk_tokens"] <= 64 for r in rows)
    # every curated doc's tokens are represented in some chunk
    n_docs = curated.count()
    assert packed.select("doc_id").distinct().count() == n_docs


def test_packing_pipeline_numeric_chunk_order(spark):
    """ADVICE round 1: with >= 10 chunks per doc the pack must follow
    NUMERIC chunk order — the unpadded string key sorted '1:10' before
    '1:2' and interleaved bins. Bin ids must be non-decreasing in
    chunk_id within each (doc, pack_group)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
        run_packing_pipeline,
    )

    text = " ".join(f"w{i}" for i in range(700))  # ~14 chunks at stride 48
    curated = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    packed = run_packing_pipeline(
        curated, window=64, stride=48, budget=128, partitions=1
    )
    rows = sorted(packed.collect(), key=lambda r: r["chunk_id"])
    assert len(rows) >= 10
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins), f"bins interleave: {bins}"


def test_curation_optional_lm_and_span_stages(spark, tmp_path):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
        run_curation_pipeline,
    )
    from pyspark.sql import functions as F

    out = run_curation_pipeline(
        spark,
        "/root/testdata/sf0.001",
        str(tmp_path / "curated_lm"),
        entropy_gate=(0.5, 10.0),
        span_dedup_spans=8,
    )
    n = out.count()
    assert n > 0
    # span dedup never leaves empty text in the output
    assert out.filter(F.length("text") == 0).count() == 0
    # exact dedup ran on the CLEANED text: all outputs distinct
    assert out.select("text").distinct().count() == n
    # note: the span-cleaned run can keep MORE docs than the default
    # run — removing shared boilerplate shrinks near-dup clusters, so
    # fewer docs are pruned as duplicates. That interaction is the
    # point of cleaning before dedup.


def test_mixture_apply_single_scan_and_matches_audit(spark, tmp_path):
    """The 100 TB mixture path: a materialized source_mixture artifact
    fed through mixture_apply scans the corpus exactly ONCE (the
    inline variant scans twice), and keeps exactly the docs the
    mixture_sample audit counts."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
        mixture_apply,
        mixture_sample,
        source_mixture,
    )

    docs = t(spark, SF, "documents")
    audit_path = str(tmp_path / "mix_audit")
    source_mixture(docs, alpha=0.5).write.parquet(audit_path)
    mix = spark.read.parquet(audit_path)

    kept = mixture_apply(docs, mix)

    def doc_scans(df) -> int:
        # optimizedPlan elides file paths; a documents scan is the
        # relation whose first column is doc_id
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Relation [doc_id#")

    assert doc_scans(kept) == 1
    # the inline variant re-references the corpus throughout the
    # weight computation's lineage (9 logical scans on this plan)
    inline = mixture_apply(docs, source_mixture(docs, alpha=0.5))
    assert doc_scans(inline) > 1

    # same rows either way, schema unchanged
    assert kept.columns == docs.columns
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    assert ids(kept) == ids(inline)
    # audit n_kept per slice == applied row counts per slice
    audit = {
        r["source"]: r["n_kept"]
        for r in mixture_sample(docs, mixture=mix).collect()
    }
    applied = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert audit == applied
    # downsample-only with a real effect at alpha=0.5 on this fixture
    assert 0 < kept.count() <= docs.count()


def test_curation_pipeline_mixture_stage(spark, tmp_path):
    """mixture_alpha wires the audit-artifact round-trip end-to-end:
    the artifact lands next to the output, the rebalance only removes
    rows (subset of the default run), and alpha=1.0 keeps natural
    proportions (no-op on row membership)."""
    base = run_curation_pipeline(spark, SF, str(tmp_path / "plain"))
    mixed = run_curation_pipeline(
        spark, SF, str(tmp_path / "mixed"), mixture_alpha=0.5
    )
    audit = spark.read.parquet(str(tmp_path / "mixed") + "__mixture_audit")
    assert audit.columns == ["source", "n_docs", "n_tokens", "token_share", "weight"]
    assert abs(sum(r["weight"] for r in audit.collect()) - 1.0) < 1e-9
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    assert ids(mixed) <= ids(base)
    # alpha=1: weight == token_share, every rate is 1, nothing dropped
    natural = run_curation_pipeline(
        spark, SF, str(tmp_path / "nat"), mixture_alpha=1.0
    )
    assert ids(natural) == ids(base)


def test_curation_pipeline_suffix_and_domain_cap_stages(spark, tmp_path):
    """The round-7 optional stages compose: substring_min_len swaps the
    token-window cleaner for the character-exact suffix_removal (text
    rewritten, no doc fully lost on this fixture), domain_cap bounds
    every source's surviving docs, and the two stages are mutually
    exclusive with span_dedup_spans."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    out = run_curation_pipeline(
        spark,
        SF,
        str(tmp_path / "c_sfx"),
        substring_min_len=15,
        domain_cap_per_source=3,
    )
    rows = out.collect()
    assert rows, "pipeline emptied the corpus"
    per_src = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert max(per_src.values()) <= 3, per_src
    # the cleaner actually rewrote duplicated blocks somewhere upstream
    # of the cap: compare against the same run without cleaning
    base = run_curation_pipeline(
        spark, SF, str(tmp_path / "c_base"), domain_cap_per_source=3
    )
    base_len = {r["doc_id"]: len(r["text"]) for r in base.collect()}
    got_len = {r["doc_id"]: len(r["text"]) for r in rows}
    shared = set(base_len) & set(got_len)
    assert shared and any(got_len[i] < base_len[i] for i in shared), (
        "suffix removal changed nothing"
    )
    with _pytest.raises(ValueError, match="alternative"):
        run_curation_pipeline(
            spark, SF, str(tmp_path / "c_bad"),
            span_dedup_spans=8, substring_min_len=15,
        )


def test_curation_pipeline_sorted_output_layout(spark, tmp_path):
    """sort_output_by writes each split as a globally-sorted file
    sequence (round-8 sorted_write integration): per split directory
    the file min/max doc_id intervals tile, the readback matches the
    default write's row set exactly, and split partition discovery
    still works."""
    from pyspark.sql import functions as F

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.layout import (
        build_manifest,
    )

    out_sorted = str(tmp_path / "c_sorted")
    got = run_curation_pipeline(spark, SF, out_sorted, sort_output_by="doc_id")
    base = run_curation_pipeline(spark, SF, str(tmp_path / "c_plain"))
    assert {tuple(sorted(r.asDict().items())) for r in got.collect()} == {
        tuple(sorted(r.asDict().items())) for r in base.collect()
    }
    for split in ("train", "val", "test"):
        d = f"{out_sorted}/split={split}"
        n = got.filter(F.col("split") == split).count()
        if n == 0:
            continue
        spans = sorted(
            (r["lo_doc_id"], r["hi_doc_id"])
            for r in build_manifest(spark, d, ["doc_id"]).collect()
        )
        for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
            assert lo1 <= hi1 <= lo2, (split, spans)


def test_curation_soft_dedup_retains_weights_and_splits_by_cluster(
    spark, tmp_path
):
    """soft_dedup=True keeps near-duplicates with 1/cluster-size
    weights AND splits by near-dup cluster — no surviving near-dup
    pair may straddle the train/val/test boundary (the leakage mode
    the per-doc modulus has when losers are retained)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
        minhash_estimate_pairs,
    )

    hard = run_curation_pipeline(spark, SF, str(tmp_path / "hard"))
    soft = run_curation_pipeline(
        spark, SF, str(tmp_path / "soft"), soft_dedup=True
    )
    # near-dup losers are retained, so the soft corpus is strictly
    # larger than the hard-pruned one and carries the weight columns
    assert soft.count() > hard.count()
    assert {"weight", "cluster_id", "split"} <= set(soft.columns)
    # weight == 1/|cluster| exactly, singletons weigh 1.0
    sizes = soft.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"), F.first("weight").alias("w")
    )
    bad = sizes.filter(
        F.abs(F.col("w") - F.round(F.lit(1.0) / F.col("n"), 9)) > 1e-12
    )
    assert bad.isEmpty()
    # every cluster lands in exactly ONE split (construction), and the
    # independent check: re-detect near-dup pairs over the curated
    # docs — both endpoints of every pair must share a split
    per_cluster = soft.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns")
    )
    assert per_cluster.filter(F.col("ns") > 1).isEmpty()
    pairs = minhash_estimate_pairs(soft, threshold=0.5).select("id_a", "id_b")
    lab = soft.select("doc_id", "split")
    straddle = (
        pairs.join(lab.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "split_a")
        .join(lab.withColumnRenamed("doc_id", "id_b"), "id_b")
        .filter(F.col("split_a") != F.col("split"))
    )
    # the fixture corpus is near-dup heavy: the pair set must be
    # non-empty for this check to mean anything
    assert not pairs.isEmpty()
    assert straddle.isEmpty()
    # weights conserve probability mass: sum over each cluster == 1
    mass = soft.groupBy("cluster_id").agg(F.sum("weight").alias("m"))
    assert mass.filter(F.abs(F.col("m") - 1.0) > 1e-6).isEmpty()


def test_curation_full_mojibake_repair_dedups_mixed_tail(spark, tmp_path):
    """Round-11: with ``full_mojibake_repair=True`` a mis-decoded crawl
    whose mojibake includes OUT-OF-MAP signatures (š) alongside an
    in-map one (é, the detector trigger) hashes together with its
    clean twin at exact dedup; the default enumerated chain repairs
    only the é, so the twins hash apart and both survive."""
    base = (
        "the quick brown fox jumps over the lazy dog near the wide "
        "river bank today"
    )
    clean_sfx = " caf\xe9 š report"
    broken_sfx = " caf\xc3\xa9 \xc5\xa1 report"  # é in-map, š out-of-map
    other = (
        "a completely different document about spark shuffle "
        "partitions and the adaptive query execution planner at scale"
    )
    rows = [
        (1, base + clean_sfx, "en", "srcA", 0),
        (2, base + broken_sfx, "en", "srcA", 0),
        (3, other, "en", "srcB", 0),
    ]
    src = tmp_path / "fixture"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(src / "documents.parquet"))

    out_default = run_curation_pipeline(
        spark, str(src), str(tmp_path / "c_default")
    )
    out_full = run_curation_pipeline(
        spark, str(src), str(tmp_path / "c_full"), full_mojibake_repair=True
    )
    ids_default = {r["doc_id"] for r in out_default.select("doc_id").collect()}
    ids_full = {r["doc_id"] for r in out_full.select("doc_id").collect()}
    # default chain: é repaired but š still differs -> twins coexist
    # (near-dup stage may still prune one; exact dedup must NOT) --
    # assert at the exact-dedup level via distinct hashes post-repair
    assert 1 in ids_full and 2 not in ids_full  # min doc_id survives
    assert 3 in ids_full
    # the surviving text in full mode is the CLEAN form
    kept = {
        r["doc_id"]: r["text"] for r in out_full.select("doc_id", "text").collect()
    }
    assert kept[1] == base + clean_sfx
    # default mode keeps doc 1; doc 2 may fall to the NEAR-dup stage
    # (the twins are near-identical by construction) but its exact
    # hash differs -> if present its text retains the š signature
    assert 1 in ids_default


def test_curation_drift_report_stage(spark, tmp_path):
    """drift_report=True materializes the per-source KS+PSI shift
    report over the ARRIVING corpus (post-hygiene), matching the
    standalone operators exactly."""
    from pyspark.sql import functions as F

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        demojibake,
    )
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
        run_curation_pipeline,
    )
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        ks_drift,
        psi_drift,
    )
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import (
        t,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "cur")
    run_curation_pipeline(spark, sf, out, drift_report=True)
    rep = spark.read.parquet(out + "__drift_report")
    assert set(rep.columns) == {
        "source", "n_source", "n_rest", "ks_stat", "reject_95",
        "psi", "shifted", "w1_dist", "df_chi2", "lang_chi2",
        "lang_reject_95",
    }
    d = t(spark, sf, "documents").withColumn(
        "text", demojibake(F.col("text"))
    )
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        chi2_drift,
        w1_drift,
    )

    want = {
        r["source"]: (r["ks_stat"], r["psi"])
        for r in ks_drift(d)
        .join(psi_drift(d), ["source", "n_source", "n_rest"])
        .collect()
    }
    got = {r["source"]: (r["ks_stat"], r["psi"]) for r in rep.collect()}
    assert got == want
    want_w1 = {r["source"]: r["w1_dist"] for r in w1_drift(d).collect()}
    want_c2 = {r["source"]: r["chi2"] for r in chi2_drift(d).collect()}
    for r in rep.collect():
        assert r["w1_dist"] == want_w1[r["source"]]
        assert r["lang_chi2"] == want_c2[r["source"]]
    # every arriving source is reported, even ones curation later drops
    n_sources = d.select("source").distinct().count()
    assert rep.count() == n_sources
