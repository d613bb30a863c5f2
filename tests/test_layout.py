"""Z-order layout: key correctness and the pruning property it exists
for — per-file min/max ranges must be tight on BOTH clustered columns,
where a single-column sort is tight on one and spans the full range on
the other (oracle-checked end-to-end as x_zorder_key)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import (
    layout as L,
)


def _morton_ref(a: int, b: int, bits: int = 8) -> int:
    out = 0
    for j in range(bits):
        out |= ((a >> j) & 1) << (2 * j)
        out |= ((b >> j) & 1) << (2 * j + 1)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = df.select(
        "id", L.interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    by_id = {r["id"]: r["z"] for r in got}
    for i, a, b in rows:
        assert by_id[i] == _morton_ref(a, b)


def test_scale_to_bits_clamps_and_null_maps_zero(spark):
    df = spark.createDataFrame(
        [(0, -5.0), (1, 0.0), (2, 99.9), (3, 100.0), (4, 250.0), (5, None)],
        "id long, v double",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", L.scale_to_bits(F.col("v"), 0.0, 100.0, 4).alias("s")
        ).collect()
    }
    assert got[0] == 0          # below range clamps to 0
    assert got[1] == 0
    assert got[2] == 15         # just under hi → top cell
    assert got[3] == 15         # hi clamps to top
    assert got[4] == 15
    assert got[5] == 0          # NULL → 0, never NULL


def _avg_file_spans(path: str, spark, cols):
    """Mean per-file (max-min) span for each column, as coverage
    fraction of the global span."""
    full = spark.read.parquet(path)
    glo = full.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    spans = {c: [] for c in cols}
    for f in glob.glob(f"{path}/part-*.parquet"):
        st = (
            spark.read.parquet(f)
            .agg(
                *[F.min(c).alias(f"lo_{c}") for c in cols],
                *[F.max(c).alias(f"hi_{c}") for c in cols],
            )
            .collect()[0]
        )
        for c in cols:
            width = float(glo[f"hi_{c}"]) - float(glo[f"lo_{c}"])
            spans[c].append(
                (float(st[f"hi_{c}"]) - float(st[f"lo_{c}"])) / width
            )
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    # synthetic uniform grid so both dims have real spread
    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("a"),
        F.floor(F.col("id") / 64).alias("b"),
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    L.zorder_write(df, zpath, ["a", "b"], [(0, 64), (0, 64)], bits=6, n_files=16)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )
    z = _avg_file_spans(zpath, spark, ["a", "b"])
    s = _avg_file_spans(spath, spark, ["a", "b"])
    # single-col sort: near-zero span on a, full span on b
    assert s["a"] < 0.2 and s["b"] > 0.8
    # z-order: BOTH dims well under the full span — balanced pruning
    assert z["a"] < 0.5 and z["b"] < 0.5
    # and the worst dimension improves vs the sorted layout
    assert max(z.values()) < max(s.values()) - 0.3
    # round trip loses no rows
    assert spark.read.parquet(zpath).count() == 4096


def test_manifest_pruning_on_zordered_layout(spark, tmp_path):
    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("a"),
        F.floor(F.col("id") / 64).alias("b"),
    )
    zpath = str(tmp_path / "z")
    L.zorder_write(df, zpath, ["a", "b"], [(0, 64), (0, 64)], bits=6, n_files=16)
    man = L.build_manifest(spark, zpath, ["a", "b"])
    assert man.count() == 16
    # a narrow box on BOTH dims must skip most files on a z-ordered
    # layout...
    ranges = {"a": (0, 7), "b": (0, 7)}
    kept = L.prune_files(man, ranges)
    assert 0 < len(kept) <= 4
    # ...and the pruned read + row filter equals the full-scan filter
    got = (
        L.read_pruned(spark, man, ranges)
        .filter((F.col("a") <= 7) & (F.col("b") <= 7))
        .count()
    )
    want = df.filter((F.col("a") <= 7) & (F.col("b") <= 7)).count()
    assert got == want == 64


def test_bloom_manifest_no_false_negatives_and_skips(spark, tmp_path):
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.layout import (
        build_manifest_bloom,
        prune_files_bloom,
    )

    path = str(tmp_path / "bloomed")
    # 8 files of 500 ids each, disjoint by construction
    df = spark.range(0, 4000).select(
        F.col("id").alias("event_id"), (F.col("id") % 97).alias("attr")
    )
    df.repartitionByRange(8, "event_id").write.parquet(path)
    man = build_manifest_bloom(spark, path, "event_id").cache()
    n_files = man.count()
    assert n_files == 8

    # every present key's true file must survive (no false negatives)
    full = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    for probe in (0, 1234, 3999):
        true_file = full.filter(F.col("event_id") == probe).select("__f").first()["__f"]
        survivors = prune_files_bloom(man, probe)
        assert true_file in survivors, probe

    # absent keys prune: across many absent probes the average survivor
    # count must be far below the file count (fp-rate bound, k=4)
    tot = sum(len(prune_files_bloom(man, v)) for v in range(100000, 100020))
    assert tot < 20 * n_files / 2


def test_hilbert_key_matches_xy2d_and_is_bijective(spark):
    """The 4-state-machine column fold must equal the literal xy2d
    loop on every cell of a 16x16 grid (order 4) and be a bijection
    onto 0..255."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.layout import (
        hilbert_key,
    )

    def xy2d(order, x, y):
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("d")
        ).collect()
    }
    assert got == {(x, y): xy2d(4, x, y) for x, y in cells}
    assert sorted(got.values()) == list(range(256))


def test_hilbert_adjacency_beats_morton(spark):
    """THE Hilbert property: consecutive curve positions are always
    grid-adjacent (|dx|+|dy| == 1), while the Morton curve jumps
    across power-of-two seams — the locality reason to range-
    partition on the Hilbert key."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.layout import (
        hilbert_key,
        interleave_bits,
    )

    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "x bigint, y bigint")
    rows = df.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h"),
        interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z"),
    ).collect()
    by_h = sorted(rows, key=lambda r: r["h"])
    steps_h = [
        abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
        for a, b in zip(by_h, by_h[1:])
    ]
    assert all(s == 1 for s in steps_h)
    by_z = sorted(rows, key=lambda r: r["z"])
    steps_z = [
        abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
        for a, b in zip(by_z, by_z[1:])
    ]
    assert max(steps_z) > 1  # Morton seam jumps exist on the same grid
