"""Property-based tests (SURVEY.md §5 item 5): totality of the
timestamp parser, dedup idempotence/order-independence."""

from __future__ import annotations

import pytest

# round 16: slow tier — property-replay tests: every operator here is re-verified against a pure-Python reference — heavy by design, and each subject also has a per-round oracle row
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions import (
    transforms as X,
)

_SLOW = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
@_SLOW
def test_p8_parser_total_never_throws(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    out = df.select(X.parse_multiformat_ts("raw").alias("ts")).collect()
    assert len(out) == len(raws)  # NULL or valid — never an exception


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
@_SLOW
def test_dedup_idempotent_and_order_independent(spark, rows):
    df = spark.createDataFrame(rows, "id int, v int")
    once = df.dropDuplicates(["id"])
    assert once.count() == once.dropDuplicates(["id"]).count()
    rev = spark.createDataFrame(list(reversed(rows)), "id int, v int")
    assert once.count() == rev.dropDuplicates(["id"]).count()


def test_stratified_sample_stable_under_repartitioning(spark):
    """Content-hash sampling must select the same rows regardless of
    physical partitioning — the property that makes it reproducible
    on any cluster layout."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        stratified_sample,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"en": 60, "zh": 30}
    ids = lambda df: {
        r["doc_id"]
        for r in stratified_sample(df, "lang", rates, default_rate=20)
        .select("doc_id")
        .collect()
    }
    base = ids(d)
    assert len(base) > 0
    assert ids(d.repartition(7)) == base
    assert ids(d.repartition(1)) == base


@given(
    st.lists(st.integers(1, 30), min_size=1, max_size=25),
    st.integers(2, 16),
)
@_SLOW
def test_pack_sequences_invariants(spark, token_counts, budget):
    """For any corpus and budget: every doc gets exactly one bin, bins
    fill in id order, and each doc's bin is exactly
    cum_tokens_before // budget (a doc wider than the budget advances
    the bin counter past the ids it "occupies" — bins need not be
    dense)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
        pack_sequences,
    )

    rows = [(i, "w " * n, "s") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = sorted(
        (r["doc_id"], r["n_tokens"], r["bin_id"])
        for r in pack_sequences(df, budget=budget).collect()
    )
    assert len(out) == len(token_counts)  # exactly one bin per doc
    bins = [b for _, _, b in out]
    assert bins == sorted(bins)  # id order fills bins monotonically
    assert bins[0] == 0
    running = 0
    for _, n, b in out:
        assert b == running // budget  # the defining invariant
        running += n


_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta echo fox golf hotel india juliet".split()),
    min_size=3,
    max_size=12,
)


@given(
    st.lists(_WORDS, min_size=1, max_size=4),
    st.lists(_WORDS, min_size=1, max_size=6),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_never_misses_property(spark, eval_docs, train_docs):
    """Bloom guarantee under random corpora: every doc the exact
    contamination report flags is bloom-flagged (false positives
    allowed, false negatives never)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import (
        quality as Q,
    )

    ev = spark.createDataFrame(
        [(i, " ".join(w), "e") for i, w in enumerate(eval_docs)],
        "doc_id long, text string, source string",
    )
    tr = spark.createDataFrame(
        [(1000 + i, " ".join(w), "t") for i, w in enumerate(train_docs)],
        "doc_id long, text string, source string",
    )
    words = Q.bloom_build(ev)
    probe = {r["doc_id"]: r["flagged"] for r in Q.bloom_probe(tr, words).collect()}
    exact = {r["doc_id"] for r in Q.contamination_report(tr, ev).collect()}
    for d in exact:
        assert probe[d] == 1


def test_ddsketch_relative_error_guarantee(spark):
    """DDSketch estimates must be within alpha relative error of the
    exact quantile — the paper's guarantee, checked against numpy."""
    import numpy as np
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.sketches import (
        dd_buckets,
        dd_quantiles,
    )

    # deterministic log-normal-ish values via hash, spanning 4 decades
    vals = [0.1 * (1.1 ** (i % 97)) + (i % 13) for i in range(5000)]
    df = spark.createDataFrame(
        [("k", float(v)) for v in vals], "k string, value double"
    )
    alpha = 0.02
    b = dd_buckets(df, keys=["k"], col="value", alpha=alpha)
    got = {
        round(r["q"], 2): r["est"]
        for r in dd_quantiles(b, keys=["k"], qs=[0.5, 0.95, 0.99],
                              alpha=alpha).collect()
    }
    arr = np.array(vals)
    for q in (0.5, 0.95, 0.99):
        exact = float(np.quantile(arr, q, method="inverted_cdf"))
        rel = abs(got[q] - exact) / exact
        assert rel <= alpha + 1e-9, (q, got[q], exact, rel)


def test_ddsketch_buckets_merge_exactly(spark):
    """Sketch mergeability: bucket tables built on two halves, merged
    by summing counts, must equal the single-pass sketch."""
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.sketches import (
        dd_buckets,
    )

    rows = [(i, "k", 0.5 + (i % 101) * 1.37) for i in range(2000)]
    df = spark.createDataFrame(rows, "i bigint, k string, value double")
    whole = dd_buckets(df, keys=["k"]).collect()
    h1 = dd_buckets(df.filter(F.col("i") % 2 == 0), keys=["k"])
    h2 = dd_buckets(df.filter(F.col("i") % 2 == 1), keys=["k"])
    merged = (
        h1.unionByName(h2)
        .groupBy("k", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    assert sorted(map(tuple, whole)) == sorted(map(tuple, merged))


@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=8
        ),
        min_size=2,
        max_size=12,
    )
)
@_SLOW
def test_prefix_filter_exactness_property(spark, docs):
    """For ANY corpus over a tiny alphabet (maximally collision-prone
    prefixes), the prefix-filtered join must equal brute force — the
    zero-false-negative theorem and the verify stage's zero-false-
    positive guarantee, as a property."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]) for r in prefix_filter_pairs(df).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    expect = {
        (a, b)
        for a in sets
        for b in sets
        if a < b and 5 * len(sets[a] & sets[b]) >= 3 * len(sets[a] | sets[b])
    }
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
@_SLOW
def test_triangles_match_bruteforce_property(spark, edges):
    """Degree-oriented enumeration equals the O(n³) python check on
    ANY small graph (self-loops and duplicate/reversed edges
    included)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.graph import (
        triangles,
    )

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = sorted(
        (r["p1"], r["p2"], r["p3"]) for r in triangles(df).collect()
    )
    adj = set()
    nodes = set()
    for a, b in edges:
        if a != b:
            adj.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    ns = sorted(nodes)
    expect = sorted(
        (x, y, z)
        for i, x in enumerate(ns)
        for y in ns[i + 1 :]
        for z in ns
        if y < z
        and (x, y) in adj and (y, z) in adj and (x, z) in adj
    )
    assert got == expect


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=40, unique=True,
    )
)
def test_hilbert_key_matches_reference_property(spark, pts):
    """For arbitrary grid points at order 8, the column fold equals
    the literal xy2d loop and stays within [0, 2^16)."""
    from pyspark.sql import functions as F

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

    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=8).alias("d")
        ).collect()
    }
    for (x, y), d in got.items():
        assert d == xy2d(8, x, y)
        assert 0 <= d < (1 << 16)


@given(
    st.lists(
        st.text(alphabet="abcxy ", min_size=0, max_size=14),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_suffix_array_matches_bruteforce_property(spark, texts):
    """The O(log n) distributed construction equals the definition
    (python sorted suffixes) on ANY small corpus — tiny alphabet
    forces heavy rank ties and identical cross-doc suffixes, the
    hard paths of the doubling + pack-w machinery; empty texts stay
    IN the corpus and must contribute zero suffixes (the
    split('','') phantom-element hazard)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
        suffix_array,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["pos"]): r["sa_rank"] for r in suffix_array(df).collect()
    }
    sufs = sorted((t[p:], d, p) for d, t in docs for p in range(len(t)))
    want = {(d, p): i + 1 for i, (_, d, p) in enumerate(sufs)}
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    ),
    st.integers(2, 5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lcp_ranks_equals_strings_property(spark, texts, min_len):
    """The rank-array LCP greedy (identical-suffix shortcut + level
    descent + bounded residual) equals the string-scan form on ANY
    small corpus — the 3-char alphabet maximizes identical cross-doc
    suffixes and mid-greedy 'identical shorter tail' pairs, the
    subtle paths of the overshoot argument."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
        duplicated_suffix_lcp,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    s = sorted(map(tuple, duplicated_suffix_lcp(df, min_len=min_len).collect()))
    r = sorted(map(tuple, duplicated_suffix_lcp(
        df, min_len=min_len, mode="ranks").collect()))
    assert s == r


@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=12),
        min_size=1,
        max_size=4,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_suffix_removal_matches_reference_property(spark, texts):
    """suffix_removal equals the python reference (suffix sort →
    adjacent LCP → interval union → rebuild) on ANY small corpus,
    empty documents included (zero counts, empty clean_text)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
        suffix_removal,
    )
    from tests.test_suffixes import _brute_removal

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_chars"], r["n_chars_removed"], r["n_spans"]
        )
        for r in suffix_removal(df, min_len=4).collect()
    }
    want = _brute_removal(docs, min_len=4)
    assert got == want


@given(
    st.lists(
        # values drawn from a SMALL pool so heavy tie masses (the
        # audit's hard case) occur constantly, mixed with a wide pool
        st.one_of(st.integers(0, 3), st.integers(0, 1000)),
        min_size=4,
        max_size=120,
    ),
    st.integers(2, 8),
)
@_SLOW
def test_bucket_rank_audit_always_true_on_approx_bucket(spark, vals, n):
    """Property behind the round-8 scale-mode gates: for ANY data —
    including degenerate all-tied columns and duplicate cut points
    with empty buckets — bucket_rank_audit over approx_bucket's own
    routing must return rank_ok TRUE for every bucket of the full
    spine, with n_total exact. (The audit's one-sided bounds are
    constructed to be tie-robust; this is the claim under fire.)"""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.bucketing import (
        approx_bucket,
        bucket_rank_audit,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id bigint, v double"
    )
    rows = bucket_rank_audit(approx_bucket(df, "v", n), "v", n).collect()
    assert len(rows) == n
    assert all(r["n_total"] == len(vals) for r in rows)
    assert all(r["rank_ok"] for r in rows), [
        (r["bucket"], r["rank_ok"]) for r in rows
    ]


@given(
    blob=st.binary(max_size=400),
    w=st.integers(0, 4000),
    h=st.integers(0, 4000),
    dur=st.integers(0, 10**7),
    cut=st.integers(0, 400),
    flip=st.integers(0, 399),
)
@settings(max_examples=60, deadline=None)
def test_video_header_parse_total_never_throws(blob, w, h, dur, cut, flip):
    """parse_video_header is TOTAL over bytes: arbitrary garbage,
    truncated builders, and single-byte corruptions (which can lie
    about box sizes) must return a tuple or None, never raise — the
    contract a 100 TB binary scan needs, since one malformed blob
    must not kill a task."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.multimodal import (
        build_minimal_mp4,
        parse_video_header,
    )

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.multimodal import (
        build_minimal_fmp4,
    )

    for payload in (
        blob,
        build_minimal_mp4(w, h, dur)[:cut],
        bytes(
            b ^ (1 << (flip % 8)) if i == flip % max(1, cut or 1) else b
            for i, b in enumerate(build_minimal_mp4(w, h, dur, pad=7))
        ),
        # round-10: the fragmented-segment walk (styp/sidx/moof) obeys
        # the same totality contract under truncation + bit flips
        build_minimal_fmp4(dur % 10**6)[:cut],
        bytes(
            b ^ (1 << (flip % 8)) if i == flip % max(1, cut or 1) else b
            for i, b in enumerate(build_minimal_fmp4(dur % 10**6, pad=5))
        ),
    ):
        got = parse_video_header(payload)
        assert got is None or (len(got) == 7 and isinstance(got[5], str))
    # the untruncated, uncorrupted builds always round-trip
    full = parse_video_header(build_minimal_mp4(w, h, dur))
    assert full is not None and full[0] == w and full[1] == h
    frag = parse_video_header(build_minimal_fmp4(dur % 10**6))
    assert frag is not None and frag[6] == 1 and frag[2] == dur % 10**6


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        max_size=20,
    ),
    extra=st.sets(st.integers(0, 40), max_size=8),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cluster_split_never_straddles_property(spark, edges, extra):
    """For ANY pair graph (self-loops, duplicates, chains, disjoint
    docs): connected docs share a split AND cluster_id equals the
    component minimum — the leakage-safety invariant as a property."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
        cluster_split,
    )

    ids = sorted({u for e in edges for u in e} | extra)
    if not ids:
        return
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(ids[0], ids[0])],
        "id_a bigint, id_b bigint",
    )
    out = {r["doc_id"]: r for r in cluster_split(docs, pairs).collect()}
    # reference components via union-find
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        if a in parent and b in parent:
            parent[find(a)] = find(b)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    for members in comp.values():
        want = min(members)
        got = {out[i]["cluster_id"] for i in members}
        assert got == {want}
        assert len({out[i]["split"] for i in members}) == 1


# Adjacency-safe alphabet for the repair property: ASCII plus accents
# whose cp1252 byte is >= 0xC0 and NOT a valid 2-byte UTF-8 lead
# (0xC2-0xDF) -- so no adjacency of clean chars can form valid UTF-8
# bytes under cp1252 encoding. Chars that encode into 0x80-0xBF
# (s-caron 0x9A, euro 0x80, em dash 0x97) or to 0xC2-0xDF (sharp-s
# 0xDF) are deliberately EXCLUDED: 'ss-caron'-style adjacencies are
# genuine false positives of the round-trip heuristic (documented in
# repair_mojibake_text; a clean doc is shielded by the detector gate),
# and the unit test covers those chars as isolated words.
_MOJI_SAFE = st.text(
    alphabet="abc XYZ123éèüñöàï", min_size=0, max_size=40
)


@given(_MOJI_SAFE)
@settings(max_examples=200, deadline=None)
def test_full_mojibake_repair_inverts_cp1252_misdecode(s):
    """Round-11 property: over the adjacency-safe alphabet the generic
    repair exactly inverts a utf-8-read-as-cp1252 mis-decode, and is
    the identity on the clean string itself (its cp1252 bytes are not
    valid multi-byte UTF-8)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions.text import (
        repair_mojibake_text,
    )

    broken = s.encode("utf-8").decode("cp1252")
    assert repair_mojibake_text(broken) == s
    assert repair_mojibake_text(s) == s


@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=30),
    st.lists(st.integers(0, 30), min_size=2, max_size=30),
)
@_SLOW
def test_ks_drift_matches_reference_property(spark, xs, ys):
    """ks_drift equals the textbook two-sample KS statistic
    (max ECDF gap over the pooled points, computed in exact Fraction
    arithmetic) on ANY pair of small integer samples."""
    from fractions import Fraction

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        ks_drift,
    )

    rows = [(v, "g1") for v in xs] + [(v, "g2") for v in ys]
    df = spark.createDataFrame(rows, "n_chars bigint, source string")
    got = {r["source"]: r["ks_stat"] for r in ks_drift(df).collect()}

    def ecdf_gap(a, b):
        pts = sorted(set(a) | set(b))
        return max(
            abs(
                Fraction(sum(1 for v in a if v <= p), len(a))
                - Fraction(sum(1 for v in b if v <= p), len(b))
            )
            for p in pts
        )

    want = float(ecdf_gap(xs, ys))
    assert abs(got["g1"] - want) < 1e-12
    assert abs(got["g2"] - want) < 1e-12  # symmetric for two groups


@given(
    st.lists(st.integers(0, 1000), min_size=3, max_size=25),
)
@_SLOW
def test_acf_matches_reference_property(spark, xs):
    """acf_integer equals the float textbook estimator
    Σ(x_t−x̄)(x_{t−k}−x̄)/Σ(x_t−x̄)² on ANY small integer series."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        acf_integer,
    )

    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(xs)],
        "series string, day int, x bigint",
    )
    got = {
        r["lag"]: r["acf"] for r in acf_integer(df, max_lag=3).collect()
    }
    n = len(xs)
    mean = sum(xs) / n
    den = sum((v - mean) ** 2 for v in xs)
    if den == 0:
        assert got == {}
        return
    for k in range(1, 4):
        if k >= n:
            assert k not in got
            continue
        want = (
            sum((xs[t] - mean) * (xs[t - k] - mean) for t in range(k, n))
            / den
        )
        assert abs(got[k] - want) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=20,
    )
)
@_SLOW
def test_km_survival_matches_reference_property(spark, durs):
    """km_survival equals a pure-Python Kaplan–Meier (risk sets from
    first principles) on ANY small set of (duration, event) users —
    censoring ties, duplicate times and risk-set exhaustion
    included."""
    import datetime
    import math

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        km_survival,
    )

    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    for uid, (t_days, ev) in enumerate(durs):
        rows.append((uid, d0, "signup"))
        stamp = d0 + datetime.timedelta(days=t_days)
        rows.append((uid, stamp, "purchase" if ev else "view"))
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["t_days"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in km_survival(df).collect()
    }

    # reference: classic product-limit over event times
    n = len(durs)
    times = sorted({t for t, ev in durs if ev})
    s = 1.0
    exhausted = False
    want = {}
    for tt in times:
        at_risk = sum(1 for t, _ in durs if t >= tt)
        d = sum(1 for t, ev in durs if ev and t == tt)
        if exhausted or d == at_risk:
            exhausted = True
            want[tt] = (at_risk, d, 0.0)
            continue
        # same rounded-log accumulation as the operator (12 dp per
        # factor) — differences are far below the 1e-9 tolerance
        s *= 1.0 - d / at_risk
        want[tt] = (at_risk, d, s)
    assert set(got) == set(want)
    for tt, (nr, d, sv) in want.items():
        assert got[tt][0] == nr and got[tt][1] == d
        if sv == 0.0:
            assert got[tt][2] == 0.0
        else:
            assert math.isclose(got[tt][2], sv, rel_tol=1e-9)


@given(
    st.lists(st.integers(0, 99), min_size=1, max_size=25),
    st.lists(st.integers(0, 99), min_size=1, max_size=25),
)
@_SLOW
def test_psi_drift_matches_reference_property(spark, xs, ys):
    """psi_drift equals the textbook add-one-smoothed PSI computed in
    pure Python over the same global equal-width buckets."""
    import math

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        psi_drift,
    )

    rows = [(v, "g1") for v in xs] + [(v, "g2") for v in ys]
    df = spark.createDataFrame(rows, "n_chars bigint, source string")
    got = {r["source"]: r["psi"] for r in psi_drift(df).collect()}

    allv = xs + ys
    mn, mx = min(allv), max(allv)
    width = mx - mn + 1

    def bucket(v):
        return (v - mn) * 10 // width

    def counts(vals):
        c = [0] * 10
        for v in vals:
            c[bucket(v)] += 1
        return c

    cx, cy = counts(xs), counts(ys)

    def psi(a_counts, b_counts):
        na, nb_ = sum(a_counts), sum(b_counts)
        out = 0.0
        for i in range(10):
            p = (a_counts[i] + 1) / (na + 10)
            q = (b_counts[i] + 1) / (nb_ + 10)
            out += round((p - q) * math.log(p / q), 12)
        return out

    assert math.isclose(got["g1"], psi(cx, cy), rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(got["g2"], psi(cy, cx), rel_tol=1e-9, abs_tol=1e-12)


@given(
    st.lists(
        st.tuples(
            st.lists(
                st.sampled_from("a b c d e f g".split()),
                min_size=1,
                max_size=8,
            ),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=2,
        max_size=15,
    )
)
@_SLOW
def test_js_divergence_matches_reference_property(spark, docs):
    """js_divergence_by_group equals the direct two-distribution JS
    (Counter arithmetic) on ANY small multi-source corpus, and always
    lands in [0, ln 2]."""
    import math
    from collections import Counter

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import (
        corpus as C,
    )

    rows = [
        (i, " ".join(toks), src) for i, (toks, src) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r["source"]: r["js_divergence"]
        for r in C.js_divergence_by_group(df).collect()
    }

    per, allc = {}, Counter()
    for _, text, src in rows:
        c = Counter(text.split())
        per.setdefault(src, Counter()).update(c)
        allc.update(c)

    def js(pc, qc):
        np_, nq = sum(pc.values()), sum(qc.values())
        out = 0.0
        for t_ in set(pc) | set(qc):
            p = pc[t_] / np_
            q = qc[t_] / nq
            m = (p + q) / 2
            if p:
                out += 0.5 * p * math.log(p / m)
            if q:
                out += 0.5 * q * math.log(q / m)
        return out

    for src, cnt in per.items():
        rest = allc - cnt
        if sum(rest.values()) == 0:
            assert src not in got  # whole-corpus slice dropped
            continue
        want = js(cnt, rest)
        assert math.isclose(got[src], want, rel_tol=1e-9, abs_tol=1e-11), src
        assert -1e-12 <= got[src] <= math.log(2.0) + 1e-9


@given(
    st.lists(
        st.lists(
            st.sampled_from("u v w x y z".split()), min_size=2, max_size=7
        ),
        min_size=2,
        max_size=10,
    )
)
@_SLOW
def test_bm25_matches_reference_property(spark, docs):
    """bm25_topk equals a from-scratch Python BM25 (identical query
    derivation, idf, saturation and tie-break) on ANY small corpus."""
    import math
    from collections import Counter

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import (
        corpus as C,
    )

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = sorted(
        (r["query"], r["rnk"], r["doc_id"], round(r["score"], 9))
        for r in C.bm25_topk(df, n_queries=2, k=3).collect()
    )

    toks = {i: t.split() for i, t, _ in rows}
    # query derivation: top-2 bigrams by count, ties lexicographic
    bg = Counter()
    for ts in toks.values():
        bg.update(" ".join(ts[j : j + 2]) for j in range(len(ts) - 1))
    queries = [b for b, _ in sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]

    tf = {i: Counter(ts) for i, ts in toks.items()}
    dfreq = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    n = len(rows)
    sum_dl = sum(len(ts) for ts in toks.values())
    avgdl = sum_dl / n

    want = []
    for qy in queries:
        scored = []
        for i, ts in toks.items():
            s = 0.0
            hit = False
            for term in qy.split():
                f = tf[i][term]
                if f == 0:
                    continue
                hit = True
                idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
                s += round(
                    idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (len(ts) / avgdl))),
                    12,
                )
            if hit:
                scored.append((-s, i))
        scored.sort()
        for rnk, (neg_s, i) in enumerate(scored[:3], start=1):
            want.append((qy, rnk, i, round(-neg_s, 9)))
    assert got == sorted(want)


@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=30),
    st.lists(st.integers(0, 30), min_size=2, max_size=30),
)
@_SLOW
def test_w1_drift_matches_reference_property(spark, xs, ys):
    """w1_drift equals the exact Fraction integral of |ECDF_a − ECDF_b|
    over the pooled grid on ANY pair of small integer samples."""
    from fractions import Fraction

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        w1_drift,
    )

    rows = [(v, "g1") for v in xs] + [(v, "g2") for v in ys]
    df = spark.createDataFrame(rows, "n_chars bigint, source string")
    got = {r["source"]: r["w1_dist"] for r in w1_drift(df).collect()}

    def w1(a, b):
        pts = sorted(set(a) | set(b))
        tot = Fraction(0)
        for lo, hi in zip(pts, pts[1:]):
            fa = Fraction(sum(1 for v in a if v <= lo), len(a))
            fb = Fraction(sum(1 for v in b if v <= lo), len(b))
            tot += abs(fa - fb) * (hi - lo)
        return tot

    want = float(w1(xs, ys))
    assert abs(got["g1"] - want) < 1e-12
    assert abs(got["g2"] - want) < 1e-12  # symmetric for two groups


@given(
    st.lists(st.sampled_from(["en", "de", "fr", "nl"]), min_size=2,
             max_size=25),
    st.lists(st.sampled_from(["en", "de", "fr", "nl"]), min_size=2,
             max_size=25),
)
@_SLOW
def test_chi2_drift_matches_reference_property(spark, xs, ys):
    """chi2_drift equals the textbook two-sample homogeneity statistic
    Σ(O−E)²/E over both samples on ANY pair of small category lists."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
        chi2_drift,
    )

    rows = [(v, "g1") for v in xs] + [(v, "g2") for v in ys]
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {r["source"]: r for r in chi2_drift(df).collect()}

    cats = sorted(set(xs) | set(ys))
    n = len(xs) + len(ys)
    want = 0.0
    for c in cats:
        ct = xs.count(c) + ys.count(c)
        for n_s, o in ((len(xs), xs.count(c)), (len(ys), ys.count(c))):
            e = n_s * ct / n
            want += (o - e) ** 2 / e
    assert abs(got["g1"]["chi2"] - want) < 1e-9
    assert abs(got["g2"]["chi2"] - want) < 1e-9
    assert got["g1"]["df_chi2"] == len(cats) - 1


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(-50, 50)),
        min_size=2,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@_SLOW
def test_theil_sen_matches_reference_property(spark, pts):
    """theil_sen_slope equals the statistics.median of all pairwise
    slopes on ANY small integer series with distinct x."""
    import statistics

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        theil_sen_slope,
    )

    df = spark.createDataFrame(
        [("s", x, float(y)) for x, y in pts],
        "series string, m int, v double",
    )
    got = theil_sen_slope(df).collect()[0]
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
        if x2 != x1
    ]
    # the operator orders pairs by x; direction does not change slope
    assert abs(got["ts_slope"] - statistics.median(slopes)) < 1e-12
    assert got["n_pairs"] == len(slopes)


@given(
    st.lists(st.integers(0, 20), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(0, 20), min_size=1, max_size=8, unique=True),
    st.integers(1, 5),
)
@_SLOW
def test_rrf_fuse_matches_reference_property(spark, ids_a, ids_b, k):
    """rrf_fuse equals a pure-Python reciprocal-rank fusion (score
    1/(60+rank), absent leg contributes 0, score-desc id-asc order)
    on ANY pair of ranked id lists."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [("q", i, r + 1) for r, i in enumerate(ids_a)],
        "query_id string, doc_id bigint, rnk int",
    )
    b = spark.createDataFrame(
        [("q", i, r + 1) for r, i in enumerate(ids_b)],
        "query_id string, doc_id bigint, rnk int",
    )
    got = [
        (r["doc_id"], r["rrf_score"])
        for r in rrf_fuse(a, b, k=k).orderBy("rnk").collect()
    ]
    ra = {i: r + 1 for r, i in enumerate(ids_a)}
    rb = {i: r + 1 for r, i in enumerate(ids_b)}
    scores = {
        i: (1.0 / (60 + ra[i]) if i in ra else 0.0)
        + (1.0 / (60 + rb[i]) if i in rb else 0.0)
        for i in set(ra) | set(rb)
    }
    want = sorted(
        scores.items(), key=lambda kv: (-round(kv[1], 12), kv[0])
    )[:k]
    assert got == want


@given(
    st.lists(st.integers(0, 50), min_size=7, max_size=28),
)
@_SLOW
def test_seasonal_decompose_matches_reference_property(spark, xs):
    """seasonal_decompose_daily equals a pure-Python classical
    additive decomposition (centered 7-day MA on full windows,
    uncentered dow means of the detrended series) on ANY daily
    integer series."""
    import datetime as dt

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    base = dt.date(2024, 1, 1)  # a Monday -> dow = index % 7
    df = spark.createDataFrame(
        [("s", base + dt.timedelta(days=i), v) for i, v in enumerate(xs)],
        "series string, day date, x int",
    )
    got = {
        (r["day"] - base).days: (r["trend"], r["seasonal"], r["resid"])
        for r in seasonal_decompose_daily(df).collect()
    }
    n = len(xs)
    full = [i for i in range(n) if 3 <= i <= n - 4]
    assert set(got) == set(full)
    trend = {i: sum(xs[i - 3 : i + 4]) / 7.0 for i in full}
    by_dow: dict[int, list[int]] = {}
    for i in full:
        by_dow.setdefault(i % 7, []).append(7 * xs[i] - sum(xs[i - 3 : i + 4]))
    seas = {d: sum(v) / (7.0 * len(v)) for d, v in by_dow.items()}
    for i in full:
        t_, s_, r_ = got[i]
        assert abs(t_ - trend[i]) < 1e-12
        assert abs(s_ - seas[i % 7]) < 1e-12
        assert abs(r_ - (xs[i] - trend[i] - seas[i % 7])) < 1e-9


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=9
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 12),
)
@_SLOW
def test_chunk_sentences_matches_reference_property(spark, sent_words, B):
    """chunk_sentences equals a pure-Python greedy whole-sentence
    packer on ANY sentence structure and budget: same chunk
    boundaries, same texts, and the concatenation of chunks
    round-trips the document exactly (no token lost/duplicated)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
        chunk_sentences,
    )

    sents = [" ".join(ws) + "." for ws in sent_words]
    text = " ".join(sents)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [
        (r["chunk_id"], r["n_sentences"], r["chunk_text"])
        for r in chunk_sentences(df, max_tokens=B)
        .orderBy("chunk_id")
        .collect()
    ]

    chunks: list[list[str]] = []
    fill = 0
    for s in sents:
        t = len(s.split(" "))
        if chunks and fill + t <= B:
            chunks[-1].append(s)
            fill += t
        else:
            chunks.append([s])
            fill = t
    want = [
        (ci, len(ws), " ".join(ws)) for ci, ws in enumerate(chunks)
    ]
    assert got == want
    assert " ".join(c[2] for c in got) == text


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SLOW
def test_paragraph_dedup_matches_reference_property(spark, doc_paras):
    """Round-14 paragraph_dedup vs an independent pure-Python replay:
    docs are lists of paragraphs drawn from a 6-word pool (high
    cross-doc duplicate rate), joined with blank lines. First
    (doc_id, pos) occurrence of each distinct paragraph survives;
    docs reassemble survivors in order; docs with no paragraphs drop;
    fully-redundant docs keep '' rows."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
        paragraph_dedup,
    )

    rows = [
        (i, "\n\n".join(paras)) for i, paras in enumerate(doc_paras)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_paras_kept"])
        for r in paragraph_dedup(df).collect()
    }

    seen: set[str] = set()
    want: dict[int, tuple[str, int, int]] = {}
    for i, paras in enumerate(doc_paras):
        nonempty = [p for p in paras if p.strip()]
        if not nonempty:
            continue
        kept = []
        for p in nonempty:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[i] = ("\n\n".join(kept), len(nonempty), len(kept))
    assert got == want
