"""Distributed suffix array (operators/suffixes.py): hand-computed
banana check, differential equality with directly-sorted suffixes,
cross-document duplicate detection via LCP, partition invariance,
and the no-global-sort plan property inherited from ranking."""

from __future__ import annotations

import pytest

# round 16: slow tier — suffix-array brute-force / partition-invariance replays; the x_suffix_* oracle rows re-pin the same math every round
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
    duplicated_suffix_lcp,
    suffix_array,
    suffix_ranks,
    suffix_removal,
)


def _brute_sa(docs: list[tuple[int, str]]) -> dict[tuple[int, int], int]:
    sufs = [
        (text[p:], d, p) for d, text in docs for p in range(len(text))
    ]
    return {
        (d, p): i + 1 for i, (_, d, p) in enumerate(sorted(sufs))
    }


def test_suffix_array_banana(spark):
    """banana: suffixes sorted are a<ana<anana<banana<na<nana →
    sa ranks by pos: [4,3,6,2,5,1] for pos 0..5."""
    df = spark.createDataFrame([(1, "banana")], "doc_id bigint, text string")
    got = {r["pos"]: r["sa_rank"] for r in suffix_array(df).collect()}
    assert got == {5: 1, 3: 2, 1: 3, 0: 4, 4: 5, 2: 6}


def test_suffix_array_matches_brute_force_multi_doc(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "entirely different words"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["pos"]): r["sa_rank"] for r in suffix_array(df).collect()
    }
    assert got == _brute_sa(docs)


def test_suffix_ranks_equal_for_identical_cross_doc_suffixes(spark):
    """Two docs ending in the same tail: those suffixes must share a
    dense rank (they ARE equal strings); all unequal suffixes get
    distinct ranks."""
    docs = [(1, "xyz common tail"), (2, "abc common tail")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = suffix_ranks(df).collect()
    by_suffix: dict[str, set[int]] = {}
    texts = dict(docs)
    for r in rows:
        by_suffix.setdefault(texts[r["doc_id"]][r["pos"]:], set()).add(r["rank"])
    for suf, ranks in by_suffix.items():
        assert len(ranks) == 1, (suf, ranks)
    distinct_sufs = len(by_suffix)
    distinct_ranks = len({next(iter(v)) for v in by_suffix.values()})
    assert distinct_ranks == distinct_sufs


def test_duplicated_suffix_lcp_finds_exact_repeats(spark):
    """A 17-char phrase pasted into two docs: every position inside
    the shared phrase has an SA-neighbor LCP covering the remaining
    shared characters; unique text yields nothing at min_len=10."""
    shared = "quick brown foxes"  # 17 chars
    docs = [
        (1, f"AAA {shared} BBB"),
        (2, f"CCC {shared} DDD"),
        (3, "nothing in common here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = duplicated_suffix_lcp(df, min_len=10).collect()
    assert rows, "shared phrase not detected"
    # every hit is inside doc 1 or 2 and its fragment really does
    # occur verbatim somewhere else in the corpus
    texts = dict(docs)
    for r in rows:
        assert r["doc_id"] in (1, 2), r
        d_text = texts[r["doc_id"]]
        frag = d_text[r["pos"]: r["pos"] + r["lcp"]]
        occurrences = sum(t.count(frag) for t in texts.values())
        assert occurrences >= 2, (r, frag)
    # the best hit covers the full shared phrase
    assert max(r["lcp"] for r in rows) >= len(shared)


def test_suffix_array_partition_invariant(spark):
    docs = [(i, f"document number {i} with shared boilerplate sentence") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    a = sorted(map(tuple, suffix_array(df.repartition(2)).collect()))
    b = sorted(map(tuple, suffix_array(df.repartition(7)).collect()))
    assert a == b


def test_suffix_array_max_chars_truncates(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij")], "doc_id bigint, text string"
    )
    rows = suffix_array(df, max_chars=4).collect()
    assert {r["pos"] for r in rows} == {0, 1, 2, 3}
    got = {r["pos"]: r["sa_rank"] for r in rows}
    want = {p: rank for (_, p), rank in _brute_sa([(1, "abcd")]).items()}
    assert got == want


def _brute_removal(docs, min_len):
    """Reference: suffix sort, adjacent LCP, spans, union, rebuild."""
    sufs = sorted(
        (text[p:], d, p) for d, text in docs for p in range(len(text))
    )
    spans = {}
    for i in range(1, len(sufs)):
        a, b = sufs[i - 1][0], sufs[i][0]
        lcp = 0
        for x, y in zip(a, b):
            if x != y:
                break
            lcp += 1
        if lcp >= min_len:
            _, d, p = sufs[i]
            spans.setdefault(d, []).append((p, p + lcp))
    out = {}
    for d, text in docs:
        ivs = sorted(spans.get(d, []))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        removed = set()
        for s, e in merged:
            removed.update(range(s, e))
        clean = "".join(c for i, c in enumerate(text) if i not in removed)
        out[d] = (clean, len(text), len(removed), len(merged))
    return out


def test_suffix_removal_matches_brute_force(spark):
    """Full-frame equality with the reference implementation on a
    corpus mixing a cross-doc shared phrase (SA-first copy survives),
    an in-doc repeat, and an untouched unique doc."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
        suffix_removal,
    )

    shared = "the exact duplicated clause"
    docs = [
        (1, f"alpha {shared} aaa tail one"),
        (2, f"beta {shared} zzz tail two"),
        (3, "entirely unique sentence with no repeats"),
        (4, "echo echo echo echo echo echo echo echo"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_chars"], r["n_chars_removed"], r["n_spans"]
        )
        for r in suffix_removal(df, min_len=12).collect()
    }
    want = _brute_removal(docs, min_len=12)
    assert got == want
    # the unique doc is untouched, and something was removed overall
    assert got[3] == (docs[2][1], len(docs[2][1]), 0, 0)
    assert sum(v[2] for v in got.values()) > 0


def test_suffix_removal_partition_invariant(spark):
    docs = [
        (i, f"copy {i} of the same boilerplate paragraph body")
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    a = sorted(map(tuple, suffix_removal(df.repartition(2), min_len=10).collect()))
    b = sorted(map(tuple, suffix_removal(df.repartition(5), min_len=10).collect()))
    assert a == b


def test_lcp_ranks_mode_equals_strings_mode(spark):
    """The 100 TB rank-array LCP (greedy descent over the doubling
    history + bounded residual + identical-suffix shortcut) must
    produce the EXACT same (doc, pos, lcp) frame as the string-scan
    audit form — on a crafted corpus with cross-doc shares, in-doc
    repeats, identical tails, and at two min_len settings."""
    shared = "the exact duplicated clause body"
    docs = [
        (1, f"alpha {shared} aaa tail one"),
        (2, f"beta {shared} zzz tail two"),
        (3, "entirely unique sentence with no repeats"),
        (4, "echo echo echo echo echo echo echo echo"),
        (5, "xyz common ending suffix"),
        (6, "abc common ending suffix"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for ml in (8, 15):
        s = sorted(map(tuple, duplicated_suffix_lcp(df, min_len=ml).collect()))
        r = sorted(map(tuple, duplicated_suffix_lcp(
            df, min_len=ml, mode="ranks").collect()))
        assert s == r, (ml, s[:5], r[:5])
    assert s, "fixture produced no spans at min_len=15"


def test_lcp_ranks_mode_on_fixture_documents(spark):
    """Same equivalence over real fixture documents (the gate slice)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 10)
    )
    s = sorted(map(tuple, duplicated_suffix_lcp(
        docs, min_len=15, max_chars=200).collect()))
    r = sorted(map(tuple, duplicated_suffix_lcp(
        docs, min_len=15, max_chars=200, mode="ranks").collect()))
    assert s == r and len(s) > 0


def test_suffix_ranks_pair_rank_equals_packed(spark):
    """ADVICE r7: above ~3e9 positions the packed doubling key
    r1*(n+1)+r2 would wrap int64, so suffix_ranks switches to the
    two-column pair rank. Forcing each form on the same corpus must
    yield identical ranks (the NULLs-first pair order IS the packed
    order)."""
    docs = [(1, "banana band"), (2, "ananas banana"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    packed = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(df, pair_rank=False).collect()
    }
    paired = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(df, pair_rank=True).collect()
    }
    assert packed == paired and len(packed) == len("banana band") + len(
        "ananas banana"
    )
