"""Verify tiers: LSH candidates, Jaccard, containment suffix arrays."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.conf import DedupConfig
from sems_event_deduplication_spark.functions.minhash import (
    band_hashes,
    make_minhash_udf,
    shingle_hashes,
)
from sems_event_deduplication_spark.functions.text import char_shingles
from sems_event_deduplication_spark.operators.lsh import candidate_pairs, explode_bands
from sems_event_deduplication_spark.operators.verify import (
    containment_pairs,
    verify_jaccard,
)

CFG = DedupConfig()


def _sigs(spark, docs: dict[str, str]):
    pdf = pd.DataFrame({"clip_id": list(docs), "transcript_norm": list(docs.values())})
    mh = make_minhash_udf(CFG.num_perm, CFG.seed)
    return (
        spark.createDataFrame(pdf)
        .withColumn("shingles", char_shingles(F.col("transcript_norm"), CFG.shingle_k))
        .withColumn("minhash_sig", mh(shingle_hashes(F.col("shingles"))))
        .withColumn("bands", band_hashes(F.col("minhash_sig"), CFG.bands, CFG.rows_per_band))
    )


def test_lsh_finds_near_dups_and_verify_filters(spark):
    docs = {
        "a": "typhoon mawar slams into guam as residents urged to shelter today",
        "b": "typhoon mawar slams into guam as residents urged to shelter now",
        "c": "completely unrelated flood warning for the malawi river basin area",
    }
    sigs = _sigs(spark, docs)
    banded = explode_bands(sigs, "clip_id", "bands")
    cands = candidate_pairs(banded, CFG.max_bucket_size)
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert ("a", "b") in cand_set

    verified = verify_jaccard(cands, sigs, CFG.num_perm, CFG.jaccard_threshold)
    vset = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert ("a", "b") in vset
    assert all("c" not in p for p in vset)


def test_star_edges_for_oversized_buckets(spark):
    # 6 identical docs with cap 3 -> star edges to min id, still one component
    docs = {f"d{i}": "identical text for the oversized bucket case here" for i in range(6)}
    sigs = _sigs(spark, docs)
    banded = explode_bands(sigs, "clip_id", "bands")
    cands = candidate_pairs(banded, max_bucket_size=3)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # star edges: every non-min connects to d0
    for i in range(1, 6):
        assert ("d0", f"d{i}") in pairs
    # no quadratic blowup
    assert len(pairs) == 5


def test_containment_suffix_array(spark):
    docs = {
        "short": "typhoon mawar slams into guam",
        "long": "breaking news typhoon mawar slams into guam with heavy rain tonight",
        "other": "flood warning for the malawi river basin area continues",
    }
    sigs = _sigs(spark, docs)
    banded = explode_bands(sigs, "clip_id", "bands")
    got = containment_pairs(banded, sigs, CFG.max_bucket_size)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # containment found iff the two share at least one LSH band; with
    # jaccard ~0.45 they may or may not — so assert only on correctness
    # of found pairs: any reported pair must be a true containment.
    texts = docs
    for a, b in pairs:
        assert texts[a] in texts[b] or texts[b] in texts[a]


def test_containment_within_forced_bucket(spark):
    # force same bucket by making texts near-identical except a suffix
    docs = {
        "s": "typhoon mawar slams into guam as residents urged to shelter",
        "l": "typhoon mawar slams into guam as residents urged to shelter overnight",
    }
    sigs = _sigs(spark, docs)
    banded = explode_bands(sigs, "clip_id", "bands")
    got = containment_pairs(banded, sigs, CFG.max_bucket_size)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert ("l", "s") in pairs or ("s", "l") in pairs


def test_bucket_stats_counts_star_degradation(spark):
    """bucket_stats must report exactly the buckets the star-edge cap
    degrades and how many pairs were not enumerated."""
    import pandas as pd

    from sems_event_deduplication_spark.operators.lsh import bucket_stats

    rows = (
        # bucket (0, 1): 5 members -> over a cap of 3
        [("a%d" % i, 0, 1) for i in range(5)]
        # bucket (0, 2): 3 members -> at the cap, fully enumerated
        + [("b%d" % i, 0, 2) for i in range(3)]
        # bucket (1, 3): singleton
        + [("c0", 1, 3)]
    )
    banded = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "band_id", "band_hash"])
    )
    got = bucket_stats(banded, max_bucket_size=3).first().asDict()
    assert got == {
        "n_buckets": 3,
        "n_star_buckets": 1,
        "n_star_members": 5,
        # 5*4/2 = 10 full pairs, 4 star edges emitted -> 6 not enumerated
        "n_pairs_not_enumerated": 6,
    }


def test_suffix_array_matches_naive():
    """Rank-doubling SA must equal the naive slice-sort on random and
    pathologically repetitive strings (the shape that made slice keys
    quadratic)."""
    import numpy as np

    from sems_event_deduplication_spark.operators.verify import _suffix_array

    rng = np.random.default_rng(3)
    cases = ["", "a", "banana\x00ana", "aaaaaaaaaa", "abababababab"]
    for _ in range(10):
        n = int(rng.integers(2, 200))
        cases.append("".join(rng.choice(list("ab\x00cd"), size=n)))
    for s in cases:
        naive = sorted(range(len(s)), key=lambda i: s[i:])
        assert _suffix_array(s) == naive, s[:40]


def test_suffix_array_repetitive_fast():
    """100k chars of pure repetition must finish in well under a second
    (the slice-key form took minutes here)."""
    import time

    from sems_event_deduplication_spark.operators.verify import _suffix_array

    s = "ab" * 50_000
    t0 = time.monotonic()
    sa = _suffix_array(s)
    assert len(sa) == 100_000
    assert time.monotonic() - t0 < 5.0
