"""Normalization + shingling parity: Spark native exprs vs Python mirror."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.functions.text import (
    char_shingles,
    longest_pipe_part,
    normalize_text,
    word_tokens,
)
from oracle_utils import normalize_py, shingle_set_py

CASES = [
    "Typhoon Mawar slams into Guam | Global Disaster News",
    "short | a much longer middle part here | mid",
    "UPPER Case, punct!!! and   spaces",
    "nbsp here",
    "|||",
    "",
    "no pipes at all just words",
    "éàccénts and 日本語 mixed",
    "a|bb|ccc|dddd",
]


def test_normalize_matches_python_mirror(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": CASES}))
    got = [r["n"] for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    want = [normalize_py(t) for t in CASES]
    assert got == want


def test_longest_pipe_part(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["short | the longest part | mid"]}))
    got = df.select(longest_pipe_part(F.col("t")).alias("p")).collect()[0]["p"]
    assert got == "the longest part"


def test_char_shingles_match_python(spark):
    k = 9
    texts = [normalize_py(t) for t in CASES]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    rows = df.select("t", char_shingles(F.col("t"), k).alias("s")).collect()
    for r in rows:
        assert frozenset(r["s"]) == shingle_set_py(r["t"], k), r["t"]


def test_shingles_short_and_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["abc", ""]}))
    rows = {r["t"]: r["s"] for r in df.select("t", char_shingles(F.col("t"), 9).alias("s")).collect()}
    assert rows["abc"] == ["abc"]
    assert rows[""] == []


def test_word_tokens(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["a b  c", ""]}))
    rows = [r["w"] for r in df.select(word_tokens(F.col("t")).alias("w")).collect()]
    assert rows[0] == ["a", "b", "c"]
    assert rows[1] == []
