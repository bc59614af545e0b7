"""Sources: filename-metadata CSV scan, hierarchical union, CLI main."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import pandas as pd
from pyspark.sql import types as T

from sems_event_deduplication_spark.sources.readers import (
    read_csv_with_filename_dates,
    union_hierarchical,
)

CSV_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("url", T.StringType()),
])


def test_csv_filename_dates(spark):
    d = tempfile.mkdtemp(prefix="csvsrc_")
    os.makedirs(os.path.join(d, "countryA"), exist_ok=True)
    for name, rows in [
        ("2023-05-01_2023-05-02", [("t1", "u1"), ("t2", "u2")]),
        ("2023-06-10_2023-06-11", [("t3", "u3")]),
    ]:
        pd.DataFrame(rows, columns=["title", "url"]).to_csv(
            os.path.join(d, "countryA", f"{name}.csv"), index=False
        )
    df = read_csv_with_filename_dates(spark, os.path.join(d, "*", "*.csv"), CSV_SCHEMA)
    got = {(r["title"], str(r["start_date"]), str(r["end_date"])) for r in df.collect()}
    assert ("t1", "2023-05-01", "2023-05-02") in got
    assert ("t3", "2023-06-10", "2023-06-11") in got


def test_union_hierarchical_missing_columns(spark):
    a = spark.createDataFrame(pd.DataFrame({"title": ["x"], "keyword": ["k"]}))
    b = spark.createDataFrame(pd.DataFrame({"title": ["y"]}))
    got = union_hierarchical([a, b])
    rows = {(r["title"], r["keyword"]) for r in got.collect()}
    assert rows == {("x", "k"), ("y", None)}


def test_cli_main_synth():
    out = subprocess.run(
        [
            sys.executable, "-m", "sems_event_deduplication_spark.main",
            "--synth", "40", "--warehouse", tempfile.mkdtemp(prefix="wh_cli_"),
            "--cores", "4", "--config", "num_perm=64", "bands=16",
        ],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["n_clips"] > 40
    assert payload["clips_per_sec"] > 0
    assert "signatures" in payload["stages"]
