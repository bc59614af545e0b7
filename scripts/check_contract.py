"""Local mimic of the driver's correctness harness.

Runs every ``queries()`` entry at sf=0.01 and compares against
``oracle_sql()`` via DuckDB: row count, column-name set, and an
order-insensitive value comparison (sorted by all columns). Queries
without an oracle get a rows-only check (>= 0 rows, stable schema).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    if set(spark_df.columns) != set(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    import numpy as np

    a, b = norm_frame(spark_df), norm_frame(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            # the driver's value hash distinguishes 5 from 5.0: an
            # int-vs-float dtype split between engines hash-mismatches
            # even when every value compares equal (the round-1
            # session_count_per_user failure class) — flag it here
            if pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
                if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
                    problems.append(
                        f"column {c}: dtype split spark={av.dtype} vs "
                        f"oracle={bv.dtype} — driver value-hash will mismatch "
                        "(cast both sides to the same family)"
                    )
                close = np.isclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
                )
                if not close.all():
                    idx = ~close
                    problems.append(
                        f"column {c}: {idx.sum()} value mismatches "
                        f"(e.g. {av[idx].head(3).tolist()} vs {bv[idx].head(3).tolist()})"
                    )
            else:
                idx = av.astype(str) != bv.astype(str)
                if idx.any():
                    problems.append(
                        f"column {c}: {idx.sum()} value mismatches "
                        f"(e.g. {av[idx].head(3).tolist()} vs {bv[idx].head(3).tolist()})"
                    )
    return problems


def main():
    only = sys.argv[1:] or None

    import __spark_entry__ as entrymod
    from sems_event_deduplication_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    from sems_event_deduplication_spark.operators.strategies import (
        release_gated_broadcasts,
    )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        finally:
            # queries using count-gated broadcasts (merge/silver) pin
            # their narrow aggregates; this single long-lived session
            # runs 44 of them, so release between queries — in a
            # finally so a FAILED query's gated frames don't stay
            # pinned for the rest of the session
            release_gated_broadcasts()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {round(time.time()-t0,1)}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(odf)} rows):")
            for p in problems:
                print("     ", p)
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({round(time.time()-t0,1)}s)")

    # entry() smoke
    if not only:
        t0 = time.time()
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"ok   entry(): {n} rows, schema={[f.name for f in edf.schema.fields]} ({round(time.time()-t0,1)}s)")

    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
