#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/verify_local.py <sfDir> <outDir>

For each query output parquet in <outDir>, runs the matching oracle SQL
(from <outDir>/oracle_sql.json) in DuckDB with each testdata table
registered as a view, then compares: row count, column names, and
values (columns sorted by name, rows sorted by all columns).
Prints a per-query PASS/FAIL with a diff sample on mismatch.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: floats stay floats, ints -> int64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    def load_json(fname, default):
        p = os.path.join(out_dir, fname)
        return json.load(open(p)) if os.path.exists(p) else default

    # Artifacts written by graft.Verify: the full registered key set and
    # per-query Spark-side errors. A query that ERRORS during the dump
    # must fail THIS gate loudly, not silently vanish from the compare
    # (round 5 shipped 12 broken queries exactly that way).
    registered = load_json("registered_queries.json", [])
    verify_errors = load_json("verify_errors.json", {})

    results = {}
    for name, err in verify_errors.items():
        results[name] = f"FAIL (spark error: {err})"
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if name in results:   # errored query with a stale/partial dump dir
            continue
        try:
            spark_df = pd.read_parquet(qdir)
        except Exception as e:
            results[name] = f"FAIL (unreadable spark output: {e})"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" + \
                (" FAIL-EMPTY" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"FAIL (oracle error: {e})"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"FAIL (cols spark={list(a.columns)} duck={list(b.columns)})"
            continue
        if len(a) != len(b):
            results[name] = f"FAIL (rows spark={len(a)} duck={len(b)})"
            continue
        diffs = []
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                neq = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
            else:
                neq = ~((a[c].astype(str) == b[c].astype(str)) |
                        (a[c].isna() & b[c].isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: "
                             f"spark={a[c][i]!r} duck={b[c][i]!r}")
        if not diffs:
            # a 0-row PASS is vacuous unless emptiness IS the semantics
            # under test (round 6: api_data_point went green for a
            # round while verifying nothing after a testdata regen
            # moved its probe key) — annotate so it can't hide
            results[name] = "PASS (0 rows - check gate vacuity)" if len(a) == 0 else "PASS"
        else:
            results[name] = "FAIL " + "; ".join(diffs[:3])

    # queries that produced no output dir at all. registered_queries.json
    # now lists only the keys this Verify invocation ATTEMPTED (a subset
    # run records its subset), so the coverage check is scoped to it:
    # a registered-but-never-dumped query (crash, skip, rename drift)
    # fails loudly, while a deliberate subset run doesn't drown in
    # "no spark output" noise for keys it never tried. Oracle keys only
    # count when no registry artifact exists (older dumps).
    expected = set(registered) if registered else set(oracle)
    for name in expected:
        if name not in results:
            results[name] = "FAIL (no spark output)"
    results = {k: v for k, v in results.items()
               if not registered or k in set(registered)}

    for name, v in sorted(results.items()):
        print(f"{'✅' if v.startswith(('PASS', 'rows-only')) and 'FAIL' not in v else '❌'} {name}: {v}")
    bad = sum(1 for v in results.values() if "FAIL" in v)
    print(f"\n{len(results) - bad}/{len(results)} OK")
    if verify_errors:
        print(f"SPARK-SIDE ERRORS ({len(verify_errors)}): "
              + ", ".join(sorted(verify_errors)))
    if registered and set(registered) - set(results):
        print("UNCOVERED REGISTERED QUERIES: "
              + ", ".join(sorted(set(registered) - set(results))))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
