#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark). Runs each SparkEntry.oracleSql in
DuckDB over the sf-dir parquet tables and compares against the Verify
parquet dumps: columns sorted by name, rows sorted, values compared.

Usage: python3 tools/check.py [sfDir] [verifyOutDir] [jsonArtifactOut]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first; the optional
third arg writes the per-query result map in the driver's
CORRECTNESS_r*.json format, e.g. for the sf0.1 artifact)
"""
import duckdb, glob, json, os, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so dtype-representation differences
    # (datetime64[us] vs [ns], float32 vs 64 lists) don't mask real diffs
    def cell(v):
        import datetime
        import numpy as np
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, (float, np.floating)):
            return float(v).hex()  # bit-exact float compare
        if isinstance(v, (int, np.integer)):
            return int(v)
        if isinstance(v, (bool, np.bool_)):
            return bool(v)
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            # the DRIVER's comparator crashes on nested cells (pandas
            # sort_values → unhashable ndarray). Fail the same way locally
            # so array-typed outputs can never look green here and err
            # there (the r05 q83/q87/q88/q99 divergence). Queries must
            # to_json-serialize nested columns (Q.jsonArrays).
            raise TypeError(
                f"nested cell {type(v).__name__} in output — driver's "
                "comparator cannot hash it; serialize with to_json")
        return v
    out = df.map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            # testdata ships single-file parquet; Spark-written mirrors
            # (graft.ScaleCorpus) are part-file DIRECTORIES — glob those
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        results[name] = rec
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec["err"] = "no spark output"
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(oracle[name]).arrow().to_pandas()
            a, b = norm(spark_df), norm(duck_df)
            rec["spark_rows"] = len(a)
            rec["oracle_rows"] = len(b)
            rec["rows_match"] = len(a) == len(b)
            rec["schema_match"] = list(a.columns) == list(b.columns)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                i = bad.idxmax()
                print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ; first at {i}:")
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
                n_fail += 1
            else:
                rec["hash_match"] = True
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {e}"
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
