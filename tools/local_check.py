#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir> [names...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the sf
tables registered as views, loads the matching Spark parquet dump, sorts
columns by name and rows by value, and reports exact/hash equality per query.

Optional trailing args limit the run: bare names select queries,
`-name` EXCLUDES a query (resume/adjudication at big SFs — e.g. the r16
sf1 soak excludes q_fuzzy_join, whose oracle pays ~2.2B levenshtein
pairs at x10 replication, and re-checks it at a reduced factor).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total sort (mixed types, arrays)
    key = df.apply(lambda r: tuple(repr(v) for v in r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    all_oracled = set(oracle)
    only = {a for a in sys.argv[3:] if not a.startswith("-")}
    skip = {a[1:] for a in sys.argv[3:] if a.startswith("-")}
    if only or skip:
        oracle = {k: v for k, v in oracle.items()
                  if (not only or k in only) and k not in skip}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        spark = pd.concat([pd.read_parquet(f) for f in
                           sorted(glob.glob(f"{spark_path}/*.parquet"))])
        d, s = canon(duck), canon(spark)
        if list(d.columns) != list(s.columns):
            print(f"FAIL {name}: columns duck={list(d.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(d) != len(s):
            print(f"FAIL {name}: rows duck={len(d)} spark={len(s)}")
            n_fail += 1
            continue
        dv = d.map(repr)
        sv = s.map(repr)
        if not dv.equals(sv):
            diff = (dv != sv)
            cells = int(diff.values.sum())
            print(f"FAIL {name}: {cells} differing cells of {d.size}")
            rows = diff.any(axis=1)
            idx = list(d.index[rows])[:3]
            for i in idx:
                print(f"  duck : {d.loc[i].to_dict()}")
                print(f"  spark: {s.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(d)} rows)")
            n_pass += 1
    # queries without an oracle: rows-only smoke. Under a name-filtered
    # run, suppress it only for names NOT selected on the command line —
    # a genuinely oracle-less name explicitly selected still gets its
    # smoke output (r16 ADVICE).
    if only or skip:
        all_oracled |= {os.path.basename(p)
                        for p in glob.glob(f"{out_dir}/q_*")
                        if not ((not only or os.path.basename(p) in only)
                                and os.path.basename(p) not in skip)}
    for name in sorted(set(os.path.basename(p) for p in glob.glob(f"{out_dir}/q_*"))
                       - all_oracled):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        nrows = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
        print(f"INFO {name}: no oracle, {nrows} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
