#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the engine's parquet result,
run the oracle SQL from oracle_sql.json in DuckDB against the sf tables,
sort columns by name, sort rows, and compare row counts + value hashes.
"""
import sys, json, glob, hashlib
import duckdb

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def hash_df(df):
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == "object":
            vals = s.astype(str)
        elif str(s.dtype).startswith("datetime"):
            vals = s.astype("int64").astype(str)
        elif s.dtype == "float64":
            vals = s.round(6).astype(str)
        else:
            vals = s.astype(str)
        h.update("\x00".join(vals.tolist()).encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING   {name}: no engine output")
            fail += 1
            continue
        got = canon(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        want = canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA    {name}: {list(got.columns)} vs {list(want.columns)}")
            fail += 1
        elif len(got) != len(want):
            print(f"ROWCOUNT  {name}: {len(got)} vs {len(want)}")
            fail += 1
        elif hash_df(got) != hash_df(want):
            print(f"HASH      {name}: {len(got)} rows, values differ")
            print(got.head(3)); print(want.head(3))
            fail += 1
        else:
            print(f"OK        {name}: {len(got)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
