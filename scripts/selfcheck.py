#!/usr/bin/env python3
"""Driver-style correctness self-check (local only, NOT part of the library).

Replicates what the driver does: run graft.Verify (caller does that first),
then for each dumped query result, run the oracle SQL in DuckDB against the
same parquet tables and compare (columns sorted by name, rows sorted, values
compared exactly with a tiny float tolerance fallback reported separately).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes a bit: timestamps -> iso strings, decimals -> float
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif dt in ("int8", "int16", "int32"):
            df[c] = df[c].astype("int64")
        elif dt == "float32":
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: float(v) if type(v).__name__ == "Decimal" else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        exact = got.equals(want)
        if exact:
            print(f"PASS {name} ({len(got)} rows, exact)")
            n_pass += 1
        else:
            # localize the mismatch
            diffs = []
            for c in got.columns:
                neq = (got[c] != want[c]) & ~(got[c].isna() & want[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[{i}]: {got[c][i]!r} != {want[c][i]!r}")
            print(f"FAIL {name}: value mismatch — {'; '.join(diffs[:4])}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
