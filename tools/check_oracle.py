#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query
result parquet under OUTDIR, run the oracle SQL from oracle_sql.json against
views over SFDIR's parquet tables, sort columns by name, and compare values.

Usage: check_oracle.py SFDIR OUTDIR [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # sort columns by name, then rows by all columns (stringified)
    df = df[sorted(df.columns)]
    return df

def values_match(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no result parquet ({e})"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                an = a is None or (isinstance(a, float) and math.isnan(a)) or str(a) == 'NaT' or str(a) == 'None'
                bn = b is None or (isinstance(b, float) and math.isnan(b)) or str(b) == 'NaT' or str(b) == 'None'
                if an and bn:
                    continue
                if an != bn or not values_match(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: got={a!r} want={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len([k for k in oracles if not only or k in only])} checked")

if __name__ == "__main__":
    main()
