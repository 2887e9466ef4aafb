#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
Compares each <verifyOutDir>/<name> spark parquet result against the
oracle SQL in <verifyOutDir>/oracle_sql.json run on DuckDB over the
sfDir parquet tables. Columns sorted by name; rows sorted; values
stringified for hashing (floats via repr of round-trip float).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, rows by full tuple string
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        sr = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [c[0] for c in con.description]
        if name not in oracles:
            print(f"{name}: NO_ORACLE rows={len(sr)}")
            continue
        try:
            orr = con.execute(oracles[name]).fetchall()
            ocols = [c[0] for c in con.description]
        except Exception as e:
            print(f"{name}: ORACLE_ERR {e}")
            n_fail += 1
            continue
        rows_ok = len(sr) == len(orr)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = canon(sr, scols) == canon(orr, ocols) if rows_ok and schema_ok else False
        # fetchdf-level repr check: DuckDB HUGEINT (e.g. any sum()) comes
        # through pandas as float64 ('0.0' vs '0'), which fetchall hides;
        # tools/oracle_check.py compares via dataframes, so mirror that
        # strictness here for the queries being checked.
        repr_ok = True
        if rows_ok and schema_ok and hash_ok:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            odf = con.execute(oracles[name]).fetchdf()
            cols = sorted(scols)
            def dfcanon(df):
                return sorted(tuple(repr(v) for v in r)
                              for r in df[cols].astype(object).values)
            repr_ok = dfcanon(sdf) == dfcanon(odf)
            if not repr_ok:
                print(f"  [repr] dataframe-level mismatch (HUGEINT->float?)")
        ok = rows_ok and schema_ok and hash_ok and repr_ok
        n_pass += ok
        n_fail += (not ok)
        msg = "PASS" if ok else (
            f"FAIL rows={len(sr)}/{len(orr)} schema={schema_ok} "
            f"spark_cols={sorted(scols)} oracle_cols={sorted(ocols)}")
        print(f"{name}: {msg}")
        if rows_ok and schema_ok and not hash_ok:
            a, b = canon(sr, scols), canon(orr, ocols)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"  spark : {x[:200]}")
                print(f"  oracle: {y[:200]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")

if __name__ == "__main__":
    main()
