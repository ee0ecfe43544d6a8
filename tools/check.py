#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results on the same tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())  # scale-insensitive decimal compare
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(got)})" + ("" if len(got) > 0 else " !!EMPTY")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            results[name] = f"SCHEMA_MISMATCH got={g_cols} exp={e_cols}"
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got[g_cols].itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp[e_cols].itertuples(index=False))
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
        elif g == e:
            results[name] = f"MATCH({len(g)})"
        else:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            results[name] = f"VALUE_MISMATCH n={sum(1 for a,b in zip(g,e) if a!=b)}/{len(g)} sample={diffs}"
    ok = sum(1 for v in results.values() if v.startswith("MATCH") or v.startswith("ROWS_ONLY("))
    for k, v in results.items():
        flag = "  " if (v.startswith("MATCH") or (v.startswith("ROWS_ONLY") and "EMPTY" not in v)) else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{ok}/{len(results)} ok")

if __name__ == "__main__":
    main()
