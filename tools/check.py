#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results on the same tables.

Usage: python3 tools/check.py [--strict] <sfDir> <verifyOutDir>

--strict mirrors the DRIVER's precision-sensitive hash gate: decimals are
compared by their unnormalized string rendering (so DECIMAL(28,2) "1.50"
vs DECIMAL(38,2) "1.50" still matches, but a scale difference like "1.5"
vs "1.50" does NOT), and per-column dtypes must agree between the Spark
output and the oracle result. The default (lax) mode normalizes decimal
scale — r6's q_gap_fill passed lax locally and failed the driver's hash,
so the pre-commit gate should always run strict.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

STRICT = False

# Decimal-surface lint (round-8 rule): two rounds of precision-pinning
# produced value- AND engine-type-identical DECIMAL outputs that the
# driver's opaque hash still rejected, so gated comparison surfaces must
# not contain DECIMAL at all — emit integer minor units (cents) or render
# cast("string"). A query may carry an explicit waiver here with a reason.
DECIMAL_WAIVERS = {
    # name: reason
}

def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        # strict: exact rendering including scale (the driver hashes the
        # engine's own string form, so (28,2) vs (38,2) values agree but a
        # scale mismatch does not); lax: scale-insensitive
        return str(v) if STRICT else str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    # fresh connection per query batch: one connection across 200+ oracles
    # (several with recursive CTEs / large sorts) accumulates allocator
    # state until DuckDB fails tiny allocations ("block of 16384 bytes")
    # on queries that pass in isolation — a spurious-red hazard for the
    # gate. Recycling every RECYCLE_EVERY queries resets the allocator;
    # a failed oracle additionally gets ONE retry on a brand-new
    # connection before being reported.
    RECYCLE_EVERY = 20
    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c
    con = fresh_con()
    since_recycle = 0
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
        since_recycle += 1
        if since_recycle >= RECYCLE_EVERY:
            con.close()
            con = fresh_con()
            since_recycle = 0
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(got)})" + ("" if len(got) > 0 else " !!EMPTY")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            try:
                con.close()
                con = fresh_con()
                since_recycle = 0
                exp = con.execute(oracle[name]).fetchdf()
            except Exception:
                results[name] = f"ORACLE_SQL_ERROR: {e}"
                continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            results[name] = f"SCHEMA_MISMATCH got={g_cols} exp={e_cols}"
            continue
        if STRICT:
            # ENGINE-level type parity per column (DESCRIBE, not pandas
            # dtype — both sides of a decimal render as object in pandas,
            # but DECIMAL(28,2) vs DECIMAL(38,2) is exactly the mismatch
            # that failed r6's q_gap_fill driver hash)
            def types_of(sql):
                rows = con.execute(f"DESCRIBE {sql}").fetchall()
                return {r[0]: r[1] for r in rows}
            # the DESCRIBE pair runs the oracle's planner again and is just
            # as exposed to the long-session allocator exhaustion as the
            # fetch — give it the same one-retry-on-fresh-connection cure
            # (r9 saw the fetch path fail this way; r10 saw DESCRIBE)
            try:
                tg = types_of(f"SELECT * FROM '{d}/*.parquet'")
                te = types_of(f"({oracle[name]})")
            except Exception:
                con.close()
                con = fresh_con()
                since_recycle = 0
                tg = types_of(f"SELECT * FROM '{d}/*.parquet'")
                te = types_of(f"({oracle[name]})")
            tmis = [(c, tg.get(c), te.get(c)) for c in g_cols
                    if tg.get(c) != te.get(c)]
            if tmis:
                results[name] = f"TYPE_MISMATCH {tmis}"
                continue
            dec = [c for c, t in tg.items() if "DECIMAL" in str(t).upper()]
            if dec and name not in DECIMAL_WAIVERS:
                results[name] = (f"DECIMAL_SURFACE {dec} — gated outputs must be "
                                 "integer/string (see DECIMAL_WAIVERS)")
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
    mode = "strict" if STRICT else "lax"
    print(f"\n{ok}/{len(results)} ok ({mode})")
    # machine-readable artifact for tools/headline.py (NOTES numbers must
    # come from committed artifacts, not prose — the r6-r8 drift rule).
    # Written ONLY when the check covered the FULL oracle map: a
    # single-query debug check must not clobber the committed full-sweep
    # artifact (it did, twice, in round 11 — this guard is the fix).
    if len(results) >= len(oracle):
        with open("CHECK_local.json", "w") as f:
            json.dump({"ok": ok, "total": len(results), "mode": mode,
                       "sf_dir": sf_dir, "results": results}, f, indent=0)
    else:
        print(f"[check] partial run ({len(results)}/{len(oracle)}) — "
              "CHECK_local.json left untouched")

if __name__ == "__main__":
    main()
