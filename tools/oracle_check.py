#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables, compare rows/schema/hash.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, json, glob, os
import duckdb

# The round-11 driver hash divergence (att4/bt1/dsk1/gb1) was
# builder-green / driver-red: the builder's DuckDB and the driver's
# disagreed on round(DOUBLE) inside iterated quantizations. The
# arithmetic fix is in the oracles themselves (integer-only rounding),
# but local verify must still announce which oracle engine it ran so a
# future green can never silently mean "green on a different DuckDB".
PINNED_DUCKDB = "1.0.0"
if duckdb.__version__ != PINNED_DUCKDB:
    print(f"FATAL: local DuckDB {duckdb.__version__} != pinned "
          f"{PINNED_DUCKDB} — builder-green would not imply driver-green. "
          f"Re-pin PINNED_DUCKDB deliberately if the upgrade is intended.",
          file=sys.stderr)
    sys.exit(2)
print(f"[oracle_check] duckdb=={duckdb.__version__} (pinned)")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sql = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    ok = True
    for name in (names or sorted(sql)):
        if name not in sql:
            print(f"{name}: NO ORACLE"); continue
        spark_dir = os.path.join(out, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); ok = False; continue
        srel = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in srel.description]; srows = srel.fetchall()
        orel = con.execute(sql[name])
        ocols = [d[0] for d in orel.description]; orows = orel.fetchall()
        sc, scn = canon(srows, scols)
        oc, ocn = canon(orows, ocols)
        rows_m = len(srows) == len(orows)
        schema_m = scn == ocn
        hash_m = sc == oc
        status = "PASS" if (rows_m and schema_m and hash_m) else "FAIL"
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} schema={schema_m} hash={hash_m}")
        if status == "FAIL":
            ok = False
            if not schema_m:
                print(f"  spark cols: {scn}\n  oracle cols: {ocn}")
            for i, (a, b) in enumerate(zip(sc, oc)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
    sys.exit(0 if ok else 1)

main()
