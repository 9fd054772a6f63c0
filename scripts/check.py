#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness compare.

Usage: python3 scripts/check.py [sfdir] [verify_out]

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, sorts
columns by name (driver semantics) and compares cell-exact, both in given
row order and row-sorted.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (GenScale shards): a directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_bad += 1; continue
        # dtype parity: the driver's value-hash distinguishes int64 from
        # float64 even when values compare equal (e.g. DuckDB HUGEINT ->
        # pandas float64 made f9_scd2 driver-red while cell-compare passed).
        # Widths within a kind are NOT significant: graft.Verify.canonical
        # widens every Spark integer to int64 / float to float64 before the
        # dump, so mirror that widening on the oracle frame (DuckDB keeps
        # int32 for int32 parquet columns) and only flag kind mismatches.
        WIDEN = {"int8": "int64", "int16": "int64", "int32": "int64",
                 "uint8": "int64", "uint16": "int64", "uint32": "int64",
                 "float32": "float64"}
        for c in odf.columns:
            t = str(odf[c].dtype)
            if t in WIDEN:
                odf[c] = odf[c].astype(WIDEN[t])
        for c in sdf.columns:
            t = str(sdf[c].dtype)
            if t in WIDEN:
                sdf[c] = sdf[c].astype(WIDEN[t])
        dt_mism = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                   for c in sdf.columns if sdf[c].dtype != odf[c].dtype]
        if dt_mism:
            print(f"FAIL {name}: dtypes (col, spark, oracle) {dt_mism}")
            n_bad += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1; continue
        # compare as-is order (queries ORDER BY a unique key on both sides)
        def is_null(v):
            return v is None or (isinstance(v, float) and v != v)
        def cell_eq(x, y):
            # list/array cells come back as numpy arrays — compare as lists
            if hasattr(x, "tolist"):
                x = x.tolist()
            if hasattr(y, "tolist"):
                y = y.tolist()
            if isinstance(x, list) or isinstance(y, list):
                return (isinstance(x, list) and isinstance(y, list)
                        and len(x) == len(y)
                        and all(cell_eq(a, b) for a, b in zip(x, y)))
            if is_null(x) or is_null(y):
                return is_null(x) and is_null(y)
            return x == y
        mism = []
        for c in sdf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if not cell_eq(x, y):
                    mism.append((c, i, x, y)); break
        if mism:
            print(f"FAIL {name}: first mismatches {mism[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
