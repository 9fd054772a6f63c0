#!/usr/bin/env python3
"""check.py with a per-query wall-clock budget, for order-of-magnitude
oracle gates (sf1+): the handful of documented QUADRATIC BASELINE rungs
(d3-composite dedup, d14 SemDeDup, exact-NN, recall-truth harnesses) carry
oracle SQL whose DuckDB cost grows with the square of the corpus — at sf1
one such oracle can burn CPU-hours while the Spark side finished the whole
suite in minutes. That cost measures the oracle engine, not this one, so
each compare runs in a subprocess under a timeout; queries whose ORACLE
exceeds the budget are recorded "oracle_timeout" (the Spark result is
still present and row-counted), everything else gets the exact
cell-compare verdict. Emits a CORRECTNESS-style JSON artifact.

Compares run through a WORKER POOL (default 4, env CHECK_SCALED_WORKERS):
a serial sweep at sf2 spent most of its wall inside a handful of
budget-bound oracles while hundreds of sub-second compares queued behind
them. Each worker's DuckDB is capped at 8 threads so four concurrent
oracles don't oversubscribe the 32-core host.

Usage: python3 scripts/check_scaled.py <sfdir> <verify_out> <artifact.json> \
           [timeout_s] [only_csv]

`only_csv` restricts the run to the named queries and MERGES their results
into an existing artifact (escalation pass: re-run just the oracle_timeout
entries with a bigger budget).
"""
import sys, json, glob, os, multiprocessing as mp
from concurrent.futures import ThreadPoolExecutor

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

WIDEN = {"int8": "int64", "int16": "int64", "int32": "int64",
         "uint8": "int64", "uint16": "int64", "uint32": "int64",
         "float32": "float64"}


def compare_one(sfdir, out, name, sql, q):
    import duckdb
    try:
        con = duckdb.connect()
        # 4 concurrent workers x 8 threads = the host's 32 cores, no more;
        # a single-lane final escalation can raise this to the core count
        con.sql(f"SET threads TO {os.environ.get('CHECK_SCALED_THREADS', '8')}")
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            if os.path.isdir(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        odf = con.sql(sql).df()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        r = {"spark_rows": len(sdf), "oracle_rows": len(odf),
             "rows_match": len(sdf) == len(odf), "err": None}
        if list(sdf.columns) != list(odf.columns):
            r.update(schema_match=False, hash_match=False)
            q.put((name, r)); return
        # identical widening + cell compare to scripts/check.py
        for df in (odf, sdf):
            for c in df.columns:
                t = str(df[c].dtype)
                if t in WIDEN:
                    df[c] = df[c].astype(WIDEN[t])
        r["schema_match"] = not [c for c in sdf.columns
                                 if sdf[c].dtype != odf[c].dtype]
        if not r["rows_match"] or not r["schema_match"]:
            r["hash_match"] = False
            q.put((name, r)); return

        def is_null(v):
            return v is None or (isinstance(v, float) and v != v)

        def cell_eq(x, y):
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

        same = True
        for c in sdf.columns:
            if not same:
                break
            for x, y in zip(sdf[c].tolist(), odf[c].tolist()):
                if not cell_eq(x, y):
                    same = False
                    break
        r["hash_match"] = bool(same)
        q.put((name, r))
    except Exception as e:
        q.put((name, {"rows_match": False, "schema_match": False,
                      "hash_match": False, "err": str(e)[:300]}))


def run_one(sfdir, out, name, sql, budget):
    """Spawn-join-timeout one compare; returns (name, result dict)."""
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output", flush=True)
        return name, {"rows_match": False, "err": "no spark output"}
    q = mp.Queue()
    p = mp.Process(target=compare_one, args=(sfdir, out, name, sql, q))
    p.start()
    p.join(budget)
    if p.is_alive():
        # SIGTERM first; a native DuckDB query can ignore it, so escalate
        # to SIGKILL after a grace period instead of hanging the gate
        p.terminate(); p.join(10)
        if p.is_alive():
            p.kill(); p.join()
        import duckdb
        con = duckdb.connect()
        n = con.sql(f"SELECT count(*) FROM '{out}/{name}/*.parquet'").fetchone()[0]
        print(f"SKIP {name}: oracle exceeded {budget}s (spark_rows={n})", flush=True)
        return name, {"oracle_timeout": True, "budget_s": budget,
                      "spark_rows": int(n), "err": None}
    # the worker may have died without enqueueing (OOM-kill/segfault mid-
    # oracle — the sf1+ scenario this gate exists for): a blocking q.get()
    # would deadlock the whole run, so bound it and record the death
    try:
        name2, r = q.get(timeout=30)
    except Exception:
        print(f"FAIL {name}: compare worker died exitcode={p.exitcode}", flush=True)
        return name, {"rows_match": False, "schema_match": False,
                      "hash_match": False,
                      "err": f"compare worker died (exitcode={p.exitcode})"}
    if r.get("hash_match"):
        print(f"ok   {name} ({r['spark_rows']} rows)", flush=True)
    else:
        print(f"FAIL {name}: {r}", flush=True)
    return name2, r


def main():
    sfdir, out, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 180
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    workers = int(os.environ.get("CHECK_SCALED_WORKERS", "4"))
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # escalation mode: start from the existing artifact and re-judge only
    # the named queries (their old entries are replaced below)
    results = {}
    if only is not None and os.path.exists(artifact):
        results = json.load(open(artifact)).get("queries", {})
    names = [n for n in sorted(oracle) if only is None or n in only]
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for name, r in pool.map(
                lambda n: run_one(sfdir, out, n, oracle[n], budget), names):
            results[name] = r
    # recount over the FULL merged result set (escalation mode replaces
    # entries inside a pre-existing artifact)
    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    n_to = sum(1 for r in results.values() if r.get("oracle_timeout"))
    n_bad = len(results) - n_ok - n_to
    summary = {"sf_dir": sfdir, "n_ok": n_ok, "n_fail": n_bad,
               "n_oracle_timeout": n_to, "oracle_budget_s": budget,
               "queries": results}
    json.dump(summary, open(artifact, "w"), indent=1, sort_keys=True)
    print(f"== {n_ok} ok, {n_bad} fail, {n_to} oracle-timeout ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
