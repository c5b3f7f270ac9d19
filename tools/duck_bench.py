#!/usr/bin/env python3
"""DuckDB single-node timing twin of graft.Bench (SURVEY §6).

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [reps] [timeout_s]

Runs each oracle SQL against the parquet tables in sfDir (single-file
or directory layout), reps times, and prints one JSON line of per-query
median seconds. Queries that exceed the per-run timeout are interrupted
and reported as DNF — the exact dedup formulations are EXPECTED to DNF
beyond sf0.1; that contrast with the LSH operators is the point of the
comparison. Oracle SQLs carrying absolute sf0.01 literals (q_parquet_meta
pins the gate dir on both engines) run as-is: constant metadata work on
either side.
"""
import json
import os
import statistics
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0

    con = duckdb.connect()
    con.execute("SET threads = 32")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        glob = f"{src}/*.parquet" if os.path.isdir(src) else src
        if t == "events":
            ts_type = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{glob}') LIMIT 1"
            ).fetchone()[0]
            if ts_type == "BIGINT":
                # ScaleGen carries the ns-int64 ts as BIGINT (Spark cannot
                # write TIMESTAMP(NANOS)); truncate to us like Tables.events
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{glob}')")
                continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    oracle = json.loads(open(oracle_path).read())
    results, dnf, errors = {}, [], {}
    for name in sorted(oracle):
        times = []
        for _ in range(reps):
            fired = threading.Event()

            def interrupt():
                fired.set()
                con.interrupt()

            timer = threading.Timer(timeout_s, interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
                times.append(time.time() - t0)
            except duckdb.InterruptException:
                dnf.append(name)
                times = []
                break
            except Exception as e:
                errors[name] = str(e)[:160]
                times = []
                break
            finally:
                timer.cancel()
                if fired.is_set():
                    # the timer can fire between fetchall() returning and
                    # cancel(), leaving a pending interrupt on the shared
                    # connection that would abort the NEXT healthy query —
                    # drain it with a throwaway statement
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
        if times:
            results[name] = round(statistics.median(times), 3)
    line = {
        "metric": "duckdb_total", "value": round(sum(results.values()), 3),
        "unit": "sec", "reps": reps, "stat": "median",
        "n_queries": len(results), "n_dnf": len(dnf), "n_errors": len(errors),
        "timeout_s": timeout_s, "dnf": dnf, "errors": errors,
        "queries": results, "sf": sf_dir,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
