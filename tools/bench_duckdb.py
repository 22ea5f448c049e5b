#!/usr/bin/env python3
"""Time the DuckDB oracle suite on a scale-factor directory — the latency
baseline the Spark bench is compared against (BASELINE.md).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [reps]

Mirrors graft.Bench's protocol EXACTLY: a warmup pass of every query
(JIT/page cache), then `reps` (default 3) sequential measured passes,
per-query MEDIAN reported, total = sum of medians. 32 threads like the
Spark side. Each query is wrapped `SELECT count(*) FROM (<sql>) __t` —
the same action the Spark bench uses (df.count()), so BOTH optimizers get
the same dead-projection pruning opportunity; a raw fetchall() would bill
DuckDB for materializing millions of rows into Python objects, which the
Spark side never pays.
"""
import sys, json, os, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    names = sorted(oracle)

    def run(name):
        con.execute(f"SELECT count(*) FROM ({oracle[name]}) __t").fetchall()

    for name in names:  # warmup
        try:
            run(name)
        except Exception as e:
            print(f"WARMUP FAIL {name}: {e}", file=sys.stderr)
    samples = {n: [] for n in names}
    errors = {}
    for _ in range(reps):
        for name in names:
            t0 = time.time()
            try:
                run(name)
                samples[name].append(time.time() - t0)
            except Exception as e:
                # failed samples are DROPPED, named in errors, and printed —
                # a NaN in the list would break median's sort order-dependently
                # and let a partially failed run report a plausible total
                errors[name] = str(e)[:200]
                print(f"MEASURED FAIL {name}: {e}", file=sys.stderr)
    med = {n: statistics.median(v) for n, v in samples.items() if v}
    total = sum(med.values())
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "sf": sf_dir,
                      "queries": {n: round(v, 3) for n, v in med.items()},
                      "errors": errors}))


if __name__ == "__main__":
    main()
