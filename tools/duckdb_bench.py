#!/usr/bin/env python3
"""Per-query DuckDB timings over the SAME oracle SQL the correctness gate
runs — the benchmark denominator, emitted as an artifact so every round's
per-query comparison (Spark seconds vs DuckDB seconds) is computable from
checked-in files instead of prose.

Usage:
  python3 tools/duckdb_bench.py <sfDir> <oracleSqlJson> [out.json]

<oracleSqlJson> must come from a graft.Verify run against the SAME sfDir
(q60's oracle embeds centroids trained on that data). Median of 3 timed
runs per query after one warm-up, 32 threads — mirroring Bench.scala's
protocol (median-of-3, local[32]).
"""
import sys, json, os, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
ITERS = int(os.environ.get("DUCKDB_BENCH_ITERS", "3"))


def main(sf_dir, oracle_path, out_path):
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        # flat driver files or spark-style directories (target/sf1,
        # target/sf0.1-mrg)
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    timings = {}
    spread = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.sql(sql).fetchall()  # warm-up (I/O cache, plan)
            runs = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 6)
            # the per-query spread is the adjudication guard: a ratio
            # quoted against a single-generation DuckDB plan flip (q89's
            # 4.2->0.6, q111's documented 2.2<->15.2) is meaningless
            # unless the artifact shows whether the denominator is
            # stable — min/median/max makes that visible per query
            spread[name] = {
                "min": round(min(runs), 6),
                "median": round(statistics.median(runs), 6),
                "max": round(max(runs), 6),
            }
        except Exception as e:
            timings[name] = None
            print(f"ERR {name}: {str(e)[:200]}", file=sys.stderr)
    ok = {k: v for k, v in timings.items() if v is not None}
    artifact = {
        "metric": "duckdb_oracle_total", "unit": "sec",
        "value": round(sum(ok.values()), 3),
        "threads": 32, "iters": ITERS, "sf": sf_dir,
        "queries": timings,
        "spread": spread,
    }
    json.dump(artifact, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in ("metric", "value", "sf")}))
    print(f"wrote {out_path} ({len(ok)}/{len(timings)} queries timed)")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1]
    orc = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out/oracle_sql.json"
    out = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_duckdb_per_query.json"
    sys.exit(main(sf, orc, out))
