#!/usr/bin/env python3
"""DuckDB A/B baseline: time every oracle statement from a Verify dump
against the same parquet fixtures Spark read. Usage:

  python3 scripts/duckdb_ab.py <sfdir> <verify_outdir> [passes] [threads]

Prints per-query seconds (min over passes) and the total — the number
the bench ratio in README.md compares against. Mirrors the bench's
min-of-two-passes discipline so JIT/cache noise can't land on one side.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else (os.cpu_count() or 32)
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sfdir}/{t}.parquet')")
    names = sorted(oracle)
    times = {}
    for p in range(passes):
        for name in names:
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"FAIL {name}: {e}", file=sys.stderr)
                dt = float("inf")
            times.setdefault(name, []).append(dt)
    per = {n: min(ts) for n, ts in times.items()}
    failed = sorted(n for n, v in per.items() if v == float("inf"))
    # an unequal query set makes the A/B ratio meaningless — emit null
    # instead of a silently smaller total
    total = (None if failed
             else round(sum(per.values()), 3))
    if failed:
        print(f"WARNING: {len(failed)} oracle statement(s) failed "
              f"({', '.join(failed)}) — total_sec omitted; the ratio "
              "would compare unequal query sets", file=sys.stderr)
    for n in sorted(per, key=lambda x: -per[x])[:15]:
        print(f"{per[n]:9.3f}  {n}")
    print(json.dumps({"engine": "duckdb", "sf": sfdir,
                      "threads": threads,
                      "n_queries": len(per), "total_sec": total,
                      "failed": failed}))
    with open("duckdb_ab.json", "w") as f:
        # failed queries serialize as null (inf is not valid JSON)
        json.dump({"sf": sfdir, "total_sec": total,
                   "threads": threads,
                   "failed": failed,
                   "queries": {n: (round(v, 4) if v != float("inf")
                                   else None)
                               for n, v in per.items()}}, f)


if __name__ == "__main__":
    main()
