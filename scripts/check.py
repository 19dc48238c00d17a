#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (dev tool only —
not part of the shipped library). Usage:

    python3 scripts/check.py /root/testdata/sf0.01 /tmp/vout [query ...]

Reads each /tmp/vout/<name> parquet dir written by graft.Verify, runs the
matching oracle SQL from /tmp/vout/oracle_sql.json in DuckDB (with the
fixture parquet files registered as views named after the tables), sorts
columns by name and rows by all columns on both sides, and reports
per-query match / mismatch with first differing cells.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def cells_equal(a, b):
    if a is None or b is None:
        return a is b or a == b
    if isinstance(a, float) or isinstance(b, float):
        # Driver hashes typed values: int 25 vs float 25.0 MISMATCH there,
        # so treat cross-type numeric equality as failure here too.
        if isinstance(a, float) != isinstance(b, float):
            return False
        if a == b:
            return True
        return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Outputs past this size don't fit the in-Python row-sort compare
    # (q_dedup_simhash reaches 241M rows at sf1). Compare them INSIDE
    # DuckDB instead: exact row count + order-insensitive sum of row
    # hashes over the name-sorted columns — the method SCALE.md records.
    BIG_ROWS = 5_000_000
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            n_mine = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
            ).fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: cannot read my output: {e}")
            n_fail += 1
            continue
        if n_mine > BIG_ROWS:
            try:
                cols = sorted(r[0] for r in
                              con.sql(f"DESCRIBE {sql}").fetchall())
                collist = ", ".join(f'"{c}"' for c in cols)
                mn, mh = con.sql(
                    f"SELECT count(*), sum(hash({collist})) "
                    f"FROM '{out_dir}/{name}/*.parquet'").fetchone()
                rn, rh = con.sql(
                    f"SELECT count(*), sum(hash({collist})) FROM ({sql})"
                ).fetchone()
            except Exception as e:
                print(f"FAIL {name}: big-output compare error: {e}")
                n_fail += 1
                continue
            if (mn, mh) == (rn, rh):
                print(f"PASS {name} ({mn} rows, count+hash-sum)")
                n_pass += 1
            else:
                print(f"FAIL {name}: big-output mismatch "
                      f"mine=({mn}, {mh}) oracle=({rn}, {rh})")
                n_fail += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            my_cols, my_rows = canon(mine.fetchall(), mine.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read my output: {e}")
            n_fail += 1
            continue
        try:
            ref = con.sql(sql)
            ref_cols, ref_rows = canon(ref.fetchall(), ref.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if my_cols != ref_cols:
            print(f"FAIL {name}: columns {my_cols} != oracle {ref_cols}")
            n_fail += 1
            continue
        if len(my_rows) != len(ref_rows):
            print(f"FAIL {name}: {len(my_rows)} rows != oracle {len(ref_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (mr, rr) in enumerate(zip(my_rows, ref_rows)):
            for j, (a, b) in enumerate(zip(mr, rr)):
                if not cells_equal(a, b):
                    bad = (i, my_cols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, colname, a, b = bad
            delta = ""
            try:
                delta = f" (delta={abs(float(a) - float(b)):.3e})"
            except (TypeError, ValueError):
                pass
            print(f"FAIL {name}: row {i} col {colname}: mine={a!r} oracle={b!r}{delta}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(my_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
