#!/usr/bin/env python3
"""Scale the driver's fixture tables by key-shifted replication.

Usage: scale_up.py <src_sf_dir> <dst_dir> <factor>

Builds an sf-N dataset from sf-M by unioning `factor` copies of each
table with every key column shifted per copy, so uniqueness and
referential joins (orders.o_custkey -> customer, lineitem.l_* -> their
dims) hold at the larger scale. Dimension tables with fixed cardinality
(region, nation) copy once. Schemas are preserved exactly via pyarrow
(whatever timestamp unit the driver shipped — fixtures have carried
events.ts as both timestamp[ns] and timestamp[us] across generations;
pyarrow preserves the source unit verbatim either way), so both
the Spark engine and the DuckDB oracle read identical shapes at every
scale. Text/embedding payloads repeat verbatim — exact duplicates
across copies are realistic corpus content and exercise the dedup
operators at their worst case.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# key column -> the table whose max value defines its shift stride
SHIFTS = {
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    tabs = {t: pq.read_table(f"{src}/{t}.parquet") for t in TABLES}
    # stride = max + 1: keys start at 0, so a max-only stride would
    # collide copy i's max key with copy i+1's zero key
    stride = {
        "c": pc.max(tabs["customer"]["c_custkey"]).as_py() + 1,
        "s": pc.max(tabs["supplier"]["s_suppkey"]).as_py() + 1,
        "p": pc.max(tabs["part"]["p_partkey"]).as_py() + 1,
        "o": pc.max(tabs["orders"]["o_orderkey"]).as_py() + 1,
        "e": pc.max(tabs["events"]["event_id"]).as_py() + 1,
        "u": pc.max(tabs["events"]["user_id"]).as_py() + 1,
        "d": pc.max(tabs["documents"]["doc_id"]).as_py() + 1,
        "v": pc.max(tabs["embeddings"]["vec_id"]).as_py() + 1,
    }
    for t in TABLES:
        base = tabs[t]
        if t in ("region", "nation"):
            out = base
        else:
            copies = []
            for i in range(factor):
                cp = base
                for col, sk in SHIFTS[t].items():
                    idx = cp.schema.get_field_index(col)
                    shifted = pc.add(cp[col], i * stride[sk]).cast(
                        cp.schema.field(col).type)
                    cp = cp.set_column(idx, cp.schema.field(col), shifted)
                copies.append(cp)
            out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet", version="2.6",
                       coerce_timestamps=None)
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
