#!/usr/bin/env python3
"""Derive an sf1-equivalent dataset from the driver-provided sf0.1
tables (the environment ships no sf1 generator): each fact table is
replicated 10x with replica-offset keys, preserving parquet schemas
bit-for-bit via pyarrow.

Usage: python3 tools/make_sf1.py [outDir=/tmp/graft_sf1] [replicas=10]
(replicas=100 derives an sf10-equivalent set; documents rotate by i mod
26, so at replicas>26 some replicas are exact text clones under fresh
doc_ids — realistic duplication for a web-scale dedup workload, and
bench-only since oracles run at sf0.01)

Replication rules:
  - region/nation: copied unchanged (dimensions).
  - customer/supplier/part/orders/lineitem: replica i offsets every
    entity key by i * (max_key + 1), so referential joins stay valid
    and key cardinalities scale 10x.
  - events: event_id offset; timestamps unchanged (10x event rate over
    the same month).
  - documents: doc_id offset AND replica i>0 texts are letter-rotated
    (Caesar by i) so replicas are DISTINCT documents: the dedup family
    scales by corpus size, not by 10 artificial clones of every doc.
  - embeddings: vec_id offset, vectors unchanged (queries select
    vec_id < 8, so added replicas only grow the searched corpus).
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
# key spaces shared across tables must offset by the same stride
STRIDE_OF = {
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
}


def rotate(text: str, i: int) -> str:
    a = "abcdefghijklmnopqrstuvwxyz"
    table = str.maketrans(a, a[i:] + a[:i])
    return text.translate(table)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    strides = {}
    tables = {}
    for name in ["region", "nation"] + list(KEYED):
        tables[name] = pq.read_table(f"{SRC}/{name}.parquet")
    for name, keys in KEYED.items():
        for k in keys:
            if STRIDE_OF.get(k, k) == k:
                strides[k] = pc.max(tables[name][k]).as_py() + 1
    for name in ["region", "nation"]:
        pq.write_table(tables[name], f"{OUT}/{name}.parquet")
        print(name, tables[name].num_rows)
    for name, keys in KEYED.items():
        t = tables[name]
        parts = []
        for i in range(R):
            p = t
            for k in keys:
                stride = strides[STRIDE_OF.get(k, k)]
                col = pc.add(p[k], pa.scalar(i * stride, type=p[k].type))
                p = p.set_column(p.schema.get_field_index(k), k, col)
            if name == "documents" and i % 26 != 0:
                texts = pa.array([rotate(x, i % 26) for x in p["text"].to_pylist()],
                                 type=p["text"].type)
                p = p.set_column(p.schema.get_field_index("text"), "text", texts)
            parts.append(p)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{OUT}/{name}.parquet")
        print(name, t.num_rows, "->", full.num_rows)


if __name__ == "__main__":
    main()
