#!/usr/bin/env python3
"""Build a FACTOR-x replicated dataset from an sf dir (driver-side tooling,
not engine code — the engine never sees this script).

Round 4 verified the relational families at 10x via an ad-hoc /tmp/sf1x;
this is that script made reproducible AND extended to the corpus tables
(documents / embeddings / events), so the d/t/v/e/g families get oracled
above sf0.1 too (VERDICT r5 item 2).

Replication = key-offset copies, FK-consistent by construction:
  - customer/orders/lineitem: custkey and orderkey offset per replica by
    a stride >= max(key) computed on the KEY-OWNING table (customer for
    custkey, orders for orderkey) and applied identically to every
    referencing column — a per-table max would break FKs whenever the
    fact side doesn't reach the dim side's max. part/supplier/nation/
    region stay as-is (dims), so l_partkey/l_suppkey FKs remain valid
    and dim-joined queries see 10x fact rows against the same dims.
  - events: event_id/user_id offset (disjoint user spaces per replica ->
    sessions never merge across replicas); timestamps preserved at their
    physical unit.
  - documents: doc_id offset, text identical -> every document gains
    FACTOR-1 exact copies. That is the realistic web-crawl regime for the
    dedup tier (and drives d4's adaptive prefix dispatch).
  - embeddings: vec_id offset (stride a multiple of 10 so the vec_id%10
    query subsets replicate too), vectors identical -> cosine ties broken
    by the documented id-ASC total order in both engines.

Usage: python3 tools/replicate_10x.py [src=/root/testdata/sf0.1] [dst=/tmp/sf10x] [factor=10]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)


def key_stride(table: str, col: str) -> int:
    m = pc.max(pq.read_table(f"{src}/{table}.parquet", columns=[col])[col]).as_py()
    # next power of 10 above max -> human-readable replica id ranges,
    # and a multiple of 10 (keeps vec_id%10 / event_id-mod subsets intact)
    s = 10
    while s <= m:
        s *= 10
    return s


# strides computed ONCE per key domain, on the key-owning table
STRIDE = {
    "custkey": key_stride("customer", "c_custkey"),
    "orderkey": key_stride("orders", "o_orderkey"),
    "event_id": key_stride("events", "event_id"),
    "user_id": key_stride("events", "user_id"),
    "doc_id": key_stride("documents", "doc_id"),
    "vec_id": key_stride("embeddings", "vec_id"),
}


def replicate(name: str, offsets: dict):
    """offsets: column name -> key-domain name in STRIDE

    Writes one row group per replica through a streaming ParquetWriter, so
    peak memory is ONE replica regardless of factor (factor=1000 over sf0.1
    would otherwise need ~60 GB of Arrow buffers for lineitem alone).
    """
    t = pq.read_table(f"{src}/{name}.parquet")
    with pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema) as w:
        for i in range(factor):
            cols = []
            for c in t.column_names:
                a = t[c]
                if c in offsets:
                    a = pc.add(a, pa.scalar(i * STRIDE[offsets[c]], type=a.type))
                cols.append(a)
            w.write_table(pa.table(cols, names=t.column_names))
    out_rows = t.num_rows * factor
    print(f"{name}: {t.num_rows} -> {out_rows} rows "
          f"(offsets {({c: STRIDE[d] for c, d in offsets.items()})})")


def copy(name: str):
    t = pq.read_table(f"{src}/{name}.parquet")
    pq.write_table(t, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows (dim, copied)")


for d in ["region", "nation", "part", "supplier"]:
    copy(d)
replicate("customer", {"c_custkey": "custkey"})
replicate("orders", {"o_orderkey": "orderkey", "o_custkey": "custkey"})
replicate("lineitem", {"l_orderkey": "orderkey"})
replicate("events", {"event_id": "event_id", "user_id": "user_id"})
replicate("documents", {"doc_id": "doc_id"})
replicate("embeddings", {"vec_id": "vec_id"})
print(f"done -> {dst} (factor {factor})")
