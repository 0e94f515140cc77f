#!/usr/bin/env python3
"""Synthesize an sf1 fixture set as a deterministic 10x scale-up of the
driver's sf0.1 parquet tables, for the round-10 sf1 correctness/bench
sweep. Copy k (k = 0..9) offsets every key column by k * stride so shards
are self-contained (joins stay within a shard); copy 0 is the original.

Two tables need more than key offsets to avoid degenerate semantics:
  - documents: every word in copy k > 0 gets an `_k` suffix, so copies
    share no shingles (otherwise every doc has 9 exact twins and the
    dedup pair mass grows ~100x instead of 10x); n_chars is recomputed.
  - embeddings: copy k > 0 adds k * 0.0017 to every component, so vectors
    are distinct and similarity ties stay well-behaved.

The correctness gate is self-consistent: Spark and the DuckDB oracle read
the SAME synthesized parquet, so any deterministic transform is valid.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1] [/tmp/graft_sf1]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = 10

# key column -> per-copy offset stride
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
SHARED = ["region", "nation"]  # dimension tables: single copy, no offset


def shard(table: pa.Table, name: str, k: int) -> pa.Table:
    t = table
    for col, stride in OFFSETS.get(name, {}).items():
        i = t.schema.get_field_index(col)
        t = t.set_column(i, col, pc.add(t.column(col), k * stride))
    if k > 0 and name == "documents":
        texts = t.column("text").to_pylist()
        texts = [" ".join(f"{w}_{k}" for w in s.split(" ")) for s in texts]
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in texts], pa.int64()))
    if k > 0 and name == "embeddings":
        embs = t.column("embedding").to_pylist()
        bump = k * 0.0017
        embs = [[pa.scalar(v + bump, pa.float32()).as_py() for v in e] for e in embs]
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(embs, pa.list_(pa.float32())))
    return t


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for name in list(OFFSETS) + SHARED:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name in SHARED:
            out = src
        else:
            out = pa.concat_tables([shard(src, name, k) for k in range(K)])
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
