"""Materialize a larger benchmark scale from the driver's sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1}; the 100 TB question needs marginal
numbers at a scale where fixed overhead (JVM warmup, plan/codegen) is
amortized away.  This tool replicates the sf0.1 fact tables FACTOR
times with key offsets (distinct primary keys, same dimension tables)
into .bench/sf1 — the same trick TPC uses for scale factors: fact rows
grow linearly, dimensions stay fixed.

Replication semantics per table:
- events:     event_id and user_id offset per replica (user breadth
              grows 10x, per-user density constant — matches how log
              volume actually scales: more hosts, not denser hosts)
- orders:     o_orderkey offset; o_custkey unchanged (dims fixed)
- lineitem:   l_orderkey offset with the SAME stride as orders so the
              FK join stays consistent
- documents:  doc_id offset, text unchanged (replicas become exact
              dups — a realistic crawl dup rate for dedup operators)
- embeddings: vec_id offset
- dims (region nation customer supplier part): copied as-is

Usage: python tools/make_bench_sf.py [--factor 10] [--src /root/testdata/sf0.1]
                                     [--dst .bench/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# (table, [key columns to offset]) — stride is max(key)+1 within the table
FACTS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def _replicate(tbl: pa.Table, keys: list[str], factor: int,
               strides: dict[str, int]) -> pa.Table:
    parts = []
    for i in range(factor):
        if i == 0:
            parts.append(tbl)
            continue
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in keys:
                col = pc.add(col, i * strides[name])
            elif name == "text":
                # Realistic dup mix per base doc (~30% dup rate, the
                # high end of real crawls): replica 2 stays an EXACT
                # dup, replica 4 a perturbed NEAR dup, every other
                # replica gets a doc-unique suffix making it DISTINCT.
                # (A pure exact-replica corpus put every doc in a
                # 10-member dup group — 45 candidate pairs each — and
                # the minhash bench measured that artifact, not the
                # operator.)
                # The mix must repeat PER DECADE with decade-LOCAL dup
                # targets: replicas i<10 keep the original i==2/i==4
                # rule byte-for-byte (factor 10 / .bench/sf1 is
                # unchanged across rounds), while decades d>=1 anchor
                # their exact pair (10d+2 == 10d+5) and near-dup
                # (10d+4) on a decade-keyed REWRITE of the base — not
                # on the original.  The earlier i%10==2 'exact dup of
                # the original' rule made every decade's copy land in
                # ONE identical-text group (11 members at factor 100,
                # 55 candidate pairs per base doc vs sf1's 1), so the
                # sf10/sf1 dedup ratios measured a corpus artifact —
                # group sizes must stay bounded as the factor grows
                # for the scaling leg to measure the OPERATOR.
                chunk = col.combine_chunks()

                def _subst(tag):
                    # rewrite most words with tag-unique character
                    # substitutions: nearly every 3-word shingle
                    # changes (a shingle survives only if none of its
                    # words contain e/a/o), so Jaccard vs the base is
                    # ~0 — genuinely distinct docs at the SAME length
                    # (a suffix append leaves Jaccard ~0.9; word
                    # interleaving doubles doc length).  Tags must
                    # avoid 'a'/'o' so the three replaces compose.
                    return pc.replace_substring(
                        pc.replace_substring(
                            pc.replace_substring(chunk, "e", tag),
                            "a", f"x{tag}",
                        ),
                        "o", "q",
                    )

                if i < 10:
                    if i == 2:
                        pass  # exact dup of the original
                    elif i == 4:
                        col = pc.binary_join_element_wise(
                            chunk, f" replica{i}", ""
                        )
                    else:
                        col = _subst(f"{i}")
                else:
                    d = i // 10
                    if i % 10 in (2, 5):
                        # decade-local exact PAIR: 10d+2 == 10d+5,
                        # distinct from every other decade and the base
                        col = _subst(f"d{d}")
                    elif i % 10 == 4:
                        # near-dup of the decade pair, not of the base
                        col = pc.binary_join_element_wise(
                            _subst(f"d{d}"), f" replica{i}", ""
                        )
                    else:
                        col = _subst(f"{i}")
            cols[name] = col
        parts.append(pa.table(cols, schema=None))
    return pa.concat_tables(parts, promote_options="none")


def build(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    # orders and lineitem must share the orderkey stride for FK joins
    shared_stride: dict[str, int] = {}
    o = pq.read_table(os.path.join(src, "orders.parquet"))
    shared_stride["o_orderkey"] = pc.max(o.column("o_orderkey")).as_py() + 1
    shared_stride["l_orderkey"] = shared_stride["o_orderkey"]

    for t, keys in FACTS.items():
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        strides = {}
        for k in keys:
            strides[k] = shared_stride.get(
                k, pc.max(tbl.column(k)).as_py() + 1
            )
        out = _replicate(tbl, keys, factor, strides)
        # Many row groups per file: Spark assigns row groups to scan
        # tasks by byte range, so this is what lets the engine read
        # the fact table cluster-parallel WITHOUT a repartition
        # exchange (session.ensure_parallelism) — the layout any real
        # at-scale dataset would have.
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"),
                       compression="snappy",
                       row_group_size=max(1024, out.num_rows // 64))
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows",
              file=sys.stderr)
    for t in DIMS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"),
                       compression="snappy")
        print(f"{t}: {tbl.num_rows} rows (dim, copied)",
              file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench", "sf1"),
    )
    a = ap.parse_args()
    build(a.src, a.dst, a.factor)
