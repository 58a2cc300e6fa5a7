"""Generate a scaled-up benchmark dataset by replicating an existing
SF directory with remapped keys.

The driver provides sf0.001/0.01/0.1; the marginal (per-row) cost of
the engine only shows above the fixed per-action overhead, so the
bench wants a bigger corpus.  Each replica k shifts every key space
by k * stride so joins stay consistent (orders.o_custkey still hits
customer.c_custkey, lineitem.l_orderkey still hits orders, etc.) and
timestamps by k minutes so windows/sessions don't collapse.

Usage: python tools/gen_sf.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/testdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mtail_spark.session import get_spark, load_table

# per-table: (key columns to shift, timestamp columns to jitter)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TS_COLS = {"events": ["ts"]}
STRIDE = 1_000_000_000


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata/sf1"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("gen-sf")
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = load_table(spark, src, name)
        out = f"{dst}/{name}.parquet"
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(out)
            continue
        reps = []
        for k in range(factor):
            r = df
            if name == "documents" and k > 0:
                # interleave a replica tag into every word gap so
                # replicas are NOT near-duplicates of each other (the
                # dedup workload should stay ~linear in corpus size,
                # not quadratic in replica count)
                r = r.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), " ", f" r{k} "),
                ).withColumn("n_chars", F.length("text"))
            for col in KEYED.get(name, []):
                if dict(r.dtypes)[col] in ("bigint", "int"):
                    r = r.withColumn(
                        col, F.col(col) + F.lit(k * STRIDE).cast("long")
                    )
                else:  # string keys (doc_id/emb_id style)
                    r = r.withColumn(
                        col,
                        F.when(
                            F.lit(k) == 0, F.col(col)
                        ).otherwise(F.concat(F.col(col), F.lit(f"#r{k}"))),
                    )
            for col in TS_COLS.get(name, []):
                r = r.withColumn(
                    col,
                    F.col(col) + F.make_interval(mins=F.lit(k)),
                )
            reps.append(r)
        allr = reps[0]
        for r in reps[1:]:
            allr = allr.unionByName(r)
        allr.write.mode("overwrite").parquet(out)
        print(name, "->", out, flush=True)
    print("done")


if __name__ == "__main__":
    main()
