"""Greedy sequence packing for training-data pipelines.

Concatenating documents into fixed-token-budget sequences is the last
step before tokenized training data ships.  The assignment recurrence
— "this document joins the open sequence unless it would overflow,
else it starts the next one" — is order-sensitive and NON-associative
(no prefix-sum trick applies exactly), i.e. the same computational
class as the mtail register fold.  The scale shape is the same one
the fold uses: packing is defined PER SHARD (real pipelines pack
within a shard/source file and never across), so applyInPandas
groups run parallel across shards and sequential within — at 100 TB
shard count is the parallelism and no shard's documents ever
materialize anywhere but its own group.

Semantics (both engines, bit-identical):
- documents are ordered by `order_col` within a shard;
- a document joins the open sequence iff acc + tokens <= budget,
  else it OPENS sequence seq+1 with acc = tokens;
- the first document opens sequence 0 (even when it alone exceeds
  the budget — an oversized document owns a sequence; the next
  document then always overflows it and moves on).

The DuckDB oracle replays the recurrence with a recursive CTE
advancing every shard's chain one row per step — "iterative" again
does not mean "non-SQL-expressible".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Assign (seq_id, seq_pos) per row: greedy in-order packing of
    `token_col` counts into `budget`-token sequences within each
    shard.  seq_id is shard-local (pair it with the shard column for
    a global key); seq_pos is the document's position inside its
    sequence."""
    fields = [
        T.StructField(shard_col, df.schema[shard_col].dataType, True),
        T.StructField(order_col, df.schema[order_col].dataType, True),
        T.StructField("toks", T.LongType(), True),
        T.StructField("seq_id", T.LongType(), False),
        T.StructField("seq_pos", T.LongType(), False),
    ]
    out_schema = T.StructType(fields)
    narrowed = df.select(
        F.col(shard_col),
        F.col(order_col),
        F.col(token_col).cast("long").alias("toks"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        seqs, poss = [], []
        seq = -1
        acc = budget + 1  # force the first row to open sequence 0
        pos = 0
        for t in pdf["toks"].tolist():
            t = int(t)
            if acc + t > budget:
                seq += 1
                acc = t
                pos = 0
            else:
                acc += t
                pos += 1
            seqs.append(seq)
            poss.append(pos)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col],
                order_col: pdf[order_col],
                "toks": pdf["toks"],
                "seq_id": seqs,
                "seq_pos": poss,
            }
        )

    packed = narrowed.groupBy(shard_col).applyInPandas(
        pack, schema=out_schema
    )
    return df.join(
        packed.select(shard_col, order_col, "seq_id", "seq_pos"),
        [shard_col, order_col],
    )


def chunk_fixed_windows(
    df: DataFrame,
    token_col: str,
    window: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Fixed-context-window chunking: concatenate each shard's
    documents in order and cut the token stream every `window`
    tokens (the "pack everything, split at 2048" regime — documents
    CROSS chunk boundaries, unlike pack_sequences' greedy
    no-split bins).

    Unlike the greedy recurrence, this IS prefix-sum expressible:
    a document starting at cumulative offset s with t tokens spans
    chunks floor(s/K) .. floor((s+t-1)/K).  So the whole operator is
    one per-shard window cumsum (single hash-partitioned exchange)
    plus a map-side sequence()+explode — no applyInPandas, no
    sequential anything; every shard's chunk assignment is
    whole-stage codegen.  Returns one row per (document, chunk) with
    the token overlap carried by that chunk."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.col(token_col).cast("long")
    start = F.coalesce(F.sum(toks).over(w), F.lit(0).cast("long"))
    k = F.lit(int(window)).cast("long")
    base = (
        df.filter(toks > 0)
        .select(
            F.col(shard_col),
            F.col(order_col),
            toks.alias("toks"),
            start.alias("tok_start"),
        )
        .withColumn(
            # integer `div`, not double division: token offsets on a
            # 100 TB corpus overflow double's 2^53 exact-int range
            "first_chunk",
            F.expr(f"tok_start div {int(window)}"),
        )
        .withColumn(
            "last_chunk",
            F.expr(f"(tok_start + toks - 1) div {int(window)}"),
        )
    )
    exploded = base.withColumn(
        "chunk_id",
        F.explode(F.sequence(F.col("first_chunk"), F.col("last_chunk"))),
    )
    chunk_lo = F.col("chunk_id") * k
    chunk_hi = chunk_lo + k
    doc_lo = F.col("tok_start")
    doc_hi = doc_lo + F.col("toks")
    return exploded.select(
        shard_col,
        order_col,
        "toks",
        "chunk_id",
        (
            F.least(chunk_hi, doc_hi) - F.greatest(chunk_lo, doc_lo)
        ).alias("toks_in_chunk"),
    )


def sequence_stats(packed: DataFrame, shard_col: str,
                   token_col: str) -> DataFrame:
    """Per-sequence fill statistics (how much of the budget each
    packed sequence uses) — the packing-efficiency report every
    pipeline wants next to the packed output."""
    return packed.groupBy(shard_col, "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("seq_tokens"),
    )
