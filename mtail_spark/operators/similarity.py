"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set against the corpus — at 100 TB the corpus side never
shuffles; the plan is scan -> map-side cosine -> per-query top-k
(partial top-k map-side via AQE + window, or groupBy/min-heap).

The scale path is LSH bucketing (random-hyperplane signs) which prunes
the corpus to matching buckets before exact re-ranking; hyperplanes are
derived deterministically from md5 so the index is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import md5_long


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns.

    With `dim` known at plan time the sum is UNROLLED into a
    left-associated chain of element_at multiply-adds: bit-identical
    to the F.aggregate left fold (and to the DuckDB oracle's
    list_reduce), but whole-stage-codegen instead of an interpreted
    CodegenFallback lambda — the VERDICT r1 perf item.  Without dim it
    falls back to the higher-order-function form."""
    if dim is not None:
        out = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast(
            "double"
        )
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i).cast("double") * F.element_at(
                b, i
            ).cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        return F.sqrt(dot(a, a, dim))
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _dot_lits(vec: Column, weights: list[float]) -> Column:
    """Unrolled dot of an array column with plan-time literal weights
    (same left-fold order as the HOF form)."""
    out = F.element_at(vec, 1).cast("double") * F.lit(weights[0])
    for i, w in enumerate(weights[1:], start=2):
        out = out + F.element_at(vec, i).cast("double") * F.lit(w)
    return out


def _sqdist_lits(vec: Column, center: list[float]) -> Column:
    """Unrolled squared euclidean distance to a literal centroid
    (left-fold order preserved)."""
    d0 = F.element_at(vec, 1).cast("double") - F.lit(center[0])
    out = d0 * d0
    for i, v in enumerate(center[1:], start=2):
        d = F.element_at(vec, i).cast("double") - F.lit(v)
        out = out + d * d
    return out


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) x corpus -> window top-k.  Ties are
    broken by neighbor id for determinism.  Pass `dim` to unroll the
    cosine into codegen arithmetic (see dot()).
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if dim is None:
        c = c.withColumn("cvec", as_double(F.col("cvec")))
        q = q.withColumn("qvec", as_double(F.col("qvec")))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        cosine(F.col("qvec"), F.col("cvec"), dim).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rank")
    )


def knn_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    round_digits: int = 9,
) -> DataFrame:
    """Exact top-k cosine neighbors via a blocked GEMM — the scale
    path for bulk numeric kernels.

    Shape: the (small) query matrix is captured into a mapInPandas
    closure; each corpus partition computes an Arrow-batched
    (batch x nq) similarity matrix with BLAS and emits only its local
    top-k per query; a final store-sized window picks the global
    top-k.  The corpus never shuffles and Python sees each corpus row
    once.

    BLAS summation order differs from a sequential fold in the last
    ulp, so similarities are ROUNDED to `round_digits` before ranking
    and output — rank and hash then agree with any engine computing
    the same rounded cosine (ties broken by corpus id)."""
    import numpy as np  # noqa: F401  (validated here, used in closure)

    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    qids_l = [int(r["qid"]) for r in q_rows]
    qmat_l = [list(r["qv"]) for r in q_rows]

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids = np.asarray(qids_l, dtype=np.int64)
        Q = np.asarray(qmat_l, dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            ids = pdf["cid"].to_numpy().astype(np.int64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = np.round(Cn @ Qn.T, round_digits)  # nb x nq
            nb = sims.shape[0]
            kk = min(k, nb)
            out_q, out_c, out_s = [], [], []
            for j in range(len(qids)):
                col = sims[:, j]
                if nb > kk:
                    idx = np.argpartition(-col, kk - 1)[:kk]
                else:
                    idx = np.arange(nb)
                order = np.lexsort((ids[idx], -col[idx]))
                sel = idx[order][:kk]
                out_q.append(np.full(len(sel), qids[j]))
                out_c.append(ids[sel])
                out_s.append(col[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "corpus_id": np.concatenate(out_c),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    cand = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    ).mapInPandas(
        gen, schema="query_id long, corpus_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rank")
    )


def make_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived value in [-1, 1).  Computed at compile time so the
    planes are plain literals in the physical plan (and reproducible
    anywhere, including in oracle SQL)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2000001) / 1000000.0 - 1.0)
        planes.append(row)
    return planes


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature as an n_planes-bit integer:
    bit p is set when dot(vec, plane_p) > 0.  Unrolled literal dot —
    codegen arithmetic, same fold order as the HOF form."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = _dot_lits(vec, plane)
        sig = sig + F.when(d > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means (driver-side centroids, exact
    assignment in Spark): seeds are the first k vectors by id, each
    iteration is one groupBy over the corpus (elementwise sums via
    posexplode + (cluster, dim) aggregation — no Python in the loop).

    At 100 TB: k centroids broadcast each iteration; the shuffle
    carries k x dim partial sums per partition."""
    c = corpus.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("vec")
    )
    seeds = c.orderBy("cid").limit(k).collect()
    centroids = [list(r["vec"]) for r in seeds]
    for _ in range(iters):
        assigned = c.withColumn(
            "cluster", _nearest_centroid(F.col("vec"), centroids)
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode("vec").alias("d", "x")
            )
            .groupBy("cluster", "d")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [0.0] * dim)[r["d"]] = r["sx"]
            counts[r["cluster"]] = r["n"]
        for ci in range(len(centroids)):
            if ci in acc and counts.get(ci):
                centroids[ci] = [v / counts[ci] for v in acc[ci]]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    best_d = None
    best_i = F.lit(0)
    for i, cen in enumerate(centroids):
        d = _sqdist_lits(vec, cen)
        if best_d is None:
            best_d = d
            best_i = F.lit(i)
        else:
            cond = d < best_d
            best_i = F.when(cond, F.lit(i)).otherwise(best_i)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_i


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer partitions the
    corpus into inverted lists; each query exactly re-ranks only its
    n_probe nearest lists.  At scale the list id becomes the corpus
    partitioning key, so a probe touches n_probe/n_lists of the data."""
    cents = kmeans_centroids(corpus, n_lists, id_col, vec_col, iters, dim)
    return _ivf_rerank(corpus, queries, cents, id_col, vec_col, k, n_probe, dim)


def make_centroids(n_lists: int, dim: int) -> list[list[float]]:
    """Deterministic md5-derived centroids in [-1, 1): a FIXED coarse
    quantizer whose cells are plan-time literals, reproducible in
    oracle SQL (same scheme as make_planes).  Trades recall for a
    fully deterministic, engine-independent index — the hash-matchable
    counterpart of knn_ivf's trained quantizer."""
    import hashlib

    cents = []
    for c in range(n_lists):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"ivf:{c}:{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2000001) / 1000000.0 - 1.0)
        cents.append(row)
    return cents


def knn_ivf_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF top-k over a fixed (deterministic-literal) coarse
    quantizer — same probe/re-rank plan as knn_ivf but with no
    training iterations, so the whole query is one declarative plan
    with a DuckDB-expressible oracle."""
    cents = make_centroids(n_lists, dim)
    return _ivf_rerank(corpus, queries, cents, id_col, vec_col, k, n_probe, dim)


def _ivf_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
    dim: int,
) -> DataFrame:
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("list_id", _nearest_centroid(F.col("cvec"), cents))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    # per-query probe lists, computed driver-free via a literal array
    # of centroid distances per query row
    probes = q.select(
        "query_id", "qvec",
        F.explode(_probe_lists(F.col("qvec"), cents, n_probe)).alias("list_id"),
    )
    scored = c.join(F.broadcast(probes), "list_id").select(
        "query_id", "corpus_id",
        cosine(F.col("qvec"), F.col("cvec"), dim).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rank")
    )


def _probe_lists(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    dists = F.array(
        *[
            F.struct(
                _sqdist_lits(vec, cen).alias("d"),
                F.lit(i).cast("int").alias("i"),
            )
            for i, cen in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(dists), 1, n_probe), lambda s: s["i"]
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: restrict the exact search to corpus vectors
    sharing the query's hyperplane-sign bucket.  Recall is tuned by
    n_planes (fewer planes = bigger buckets = higher recall/cost).

    At scale the bucket column becomes a partition/bucketing key so the
    join is co-located; here it is a plain equi-join (shuffle on
    uniformly distributed bucket ids).
    """
    planes = make_planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("bucket", hyperplane_signature(F.col("cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("bucket", hyperplane_signature(F.col("qvec"), planes))
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "corpus_id",
        cosine(F.col("qvec"), F.col("cvec"), dim).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rank")
    )
