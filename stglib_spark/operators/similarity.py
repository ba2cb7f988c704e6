"""Similarity search over embedding columns (array<float>).

Scale design (BASELINE.json north star):
- brute-force cosine top-k: the baseline — one scan, dot products via
  array higher-order functions (JVM-side, no Python), global top-k via
  orderBy+limit (Spark's TakeOrdered avoids a full sort);
- LSH-bucketed variant (random hyperplanes): signature computed natively
  from fixed seeded planes broadcast as literals; candidate search probes
  only matching buckets — the 100 TB path;
- embedding near-dup: pairs with cosine ≥ threshold inside buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from stglib_spark.session import spread


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (native, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector. The query enters the
    plan as an array literal (constant-folded, broadcast implicitly);
    orderBy+limit compiles to TakeOrderedAndProject — per-partition heap
    then driver merge of k rows, not a global sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_within(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs within a partition key (e.g. LSH
    bucket or label): equi-join on the group key bounds the pair blow-up;
    AQE skew-join splits oversized groups."""
    slim = spread(df).select(
        F.col(group_col), F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    l, r = slim.alias("l"), slim.alias("r")
    sim = cosine(F.col("l.__v"), F.col("r.__v"))
    return (
        l.join(
            r,
            (F.col(f"l.{group_col}") == F.col(f"r.{group_col}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Fixed seeded Gaussian hyperplanes for LSH signatures."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit i = sign(v·rᵢ).
    Planes are plan-time literals (constant arrays), dot products native —
    the signature costs n_planes array traversals at scan speed, no
    shuffle. Vectors in the same bucket are ANN candidates."""
    planes = random_hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bucket: Column = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return df.withColumn("lsh_bucket", bucket)


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket the corpus once (amortized across
    queries), probe buckets within ``probe_hamming`` bits of the query's
    bucket, exact cosine inside the probed set. At 100 TB the bucketed
    table is written partitioned by bucket so a probe is partition
    pruning, not a scan."""
    dim = len(query_vec)
    bucketed = lsh_bucket(df, dim, n_planes, seed, vec_col)
    planes = random_hyperplanes(dim, n_planes, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=float)
    for i, plane in enumerate(planes):
        if float(qv @ plane) >= 0:
            qsig |= 1 << i
    probe = F.bit_count(F.col("lsh_bucket").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        bucketed.filter(probe)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
