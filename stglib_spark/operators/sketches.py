"""Cardinality sketches for corpus audits: KMV (k-minimum-values)
distinct-count estimation per group.

A 100 TB corpus audit asks "how many distinct URLs / n-grams / authors
per source?" constantly; exact count-distinct shuffles every distinct
value, and Spark's built-in ``approx_count_distinct`` (HyperLogLog++)
is not reproducible across engines, so a driver oracle can't check it.
The KMV sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 "On
synopses for distinct-value estimation under multiset operations") is
the deterministic alternative: hash every value, keep the k smallest
hash values per group, and estimate

    D-hat = (k - 1) / h_(k)        (h_(k) = k-th smallest hash in [0,1))

Built on the portable 60-bit md5 hash (``dedup.hash60``), the sketch is
bit-for-bit reproducible in DuckDB, so the ESTIMATE ITSELF — not just
the plumbing — is driver-oracle-checkable. At scale xxhash64 is the
drop-in cheaper hash (same shape, no oracle).

Scale shape: a distinct pre-aggregation on (group, hash) runs map-side
first, so the shuffle carries distinct hashes only; the per-group
k-smallest selection is a window over those distinct hashes. When a
group's distinct count is huge, the optional ``prefilter_fraction``
cuts hashes above that fraction of the hash space BEFORE the shuffle —
the standard KMV threshold trick — so shuffle volume is O(k) per group
instead of O(distinct).

Reference anchor: stglib has no sketches (xarray holds everything in
RAM); this extends the engine for corpus-audit workloads per the
build brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from stglib_spark.operators.dedup import hash60

_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    k: int = 64,
    seed: str = "kmv1",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns one row per group: ``n_kept`` (number of sketch slots
    filled, ≤ k), ``kth_hash`` (the k-th smallest 60-bit hash, NULL when
    the group holds fewer than k distinct values) and ``distinct_est``.
    Groups with fewer than k distinct values report the EXACT count
    (the sketch degenerates to a distinct set) — the estimator only
    kicks in once the sketch saturates, exactly as in Beyer et al. §4.

    All estimator arithmetic is IEEE-exact ((k-1) * 2^60 / kth as one
    double multiply + divide — no ln/pow), so a DuckDB replay of the
    same hash chain lands on the identical double.

    ``prefilter_fraction``: when set (e.g. 0.01), drop hashes above
    that fraction of the hash space BEFORE the distinct shuffle. The
    estimate is unchanged as long as every group's k-th smallest hash
    survives the cut — safe when each group's true distinct count is
    at least ``k / prefilter_fraction`` w.h.p.; callers with a known
    cardinality floor use it to make the shuffle O(k) per group.
    """
    groups = list(group_cols or [])
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    h = hash60(val.cast("string"), seed=seed).alias("__h")
    hashed = df.select(*groups, h)
    if prefilter_fraction is not None:
        cut = int(_HASH_SPACE * float(prefilter_fraction))
        hashed = hashed.filter(F.col("__h") < cut)
    # Distinct first: map-side partial dedup, shuffle carries distinct
    # hashes only. The k-smallest selection then runs on the deduped set.
    distinct = hashed.distinct()
    if groups:
        w = Window.partitionBy(*groups).orderBy("__h")
        ranked = distinct.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= int(k)
        )
        kth = F.max(F.when(F.col("__rn") == int(k), F.col("__h")))
    else:
        # Ungrouped: sort().limit(k) compiles to TakeOrderedAndProject —
        # each task keeps its local k smallest and only those k·tasks
        # rows reach the driver-side merge. (A window over
        # partitionBy(lit(1)) would shuffle EVERY distinct hash into one
        # task — the ADVICE r6 scale bug this replaces.)
        ranked = distinct.sort("__h").limit(int(k))
        kth = F.when(F.count(F.lit(1)) == int(k), F.max("__h"))
    est = F.when(
        kth.isNotNull(),
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth.cast("double"),
    ).otherwise(F.count(F.lit(1)).cast("double"))
    return ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_kept"),
        kth.alias("kth_hash"),
        est.alias("distinct_est"),
    )
