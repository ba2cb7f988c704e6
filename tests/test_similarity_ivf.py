"""IVF ANN index: assignment, Lloyd refinement, probe recall.

The oracled query (sim_ann_ivf_topk) replays the seed-codebook index in
DuckDB; these tests cover the production path the oracle can't — Lloyd
refinement — and the recall contract of probing.
"""

import math

import pytest

from stglib_spark.operators import similarity as sim
from stglib_spark.queries import _QUERY_VEC, load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_ivf_assign_nearest(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.1]), (2, [1.0, 0.9]), (3, [0.05, 0.0])],
        ["vec_id", "embedding"],
    )
    cents = [(10, [0.0, 0.0]), (20, [1.0, 1.0])]
    got = {
        r["vec_id"]: r["ivf_cell"]
        for r in sim.ivf_assign(df, cents).select("vec_id", "ivf_cell").collect()
    }
    assert got == {1: 10, 2: 20, 3: 10}


def test_ivf_assign_tie_breaks_low_cid(spark):
    df = spark.createDataFrame([(1, [0.5])], ["vec_id", "embedding"])
    cents = [(7, [0.0]), (3, [1.0])]  # equidistant → lowest cid wins
    row = sim.ivf_assign(df, cents).first()
    assert row["ivf_cell"] == 3


def test_ivf_refine_moves_centroids_to_cell_means(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 2) * 10.0 + d]) for i, d in zip(range(8), [0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0])],
        ["vec_id", "embedding"],
    )
    seed = sim.ivf_seed_centroids(df, 2)
    refined = sim.ivf_refine(df, seed, iters=3)
    centers = sorted(v[0] for _, v in refined)
    # cluster A: values 0,1,2,3 → mean 1.5; cluster B: 10,11,12,13 → 11.5
    assert centers[0] == pytest.approx(1.5)
    assert centers[1] == pytest.approx(11.5)


def test_ivf_probe_recall_vs_brute_force(emb):
    exact = [r["vec_id"] for r in sim.brute_force_topk(emb, _QUERY_VEC, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in sim.ann_topk_ivf(
            emb, _QUERY_VEC, k=10, n_centroids=16, nprobe=8, refine_iters=1
        ).collect()
    ]
    # probing half the refined cells must recover most of the exact top-10
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5


def test_ivf_full_probe_equals_brute_force(emb):
    exact = [(r["vec_id"], r["cosine"]) for r in sim.brute_force_topk(emb, _QUERY_VEC, k=10).collect()]
    full = [
        (r["vec_id"], r["cosine"])
        for r in sim.ann_topk_ivf(
            emb, _QUERY_VEC, k=10, n_centroids=8, nprobe=8
        ).collect()
    ]
    assert full == exact


def test_pq_seed_vectors_encode_to_themselves(spark):
    """Each codebook-seed vector's subvectors are at distance 0 from
    their own codebook entry, so the m code indices equal the vector's
    codebook row (no duplicate embeddings among the 16 seeds here)."""
    from stglib_spark.operators.similarity import pq_encode, pq_seed_codebooks

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = pq_seed_codebooks(emb, m=8, n_codes=16)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    seeds = emb.orderBy("vec_id").limit(16)
    rows = pq_encode(seeds, cb).orderBy("vec_id").collect()
    for c, r in enumerate(rows):
        assert list(r["pq_codes"]) == [c] * 8, (c, list(r["pq_codes"]))


def test_pq_adc_exact_on_codebook_vector(spark):
    """For a query equal to a stored seed vector, the ADC distance of
    that vector is exactly 0 (every LUT term hits the vector's own
    code), and it ranks first."""
    from stglib_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in first["embedding"]]
    rows = pq_adc_topk(emb, qv, k=3, m=8, n_codes=16).collect()
    assert rows[0]["vec_id"] == first["vec_id"]
    assert rows[0]["adc_dist"] == 0.0


def test_pq_dim_not_divisible_raises(spark):
    from stglib_spark.operators.similarity import pq_seed_codebooks

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="divisible"):
        pq_seed_codebooks(emb, m=7, n_codes=4)


def test_pq_refine_reduces_quantization_error(spark):
    """One Lloyd pass per subspace cannot increase total squared
    reconstruction error (k-means monotonicity), and typically reduces
    it on real embeddings."""
    import numpy as np

    from stglib_spark.operators.similarity import (
        pq_encode,
        pq_refine,
        pq_seed_codebooks,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb0 = pq_seed_codebooks(emb, m=8, n_codes=8)
    cb1 = pq_refine(emb, cb0, iters=1)

    vecs = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=float
    )

    def total_err(cb):
        err = 0.0
        for j in range(8):
            sub = vecs[:, j * 8 : (j + 1) * 8]
            cents = np.array(cb[j])
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err

    assert total_err(cb1) <= total_err(cb0) + 1e-9
    assert total_err(cb1) < total_err(cb0)


def test_pq_adc_recall_floor_vs_brute_force(spark):
    """Lossy-but-useful contract: PQ-ADC top-10 (squared-L2 over 8 byte
    codes) must keep a recall floor against exact brute-force cosine
    top-10 — the two metrics differ on unnormalized vectors, so this is
    a conservative floor, not a tight bound (0.4 measured)."""
    from stglib_spark.operators.similarity import brute_force_topk, pq_adc_topk

    emb = load_table(spark, SF, "embeddings")
    bf = {r["vec_id"] for r in brute_force_topk(emb, _QUERY_VEC, k=10).collect()}
    pq = {
        r["vec_id"]
        for r in pq_adc_topk(emb, _QUERY_VEC, k=10, m=8, n_codes=16).collect()
    }
    assert len(bf & pq) / 10 >= 0.2


def test_kmeans_refine_monotone_and_grid_snapped(spark):
    """ivf_refine(round_to=9): total within-cluster squared error is
    non-increasing per Lloyd pass, every refined centroid coordinate
    sits exactly on the 1e-9 grid (the engine-replayability contract of
    sim_kmeans_assign), and every vector's assignment is a valid
    centroid id."""
    import numpy as np

    from stglib_spark.operators.similarity import (
        ivf_assign,
        ivf_refine,
        ivf_seed_centroids,
    )

    emb = load_table(spark, SF, "embeddings")
    seeds = ivf_seed_centroids(emb, 8)
    refined = ivf_refine(emb, seeds, iters=2, round_to=9)
    for _, cv in refined:
        for x in cv:
            assert x == round(float(x), 9)

    vecs = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=float
    )

    def err(cents):
        c = np.array([cv for _, cv in cents])
        d2 = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    assert err(refined) < err(seeds)

    cids = {cid for cid, _ in refined}
    got = {r["ivf_cell"] for r in ivf_assign(emb, refined).collect()}
    assert got <= cids


def test_snap_away_matches_duckdb_idiom():
    """ivf_refine's centroid snap must be half-AWAY-FROM-ZERO and
    bit-identical to the SQL idiom the sim_kmeans_assign oracle uses
    (ADVICE r6: Python round() is half-to-even, so a mean on a 0.5e-9
    boundary diverged). Signbit-sensitive: -0.0 input must not produce
    a -0.0 the formatted hash rejects."""
    import duckdb

    from stglib_spark.operators.similarity import _snap_away

    vals = [
        2.5e-9, -2.5e-9, 1.5e-9, -1.5e-9, 3.5e-9, -3.5e-9,
        0.0, -0.0, 0.123456789499, -0.987654321501, 1.0, -1.0,
        0.7777777775, -0.7777777775,
    ]
    con = duckdb.connect()
    sql = (
        "SELECT CASE WHEN ?::DOUBLE < 0"
        " THEN -floor(-(?::DOUBLE) * 1e9 + 0.5) / 1e9"
        " ELSE floor(?::DOUBLE * 1e9 + 0.5) / 1e9 END"
    )
    for v in vals:
        got = _snap_away(v, 9)
        exp = con.execute(sql, [v, v, v]).fetchone()[0]
        assert got == exp, (v, got, exp)
        assert math.copysign(1.0, got) == math.copysign(1.0, exp), v


def test_null_and_ragged_embeddings_yield_null_not_crash(spark):
    """ADVICE r7: the Arrow kernels used to np.vstack the raw batch, so
    one NULL or wrong-length embedding raised inside the executor. The
    masked kernels must instead emit NULL for the bad rows and the
    correct result for every valid row — matching what the old native
    expression form did."""
    from stglib_spark.operators.similarity import (
        ivf_assign,
        pairwise_topk_within,
        pq_encode,
    )

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),                      # null vector
        (3, [1.0, 0.0]),                # ragged
        (4, [1.0, float("nan"), 0.0, 0.0]),  # null element → NaN
        (5, [0.9, 0.1, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])]
    got = {r["vec_id"]: r["ivf_cell"] for r in ivf_assign(df, cents).collect()}
    assert got[0] == 0 and got[1] == 1 and got[5] == 1
    assert got[2] is None and got[3] is None and got[4] is None

    cbs = [[[0.0, 0.0], [1.0, 0.0]], [[0.0, 0.0], [0.0, 1.0]]]
    codes = {r["vec_id"]: r["pq_codes"] for r in pq_encode(df, cbs).collect()}
    assert codes[1] == [1, 0]
    assert codes[2] is None and codes[3] is None and codes[4] is None

    from pyspark.sql import functions as F

    grouped = df.withColumn("g", F.lit(1))
    pairs = pairwise_topk_within(grouped, group_col="g", threshold=0.5)
    ids = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # bad vectors form no pairs; (1, 5) is the only qualifying cosine
    assert ids == {(1, 5)}, ids


def test_incremental_near_dedup_colliding_ids_no_mixed_text(spark):
    """ADVICE r7: the same doc_id on batch and index sides (a re-crawl
    with different text) used to fan the verify join across both rows
    and emit mixed-text jaccard values. With side-tagged lookup ids the
    batch doc must verify against the INDEX text only."""
    from stglib_spark.operators.dedup import incremental_near_dedup

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = "one two three four five six seven eight nine ten"
    batch = spark.createDataFrame(
        [(7, text_a)], "doc_id long, text string"
    )
    index = spark.createDataFrame(
        [(7, text_b), (8, text_a)], "doc_id long, text string"
    )
    out = incremental_near_dedup(
        batch, index, num_hashes=16, bands=8, shingle_n=2, threshold=0.5
    ).collect()
    # doc 7 matches index doc 8 (identical text, jaccard 1.0); it must
    # NOT self-match index doc 7's unrelated text
    matches = {(r["doc_id"], r["match_id"]): r["jaccard"] for r in out}
    assert (7, 8) in matches and matches[(7, 8)] == 1.0
    assert (7, 7) not in matches, matches


def test_pairwise_topk_dim_pinning_and_tiebreak(spark):
    """ADVICE r8: an explicit ``dim`` (from the caller's codebook) wins
    over the modal-length guess, so ragged/corrupt vectors that happen
    to OUTNUMBER the valid ones in a group cannot hijack the GEMM dim;
    without it, a modal-count TIE breaks deterministically toward the
    larger dim."""
    from stglib_spark.operators.similarity import pairwise_topk_within

    valid = [1.0] * 8
    ragged = [1.0] * 3
    rows = (
        [(i, "g", ragged) for i in range(3)]        # 3 corrupt vectors
        + [(10, "g", valid), (11, "g", valid)]       # 2 valid duplicates
    )
    df = spark.createDataFrame(rows, "vec_id long, g string, embedding array<double>")

    # explicit dim: only the two valid vectors pair (cosine 1.0)
    got = pairwise_topk_within(
        df, group_col="g", threshold=0.9, dim=8
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(10, 11)]

    # modal fallback with MORE ragged than valid: the corrupt dim wins
    # the count (documented limitation — callers with a codebook pass dim)
    got = pairwise_topk_within(df, group_col="g", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in got] == [
        (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)
    ]

    # exact tie (2 vs 2): deterministic break toward the LARGER dim
    tie = spark.createDataFrame(
        [(0, "g", ragged), (1, "g", ragged), (10, "g", valid), (11, "g", valid)],
        "vec_id long, g string, embedding array<double>",
    )
    got = pairwise_topk_within(tie, group_col="g", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(10, 11)]
