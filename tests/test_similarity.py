"""Similarity-search tests: brute force is the ground truth; LSH is
measured against it (recall) and must be a strict bucket-subset."""

import pyspark.sql.functions as F
import pytest

from eynollah_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk(emb):
    queries = emb.orderBy("vec_id").limit(3)
    got = brute_force_topk(emb, queries, k=5).collect()
    assert len(got) == 15
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.vec_id != q for r in rows)
        assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_lsh_finds_planted_neighbors(spark, emb):
    """LSH recall on *structured* neighbors: plant 3 slightly-perturbed
    copies of each query vector (cosine ~0.99+); multi-table LSH must
    retrieve them. (The raw corpus is near-uniform random — top-1
    cosine ~0.37 — where hyperplane LSH is information-theoretically
    near chance, so recall is measured on the planted structure.)"""
    queries = emb.orderBy("vec_id").limit(5)
    qrows = queries.collect()
    planted = []
    for qi, r in enumerate(qrows):
        for c in range(3):
            vec = [v * (1.0 + 0.004 * ((c + j) % 3 - 1)) for j, v in enumerate(r.embedding)]
            planted.append((50_000 + qi * 10 + c, vec, -1))
    corpus = emb.union(spark.createDataFrame(planted, emb.schema))
    exact = brute_force_topk(corpus, queries, k=3)
    approx = lsh_topk(corpus, queries, dim=DIM, k=3, n_planes=6, n_tables=3)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # the exact top-3 for each query are its planted copies
    assert all(v >= 50_000 for _, v in e)
    recall = len(e & a) / len(e)
    assert recall >= 0.8, (recall, sorted(e - a))
    # every LSH hit must score identically to brute force on that pair
    ec = {(r.query_id, r.vec_id): r.cosine for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.vec_id) in ec:
            assert abs(ec[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_near_dup_pairs_planted(spark, emb):
    # plant an exact duplicate vector -> cosine 1.0 must be found
    dup = emb.orderBy("vec_id").limit(1).withColumn("vec_id", F.lit(99_999))
    corpus = emb.union(dup)
    pairs = embedding_near_dup_pairs(corpus, dim=DIM, threshold=0.999)
    got = {(r.id_a, r.id_b): r.cosine for r in pairs.collect()}
    assert got.get((0, 99_999)) == pytest.approx(1.0, abs=1e-6)


def test_ivf_topk_structure_and_recall(spark, emb):
    """IVF with full probe count == brute force on cells covered; with
    n_probe == n_centroids every cell is probed, so IVF must equal the
    exact brute-force top-k (the quantizer only partitions work)."""
    from eynollah_spark.operators.similarity import ivf_topk

    queries = emb.orderBy("vec_id").limit(3)
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).collect()
    }
    assert full == exact

    # partial probing: a valid ranked subset of the exact results
    part = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).collect()
    by_q = {}
    for r in part:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_kmeans_lloyd_groups_planted_clusters(spark):
    """Two tight planted clusters must land in two distinct k-means
    cells regardless of partitioning; exact integer arithmetic makes
    results partition-invariant."""
    import numpy as np

    from eynollah_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(3)
    rows = []
    for i in range(20):  # cluster A: near e0
        v = np.concatenate([[10.0], rng.rand(7) * 0.1]).astype(float)
        rows.append((i, v.tolist()))
    for i in range(20, 40):  # cluster B: near e1
        v = np.concatenate([[0.0], [10.0], rng.rand(6) * 0.1]).astype(float)
        rows.append((i, v.tolist()))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = kmeans_lloyd(e, k=2, iters=2).collect()
    cl = {r.vec_id: r.centroid_id for r in got}
    a_ids = {cl[i] for i in range(20)}
    b_ids = {cl[i] for i in range(20, 40)}
    assert len(a_ids) == 1 and len(b_ids) == 1 and a_ids != b_ids
    assert all(r.cluster_size == 20 for r in got)
    assert all(r.cosine > 0.99 for r in got)  # tight clusters

    again = kmeans_lloyd(e.repartition(7), k=2, iters=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_kmeans_exactness_guard_raises(spark):
    """The LAZY in-plan exactness assert (|component| <= sqrt(2^61/dim)
    on quantized vectors and centroid sums) must refuse inputs whose
    actual values risk int64 wrap — at action time, loudly — while
    plan construction stays lazy and safe inputs pass untouched."""
    import pytest

    from eynollah_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [1.0e6] * 64) for i in range(10)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = kmeans_lloyd(e, k=2, iters=1, scale=1 << 20)  # lazy: no error yet
    with pytest.raises(Exception, match="exactness bound"):
        plan.count()
    # the default scale keeps a realistic (unit-ish) corpus inside the
    # bound even when one cluster absorbs every vector
    sane = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(50)], ["vec_id", "embedding"]
    )
    assert kmeans_lloyd(sane, k=2, iters=1).count() == 50


def test_semdedup_drops_within_cluster_near_dups(spark):
    """Planted near-identical vectors inside one tight cluster: the
    lowest id survives, every >= threshold neighbor of a lower id is
    dropped, and cross-cluster vectors are untouched."""
    import numpy as np

    from eynollah_spark.operators.similarity import semdedup

    rng = np.random.RandomState(11)
    rows = []
    base = np.concatenate([[10.0], rng.rand(7) * 0.05])
    for i in range(3):  # ids 0,1,2: near-identical (cosine ~1)
        rows.append((i, (base + rng.rand(8) * 1e-4).tolist()))
    for i in range(3, 10):  # distinct dominant axes 1..7 (0 is the
        v = rng.rand(8) * 0.1  # dup group's axis)
        v[(i - 3) % 7 + 1] = 10.0
        rows.append((i, v.tolist()))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r.vec_id: r for r in semdedup(e, k=3, iters=2, threshold=0.98).collect()}
    assert len(got) == 10
    assert got[0].kept  # lowest id of the dup group survives
    assert not got[1].kept and not got[2].kept
    assert all(got[i].kept for i in range(3, 10))
    # dup group members share a cluster
    assert got[0].centroid_id == got[1].centroid_id == got[2].centroid_id


def test_probe_masks():
    from eynollah_spark.operators.similarity import probe_masks

    assert probe_masks(4, 0) == [0]
    m1 = probe_masks(4, 1)
    assert m1 == [0, 1, 2, 4, 8]
    m2 = probe_masks(5, 2)
    assert len(m2) == 1 + 5 + 10
    assert all(bin(m).count("1") <= 2 for m in m2)
    assert len(set(m2)) == len(m2)


def test_lsh_full_probe_equals_brute_force(emb):
    """With probe_hamming == n_planes every bucket of every table is
    probed, so multi-probe LSH degenerates to the exact scan and must
    equal brute-force top-k bit-for-bit (same scoring + tiebreak)."""
    queries = emb.orderBy("vec_id").limit(3)
    exact = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in lsh_topk(
            emb, queries, dim=DIM, k=5, n_planes=4, n_tables=1, probe_hamming=4
        ).collect()
    }
    assert full == exact


def test_lsh_multi_probe_lifts_recall(emb):
    """Multi-probe recall (vs brute force) is monotone in the Hamming
    radius on the same tables/planes, and with_cost reports a
    per-query candidate count that grows with the radius."""
    queries = emb.orderBy("vec_id").limit(5)
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def run(r):
        rows = lsh_topk(
            emb, queries, dim=DIM, k=5, n_planes=6, n_tables=2,
            probe_hamming=r, with_cost=True,
        ).collect()
        got = {(x.query_id, x.vec_id) for x in rows}
        ncand = {x.query_id: x.n_candidates for x in rows}
        return len(got & truth) / len(truth), ncand

    r0, c0 = run(0)
    r2, c2 = run(2)
    assert r2 >= r0
    assert all(c2[q] >= c0.get(q, 0) for q in c2)
    assert r2 >= 0.6  # radius-2 probing must be far above home-bucket-only


def test_pq_rerank_lifts_recall(emb):
    """The ADC-shortlist exact re-rank (Jégou §V.C) must improve (or
    preserve) recall vs pure-ADC ranking at the same codebook."""
    from eynollah_spark.operators.similarity import pq_topk

    queries = emb.orderBy("vec_id").limit(5)
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    n = emb.count()

    def run(rr):
        rows = pq_topk(
            emb, queries, dim=DIM, m=4, k=8, iters=1, k_results=5, rerank=rr,
            with_cost=True,
        ).collect()
        for x in rows:
            assert x.n_candidates == n - 1  # ADC always scans the corpus
        return {(x.query_id, x.vec_id) for x in rows}

    adc = run(0)
    rer = run(n)  # shortlist == corpus -> exact re-rank of everything
    assert len(rer & truth) >= len(adc & truth)
    # with the shortlist covering the whole corpus the re-ranked result
    # is the exact quantized-cosine top-k: near-perfect vs brute force
    assert len(rer & truth) / len(truth) >= 0.8


def test_hard_negatives_label_exclusion(spark, sf_dir):
    """Hard negatives never share the query's label, rank by cosine
    within each query, and are the same vectors brute-force top-k
    would return once same-label rows are removed."""
    import pyspark.sql.functions as F

    from eynollah_spark.operators.similarity import (
        brute_force_topk,
        hard_negatives,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )
    q = e.filter("vec_id < 4")
    out = hard_negatives(e, q, k=3).collect()
    assert out and all(r.neg_label != r.query_label for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    # cross-check vs an unlabeled big-k brute force filtered by label
    bf = brute_force_topk(e, q, k=len(labels)).collect()
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.cosine for r in rows] == sorted(
            (r.cosine for r in rows), reverse=True
        )
        qlab = rows[0].query_label
        want = [
            r.vec_id
            for r in sorted(
                (r for r in bf if r.query_id == qid), key=lambda r: r.rank
            )
            if labels[r.vec_id] != qlab
        ][:3]
        assert [r.vec_id for r in rows] == want


def test_hard_negatives_ann_recall_and_labels(spark, sf_dir):
    """The IVF-routed miner only returns different-label negatives,
    ranks identically to exact scoring on the candidates it probes,
    and keeps recall@k >= 0.8 against the brute-force miner at the
    bench knobs (the VERDICT r4 acceptance bar)."""
    import pyspark.sql.functions as F

    from eynollah_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ann,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )
    q = e.filter("vec_id < 8")
    exact = hard_negatives(e, q, k=5).collect()
    ann = hard_negatives_ann(
        e, q, k=5, n_centroids=32, n_probe=22, with_cost=True
    ).collect()
    assert ann and all(r.neg_label != r.query_label for r in ann)
    n_corpus = e.count()
    assert all(r.n_candidates < n_corpus for r in ann)  # really pruned
    truth = {(r.query_id, r.vec_id) for r in exact}
    got = {(r.query_id, r.vec_id) for r in ann}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, recall
