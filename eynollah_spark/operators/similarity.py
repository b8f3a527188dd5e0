"""Similarity search over an embedding column (array<float/double>).

Two paths, as the task brief requires:

- **brute-force cosine top-k** — the exact baseline. One broadcast of
  the (small) query set against the corpus; dot products computed with
  `F.zip_with` + `F.aggregate`, entirely JVM-side, so the scan streams
  through whole-stage codegen with no Python.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  bucket the corpus; each query probes only its bucket. Hyperplanes
  are derived deterministically (md5 arithmetic) so any engine can
  reproduce them.

At 100 TB / billions of vectors: the brute-force path is a full scan
per query batch (only acceptable for offline joins with many queries
amortized per scan); the LSH path turns it into a bucket-pruned scan.
IVF (k-means coarse quantizer) would be the next step — the bucketing
code shape below is exactly where centroids would slot in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_cosine(pairs: DataFrame, col_a: str, col_b: str, out: str = "cosine") -> DataFrame:
    a, b = F.col(col_a), F.col(col_b)
    return pairs.withColumn(out, F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, score every corpus
    vector, window top-k per query. Ties broken by corpus id (total
    order — partition-invariant results)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def plane_values(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components for plane
    `plane_idx`: md5-derived values in [-0.5, 0.5), computed DRIVER-side
    with the same arithmetic the SQL form would use (int(md5hex[:8],16)
    is exact below 2^32, /16^8 is an exact power-of-two scaling, -0.5
    exact), so the doubles are bit-identical to what
    conv(substring(md5(...),1,8),16,10)/16^8 - 0.5 yields in any
    engine — the DuckDB oracle keeps computing them its own way and
    still hash-matches."""
    import hashlib

    return [
        int(hashlib.md5(f"plane{plane_idx}:{j}".encode()).hexdigest()[:8], 16)
        / float(16**8)
        - 0.5
        for j in range(dim)
    ]


def hyperplane(dim: int, plane_idx: int):
    """Hyperplane as a LITERAL array column. The previous form built
    the plane as an md5 expression tree; Catalyst does not constant-
    fold higher-order functions, so every corpus ROW recomputed
    dim x n_planes md5s — measured 24x slower on a 200k-row bucket
    scan (102 s -> 4.3 s). Literal values are bit-identical (verified
    exceptAll both directions)."""
    return F.expr(
        "array(" + ",".join(f"{v!r}D" for v in plane_values(dim, plane_idx)) + ")"
    )


def lsh_bucket(vec_col, dim: int, n_planes: int = 8):
    """Signature bits = sign of dot(vec, plane_i); bucket id in
    [0, 2^n_planes)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        d = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, hyperplane(dim, i))
        bucket = bucket + F.when(d > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """All bit masks over ``n_planes`` bits with popcount <=
    ``probe_hamming`` — the multi-probe perturbation set (Lv et al.
    2007, "Multi-Probe LSH"). Mask 0 is the home bucket."""
    return [m for m in range(1 << n_planes) if bin(m).count("1") <= probe_hamming]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 2,
    probe_hamming: int = 0,
    with_cost: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: standard multi-table LSH with multi-probe.
    Each of `n_tables` independent hash tables buckets the corpus by
    `n_planes` hyperplane signs; a query probes its own bucket plus
    every bucket within Hamming distance ``probe_hamming`` of its
    signature in every table (Lv et al. 2007 multi-probe — recall of
    many extra tables at the memory cost of one), candidates are
    unioned (distinct), then exact-scored. Recall grows as
    1-(1-p')^tables where p' sums the binomial probe terms; the
    `ann_recall` query measures it against brute force.

    Scale shape: corpus is written once per table (explode by table id),
    the join shuffles on (table, bucket); only the tiny QUERY side is
    exploded by probe mask (C(n_planes, <=probe_hamming) rows per
    query/table), so corpus cost is unchanged — bucket sizes stay
    ~N/2^planes and no full cross product ever forms.

    with_cost=True appends ``n_candidates`` — the number of distinct
    candidates exact-scored for that query (the honest probe cost an
    index evaluation must report alongside recall).
    """
    def table_bucket(vec_name: str, t: int):
        """Bucket id for table ``t``: planes are the LITERAL arrays for
        the table-namespaced indices (t*n_planes + i). Literal planes
        keep the scan free of per-row md5 recomputation (see
        ``hyperplane``); the dot itself stays the same HOF fold, so
        bucket values are bit-identical to the expression-plane form."""
        bucket = None
        for i in range(n_planes):
            d = _dot(F.col(vec_name), hyperplane(dim, t * n_planes + i))
            bit = F.when(d > 0, F.lit(2**i)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        return bucket

    def with_buckets(df, idc, vecc, out_id, out_vec):
        # all tables' buckets are computed BEFORE the table explode
        # (each vector is read once per table either way; this shape
        # needs no per-row CASE over tbl)
        base = df.select(F.col(idc).alias(out_id), F.col(vecc).alias(out_vec))
        tb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        table_bucket(out_vec, t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_tb")
        return base.select(out_id, out_vec, tb).select(
            out_id, out_vec, F.col("_tb.tbl").alias("tbl"), F.col("_tb.bucket").alias("bucket")
        )

    c = with_buckets(corpus, id_col, vec_col, "vec_id", "vec")
    q = with_buckets(queries, id_col, vec_col, "query_id", "qvec")
    if probe_hamming > 0:
        masks = probe_masks(n_planes, probe_hamming)
        q = q.withColumn(
            "bucket",
            F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])),
        )
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", "vec_id", "vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w))
    cols = ["query_id", "vec_id", "cosine", "rank"]
    if with_cost:
        wq = Window.partitionBy("query_id")
        out = out.withColumn("n_candidates", F.count(F.lit(1)).over(wq))
        cols.append("n_candidates")
    return out.filter(F.col("rank") <= k).select(*cols)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are
    generated only within buckets, then cosine-verified."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.col("a.vec").alias("va"),
        F.col("b.vec").alias("vb"),
    )
    return (
        with_cosine(pairs, "va", "vb")
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Assign every vector to its nearest centroid (coarse quantizer).
    Centroids are tiny -> broadcast; argmin via top-1 window."""
    c = centroids.select(
        F.col("centroid_id").alias("cid"), F.col("cvec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "dist",
        -_dot(F.col(vec_col), F.col("cvec"))
        / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist", "cvec")
        .withColumnRenamed("cid", "centroid_id")
    )


def _ivf_centroids(c: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic IVF centroid pick: the n_centroids corpus vectors
    with the smallest md5-derived rank. orderBy().limit(n) compiles to
    TakeOrderedAndProject — per-partition top-n merged at the driver,
    NOT a global sort (the plan test asserts this), so the pick scales
    with partitions. Only the tiny n-row result is then window-ranked
    to assign dense centroid ids. ``c`` must have (vec_id, vec)."""
    hcol = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ivf:"), F.col("vec_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
    )
    picked = (
        c.select("vec_id", "vec", hcol.alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(n_centroids)
    )
    return picked.select(
        (F.row_number().over(Window.orderBy("_h", "vec_id")) - 1).alias("centroid_id"),
        F.col("vec").alias("cvec"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    with_cost: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    partitions the corpus into centroid cells; each query scores only
    the ``n_probe`` nearest cells. with_cost=True appends
    ``n_candidates`` (vectors exact-scored for that query — the probe
    cost an index evaluation reports alongside recall).

    The quantizer here is deterministic k-means++-style init without
    Lloyd iterations: centroids are the corpus vectors whose
    md5-derived rank is smallest (reproducible on any engine, no RNG).
    At 100 TB you would train real centroids offline and broadcast
    them; the dataflow below (broadcast centroids -> cell assignment
    shuffle -> per-cell scoring) is exactly the production shape, and
    is where a trained codebook would slot in.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))

    centroids = _ivf_centroids(c, n_centroids)
    assigned = ivf_assign(c, centroids, "vec")

    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "sim",
        _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "centroid_id")
    )

    cand = assigned.join(
        F.broadcast(probes), "centroid_id"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w))
    cols = ["query_id", "vec_id", "cosine", "rank"]
    if with_cost:
        wq = Window.partitionBy("query_id")
        out = out.withColumn("n_candidates", F.count(F.lit(1)).over(wq))
        cols.append("n_candidates")
    return out.filter(F.col("rank") <= k).select(*cols)


def _int_dot(a, b):
    """Exact int64 dot product of two bigint arrays (left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _int_cosine(a, b):
    """Cosine from exact integer dot/norms: the three folds are exact
    int64 (kmeans_lloyd's exactness guard bounds dim*(n*V)^2 under
    2^62, where V is the max quantized component and n the worst-case
    cluster size), so the double conversion and final IEEE ops are
    bit-identical on any engine — no float-summation-order hazard."""
    return F.coalesce(
        _int_dot(a, b).cast("double")
        / (
            F.sqrt(_int_dot(a, a).cast("double"))
            * F.sqrt(_int_dot(b, b).cast("double"))
        ),
        F.lit(-2.0),
    )


def _exact_guard(col, scale: int):
    """Per-row lazy exactness guard IN THE VALUE PATH (a side column
    would be pruned by Catalyst): |component| <= sqrt(2^61/dim)
    guarantees every dim-length int64 fold of such components stays
    under 2^61. Under ANSI (Spark 4 default) an overflow would already
    error — this replaces the opaque ArithmeticException with an
    actionable message. (The per-dimension SUM feeding a centroid is
    itself safe: with |val| <= 2^27ish the long agg overflows only
    past ~6e10 members in ONE cluster.)"""
    lim = F.floor(F.sqrt(F.lit(float(1 << 61)) / F.size(col)))
    ok = F.array_max(F.transform(col, lambda x: F.abs(x))) <= lim
    return F.when(ok, col).otherwise(
        F.raise_error(
            F.lit(
                "kmeans int64 exactness bound exceeded: a quantized "
                f"component or centroid sum (scale={scale}) broke "
                "|comp| <= sqrt(2^61/dim); lower `scale`"
            )
        )
    )


def _lloyd_chain(c: DataFrame, k: int, iters: int, scale: int):
    """The deterministic Lloyd iteration chain over a pre-quantized
    (vec_id, v:array<bigint>) frame. Init picks the k corpus vectors
    with smallest md5-rank via orderBy().limit() —
    TakeOrderedAndProject, no global sort. Per iteration: broadcast
    the k sum-vectors -> nearest-centroid assignment (argmax cosine,
    centroid-id tiebreak; map-side, no shuffle) -> per-dimension sums
    via posexplode + partial-agg groupBy((centroid, dim)).

    Returns (assigned, cent, sizes): the final assignment
    (vec_id, v, centroid_id, cos), the centroid frame that produced it
    (centroid_id, cvec — integer SUM vectors after the first
    iteration, seed vectors for iters=0), and the member counts of
    the sums behind ``cent`` (n_members=1 for the iters=0 seeds) —
    sizes are what a mean reconstruction divides by (pq_codes)."""
    hcol = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmeans:"), F.col("vec_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
    )
    picked = (
        c.select("vec_id", "v", hcol.alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(k)
    )
    cent = picked.select(
        (F.row_number().over(Window.orderBy("_h", "vec_id")) - 1).alias(
            "centroid_id"
        ),
        F.col("v").alias("cvec"),
    )
    sizes = cent.select(
        "centroid_id", F.lit(1).cast("bigint").alias("n_members")
    )

    def assign(cents):
        scored = c.crossJoin(F.broadcast(cents)).withColumn(
            "cos", _int_cosine(F.col("v"), F.col("cvec"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cos"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "v", "centroid_id", "cos")
        )

    assigned = assign(cent)
    for _ in range(iters):
        cent = (
            assigned.select("centroid_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.sum("val").alias("s"))
            .groupBy("centroid_id")
            .agg(
                _exact_guard(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "s"))),
                        lambda x: x["s"],
                    ),
                    scale,
                ).alias("cvec")
            )
        )
        sizes = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("n_members")
        )
        assigned = assign(cent)
    return assigned, cent, sizes


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 12,
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column — the
    offline training step for ``ivf_topk``'s coarse quantizer
    (faiss-style IVF training, expressed Spark-first).

    Engine-exact by construction: components are quantized to
    ``round(x * scale)`` bigints (scale 2^12 by default); centroids
    are kept as INTEGER SUM vectors (cosine is scale-invariant, so
    the mean's division never happens); every dot/norm is an exact
    int64 fold. Exactness invariant: every fold is sum_j a_j*b_j, so
    it stays exact while every participating component (quantized
    vectors AND centroid sums) satisfies ``|comp| <= sqrt(2^61/dim)``
    — enforced LAZILY by an in-plan ``assert_true`` on both frames,
    so the operator stays a lazy DataFrame transform (no eager
    corpus scan), rejects only inputs whose ACTUAL sums are at risk
    (a worst-case pre-check would refuse working large corpora), and
    fails loudly at action time instead of silently wrapping (Spark)
    or erroring mid-query (DuckDB). Init picks the k corpus vectors
    with smallest md5-rank via orderBy().limit() —
    TakeOrderedAndProject, no global sort.

    Per iteration: broadcast the k sum-vectors -> nearest-centroid
    assignment (argmax cosine, centroid-id tiebreak; map-side, no
    shuffle) -> per-dimension sums via posexplode + partial-agg
    groupBy((centroid, dim)) — at any corpus size the map-side combine
    reduces each partition to k*dim rows before the exchange. Empty
    clusters drop out (standard Lloyd degeneracy), deterministically.

    Returns (vec_id, centroid_id, cluster_size, cosine) of the final
    assignment; cosine (to the centroid, rounded 6) is the per-vector
    quantization quality.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        _exact_guard(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * scale).cast("bigint"),
            ),
            scale,
        ).alias("v"),
    )
    assigned, _cent, _sizes = _lloyd_chain(c, k, iters, scale)
    wsz = Window.partitionBy("centroid_id")
    return assigned.select(
        "vec_id",
        "centroid_id",
        F.count(F.lit(1)).over(wsz).alias("cluster_size"),
        F.round(F.col("cos"), 6).alias("cosine"),
    )


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 12,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) expressed
    Spark-first: cluster the embeddings with the deterministic integer
    Lloyd trainer (``kmeans_lloyd``), then within each cluster drop
    every vector that has a ``>= threshold`` cosine neighbor with a
    LOWER id (keep-first, the same greedy representative rule the
    paper applies inside each cluster's epsilon-ball).

    Pairwise scoring is confined to clusters, so the quadratic term is
    bounded by the largest cluster — ``k`` is the scale knob (SemDeDup
    runs ~10^5 clusters at web scale, keeping clusters ~corpus/k).
    The self-join keys on centroid_id; AQE splits a skewed giant
    cluster's join. Cosines reuse the exact int64 quantized folds, so
    the DuckDB oracle reproduces every comparison bit-identically.

    Returns (vec_id, centroid_id, cluster_size, kept).
    """
    assigned = kmeans_lloyd(
        corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    qv = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("bigint"),
        ).alias("v"),
    )
    av = assigned.select("vec_id", "centroid_id").join(qv, "vec_id")
    dropped = (
        av.alias("a")
        .join(
            av.alias("b"),
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.round(_int_cosine(F.col("a.v"), F.col("b.v")), 6).alias("pc"),
        )
        .filter(F.col("pc") >= threshold)
        .select("vec_id")
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        "cluster_size",
        F.col("_dropped").isNull().alias("kept"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-vector ANN
# ---------------------------------------------------------------------------
def _quantize(vec_col, scale: int):
    return F.transform(
        vec_col if not isinstance(vec_col, str) else F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("bigint"),
    )


def _pq_frames(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 12,
) -> DataFrame:
    """Shared PQ machinery (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each ``dim``-vector into
    ``m`` subvectors, train an independent deterministic Lloyd
    codebook of ``k`` centroids per subspace (``_lloyd_chain`` — the
    same md5 init/exact-int folds as ``kmeans_lloyd``), and assign
    each doc one code per subspace.

    Reconstruction stays engine-exact: the subspace centroid MEAN is
    re-quantized to integers — ``round(sum_j / n_members)`` per
    component (one correctly-rounded double division from exact
    int64s) — so the reconstructed full vector is an integer vector
    at the original quantization scale and every downstream cosine is
    an exact int64 fold.

    Scale shape: the m sub-kmeans run as ONE grouped Lloyd chain over
    an exploded (sub_id, vec_id, subvector) frame — every assignment
    is a broadcast of the m*k-entry codebook plus one map-side-partial
    `max_by` groupBy on (sub_id, vec_id), every centroid update one
    (sub_id, centroid, dim)-keyed partial agg, and the m per-subspace
    results pivot back to wide in one groupBy(vec_id). The per-
    subspace formulation (m separate chains re-joined on vec_id) did
    the same arithmetic with m times the exchanges and an m-way join
    fan-in; the grouped plan is both shallower for Catalyst and
    strictly fewer shuffles at corpus scale. Init, argmax tiebreak
    (highest cosine, then lowest centroid_id), exact-int sums and the
    round-of-mean reconstruction are bit-identical to the ungrouped
    chain (guarded by the pq fixtures and the DuckDB oracle).

    Returns one row per doc: (vec_id, code0..code{m-1}, v (full
    quantized vector), rvec (full integer reconstruction)).
    """
    sub = dim // m
    assert sub * m == dim, "dim must divide into m equal subspaces"
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub_id"),
                        _exact_guard(
                            _quantize(
                                F.slice(F.col(vec_col), s * sub + 1, sub), scale
                            ),
                            scale,
                        ).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("vec_id", F.col("e.sub_id").alias("sub_id"), F.col("e.v").alias("v"))

    # Deterministic init: the k corpus vectors with smallest md5-rank
    # (same hash for every subspace, exactly as the per-subspace
    # chains computed it) — TakeOrderedAndProject, no global sort.
    hcol = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmeans:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
    )
    picked = (
        corpus.select(F.col(id_col).alias("vec_id"), hcol.alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(k)
    )
    seed_ids = picked.select(
        (F.row_number().over(Window.orderBy("_h", "vec_id")) - 1).alias(
            "centroid_id"
        ),
        "vec_id",
    )
    cent = c.join(F.broadcast(seed_ids), "vec_id").select(
        "sub_id", "centroid_id", F.col("v").alias("cvec")
    )
    sizes = cent.select(
        "sub_id", "centroid_id", F.lit(1).cast("bigint").alias("n_members")
    )

    def assign(cents):
        scored = c.join(F.broadcast(cents), "sub_id").withColumn(
            "cos", _int_cosine(F.col("v"), F.col("cvec"))
        )
        # argmax via max_by (highest cos, then lowest centroid_id):
        # partial-aggregates map-side, so the shuffle carries one row
        # per (sub_id, vec_id) instead of k candidate rows.
        return (
            scored.groupBy("sub_id", "vec_id")
            .agg(
                F.first("v").alias("v"),
                F.max_by(
                    F.struct("centroid_id", "cos"),
                    F.struct(F.col("cos"), -F.col("centroid_id")),
                ).alias("_b"),
            )
            .select(
                "sub_id",
                "vec_id",
                "v",
                F.col("_b.centroid_id").alias("centroid_id"),
                F.col("_b.cos").alias("cos"),
            )
        )

    assigned = assign(cent)
    for _ in range(iters):
        cent = (
            assigned.select(
                "sub_id", "centroid_id", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("sub_id", "centroid_id", "dim")
            .agg(F.sum("val").alias("s"))
            .groupBy("sub_id", "centroid_id")
            .agg(
                _exact_guard(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "s"))),
                        lambda x: x["s"],
                    ),
                    scale,
                ).alias("cvec")
            )
        )
        sizes = assigned.groupBy("sub_id", "centroid_id").agg(
            F.count(F.lit(1)).alias("n_members")
        )
        assigned = assign(cent)

    # Integer mean reconstruction per (sub_id, centroid): m*k rows.
    recon = cent.join(F.broadcast(sizes), ["sub_id", "centroid_id"]).select(
        "sub_id",
        "centroid_id",
        F.transform(
            "cvec",
            lambda x: F.round(x.cast("double") / F.col("n_members")).cast(
                "bigint"
            ),
        ).alias("rvec"),
    )
    # Pivot the m subspace rows back to one wide row per doc; the
    # full quantized vector is the subspace slices re-concatenated
    # (quantization is componentwise), re-guarded at full dim exactly
    # as the ungrouped version guarded its corpus projection.
    wide = (
        assigned.join(F.broadcast(recon), ["sub_id", "centroid_id"])
        .groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sub_id", "centroid_id", "v", "rvec"))
            ).alias("_a")
        )
    )
    return wide.select(
        "vec_id",
        *[F.col("_a")[s]["centroid_id"].alias(f"code{s}") for s in range(m)],
        _exact_guard(
            F.flatten(F.transform("_a", lambda x: x["v"])), scale
        ).alias("v"),
        F.flatten(F.transform("_a", lambda x: x["rvec"])).alias("rvec"),
    )


def pq_codes(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 12,
) -> DataFrame:
    """PQ encoding of the corpus: per-doc subspace codes plus the
    reconstruction quality (cosine between the doc's quantized vector
    and its integer PQ reconstruction, rounded 6). The codes column
    set is the compressed representation a 100 TB index would store
    (m bytes/vector at k<=256 vs 4*dim)."""
    fr = _pq_frames(corpus, dim, m, k, iters, id_col, vec_col, scale)
    return fr.select(
        "vec_id",
        *[F.col(f"code{s}") for s in range(m)],
        F.round(_int_cosine(F.col("v"), F.col("rvec")), 6).alias("recon_cosine"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    k_results: int = 5,
    rerank: int = 0,
    with_cost: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 12,
) -> DataFrame:
    """Asymmetric-distance PQ top-k: queries keep their full quantized
    vectors; corpus docs are represented by their PQ reconstructions.
    Broadcast the (small) query set, score every doc's reconstruction
    (exact int64 cosine folds — JVM-side, codegen), window top-k per
    query with id tiebreak. The scan reads codes + the broadcast
    codebook, never the original vectors — the PQ memory win.

    ``rerank > 0`` enables the standard PQ refinement step (Jégou et
    al. 2011 §V.C): the ADC pass keeps a per-query shortlist of the
    ``rerank`` best reconstructions, then only those rows join back to
    the full quantized vectors for an exact re-score. The scan still
    never touches full vectors — the rejoin reads `rerank` vectors per
    query, which is what makes PQ recall usable without giving up the
    compressed-scan economics.

    with_cost=True appends ``n_candidates`` (ADC scans every corpus
    reconstruction, so it reports corpus_size - 1 per query — PQ trades
    scan count for per-candidate cost, and the evaluation should show
    that honestly)."""
    fr = _pq_frames(corpus, dim, m, k, iters, id_col, vec_col, scale)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _exact_guard(_quantize(F.col(vec_col), scale), scale).alias("qv"),
    )
    scored = (
        fr.select("vec_id", "rvec")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc", F.round(_int_cosine(F.col("qv"), F.col("rvec")), 6))
    )
    if with_cost:
        wq = Window.partitionBy("query_id")
        scored = scored.withColumn("n_candidates", F.count(F.lit(1)).over(wq))
    if rerank > 0:
        ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
        short = (
            scored.withColumn("_srk", F.row_number().over(ws))
            .filter(F.col("_srk") <= rerank)
            .drop("_srk", "rvec", "adc")
        )
        scored = short.join(fr.select("vec_id", "v"), "vec_id").withColumn(
            "score", F.round(_int_cosine(F.col("qv"), F.col("v")), 6)
        )
    else:
        scored = scored.withColumn("score", F.col("adc"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w))
    cols = ["query_id", "vec_id", "score", "rank"]
    if with_cost:
        cols.append("n_candidates")
    return out.filter(F.col("rank") <= k_results).select(*cols)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR /
    Contriever recipe): for each query, the k most-similar corpus
    vectors with a DIFFERENT label — near the query in embedding
    space but semantically wrong, exactly the negatives that make a
    retriever train. Same plan shape as ``brute_force_topk``
    (broadcast queries, JVM-side fold dot products, one top-k window
    keyed on query_id), with the label-mismatch predicate pushed below
    the scoring so same-label rows never rank. Ties break by corpus id
    (total order — partition-invariant).

    Returns (query_id, query_label, vec_id, neg_label, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("query_label"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("vec"))
                / (_norm(F.col("qvec")) * _norm(F.col("vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "vec_id", "neg_label", "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hard_negatives_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    with_cost: bool = False,
) -> DataFrame:
    """ANN-backed hard-negative mining: ``hard_negatives`` routed
    through the IVF coarse quantizer, the production path when the
    query set is large — each query exact-scores only its ``n_probe``
    nearest centroid cells (~n_probe/n_centroids of the corpus)
    instead of every corpus vector, so mining cost scales with the
    probed fraction, not |corpus| x |queries|. The label-mismatch
    predicate sits BELOW the scoring, on the candidate stream, so
    same-label candidates never pay a dot product.

    Deterministic end to end (md5 centroid pick, total-order tie
    breaks) — the DuckDB oracle reproduces it exactly; truth-scored by
    the ``hard_negatives_ann_recall`` query against the brute-force
    miner (the ann_recall protocol). with_cost=True appends
    ``n_candidates`` (different-label vectors exact-scored per query).

    Returns (query_id, query_label, vec_id, neg_label, cosine, rank
    [, n_candidates])."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("vec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qvec"),
    )
    centroids = _ivf_centroids(c.select("vec_id", "vec"), n_centroids)
    assigned = ivf_assign(c, centroids, "vec")
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "sim",
        _dot(F.col("qvec"), F.col("cvec"))
        / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "query_label", "qvec", "centroid_id")
    )
    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col("neg_label") != F.col("query_label")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col("vec"))
            / (_norm(F.col("qvec")) * _norm(F.col("vec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w))
    cols = [
        "query_id", "query_label", "vec_id", "neg_label", "cosine",
        F.col("rank").cast("int").alias("rank"),
    ]
    if with_cost:
        wc = Window.partitionBy("query_id")
        out = out.withColumn("n_candidates", F.count(F.lit(1)).over(wc))
        cols.append("n_candidates")
    return out.filter(F.col("rank") <= k).select(*cols)
