"""Deterministic corpus sampling / quota operators.

Training-data mixing needs reproducible, cluster-order-independent
sampling — ``df.sample()`` is seed-and-partitioning dependent, so a
re-run on a different cluster layout keeps different rows.  These
operators key every decision on a hash of the ROW (doc_id), never on
partition state, so the same corpus always yields the same sample on
1 executor or 1000.

Scale posture:

- ``stratified_sample`` is a pure map-side filter (zero shuffles): the
  per-stratum keep-decision is ``md5(doc_id) mod 1e6 < rate·1e6``.
- ``per_group_quota`` is the two-phase top-N: rank within
  (group, salt) first — bounding any single window partition to the
  salted slice — then rank the ≤ salts·quota survivors per group.
  A single-phase window over a hot group (one domain with 10⁹ docs)
  would sort that group in one task; the salted phase caps it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from eynollah_spark.operators.dedup import _h64

# decisions are uniform on [0, 1e6) — hash of the doc id, engine-portable
# (same md5→bigint construction as the dedup family; DuckDB mirror:
#  CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) % 1000000)
SAMPLE_MOD = 1_000_000


def _hash_unit(id_col) -> F.Column:
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(SAMPLE_MOD))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    ``rates`` maps stratum value → keep-rate in [0, 1]; strata not
    listed use ``default_rate``.  The keep decision depends only on
    ``id_col``, so the sample is identical across cluster layouts and
    re-runs — a map-side filter with no shuffle and no RNG state.
    """
    rate = F.lit(int(round(default_rate * SAMPLE_MOD)))
    for value, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(round(r * SAMPLE_MOD)))
        ).otherwise(rate)
    return docs.filter(_hash_unit(F.col(id_col)) < rate)


def per_group_quota(
    docs: DataFrame,
    quota: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """At most ``quota`` docs per group, preferring highest
    ``order_col`` (ties → lowest ``id_col``): per-domain caps for a
    crawl corpus.

    Two-phase top-N: phase 1 ranks within (group, hash-salt) and keeps
    ``quota`` per salted slice — the per-salt top-N is a superset of
    the group top-N, so correctness is independent of salt count —
    then phase 2 ranks the ≤ salts·quota survivors per group.  Result
    columns: group, doc_id, order value, final rank.
    """
    order = [F.desc(order_col), F.asc(id_col)]
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salts))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= quota)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= quota)
        .select(group_col, id_col, order_col, "rank")
    )


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "tb0",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-group TOKEN-budget selection: keep, for each group (source/
    domain/language), the maximal deterministic-hash-ordered prefix of
    docs whose cumulative whitespace-token count stays within
    ``budget`` — the "N tokens per domain" mixing recipe, keyed on
    tokens rather than doc counts (``per_group_quota``'s unit).

    Order within a group is ``(md5(doc_id ++ ':seed'), doc_id)`` —
    cluster-layout independent and unbiased by doc length or position,
    so the kept set is identical on 1 executor or 1000, and growing
    the corpus only APPENDS candidates after the old ones in hash
    order (a kept doc can be displaced only by new docs hashing ahead
    of it, never by re-shuffling).

    Scale shape — the per-group running total is a TWO-LEVEL prefix
    sum, never one window partition per group (a hot domain with 10⁹
    docs would otherwise sort in a single task): (1) docs bucket by
    hash RANGE (bucket = h·n_buckets/1e6, monotone in h so bucket
    order IS hash order), (2) per-(group, bucket) token totals + a
    window over that tiny table yields exclusive bucket offsets,
    broadcast back, (3) an in-bucket cumsum completes the global
    per-group prefix. Exact single-window SQL oracle.

    Returns kept rows: (group, doc_id, n_tokens, cum_tokens) where
    cum_tokens ≤ budget is the through-this-doc running total.
    """
    from eynollah_spark.operators.text_analysis import token_count

    h = F.pmod(
        _h64(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        F.lit(SAMPLE_MOD),
    )
    base = docs.select(
        group_col,
        id_col,
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        h.alias("_h"),
    ).withColumn(
        "_b", F.floor(F.col("_h") * n_buckets / SAMPLE_MOD).cast("bigint")
    )
    bucket_tot = base.groupBy(group_col, "_b").agg(
        F.sum("n_tokens").alias("_bt")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        group_col,
        "_b",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_off"),
    )
    wi = (
        Window.partitionBy(group_col, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # offsets is n_groups x n_buckets rows — tiny for a source mix,
    # UNBOUNDED for a per-domain budget over millions of domains, so
    # no broadcast hint: AQE picks broadcast-vs-shuffle from the
    # measured size (the same delegation ngram_jaccard_pairs uses for
    # its sizes join); the shuffle alternative is keyed on the same
    # (group, bucket) the cumsum window just partitioned by
    return (
        base.withColumn("_ci", F.sum("n_tokens").over(wi))
        .join(offsets, [group_col, "_b"])
        .withColumn("cum_tokens", F.col("_ci") + F.col("_off"))
        .filter(F.col("cum_tokens") <= budget)
        .select(
            group_col,
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


CCNET_RATES = {"head": 1.0, "middle": 0.5, "tail": 0.1}


def ccnet_bucket_sample(
    docs: DataFrame,
    text_col: str = "text",
    rates: dict[str, float] | None = None,
    seed: str = "ccnet",
) -> DataFrame:
    """CCNet's perplexity-bucket sampling (Wenzek et al. 2020 §4.3):
    score every doc with the corpus bigram LM (``bigram_lm_scores``,
    the KenLM stand-in), split the scored corpus into HEAD / MIDDLE /
    TAIL terciles of cross-entropy (head = most fluent), and keep each
    bucket at its own rate — the standard recipe that over-samples
    fluent text without discarding the tail outright.

    Deterministic end to end: the tercile thresholds are exact ORDER
    STATISTICS — t1 is the smallest score value whose cumulative doc
    count reaches ceil(n/3) (t2 at ceil(2n/3)) — so each boundary is
    an exact corpus value, never an interpolated float whose last ulp
    could flip a boundary doc between engines. The keep decision is
    the md5(doc_id) rule of ``stratified_sample`` — no RNG, identical
    on any cluster layout. Docs with no bigrams (n_bigrams = 0) have
    no score and are excluded, matching CCNet's behavior for empty
    pages.

    Scale shape: the LM scoring is the bigram operator's (hash-keyed
    count shuffles); the cumulative count over DISTINCT score values
    is the two-level prefix sum (per-integer-bit bucket totals over a
    tiny bucket table, then within-bucket windows — the otsu /
    pack_documents shape, never one giant exact-percentile buffer);
    the resulting 1-row threshold frame is broadcast back; bucket
    assignment + sampling are map-side.

    Returns (doc_id, xent_bits, bucket, kept).
    """
    from eynollah_spark.operators.text_analysis import bigram_lm_scores

    if rates is None:
        rates = CCNET_RATES
    scored = bigram_lm_scores(docs, text_col).filter(
        F.col("n_bigrams") > 0
    )
    # exact order-statistic terciles over distinct score values:
    # cumulative counts via the two-level prefix sum (integer-bit
    # buckets are a tiny table — xent_bits spans a few dozen integer
    # bit-costs — so the offsets window is bounded; within-bucket
    # windows partition by bucket)
    vals = scored.groupBy("xent_bits").agg(F.count(F.lit(1)).alias("_c"))
    vals = vals.withColumn("_b", F.floor("xent_bits").cast("bigint"))
    w_off = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        vals.groupBy("_b")
        .agg(F.sum("_c").alias("_bt"))
        .withColumn("_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)))
        .select("_b", "_off")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("xent_bits")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        vals.join(F.broadcast(offsets), "_b")
        .withColumn("_cum", F.sum("_c").over(w_in) + F.col("_off"))
    )
    n_tot = scored.agg(F.count(F.lit(1)).alias("_n"))
    th = cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(
            F.when(
                F.col("_cum") >= F.expr("(_n + 2) DIV 3"), F.col("xent_bits")
            )
        ).alias("t1"),
        F.min(
            F.when(
                F.col("_cum") >= F.expr("(2 * _n + 2) DIV 3"),
                F.col("xent_bits"),
            )
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("xent_bits") <= F.col("t1"), F.lit("head"))
        .when(F.col("xent_bits") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    rate = F.lit(int(round(rates["tail"] * SAMPLE_MOD)))
    for name in ("middle", "head"):
        rate = F.when(
            F.col("bucket") == name,
            F.lit(int(round(rates[name] * SAMPLE_MOD))),
        ).otherwise(rate)
    h = F.pmod(
        _h64(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}"))),
        F.lit(SAMPLE_MOD),
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .withColumn("bucket", bucket)
        .select(
            "doc_id",
            "xent_bits",
            "bucket",
            (h < rate).alias("kept"),
        )
    )


def _hashed_features(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket) feature MULTISET: lowercase whitespace tokens
    plus word bigrams, hashed into ``n_buckets`` buckets via the same
    portable md5 construction the dedup family uses. All JVM-side
    (split/transform/explode); counts are preserved (no distinct) —
    DSIR's bag-of-hashed-ngrams features."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bigrams)).alias("feat"),
    ).select(
        "doc_id",
        F.pmod(
            _h64(F.concat(F.lit("dsir:"), F.col("feat"))), F.lit(n_buckets)
        ).alias("bucket"),
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    n_select: int = 100,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023,
    arXiv:2302.03169): select ``n_select`` docs from ``docs`` whose
    hashed-ngram distribution looks like ``target`` (a small
    high-quality subset, e.g. one language or one curated source),
    via Gumbel-top-k sampling proportional to the importance weights.

    Model fit = two ``n_buckets``-row bucket histograms (target and
    raw), add-one smoothed; per-bucket log-likelihood-ratio is
    quantized to a 1e-6-resolution BIGINT so the per-doc weight
    ``logw_e6 = sum_b count_db * lr_e6[b]`` is an EXACT int64 fold —
    order-free across partitions and engines (the only float op per
    bucket is one ln over exact-integer ratios, shared with the
    oracle). Gumbel keys come from md5(doc_id), so the "sample" is
    deterministic and cluster-layout-independent.

    Scale shape: feature explode is map-side; the two histograms
    aggregate to ``n_buckets`` rows (partial agg before the exchange);
    the lr table is a bounded broadcast (n_buckets rows, a constant);
    per-doc weights are one groupBy(doc_id); selection is
    orderBy().limit() -> TakeOrderedAndProject, no global sort.

    Returns (doc_id, logw_e6, key_e6, rank) for the selected docs.
    """
    feats_raw = _hashed_features(docs, text_col, id_col, n_buckets)
    feats_tgt = _hashed_features(target, text_col, id_col, n_buckets)
    r_cnt = feats_raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("r"))
    t_cnt = feats_tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("t"))
    r_tot = r_cnt.agg(F.sum("r").alias("rtot"))
    t_tot = t_cnt.agg(F.sum("t").alias("ttot"))
    nb = F.lit(n_buckets).cast("bigint")
    lr = (
        r_cnt.join(t_cnt, "bucket", "left")
        .fillna(0, ["t"])
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "bucket",
            F.round(
                F.lit(1e6)
                * F.log(
                    ((F.col("t") + 1) * (F.col("rtot") + nb)).cast("double")
                    / ((F.col("r") + 1) * (F.col("ttot") + nb)).cast("double")
                )
            )
            .cast("bigint")
            .alias("lr_e6"),
        )
    )
    dcnt = feats_raw.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    logw = (
        dcnt.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr_e6")).alias("logw_e6"))
    )
    h = F.pmod(
        _h64(F.concat(F.lit("gumbel:"), F.col("doc_id").cast("string"))),
        F.lit(1_000_000),
    )
    gumbel = F.round(
        F.lit(1e6) * -F.log(-F.log((h.cast("double") + 0.5) / 1.0e6))
    ).cast("bigint")
    scored = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(logw, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("logw_e6"), F.lit(0)).cast("bigint").alias("logw_e6"),
            gumbel.alias("_g"),
        )
        .withColumn("key_e6", F.col("logw_e6") + F.col("_g"))
    )
    picked = scored.orderBy(F.desc("key_e6"), F.asc("doc_id")).limit(n_select)
    return picked.select(
        "doc_id",
        "logw_e6",
        "key_e6",
        F.row_number()
        .over(Window.orderBy(F.desc("key_e6"), F.asc("doc_id")))
        .alias("rank"),
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual-LM
    sampling rule (alpha < 1 upsamples tail sources/languages):
    w_s = n_s^alpha / sum_t n_t^alpha. ``boost`` is w_s divided by the
    natural share n_s/N — the factor to feed ``stratified_sample``
    rates when rebalancing the corpus.

    One groupBy to per-group counts (partial agg), a broadcast of the
    1-row normalizer — group count is bounded by the source/language
    vocabulary, so every frame here is tiny at any corpus size.

    Returns (source, n_docs, weight, boost), floats rounded 6.
    """
    cnt = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cnt.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z"),
        F.sum("n_docs").alias("n_tot"),
    )
    p = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    return cnt.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.round(p / F.col("z"), 6).alias("weight"),
        F.round((p / F.col("z")) / (F.col("n_docs") / F.col("n_tot")), 6).alias(
            "boost"
        ),
    )


def train_shards(
    docs: DataFrame,
    n_shards: int = 64,
    seed: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for training: every doc gets a
    pseudo-random ``shuffle_key`` (h64 of ``id:seed``) and a ``shard``
    in [0, n_shards). Reading shards in shard order and rows in key
    order IS the shuffled corpus — reproducible on any cluster layout
    (nothing depends on partition state), re-shuffled by changing
    ``seed``. Pure map-side: zero shuffles added here.
    """
    key = _h64(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    return docs.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )


def train_shard_stats(
    docs: DataFrame,
    n_shards: int = 16,
    seed: str = "s0",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest of the training shuffle: doc count, token
    budget, key range and a key checksum per shard — the numbers a
    training launcher needs to size epochs AND a determinism witness
    (any reordering/repartitioning of the input leaves every row
    identical). One partial-agg groupBy on ``shard``; output is
    n_shards rows."""
    from eynollah_spark.operators.text_analysis import token_count

    sh = train_shards(docs, n_shards, seed, id_col)
    return (
        sh.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("total_tokens"),
            F.min("shuffle_key").alias("min_key"),
            F.max("shuffle_key").alias("max_key"),
            # xor, not sum: 60-bit keys overflow int64 under sum at any
            # real shard size; xor is order-independent and closed
            F.expr("bit_xor(shuffle_key)").alias("key_xor"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 64,
    seed: str = "s0",
    id_col: str = "doc_id",
) -> None:
    """Materialize the training shuffle: one parquet directory per
    shard, rows inside each file in shuffle-key order (the within-shard
    random order). ``repartition(n_shards, shard)`` keeps every shard
    whole in exactly one task, so each shard directory holds one file
    whose row order is the shuffle order. Size ``n_shards`` so one
    shard fits a task: at 100 TB with ~1 GiB training files that is
    ~10^5 shards — the shuffle is one hash exchange regardless.
    """
    sh = train_shards(docs, n_shards, seed, id_col)
    (
        sh.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def assign_splits(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment: each doc's split is a
    pure function of (id, seed) — layout-independent, stable across
    reruns and cluster sizes, never leaking a doc across splits when
    the corpus grows (an id keeps its split forever under a fixed
    seed). Map-side only; weights are fractions summing to <= 1, any
    remainder falls into the LAST listed split.
    """
    # `is None` (not falsy) so an explicitly-passed {} reaches the
    # validation error below instead of silently getting the defaults
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or min(weights.values()) < 0 or sum(weights.values()) > 1 + 1e-9:
        raise ValueError("split weights must be non-negative and sum to <= 1")
    names = list(weights)
    h = F.pmod(
        _h64(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        F.lit(SAMPLE_MOD),
    )
    expr = None
    hi = 0.0
    for name in names[:-1]:
        hi += weights[name]
        cond = h < F.lit(int(round(hi * SAMPLE_MOD)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    split = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return docs.withColumn("split", split)
