"""Unit + plan-shape tests for the sampling/quota/BM25 operators."""

from __future__ import annotations

import math
import os
import re
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_layout_independent(spark):
    """The keep-set must be a pure function of doc_id — identical under
    different partitionings (the property df.sample() does NOT have)."""
    from eynollah_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    rates = {"en": 0.5, "de": 0.25}
    a = stratified_sample(docs.repartition(1), rates, default_rate=0.1)
    b = stratified_sample(docs.repartition(7, "source"), rates, default_rate=0.1)
    ka = sorted(r.doc_id for r in a.collect())
    kb = sorted(r.doc_id for r in b.collect())
    assert ka == kb
    assert 0 < len(ka) < docs.count()


def test_stratified_sample_respects_strata(spark):
    """rate=0 strata vanish; rate=1 strata are kept in full."""
    from eynollah_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    out = stratified_sample(docs, {"en": 1.0}, default_rate=0.0).collect()
    n_en = docs.filter("lang = 'en'").count()
    assert len(out) == n_en
    assert all(r.lang == "en" for r in out)


def test_stratified_sample_no_shuffle(spark):
    """Map-side filter: zero exchanges in the plan."""
    from eynollah_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(stratified_sample(docs, {"en": 0.5}, default_rate=0.1))
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# per_group_quota
# ---------------------------------------------------------------------------


def test_per_group_quota_matches_single_phase(spark):
    """The salted two-phase top-N must equal the plain one-window
    row_number result for every salt count (superset property)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from eynollah_spark.operators.sampling import per_group_quota

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    expect = sorted(
        (r.source, r.doc_id, r.n_chars, r.rank)
        for r in docs.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
        .collect()
    )
    for salts in (1, 3, 16):
        got = sorted(
            tuple(r)
            for r in per_group_quota(docs, quota=5, salts=salts).collect()
        )
        assert got == expect, salts


def test_per_group_quota_bounds_hot_group(spark):
    """A single dominant group still splits across salts in phase 1:
    the first window partitions by (group, salt), not group alone."""
    from eynollah_spark.operators.sampling import per_group_quota

    # one hot group (every source collapses to 'src'), non-foldable so
    # the window partitioning survives constant folding
    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "substr(source, 1, 3) as source", "n_chars"
    )
    out = per_group_quota(docs, quota=4, salts=8)
    plan = _plan(out)
    assert re.search(r"hashpartitioning\(source#\d+, _salt#\d+", plan), plan
    # Spark 4 additionally pushes a map-side partial top-N (WindowGroupLimit)
    # below each exchange — assert it stays
    assert plan.count("WindowGroupLimit") >= 2, plan
    rows = out.collect()
    assert len(rows) == 4
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def _bm25_reference(rows, terms, k1=1.2, b=0.75):
    """Driver-side BM25 on a list of (doc_id, text) — independent
    formulation (dict counting) of the same public formula."""
    toks = {d: t.lower().split() for d, t in rows}
    dls = {d: (len(t.split()) if t.strip() else 0) for d, t in rows}
    n = len(rows)
    avgdl = sum(dls.values()) / n
    scores = {}
    for t in terms:
        df = sum(1 for tk in toks.values() if t in tk)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, tk in toks.items():
            tf = tk.count(t)
            if tf:
                dl = dls[d]
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl)
                )
    return {d: round(s, 6) for d, s in scores.items() if round(s, 6) > 0}


def test_bm25_matches_reference_formula(spark, tmp_path):
    from eynollah_spark.operators.search import bm25_topk

    rows = [
        (0, "spark shuffle join spark spark"),
        (1, "window merge sort"),
        (2, "the quick brown fox"),
        (3, "spark window window merge spark"),
        (4, ""),
        (5, "hash hash hash hash hash hash hash hash"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    terms = ("spark", "merge", "hash")
    got = {r.doc_id: r.score for r in bm25_topk(docs, terms, k=10).collect()}
    assert got == _bm25_reference(rows, terms)


def test_bm25_topk_order_and_limit(spark):
    from eynollah_spark.operators.search import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = bm25_topk(docs, ("spark", "merge"), k=7).collect()
    assert len(out) == 7
    keys = [(-r.score, r.doc_id) for r in out]
    assert keys == sorted(keys)


def test_bm25_plan_no_token_shuffle(spark):
    """The scale contract: no explode/groupBy(doc, token) shuffle — the
    only exchanges are the 1-row stats agg; top-k compiles to
    TakeOrderedAndProject, stats come back via a broadcast join."""
    from eynollah_spark.operators.search import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bm25_topk(docs, ("spark", "merge"), k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Generate explode" not in plan, plan
    assert "hashpartitioning(doc_id" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


# ---------------------------------------------------------------------------
# train_shards / write_training_shards
# ---------------------------------------------------------------------------


def test_train_shards_layout_and_seed(spark):
    """Shard assignment is a pure function of (doc_id, seed): identical
    under any input partitioning; a different seed reshuffles."""
    from eynollah_spark.operators.sampling import train_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id: r.shard for r in train_shards(docs.repartition(1), 8).collect()}
    b = {
        r.doc_id: r.shard
        for r in train_shards(docs.repartition(5, "source"), 8).collect()
    }
    assert a == b
    c = {r.doc_id: r.shard for r in train_shards(docs, 8, seed="s1").collect()}
    assert c != a  # a new seed is a new shuffle
    assert set(a.values()) <= set(range(8))
    # covers every shard and is roughly balanced at 500 docs / 8 shards
    import collections

    sizes = collections.Counter(a.values())
    assert len(sizes) == 8
    assert max(sizes.values()) < 3 * min(sizes.values())


def test_train_shards_no_shuffle(spark):
    """The assignment itself is map-side: zero exchanges."""
    from eynollah_spark.operators.sampling import train_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(train_shards(docs, 16))
    assert "Exchange" not in plan


def test_write_training_shards_order_and_coverage(spark, tmp_path):
    """The materialized shards hold every doc exactly once; each shard
    directory holds ONE file whose row order is shuffle-key order (the
    within-shard shuffle a training loader consumes by reading
    sequentially)."""
    import glob

    from eynollah_spark.operators.sampling import write_training_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=8)

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    for d in sorted(glob.glob(f"{path}/shard=*")):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, f"{d}: a shard must be one file"
        pdf = pd.read_parquet(files[0])
        keys = pdf["shuffle_key"].tolist()
        assert keys == sorted(keys)


def test_assign_splits_deterministic_and_stable_under_growth(spark):
    """A doc's split is a pure function of (id, seed): the assignment
    on a half corpus equals the assignment of the same ids in the full
    corpus (no leakage when the corpus grows), and fractions land near
    the requested weights."""
    from eynollah_spark.operators.sampling import assign_splits

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r.doc_id: r.split for r in assign_splits(docs, w).collect()}
    half = {
        r.doc_id: r.split
        for r in assign_splits(docs.filter("doc_id % 2 = 0"), w).collect()
    }
    assert all(full[k] == v for k, v in half.items())
    import collections

    c = collections.Counter(full.values())
    n = len(full)
    assert 0.7 < c["train"] / n < 0.9
    assert c["val"] > 0 and c["test"] > 0
    # different seed reshuffles
    other = {r.doc_id: r.split for r in assign_splits(docs, w, seed="s9").collect()}
    assert other != full


def test_assign_splits_rejects_empty_weights(spark):
    """ADVICE r3: an explicitly-passed {} must raise, not silently get
    the defaults (only None selects the defaults)."""
    import pytest

    from eynollah_spark.operators.sampling import assign_splits

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="split weights"):
        assign_splits(docs, {})
    # None still selects the documented defaults
    assert assign_splits(docs, None).columns[-1] == "split"


def test_token_budget_sample_prefix_and_bucket_invariance(spark, sf_dir):
    """The kept set is the maximal hash-ordered prefix within budget,
    and the two-level bucketed prefix sum is EXACTLY the single-window
    semantics (n_buckets=1 collapses to one window; any bucket count
    must give byte-identical output)."""
    import pyspark.sql.functions as F

    from eynollah_spark.operators.dedup import _h64
    from eynollah_spark.operators.sampling import SAMPLE_MOD, token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    budget = 300
    a = token_budget_sample(docs, budget=budget, n_buckets=1024)
    b = token_budget_sample(docs, budget=budget, n_buckets=1)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and rows_a, "bucket count must not change the sample"

    # budget respected, and maximality: the first unkept doc in hash
    # order per source would overflow the budget
    kept = {(r[0], r[1]): r for r in rows_a}
    h = F.pmod(
        _h64(F.concat(F.col("doc_id").cast("string"), F.lit(":tb0"))),
        F.lit(SAMPLE_MOD),
    )
    from eynollah_spark.operators.text_analysis import token_count

    ordered = (
        docs.select(
            "source",
            "doc_id",
            token_count(F.col("text")).alias("nt"),
            h.alias("hk"),
        )
        .orderBy("source", "hk", "doc_id")
        .collect()
    )
    cum: dict[str, int] = {}
    for r in ordered:
        c = cum.get(r.source, 0) + r.nt
        cum[r.source] = c
        if c <= budget:
            k = kept.get((r.source, r.doc_id))
            assert k is not None and k[3] == c
        else:
            assert (r.source, r.doc_id) not in kept


def test_ccnet_bucket_sample_terciles_and_rates(spark, sf_dir):
    """CCNet buckets are xent terciles (head = most fluent, ~equal
    thirds), head keeps everything, tail keeps ~rate, and the keep
    decision is deterministic across reruns."""
    from eynollah_spark.operators.sampling import ccnet_bucket_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = ccnet_bucket_sample(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    n = len(out)
    assert set(by_bucket) == {"head", "middle", "tail"}
    for b, rows in by_bucket.items():
        assert abs(len(rows) - n / 3) <= n * 0.1 + 2, (b, len(rows), n)
    assert all(r.kept for r in by_bucket["head"])
    tail_rate = sum(r.kept for r in by_bucket["tail"]) / len(by_bucket["tail"])
    assert tail_rate <= 0.35
    # fluency ordering: head xent strictly below tail xent
    assert max(r.xent_bits for r in by_bucket["head"]) <= min(
        r.xent_bits for r in by_bucket["tail"]
    )
    # deterministic: second run identical
    again = ccnet_bucket_sample(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_ccnet_tercile_thresholds_are_exact_corpus_values(spark, sf_dir):
    """The tercile boundaries are ORDER STATISTICS — exact xent values
    from the corpus, never interpolated floats — so a doc sitting
    exactly on a boundary buckets identically in any engine: t1 is
    the smallest value whose cumulative count reaches ceil(n/3), every
    head doc satisfies xent <= t1, and head covers at least ceil(n/3)
    docs (more only through ties AT the boundary value)."""
    from eynollah_spark.operators.sampling import ccnet_bucket_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = ccnet_bucket_sample(docs).collect()
    xs = sorted(r.xent_bits for r in rows)
    n = len(xs)
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    t1, t2 = xs[k1 - 1], xs[k2 - 1]
    assert t1 in xs and t2 in xs  # corpus values, not interpolations
    head = [r for r in rows if r.bucket == "head"]
    mid = [r for r in rows if r.bucket == "middle"]
    assert all(r.xent_bits <= t1 for r in head)
    assert all(t1 < r.xent_bits <= t2 for r in mid)
    # head = every doc at or below t1: at least k1, exceeding it only
    # when the boundary value itself is tied
    assert len(head) == sum(1 for x in xs if x <= t1) >= k1
