"""Dedup operator tests: planted duplicates must be found; clean corpus
must stay clean; results partition-invariant."""

import pyspark.sql.functions as F
import pytest

from eynollah_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # plant: 2 exact dups, 2 near dups (one word changed / appended)
    src = base.orderBy("doc_id").limit(4).collect()
    extra = [
        (10_001, src[0].text),  # exact dup of doc 0
        (10_002, src[1].text),  # exact dup of doc 1
        (10_003, src[2].text.replace(src[2].text.split()[0], "zzz", 1)),  # near dup
        (10_004, src[3].text + " tail tail"),  # near dup
    ]
    return base.union(spark.createDataFrame(extra, ["doc_id", "text"]))


def test_exact_duplicates(docs):
    got = exact_duplicates(docs).orderBy("text_hash").collect()
    groups = {tuple(r.doc_ids_sample): (r.n_docs, r.keep_doc_id) for r in got}
    assert groups.get((0, 10_001)) == (2, 0)
    assert groups.get((1, 10_002)) == (2, 1)
    assert len(groups) == 2


def test_exact_duplicates_bounded_group_width(spark):
    """Scale guard: a 100k-copy text yields ONE row whose sample array
    is capped at sample_ids — the aggregation never materializes the
    full id list (the rank filter runs before the collect)."""
    # two hot groups (a constant single text would let Catalyst fold
    # the md5 partition key to a literal and degenerate the window)
    big = spark.range(100_000).selectExpr(
        "id as doc_id",
        "concat('boilerplate text variant ', id % 2) as text",
    )
    rows = sorted(exact_duplicates(big, sample_ids=10).collect(),
                  key=lambda r: r.keep_doc_id)
    assert len(rows) == 2
    r = rows[0]
    assert r.n_docs == 50_000
    assert r.keep_doc_id == 0
    assert r.doc_ids_sample == list(range(0, 20, 2))
    # the collect aggregates the rank-filtered frame (window rank
    # present below the agg), and the groupBy reuses the window's
    # text_hash exchange — exactly one hash exchange in the plan
    plan = exact_duplicates(big)._jdf.queryExecution().executedPlan().toString()
    assert "row_number()" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dedup_exact_keeps_min_id(docs):
    kept = dedup_exact(docs)
    assert kept.count() == docs.count() - 2
    assert kept.filter(F.col("doc_id").isin(10_001, 10_002)).count() == 0
    assert kept.filter(F.col("doc_id").isin(0, 1)).count() == 2


def test_ngram_jaccard_finds_planted(docs):
    got = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert got.get((0, 10_001)) == 1.0  # exact dup
    assert got.get((3, 10_004), 0) > 0.8  # appended tail -> high overlap
    # the driver's corpus itself contains planted near-dups (~0.99);
    # they must be found too
    assert any(a < 500 and b < 500 and j > 0.9 for (a, b), j in got.items())
    # but no low-similarity noise above threshold
    assert all(j >= 0.5 for j in got.values())


def test_minhash_lsh_finds_exact_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # exact dups have identical signatures -> always collide
    assert (0, 10_001) in pairs
    assert (1, 10_002) in pairs
    # high-jaccard corpus near-dups should mostly collide in >=1 band
    assert any(a < 500 and b < 500 for a, b in pairs)


def test_simhash_exact_dups_distance_zero(docs):
    sig = simhash_signatures(docs)
    s = {r.doc_id: r.simhash for r in sig.collect()}
    assert s[0] == s[10_001]
    assert s[1] == s[10_002]
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(docs, max_distance=10).collect()
    }
    assert pairs.get((0, 10_001)) == 0
    assert pairs.get((1, 10_002)) == 0


def test_partition_invariance(docs):
    a = sorted(
        map(tuple, ngram_jaccard_pairs(docs.repartition(1), threshold=0.5).collect())
    )
    b = sorted(
        map(tuple, ngram_jaccard_pairs(docs.repartition(16), threshold=0.5).collect())
    )
    assert a == b


def test_jaccard_plan_has_no_broadcast_hint(docs):
    """Scale guard: the per-doc sizes table is unbounded at corpus
    scale — the plan must carry NO broadcast hint (AQE decides from
    measured sizes at runtime)."""
    plan = ngram_jaccard_pairs(docs)._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan


def test_simhash_band_cap_drops_hot_buckets(spark):
    """max_band_freq: docs in a hot band bucket pair only through
    their other bands; with cap=1 identical docs (hot in ALL bands)
    produce no pairs, with the default cap they do."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert simhash_hamming_pairs(docs, max_band_freq=1).count() == 0
    assert simhash_hamming_pairs(docs).count() == 10  # all 5-choose-2


def test_minhash_band_cap_drops_hot_buckets(spark):
    """max_band_freq on the MinHash band self-join: exact duplicates
    share EVERY band, so with cap=1 a 5-copy text produces no
    candidates at all; with the default cap all 10 pairs appear. Near
    dups colliding in a cold band are unaffected by capping a hot one."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert minhash_lsh_pairs(docs, threshold=0.5, max_band_freq=1).count() == 0
    assert minhash_lsh_pairs(docs, threshold=0.5).count() == 10
    assert minhash_lsh_pairs(docs, threshold=0.5, max_band_freq=None).count() == 10


def test_minhash_band_cap_window_rides_band_exchange(spark):
    """Plan guard (VERDICT r3 #1): the hot-bucket count window must be
    keyed on the same (band, bsig) columns the self-join shuffles on —
    the cap reuses the band exchange instead of adding one."""
    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = (
        minhash_lsh_pairs(docs, threshold=0.5, max_band_freq=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(band" in plan, plan
    # the window's partition spec is exactly the join key
    assert "windowspecdefinition(band" in plan, plan


def test_incremental_dedup_per_side_universes(spark):
    """ADVICE r3: a doc_id present on BOTH sides (recrawled page, same
    stable id, different text) must NOT merge the two versions' shingle
    sets — here the new text shares nothing with any index text, so it
    must be kept even though its id collides with an index doc."""
    from eynollah_spark.operators.dedup import incremental_dedup

    # construction (verified to band-collide deterministically):
    # new-7 = prefix of idx-8 (true jaccard 11/14 = 0.786, and their
    # minhash signatures collide in exactly one band); idx-7 = the
    # SUFFIX of idx-8. A merged id-7 shingle universe would cover ALL
    # of idx-8's shingles -> inflated jaccard 14/11 = 1.27 >= 0.9 ->
    # false dup_near; per-side universes give the true 0.786 < 0.9.
    toks = [f"x0w{i}" for i in range(16)]
    new = spark.createDataFrame(
        [(7, " ".join(toks[:13]))], ["doc_id", "text"]
    )
    idx = spark.createDataFrame(
        [(7, " ".join(toks[10:])), (8, " ".join(toks))], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in incremental_dedup(new, idx, threshold=0.9).collect()}
    assert out[7].kept and not out[7].dup_near and not out[7].dup_exact
    # sanity: lowering the threshold below the TRUE jaccard flags it
    out2 = {r.doc_id: r for r in incremental_dedup(new, idx, threshold=0.7).collect()}
    assert out2[7].dup_near and not out2[7].kept


def test_incremental_dedup_schema_tolerant(spark):
    """ADVICE r3: frames with differing extra columns must work — only
    (doc_id, text) are consumed."""
    from eynollah_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(1, "some new text here", "crawl9")], ["doc_id", "text", "batch"]
    )
    idx = spark.createDataFrame(
        [(2, "some new text here", 0.5)], ["doc_id", "text", "score"]
    )
    out = incremental_dedup(new, idx).collect()
    assert len(out) == 1 and out[0].dup_exact and not out[0].kept


def test_near_dup_clusters_requires_numeric_doc_id(spark):
    from eynollah_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [("a", "some text here")], ["doc_id", "text"]
    )
    with pytest.raises(TypeError, match="numeric doc_id"):
        near_dup_clusters(docs)


def test_near_dup_clusters_warns_when_unconverged(spark):
    """A 3-hop chain cannot converge in one iteration — the operator
    must say so instead of silently emitting split clusters."""
    import warnings as w

    from eynollah_spark.operators.dedup import near_dup_clusters

    # 30-word docs differing in one word per hop: 5~6 and 6~7 are
    # near-dups (jaccard 0.806), 5~7 is not (0.68 < threshold), so the
    # component is a genuine 2-hop chain under threshold=0.75
    words = [f"w{i:02d}token" for i in range(30)]
    base = " ".join(words)
    wb = list(words)
    wb[5] = "changedone"
    wc = list(wb)
    wc[25] = "changedtwo"
    docs = spark.createDataFrame(
        [(5, base), (6, " ".join(wb)), (7, " ".join(wc))],
        ["doc_id", "text"],
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        near_dup_clusters(docs, threshold=0.75, max_iters=1).collect()


def test_near_dup_clusters_no_persisted_leftovers(spark):
    """Operator hygiene: after the call returns, the only persistent
    RDD added is the returned frame's own checkpoint — every internal
    cache (edges, per-iteration labels) is released."""
    import time

    from eynollah_spark.operators.dedup import near_dup_clusters

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "aa bb cc dd ee gg"),
         (3, "totally different words entirely here now")],
        ["doc_id", "text"],
    )
    out = near_dup_clusters(docs, threshold=0.3)
    out.collect()
    for _ in range(50):  # unpersist is async; poll briefly
        delta = jsc.getPersistentRDDs().size() - before
        if delta <= 1:
            break
        time.sleep(0.1)
    assert delta <= 1


def test_near_dup_clusters_transitivity(spark):
    """A ~ B and B ~ C (but A !~ C directly) must land in ONE cluster
    labelled by the smallest doc_id — requires >1 propagation round."""
    from eynollah_spark.operators.dedup import near_dup_clusters

    # same 2-hop chain shape as the unconverged-warning test: one
    # word changed per hop in a 30-word doc (1~2 = 2~3 = 0.806,
    # 1~3 = 0.68 < threshold)
    words = [f"w{i:02d}token" for i in range(30)]
    base = " ".join(words)
    wb = list(words)
    wb[5] = "changedone"
    wc = list(wb)
    wc[25] = "changedtwo"
    rows = [
        (1, base),
        (2, " ".join(wb)),
        (3, " ".join(wc)),
        (9, "completely different content here entirely"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in near_dup_clusters(docs, threshold=0.75).collect()
    }
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[9] == (9, 1)


def test_rowwise_signature_matches_batch(docs):
    """minhash_signature_col (streaming path) must be byte-identical
    to the batch groupBy signatures for every doc with shingles."""
    import pyspark.sql.functions as F

    from eynollah_spark.operators.dedup import (
        minhash_signature_col,
        minhash_signatures,
    )

    rowwise = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id", minhash_signature_col(F.col("text")).alias("sig")
        ).collect()
    }
    batch = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    assert batch  # non-degenerate
    assert all(rowwise[d] == batch[d] for d in batch)


def test_paragraph_dedup_keep_first_and_min_len(spark):
    from eynollah_spark.operators.dedup import paragraph_dedup

    shared = "this paragraph is shared across both documents"
    short = "tiny"  # below min_len: duplicated but never dropped
    rows = [
        (1, f"{shared}\n\nunique to doc one\n\n{short}"),
        (2, f"intro of doc two\n\n{shared}\n\n{short}"),
        (3, shared),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df, min_len=20).collect()}
    # doc 1 is the first owner: keeps everything
    assert out[1].text == f"{shared}\n\nunique to doc one\n\n{short}"
    assert out[1].n_dropped == 0 and out[1].n_paras == 3
    # doc 2 loses only the shared paragraph; order of the rest is kept
    assert out[2].text == f"intro of doc two\n\n{short}"
    assert out[2].n_dropped == 1 and out[2].n_paras == 3
    # doc 3 becomes empty (its only paragraph is owned by doc 1)
    assert out[3].text == "" and out[3].n_dropped == 1


def test_paragraph_dedup_custom_sep(spark):
    from eynollah_spark.operators.dedup import paragraph_dedup

    rows = [(1, "alpha beta gamma delta line|second line repeated here"),
            (2, "second line repeated here|alpha beta gamma delta line")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df, min_len=20, sep="|").collect()}
    assert out[1].n_dropped == 0
    assert out[2].n_dropped == 2 and out[2].text == ""


def test_duplicate_ngram_scrub_removes_copied_passage(spark):
    """A passage copied into a later doc is scrubbed there (keep-first),
    the copying doc's OWN text survives, internal repetition within
    the first doc is preserved, and unique docs are untouched."""
    from eynollah_spark.operators.dedup import duplicate_ngram_scrub

    passage = " ".join(f"p{i}" for i in range(10))  # 10-token passage
    own = " ".join(f"own{i}" for i in range(12))
    uniq = " ".join(f"u{i}" for i in range(15))
    rows = [
        (1, passage + " " + passage),  # internal repetition, first doc
        (2, own + " " + passage),      # copies the passage
        (3, uniq),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in duplicate_ngram_scrub(docs, k=8).collect()}
    assert got[1].n_removed == 0 and got[1].text == passage + " " + passage
    assert got[2].n_removed == 10 and got[2].text == own
    assert got[3].n_removed == 0 and got[3].text == uniq


def test_cdc_chunk_stats_shift_invariance(spark):
    """Content-defined chunks catch a passage duplicated at DIFFERENT
    offsets (the case fixed-frame chunking misses), and a doc with no
    shared content reports zero dup chunks."""
    from eynollah_spark.operators.dedup import cdc_chunk_stats

    passage = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, f"{passage} some unique trailer words here"),
            (2, f"a completely different and much longer prefix before {passage}"),
            (3, "entirely disjoint vocabulary in this one document body"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in cdc_chunk_stats(df, boundary_mod=4).collect()}
    assert got[1].n_dup_chunks > 0, "shared passage at offset 0 must be caught"
    assert got[2].n_dup_chunks > 0, "same passage at a shifted offset must be caught"
    assert got[3].n_dup_chunks == 0
    assert 0 < got[1].dup_token_frac <= 1.0
    assert got[3].dup_token_frac == 0.0


def test_cdc_chunks_partition_property(spark, sf_dir):
    """CDC chunks partition the token sequence exactly: joining a
    doc's chunks in chunk_idx order with single spaces reconstructs
    the whitespace-normalized text, and n_words sums to the token
    count. Stats path agrees with the emission path."""
    import pyspark.sql.functions as F

    from eynollah_spark.operators.dedup import cdc_chunk_stats, cdc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ch = cdc_chunks(docs)
    rebuilt = (
        ch.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.getField("chunk_text"),
                ),
                " ",
            ).alias("rebuilt"),
            F.sum("n_words").alias("nw"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(
            docs.select(
                "doc_id",
                F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm"),
                F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
            ),
            "doc_id",
        )
    )
    bad = rebuilt.filter(
        (F.col("rebuilt") != F.col("norm")) | (F.col("nw") != F.col("n_toks"))
    ).count()
    assert bad == 0
    stats = {r.doc_id: r.n_chunks for r in cdc_chunk_stats(docs).collect()}
    emits = {r[0]: r[1] for r in rebuilt.select("doc_id", "n_chunks").collect()}
    assert stats == emits
