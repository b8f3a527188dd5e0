"""Text-analysis operator tests (language ID, quality, tokens,
fingerprint)."""

import pyspark.sql.functions as F

from eynollah_spark.operators.text_analysis import (
    bpe_token_count,
    fingerprint,
    lang_scores,
    quality_features,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "  a  b   c "), (4, "don't stop-me now!")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.tc, r.bc)
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("tc"),
            bpe_token_count(F.col("text")).alias("bc"),
        ).collect()
    }
    assert got[1] == (2, 2)
    assert got[2] == (0, 0)
    assert got[3][0] == 3
    # don ' t stop - me now !
    assert got[4] == (3, 8)


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat et la maison est pour les amis dans"),
            (4, "xyzzy qwerty asdf"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_guess for r in lang_scores(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_quality_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = quality_features(docs)
    pdf = q.toPandas()
    assert ((pdf["quality_score"] >= 0) & (pdf["quality_score"] <= 1)).all()
    assert ((pdf["punct_ratio"] >= 0) & (pdf["punct_ratio"] <= 1)).all()
    assert (pdf["n_tokens"] >= 0).all()


def test_fingerprint_detects_shared_content(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical
            (3, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_contamination_check_finds_planted_ngram(spark):
    from eynollah_spark.operators.text_analysis import contamination_check

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "completely unrelated words that share nothing with the benchmark set"
    # doc 30 contains an 8-gram lifted verbatim from the benchmark
    leaked = "prefix words here alpha beta gamma delta epsilon zeta eta theta suffix"
    docs = spark.createDataFrame(
        [(1, bench_text), (30, leaked), (31, clean)], ["doc_id", "text"]
    )
    bench = docs.filter("doc_id = 1")
    got = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in contamination_check(docs, bench, k=8).collect()
    }
    assert (30, 1) in got and got[(30, 1)] >= 1
    assert all(d != 31 for d, _ in got)  # clean doc untouched
    assert (1, 1) not in got  # self-pair excluded


def test_contamination_plan_broadcasts_benchmark(spark):
    """Scale shape: the benchmark side must be broadcast and the
    corpus must NOT be shuffled on shingle — the only exchange left is
    the final (doc_id, bench_id) aggregation."""
    from eynollah_spark.operators.text_analysis import contamination_check

    docs = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
    plan = contamination_check(docs, docs, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # exactly one hash exchange (the groupBy) on the corpus side; a
    # shingle-keyed exchange (word_shingles' .distinct()) would add one
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pii_scrub_planted(spark):
    from eynollah_spark.operators.text_analysis import pii_scrub

    rows = [
        (1, "contact me at alice@example.com or 10.0.0.1 or +1-555-123-4567 ok"),
        (2, "no pii in this one at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (1, 1, 1)
    assert got[1].scrubbed == "contact me at [EMAIL] or [IP] or [PHONE] ok"
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 0, 0)
    assert got[2].scrubbed == rows[1][1]


def test_repetition_stats_planted(spark):
    from eynollah_spark.operators.text_analysis import repetition_stats

    rows = [
        (1, "spam spam spam spam"),          # one bigram repeated 3x
        (2, "all tokens here are unique"),
        (3, ""),                             # degenerate
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_tokens == 4 and got[1].n_distinct == 1
    assert got[1].dup_token_ratio == 0.75
    assert got[1].top_bigram_n == 3 and got[1].top_bigram_frac == 1.0
    assert got[2].dup_token_ratio == 0.0
    assert got[2].top_bigram_frac < 1.0 or got[2].n_bigrams == 4
    assert got[3].n_bigrams == 0 and got[3].top_bigram_frac == 0.0


def test_pii_and_repetition_oracle_parity_planted(spark, tmp_path):
    """Java-regex vs RE2 parity on text that actually contains PII and
    repetition (the driver corpus has neither), via the same
    row-multiset comparison the driver uses."""
    import duckdb
    import os
    import sys

    import pandas as pd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    rows = [
        (1, "mail bob.smith+tag@sub.example.co.uk and 192.168.10.255 now"),
        (2, "call +44-20-7946-0958 or +1555123456789 twice +1555123456789"),
        (3, "edge cases: a@b.co 1.2.3.4.5 999.999.999.999 x@y"),
        (4, "spam spam spam spam spam unique"),
        (5, ""),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    for name in ("pii_scrub", "repetition_stats"):
        sdf = entrymod.queries()[name](spark, str(tmp_path))
        scols = sdf.columns
        srows = sorted(tuple(r) for r in sdf.collect())
        res = con.sql(entrymod.oracle_sql()[name])
        assert sorted(res.columns) == sorted(scols), name
        # align column order to spark's
        proj = ", ".join(f'"{c}"' for c in scols)
        drows = sorted(con.sql(f"SELECT {proj} FROM res").fetchall())
        assert srows == drows, (name, srows[:2], drows[:2])
    con.close()


def test_pack_documents_contiguous_fill(spark):
    """Packing: pack_id = floor(exclusive-prefix-tokens / budget) in
    doc_id order; an over-budget doc spans its own pack; the two-level
    prefix sum is partition- AND bucket-boundary-invariant."""
    from eynollah_spark.operators.text_analysis import pack_documents

    rows = [
        (0, "a b c d"),          # 4 tokens, pre=0  -> pack 0
        (1, "a b c d e"),        # 5,        pre=4  -> pack 0
        (2, " ".join(["x"] * 25)),  # 25,    pre=9  -> pack 0
        (3, "a b"),              # 2,        pre=34 -> pack 3
        (4, ""),                 # 0,        pre=36 -> pack 3
        (5, "a"),                # 1,        pre=36 -> pack 3
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.pack_id)
        for r in pack_documents(docs, budget=10).collect()
    }
    assert got == {
        0: (4, 0), 1: (5, 0), 2: (25, 0), 3: (2, 3), 4: (0, 3), 5: (1, 3)
    }
    # bucket boundaries (bucket_size=2 forces the multi-bucket path)
    # and partitioning must not change the assignment
    small = {
        r.doc_id: (r.n_tokens, r.pack_id)
        for r in pack_documents(
            docs.repartition(5), budget=10, bucket_size=2
        ).collect()
    }
    assert small == got


def test_bigram_lm_scores_orders_natural_below_gibberish(spark):
    """Docs built from corpus-common bigrams must score LOWER
    (more predictable) than a doc of corpus-unique bigrams; <2-token
    docs have n_bigrams=0 and NULL score."""
    from eynollah_spark.operators.text_analysis import bigram_lm_scores

    common = "the cat sat on the mat"
    rows = [
        (1, common),
        (2, common),
        (3, common),
        (4, "the cat sat on the mat again"),
        (5, "zqx wvu pqr mno jkl hgf"),  # every bigram unique
        (6, "single"),
        (7, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    assert got[1].xent_bits == got[2].xent_bits == got[3].xent_bits
    assert got[1].xent_bits < got[5].xent_bits
    assert got[4].xent_bits < got[5].xent_bits
    assert got[6].n_bigrams == 0 and got[6].xent_bits is None
    assert got[7].n_bigrams == 0 and got[7].xent_bits is None
    assert got[5].n_bigrams == 5


def test_hashed_classifier_scores_shape(spark):
    """Deterministic logits; token counts; tokenless docs get NULL
    logit/keep; keep is exactly logit>0 (pre-rounding)."""
    from eynollah_spark.operators.text_analysis import hashed_classifier_scores

    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, ""), (4, "  ")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in hashed_classifier_scores(docs).collect()}
    assert got[1].n_toks == 3 and got[1].logit == got[2].logit
    assert got[1].keep == (got[1].logit > 0)
    for d in (3, 4):
        assert got[d].n_toks == 0 and got[d].logit is None and got[d].keep is None


def test_sft_pairs_frame_bound_and_order(spark):
    """Prompt holds at most K preceding turns, rendered in turn order;
    first assistant turn sees exactly the opening user turn."""
    from eynollah_spark.operators.text_analysis import sft_pairs

    rows = [
        ("c1", i, "user" if i % 2 == 0 else "assistant", f"t{i}") for i in range(6)
    ]
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {r.turn_idx: r for r in sft_pairs(turns, max_context_turns=2).collect()}
    assert sorted(out) == [1, 3, 5]
    assert out[1].prompt == "user: t0"
    assert out[1].n_context_turns == 1
    # K=2 frame: only turns 3 and 4 precede turn 5 within the bound
    assert out[5].prompt == "assistant: t3\n\nuser: t4"
    assert out[5].n_context_turns == 2
    assert out[3].response == "t3"


def test_sft_pairs_one_exchange(spark):
    """Both window expressions share one hash exchange on conv_id."""
    from eynollah_spark.operators.text_analysis import sft_pairs

    rows = [("c%d" % (i % 3), i // 3, "assistant" if i % 2 else "user", "x") for i in range(30)]
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    plan = sft_pairs(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    """Pair counts sum the WORD counts (BPE semantics), not document
    counts; words shorter than 2 chars contribute nothing."""
    from eynollah_spark.operators.text_analysis import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab cd x"), (2, "ab  cd"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.pair: r.n for r in bpe_pair_counts(docs, top_n=10).collect()}
    assert got == {"ab": 3, "cd": 2}


def test_bpe_pair_counts_overlapping_and_unicode(spark):
    """Adjacent pairs overlap (abc -> ab, bc) and are character-based,
    not byte-based, for multi-byte text."""
    from eynollah_spark.operators.text_analysis import bpe_pair_counts

    docs = spark.createDataFrame([(1, "abc über")], "doc_id long, text string")
    got = {r.pair: r.n for r in bpe_pair_counts(docs, top_n=20).collect()}
    assert got == {"ab": 1, "bc": 1, "üb": 1, "be": 1, "er": 1}


def test_ngram_diversity_detects_template_collapse(spark):
    """A looping/template source shows a far lower distinct ratio than
    a varied one; gram counting is per-occurrence, sliding window."""
    from eynollah_spark.operators.text_analysis import ngram_diversity

    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham", "loop"),
            (2, "one two three four five six seven eight", "varied"),
            (3, "", "empty"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in ngram_diversity(docs, n=2).collect()}
    assert "empty" not in out
    assert out["loop"].n_grams == 7 and out["loop"].distinct_grams == 2
    assert out["varied"].diversity == 1.0
    assert out["loop"].diversity < 0.3


def test_preference_pairs_margin_cap_and_ties(spark):
    """Higher-score response is chosen; equal-score pairs are dropped;
    per-prompt output is capped ranked by margin descending."""
    from eynollah_spark.operators.text_analysis import preference_pairs

    rows = [
        # prompt p1: responses of 1, 3, 5 tokens -> 3 ordered pairs
        ("c1", 0, "p1", "one"),
        ("c2", 0, "p1", "three token reply"),
        ("c3", 0, "p1", "five tokens in this reply"),
        # prompt p2: two equal-length responses -> tie, no pair
        ("c4", 0, "p2", "same size"),
        ("c5", 0, "p2", "also size"),
    ]
    pairs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, prompt string, response string"
    )
    out = preference_pairs(pairs, max_pairs_per_prompt=2).collect()
    assert all(r.prompt == "p1" for r in out)
    assert len(out) == 2  # cap trims the 3 candidate pairs to 2
    assert all(r.chosen_score > r.rejected_score for r in out)
    # margin-desc rank: the widest pair (5 vs 1) is rnk 1
    top = next(r for r in out if r.rnk == 1)
    assert top.margin == 4


def test_chunk_documents_windows_and_overlap(spark):
    """Windows start every stride tokens, overlap chunk-stride tokens,
    tail chunks are short, sub-chunk docs give one chunk."""
    from eynollah_spark.operators.text_analysis import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "tiny doc"), (3, "")], "doc_id long, text string"
    )
    out = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    )
    d1 = [r for r in out if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2, 3]
    assert d1[0][3] == "w0 w1 w2 w3"
    assert d1[1][3] == "w3 w4 w5 w6"  # one-token overlap (4-3)
    assert d1[3] == (1, 3, 1, "w9")  # short tail
    assert [r for r in out if r[0] == 2] == [(2, 0, 2, "tiny doc")]
    assert not [r for r in out if r[0] == 3]


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest as _pytest

    from eynollah_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=5)


def test_otsu_two_level_prefix_sum(spark):
    """The cumulative histogram must be bucket-partitioned (two-level
    prefix sum): identical thresholds at any bucket_width, and the
    per-value cumsum window rides a partitionBy(_b) spec instead of an
    unpartitioned global orderBy."""
    from eynollah_spark.operators.text_analysis import otsu_threshold

    rows = [(i, (i * 37) % 1000 + (i % 7) * 5000) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "feat"])
    wide = otsu_threshold(df, "feat", bucket_width=1 << 40).collect()[0]
    narrow = otsu_threshold(df, "feat", bucket_width=256).collect()[0]
    assert tuple(wide) == tuple(narrow)
    plan = (
        otsu_threshold(df, "feat", bucket_width=256)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(_b" in plan, plan[:2000]


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. SIGMOD'03): two docs
    sharing any run of >= w+k-1 tokens share >= 1 fingerprint; the
    sketch keeps far fewer hashes than the full shingle set."""
    from eynollah_spark.operators.text_analysis import winnowing_fingerprints

    shared = "omega psi chi phi upsilon tau"  # 6 tokens = w+k-1 with k=3,w=4
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} trailing content one"),
            (2, f"completely other prefix {shared} and a different tail"),
            (3, "no overlap with anything else at all in this document"),
        ],
        ["doc_id", "text"],
    )
    # fingerprint SETS via the same internals the operator aggregates
    from eynollah_spark.operators.dedup import _h64

    toks = F.split(F.col("text"), r"\s+")
    n = F.size(toks)
    hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0))),
        lambda i: _h64(F.concat_ws(" ", F.slice(toks, i + 1, 3))),
    )
    hs = df.select("doc_id", hashes.alias("hs"))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(F.col("hs")) - 4, F.lit(0))),
        lambda j: F.array_min(F.slice(F.col("hs"), j + 1, 4)),
    )
    sets = {
        r.doc_id: set(r.fps)
        for r in hs.select(
            "doc_id", F.array_distinct(wins).alias("fps")
        ).collect()
    }
    assert sets[1] & sets[2], "docs sharing a >=w+k-1 token run must collide"
    assert not (sets[1] & sets[3])
    assert not (sets[2] & sets[3])

    out = {r.doc_id: r for r in winnowing_fingerprints(df).collect()}
    for d, fps in sets.items():
        assert out[d].n_fingerprints == len(fps)
        assert out[d].min_fp == min(fps)
        x = 0
        for v in fps:
            x ^= v
        assert out[d].fp_xor == x
    # sub-sampling: fewer fingerprints than grams
    assert all(out[d].n_fingerprints < out[d].n_grams for d in sets)


def test_gopher_rules_each_gate(spark):
    """Each Gopher rule (Rae et al. 2021 A1.1) fires on a doc built to
    violate exactly that rule; a clean doc passes."""
    from eynollah_spark.operators.text_analysis import gopher_rules

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigor"] * 6
    )  # 60 words, mean len ~4, stopword hits
    short = "the dog with a bone"  # < 50 words
    symbols = " ".join(["word"] * 50) + " " + " ".join(["###"] * 10)
    bullets = "\n".join(["- the item with that thing"] * 10)
    nonalpha = " ".join(["123"] * 60) + " the with"
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets), (5, nonalpha)],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].gopher_keep
    assert not got[2].gopher_keep and got[2].n_words < 50
    assert not got[3].gopher_keep and got[3].symbol_ratio >= 0.1
    assert not got[4].gopher_keep and got[4].bullet_frac >= 0.9
    assert not got[5].gopher_keep and got[5].alpha_frac <= 0.8
    # stop-word probe override
    assert (
        gopher_rules(df, stop_words=("zebra", "xylophone"))
        .filter("stop_hits > 0")
        .count()
        == 0
    )


def test_c4_rules_line_and_doc_gates(spark):
    """C4 (Raffel et al. 2020 §2.2): line gate keeps only >=5-word
    terminal-punct lines; doc gates drop lorem-ipsum/brace/<3-sentence
    docs."""
    from eynollah_spark.operators.text_analysis import c4_rules

    keep_line = "this line has five good words."
    drop_short = "too short."
    drop_nopunct = "this line has no terminal punctuation at all"
    df = spark.createDataFrame(
        [
            (1, f"{keep_line}\n{drop_short}\n{drop_nopunct}\n{keep_line}\nx. y. z."),
            (2, f"{keep_line}\nlorem ipsum dolor.\n{keep_line}\nmore. and. more."),
            (3, "no sentences here at all just words"),
            (4, f"{keep_line}\ncode {{ block }}\n{keep_line}\nt. u. v."),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in c4_rules(df).collect()}
    assert got[1].c4_keep and got[1].n_kept_lines == 2
    assert got[1].clean_text == f"{keep_line}\n{keep_line}"
    assert not got[2].c4_keep and got[2].has_lorem
    assert not got[3].c4_keep and got[3].n_sentences == 0
    assert not got[4].c4_keep and got[4].has_brace
