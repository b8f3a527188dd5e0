"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (the eynollah
graft: turns -> layout kernel -> ordered spans) over transcripts
derived deterministically from /root/testdata/sf0.001/documents.parquet.

``queries()`` exposes every implemented operator family from
SURVEY.md §2 against the driver testdata; ``oracle_sql()`` carries the
exact DuckDB equivalent for each SQL-expressible one (the layout
kernel, LSH-recall similarity, and page diagnostics are rows-only by
design — their correctness gate is the fixture-equality pytest suite).

Determinism contract shared with the oracles:
- every float output is rounded (2dp money, 6dp ratios/cosines)
- every hash is md5-derived: bigint(hex(md5(x))[0:15])
- every ranking has a total order (rounded measure, then key)
- counts/sums cast so Spark and DuckDB dtypes agree (BIGINT sums,
  INT positions)
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from eynollah_spark.operators import docpage, relational
from eynollah_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
)
from eynollah_spark.operators.extract import (
    analyze_pages,
    extract_spans,
    extract_spans_salted,
    probe_turn_metadata,
)
from eynollah_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthetic_assets,
)
from eynollah_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from eynollah_spark.operators.text_analysis import (
    LANG_LEXICON,
    bpe_token_count,
    fingerprint,
    lang_scores,
    quality_features,
    token_count,
)

# ---------------------------------------------------------------------------
# shared constants (Spark queries and DuckDB oracles read the same ones)
# ---------------------------------------------------------------------------
JACCARD_K = 3
JACCARD_T = 0.2
JACCARD_MAX_DF = 1000  # shingle doc-frequency cap (skew guard)
MINHASH_N = 16
MINHASH_BANDS = 4
CLUSTER_T = 0.5  # near-dup clustering jaccard threshold
SIMHASH_MAX_DIST = 8
SUBSTR_K = 8  # duplicate-substring scrub window (tokens)
CURATION_LM_MAX = 4.62  # bigram-LM cross-entropy cap (bits), ~p90 at sf0.01
SUBSTR_MAXF = 1  # windows seen more than this often are duplicates
SIMHASH_MIN_TOKENS = 3  # near-empty docs excluded from banding
SIMHASH_MAX_BAND_FREQ = 1000  # per-band hot-bucket cap (skew guard)
MINHASH_MAX_BAND_FREQ = 1000  # (band, bsig) hot-bucket cap (skew guard)
TOPK_K = 5
TOPK_QUERY_MAX_ID = 8  # queries = vec_id < 8
LINES_PER_TURN = 4
TWOCOL_CELL = 24  # twocol corpus: left/right cell width (chars)
TWOCOL_GAP = 6  # twocol corpus: gutter width; right cell starts at CELL+GAP
TWOCOL_LPT = 6  # twocol corpus: wrapped lines per turn (3 + blank + 3 page lines)
EMB_DIM = 64
NEAR_DUP_T = 0.2
NEAR_DUP_PLANES = 4
# ANN knobs, tuned for recall@k >= 0.8 on the driver embeddings (which
# are near-uniform random — mean off-diagonal cosine ~0 — so recall is
# fundamentally bounded by the candidate-scan fraction; ann_recall
# surfaces that cost explicitly as avg_candidates / scan_frac):
#   LSH 7 planes x 3 tables + multi-probe Hamming<=2 -> recall 0.85
#   IVF 32 cells, probe 18                           -> recall 0.85
LSH_PLANES = 7
LSH_TABLES = 3
LSH_PROBE_R = 2  # multi-probe Hamming radius (Lv et al. 2007)
IVF_CENTROIDS = 32
IVF_PROBE = 18
HNA_PROBE = 22  # hard_negatives_ann: label filter trims cells, needs deeper probing for recall >= 0.8
PROBE_DENSITY_MIN = 30.0  # chars/line; the DPI_THRESHOLD=298 analog


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the vector upcast to double so the fold-left dot
    product is bit-identical across engines."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript corpus derived from the documents
    table: token-wrapped lines grouped into 4-line turns, alternating
    user/assistant roles. Gives the extraction kernel a real
    multi-turn, multi-line input built only from driver testdata."""
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    turns = (
        lines.withColumn("turn_idx", (F.col("line_idx") / LINES_PER_TURN).cast("int"))
        .groupBy("doc_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("text")
        )
    )
    return turns.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def transcripts_gapped_from_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """transcripts_from_documents with a PLANTED intra-line gap (the
    planted-structure pattern of the twocol/shear corpora): every
    full 8-token wrapped line has its 4th inter-word space widened to
    3 spaces. The std corpus joins tokens with single spaces, so §9L
    curved-line splitting (space runs >= line_split_gap = 2) can NEVER
    fire on it; this corpus gives every long line exactly one
    qualifying valley — deep (3 zero columns ≈ 12-30% of the smoothed
    max, under the 40% gate) and centered in dense ink (two-sided
    prominence ≈ 100% >= 50%) — so the -cl path demonstrably splits
    and the hash oracle checks real cuts, not a vacuous pass-through."""
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    words = F.split(F.col("line"), " ")
    gapped = F.when(
        F.size(words) >= 8,
        F.concat(
            F.array_join(F.slice(words, 1, 4), " "),
            F.lit("   "),
            F.array_join(F.slice(words, 5, F.size(words) - 4), " "),
        ),
    ).otherwise(F.col("line"))
    lines = lines.withColumn("line", gapped)
    turns = (
        lines.withColumn("turn_idx", (F.col("line_idx") / LINES_PER_TURN).cast("int"))
        .groupBy("doc_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("text")
        )
    )
    return turns.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def transcripts_twocol_from_documents(
    spark: SparkSession,
    sf_dir: str,
    cell_l: int = TWOCOL_CELL,
    cell_r: int = TWOCOL_CELL,
    gap: int = TWOCOL_GAP,
) -> DataFrame:
    """Deterministic fixed-width TWO-COLUMN transcript corpus: each
    8-token wrapped document line is split into a left cell (chars
    1..24, right-trimmed) and a right cell (chars 25..48, trimmed); a
    page line is ``rpad(left, 30) || right`` (single-cell when the
    right cell is empty), so ink sits in [0, 24) and [30, ...) with a
    >= 6-wide blank gutter between. Turns take 6 wrapped lines with a
    blank page line inserted after the 3rd, giving every full turn TWO
    >= 3-line text blocks — the §6 per-block gutter scan
    (find_num_col analog, reference utils/__init__.py:363-532) and the
    §6p page-column mode with column-major reading order
    (return_boxes_of_images_by_order_of_reading_new,
    utils/__init__.py:1599-2255) both fire. Every page line starts
    with ink at position 0 (lead == 0), so the §6d deskew gate can
    never fire and the whole path stays SQL-expressible.

    A NARROW right cell (e.g. cell_l=40, cell_r=12) makes the right
    column short-lined and <= 25% of the page width, firing the §6m
    projection-marginalia relabel (utils/marginals.py:11-252)."""
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    lc = F.rtrim(F.substring("line", 1, cell_l))
    rc = F.trim(F.substring("line", cell_l + 1, cell_r))
    pline = F.when(rc == F.lit(""), lc).otherwise(
        F.concat(F.rpad(lc, cell_l + gap, " "), rc)
    )
    cells = lines.select(
        "doc_id",
        (F.col("line_idx") / TWOCOL_LPT).cast("int").alias("turn_idx"),
        (F.col("line_idx") % TWOCOL_LPT).alias("k"),
        pline.alias("pline"),
    )
    turns = cells.groupBy("doc_id", "turn_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "pline"))),
            lambda x: x["pline"],
        ).alias("arr")
    )
    arr = F.col("arr")
    paged = turns.withColumn(
        "text",
        F.when(
            F.size(arr) > 3,
            F.array_join(
                F.concat(
                    F.slice(arr, 1, 3),
                    F.array(F.lit("")),
                    F.slice(arr, 4, F.size(arr) - 3),
                ),
                "\n",
            ),
        ).otherwise(F.array_join(arr, "\n")),
    )
    return paged.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def transcripts_shear_from_documents(
    spark: SparkSession,
    sf_dir: str,
    cell_l: int = TWOCOL_CELL,
    cell_r: int = TWOCOL_CELL,
    gap: int = TWOCOL_GAP,
) -> DataFrame:
    """Deterministic SKEWED two-column transcript corpus for the §6d
    deskew path (return_deskew_slop analog, reference
    separate_lines.py:1572-1798): each twocol page line (left cell,
    >= ``gap``-wide gutter, right cell — see
    transcripts_twocol_from_documents) is indented by k spaces, k the
    line's index within its turn (0..5, 6 lines per turn, NO blank
    line, so every full turn is ONE text block). Leads are exactly
    0..n-1, the integer LS slope is 1.0 >= slope_threshold, and the
    gutter only aligns into a valley after the shear-grid argmax picks
    the de-indenting candidate — the sheared-profile gutter scan, the
    per-line shifted split emission and the §6d no-gutter fallback all
    become SQL-expressible (oracle: extract_spans_shear_simple)."""
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    lc = F.rtrim(F.substring("line", 1, cell_l))
    rc = F.trim(F.substring("line", cell_l + 1, cell_r))
    base = F.when(rc == F.lit(""), lc).otherwise(
        F.concat(F.rpad(lc, cell_l + gap, " "), rc)
    )
    k = (F.col("line_idx") % TWOCOL_LPT).cast("int")
    cells = lines.select(
        "doc_id",
        (F.col("line_idx") / TWOCOL_LPT).cast("int").alias("turn_idx"),
        k.alias("k"),
        F.concat(F.repeat(F.lit(" "), k), base).alias("pline"),
    )
    turns = cells.groupBy("doc_id", "turn_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "pline"))),
                lambda x: x["pline"],
            ),
            "\n",
        ).alias("text")
    )
    return turns.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def transcripts_padded_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LOW-DENSITY transcript corpus for the §1e
    enhancement pre-pass (M1 analog): each 8-token wrapped line is
    truncated to 80 chars (the wrap width, so §1e's re-wrap branch is
    a provable no-op) and followed by (line_idx % 3) blank pad lines;
    4 content lines per turn. Most turns fall under the 30 chars/line
    density gate (the DPI_THRESHOLD analog) and get rewritten by the
    kernel when enable_enhancement is on; dense turns pass through."""
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    line80 = F.substring("line", 1, 80)
    page_arr = F.concat(
        F.array(line80),
        F.array_repeat(F.lit(""), (F.col("line_idx") % 3).cast("int")),
    )
    cells = lines.select(
        "doc_id",
        (F.col("line_idx") / LINES_PER_TURN).cast("int").alias("turn_idx"),
        "line_idx",
        page_arr.alias("pls"),
    )
    turns = cells.groupBy("doc_id", "turn_idx").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "pls"))),
                lambda x: x["pls"],
            )
        ).alias("arr")
    )
    return turns.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.array_join("arr", "\n").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline (kernel + order/id
    windows) over transcripts derived from sf0.001 documents."""
    turns = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_spans(turns)


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------
def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def _q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture stats for sampling-weight design: per source,
    document and token totals plus the token share of the corpus
    (two tiny aggregations + a broadcast 1-row total)."""
    d = _docs(spark, sf_dir)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot"), 6).alias("token_share"),
        )
    )


def _q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir))


def _q_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import hashed_classifier_scores

    return hashed_classifier_scores(_docs(spark, sf_dir))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_scores(_docs(spark, sf_dir)).select(
        "doc_id", "hits_en", "hits_de", "hits_fr", "hits_es", "lang_guess"
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "punct_ratio",
        "stopword_ratio",
        "mean_token_len",
        "quality_score",
    )


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir), k=JACCARD_K).select("doc_id", "fingerprint")


CONTAM_K = 8  # decontamination shingle width
CONTAM_BENCH_MAX_ID = 20  # stand-in eval set: lowest doc_ids


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 1 distinct
    8-gram with the stand-in eval set (docs with doc_id < 20)."""
    from eynollah_spark.operators.text_analysis import contamination_check

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
    return contamination_check(d, bench, k=CONTAM_K)


PACK_BUDGET = 512


def _q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: contiguous-fill pack assignment at a 512-token
    budget, via the two-level distributed prefix sum."""
    from eynollah_spark.operators.text_analysis import pack_documents

    return pack_documents(_docs(spark, sf_dir), budget=PACK_BUDGET)


PCTS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact doc-length percentiles (Spark's sort-based `percentile`,
    linear interpolation — same definition as DuckDB quantile_cont):
    the corpus length-distribution probe run before choosing context
    windows / packing strategies."""
    d = _docs(spark, sf_dir)
    arr = ",".join(str(p) for p in PCTS)
    cols = [
        F.round(
            F.expr(f"percentile(n_chars, array({arr}))")[i], 6
        ).alias(f"chars_p{int(p * 100)}")
        for i, p in enumerate(PCTS)
    ]
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    tok_cols = [
        F.round(F.expr(f"percentile(_nt, array({arr})) ")[i], 6).alias(
            f"tokens_p{int(p * 100)}"
        )
        for i, p in enumerate(PCTS)
    ]
    return d.withColumn("_nt", n_tok).agg(
        F.count(F.lit(1)).alias("n_docs"), *cols, *tok_cols
    )


TOP_TOKENS_K = 50


def _q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: global token frequencies, top-k by
    (count desc, token asc). One explode + partial-agg groupBy(token);
    the top-k compiles to TakeOrderedAndProject — per-partition heads
    merged at the driver, no global sort."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.length("token") > 0)
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(TOP_TOKENS_K)
    )


BM25_TERMS = ("spark", "merge", "window", "hash")
BM25_TOPK = 25


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval: map-side tf (no explode/shuffle), 1-row
    corpus-stats agg broadcast back, TakeOrderedAndProject top-k."""
    from eynollah_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), BM25_TERMS, k=BM25_TOPK)


# deterministic mixing rates for the stratified-sample query
SAMPLE_RATES = {"en": 0.5, "zh": 0.3, "de": 0.25}
SAMPLE_DEFAULT_RATE = 0.1
QUOTA_PER_SOURCE = 10


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language mixing sample — pure map-side filter
    keyed on md5(doc_id), identical on any cluster layout."""
    from eynollah_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars"),
        SAMPLE_RATES,
        stratum_col="lang",
        default_rate=SAMPLE_DEFAULT_RATE,
    )


def _q_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (two-phase salted top-N per source)."""
    from eynollah_spark.operators.sampling import per_group_quota

    return per_group_quota(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        quota=QUOTA_PER_SOURCE,
        group_col="source",
    )


WINNOW_K = 3  # shingle width (matches the jaccard/fingerprint family)
WINNOW_W = 4  # winnowing window: shares any >= W+K-1-token run


def _q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer et al., SIGMOD 2003):
    per-window minimum over k-gram hashes, distinct per doc — the
    sub-sampled near-dup sketch between full-shingle Jaccard and the
    single-min doc_fingerprint. All-codegen array expressions, zero
    shuffle."""
    from eynollah_spark.operators.text_analysis import winnowing_fingerprints

    return winnowing_fingerprints(
        _docs(spark, sf_dir), k=WINNOW_K, w=WINNOW_W
    )


TOKEN_BUDGET = 700  # per-source token budget (~half of each sf0.01 source)


def _q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget mixing: deterministic-hash-ordered
    prefix per source whose cumulative token count stays <= budget,
    via the two-level (bucketed) distributed prefix sum."""
    from eynollah_spark.operators.sampling import token_budget_sample

    return token_budget_sample(
        _docs(spark, sf_dir).select("doc_id", "source", "text"),
        budget=TOKEN_BUDGET,
    )


# corpus-appropriate stop-word probes (the synthetic documents corpus
# has a spark-themed vocabulary; the operator's default is the
# published Gopher list) — keep and the oracle's list in lockstep
GOPHER_QUERY_STOPS = ("the", "a", "table", "row", "value", "key", "join", "scan")


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (DPR/Contriever recipe):
    per query, the top-k nearest corpus vectors with a DIFFERENT
    label — broadcast queries, label predicate below the scoring."""
    from eynollah_spark.operators.similarity import hard_negatives

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    return hard_negatives(e, q, k=TOPK_K)


def _emb_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )


def _q_hard_negatives_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-backed hard-negative mining: the DPR different-label top-k
    routed through the IVF coarse quantizer (probe n_probe of
    n_centroids cells per query instead of the whole corpus) — the
    large-query-set production path; deterministic, exact SQL oracle."""
    from eynollah_spark.operators.similarity import hard_negatives_ann

    e = _emb_labeled(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    return hard_negatives_ann(
        e, q, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=HNA_PROBE
    )


def _q_hard_negatives_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth-scored ANN mining (the ann_recall protocol): recall@k of
    the IVF-routed hard-negative miner against the brute-force miner,
    with the probe COST alongside (avg different-label candidates
    exact-scored per query, and that as a fraction of the corpus)."""
    from eynollah_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ann,
    )

    e = _emb_labeled(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    truth = hard_negatives(e, q, k=TOPK_K).persist()
    approx = hard_negatives_ann(
        e, q, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=HNA_PROBE,
        with_cost=True,
    ).persist()
    n_corp = e.agg(F.count(F.lit(1)).alias("n_corpus"))
    hit = approx.select("query_id", "vec_id", F.lit(1).alias("_hit"))
    recall = (
        truth.select("query_id", "vec_id")
        .join(hit, ["query_id", "vec_id"], "left")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count(F.lit(1)),
                6,
            ).alias("recall_at_k"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    cost = (
        approx.groupBy("query_id")
        .agg(F.max("n_candidates").alias("nc"))
        .agg(F.avg("nc").alias("_avg_nc"))
    )
    return (
        recall.crossJoin(F.broadcast(cost))
        .crossJoin(F.broadcast(n_corp))
        .select(
            "recall_at_k",
            "n_pairs",
            F.lit(HNA_PROBE).cast("int").alias("probes_per_query"),
            F.round(F.col("_avg_nc"), 6).alias("avg_candidates"),
            F.round(F.col("_avg_nc") / (F.col("n_corpus") - 1), 6).alias(
                "scan_frac"
            ),
        )
    )


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity-bucket sampling (Wenzek et
    al. 2020 §4.3) over the corpus bigram LM, deterministic
    tercile + md5 keep rule."""
    from eynollah_spark.operators.sampling import ccnet_bucket_sample

    return ccnet_bucket_sample(_docs(spark, sf_dir))


def _q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 A1.1) with the
    published thresholds; map-side only."""
    from eynollah_spark.operators.text_analysis import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), stop_words=GOPHER_QUERY_STOPS)


def _q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2): terminal-punct
    >=5-word line gate, lorem-ipsum/brace/sentence-count doc gate,
    cleaned text returned for auditability. The documents corpus has
    no newlines or punctuation, so the input is the deterministic
    DECORATED line view (the planted-structure pattern of the _simple
    family): token-wrapped lines where every line_idx%3<2 line gains a
    terminal '.', doc_id%97 docs plant a '{' on line 1, doc_id%101
    docs plant a lorem-ipsum line 0 — every rule fires on a known
    subset, mirrored exactly in the oracle CTE."""
    from eynollah_spark.operators import docpage
    from eynollah_spark.operators.text_analysis import c4_rules

    lines = docpage.doc_lines(_docs(spark, sf_dir))
    deco = lines.select(
        "doc_id",
        "line_idx",
        F.when(
            (F.col("doc_id") % 101 == 0) & (F.col("line_idx") == 0),
            F.lit("lorem ipsum dolor sit amet consectetur."),
        )
        .otherwise(
            F.concat(
                F.col("line"),
                F.when(F.col("line_idx") % 3 < 2, F.lit(".")).otherwise(
                    F.lit("")
                ),
                F.when(
                    (F.col("doc_id") % 97 == 0) & (F.col("line_idx") == 1),
                    F.lit(" {"),
                ).otherwise(F.lit("")),
            )
        )
        .alias("line"),
    )
    docs = deco.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text")
    )
    return c4_rules(docs)


CDC_MOD = 8  # expected content-defined chunk length in tokens


def _q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup (stateless gear CDC): shift-
    invariant chunk frames catch duplicated passages at different
    offsets; one shuffle on md5(chunk), per-doc dup-token summary."""
    from eynollah_spark.operators.dedup import cdc_chunk_stats

    return cdc_chunk_stats(_docs(spark, sf_dir), boundary_mod=CDC_MOD)


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import pii_scrub

    return pii_scrub(_docs(spark, sf_dir))


def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = dedup_exact(_docs(spark, sf_dir))
    return kept.select("doc_id", F.md5("text").alias("text_hash"))


PARA_MIN_LEN = 20


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.dedup import paragraph_dedup

    # documents are single-line, so paragraph granularity comes from
    # the derived transcript corpus (token-wrapped lines, 4-line
    # turns): each turn is a doc, each line a paragraph — wrapped
    # lines repeat heavily across documents, so the gate bites
    lines = docpage.doc_lines(_docs(spark, sf_dir))
    turns = (
        lines.withColumn("t", (F.col("line_idx") / LINES_PER_TURN).cast("int"))
        .groupBy("doc_id", "t")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("text")
        )
        .select(
            (F.col("doc_id") * 1000 + F.col("t")).cast("bigint").alias("doc_id"),
            "text",
        )
    )
    out = paragraph_dedup(turns, min_len=PARA_MIN_LEN, sep="\n")
    # hash the rebuilt text: the driver compare is value-based and the
    # reassembled documents can be large
    return out.select(
        "doc_id", F.md5("text").alias("text_hash"), "n_paras", "n_dropped"
    )


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        k=JACCARD_K,
        threshold=JACCARD_T,
        max_doc_freq=JACCARD_MAX_DF,
    )


def _q_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.dedup import duplicate_ngram_scrub

    return duplicate_ngram_scrub(
        _docs(spark, sf_dir), k=SUBSTR_K, max_freq=SUBSTR_MAXF
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        _docs(spark, sf_dir),
        k=JACCARD_K,
        num_hashes=MINHASH_N,
        bands=MINHASH_BANDS,
        threshold=JACCARD_T,
        max_band_freq=MINHASH_MAX_BAND_FREQ,
    )


def _q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_clusters(
        _docs(spark, sf_dir),
        k=JACCARD_K,
        num_hashes=MINHASH_N,
        bands=MINHASH_BANDS,
        threshold=CLUSTER_T,
        max_band_freq=MINHASH_MAX_BAND_FREQ,
    )


def _q_near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster curation: near-dup clusters (connected
    components over the LSH graph) crossed with the quality score —
    one survivor per cluster, the HIGHEST-quality member (ties to the
    lowest doc_id), instead of keep-lowest-id. The per-cluster argmax
    is a window over cluster_id (partial shuffle on the tiny labels
    frame, not the corpus)."""
    d = _docs(spark, sf_dir)
    clusters = near_dup_clusters(
        d,
        k=JACCARD_K,
        num_hashes=MINHASH_N,
        bands=MINHASH_BANDS,
        threshold=CLUSTER_T,
        max_band_freq=MINHASH_MAX_BAND_FREQ,
    ).select("doc_id", "cluster_id")
    q = quality_features(d).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "cluster_id", "quality_score")
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_hamming_pairs(
        _docs(spark, sf_dir),
        max_distance=SIMHASH_MAX_DIST,
        min_tokens=SIMHASH_MIN_TOKENS,
        max_band_freq=SIMHASH_MAX_BAND_FREQ,
    )


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = brute_force_topk(e, q, k=TOPK_K)
    return out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_double(spark, sf_dir)
    return embedding_near_dup_pairs(
        e, dim=EMB_DIM, threshold=NEAR_DUP_T, n_planes=NEAR_DUP_PLANES
    )


KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_SCALE = 1 << 12


SEMDEDUP_T = 0.95
SEMDEDUP_PLANT_N = 20
SEMDEDUP_PLANT_OFFSET = 100_000


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table augmented with deterministic
    planted copies (vec_id + offset for the lowest ids) — the raw
    table has no near-duplicate pairs (max within-cluster cosine
    ~0.48), so exact copies make the keep/drop gate bite while
    staying derivable from driver testdata alone."""
    from eynollah_spark.operators.similarity import semdedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    aug = e.union(
        e.filter(F.col("vec_id") < SEMDEDUP_PLANT_N).select(
            (F.col("vec_id") + SEMDEDUP_PLANT_OFFSET).alias("vec_id"),
            "embedding",
        )
    )
    return semdedup(
        aug,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        threshold=SEMDEDUP_T,
        scale=KMEANS_SCALE,
    )


def _q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means over the embeddings table (the IVF
    coarse-quantizer training step) — exact integer-quantized
    arithmetic, so even the iterative clustering carries an exact
    DuckDB oracle (unrolled iterations)."""
    from eynollah_spark.operators.similarity import kmeans_lloyd

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_lloyd(e, k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE)


PQ_M = 4  # subspaces: EMB_DIM/PQ_M = 16-dim subvectors
PQ_K = 16  # per-subspace codebook size (larger than KMEANS_K: a 16-dim
#            subspace quantized to 8 cells loses too much resolution)
PQ_RERANK = 150  # ADC shortlist exact-re-ranked (Jégou et al. §V.C) —
#            with PQ_K=16 this lifts recall@5 from ~0.05 to >=0.8


def _q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes for the embeddings table: one
    deterministic Lloyd codebook per 16-dim subspace, integer-exact
    reconstruction quality per vector."""
    from eynollah_spark.operators.similarity import pq_codes

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_codes(
        e, dim=EMB_DIM, m=PQ_M, k=PQ_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE
    )


def _q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ top-k (full-precision query vs PQ
    reconstructions, ADC shortlist exact-re-ranked) — the
    compressed-index ANN path."""
    from eynollah_spark.operators.similarity import pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = pq_topk(
        e,
        q,
        dim=EMB_DIM,
        m=PQ_M,
        k=PQ_K,
        iters=KMEANS_ITERS,
        k_results=TOPK_K,
        rerank=PQ_RERANK,
        scale=KMEANS_SCALE,
    )
    return out.select(
        "query_id", "vec_id", "score", F.col("rank").cast("int").alias("rank")
    )


DSIR_N = 100
DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: select DSIR_N docs whose hashed
    unigram+bigram distribution looks like the English subset."""
    from eynollah_spark.operators.sampling import dsir_select

    d = _docs(spark, sf_dir)
    out = dsir_select(
        d,
        d.filter(F.col("lang") == DSIR_TARGET_LANG),
        n_select=DSIR_N,
        n_buckets=DSIR_BUCKETS,
    )
    return out.select(
        "doc_id", "logw_e6", "key_e6", F.col("rank").cast("int").alias("rank")
    )


INC_MOD = 5  # every 5th doc (by id hash) forms the "new snapshot"
INC_PLANT_N = 15
INC_EXACT_OFFSET = 1_000_000
INC_NEAR_OFFSET = 2_000_000
INC_NEAR_SUFFIX = " zz qq"


def _inc_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(new_snapshot, index) split of documents: a hash-selected 1/5
    plays the fresh crawl snapshot, the rest the existing index.
    Planted copies of low-id index docs (exact, and near with a
    2-token suffix) make the dup gates bite deterministically — the
    raw corpus need not contain cross-split duplicates."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    is_new = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("inc:"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(INC_MOD),
        )
        == 0
    )
    idx = d.filter(~is_new)
    low = idx.filter(F.col("doc_id") < INC_PLANT_N)
    new = (
        d.filter(is_new)
        .unionByName(
            low.select(
                (F.col("doc_id") + INC_EXACT_OFFSET).alias("doc_id"), "text"
            )
        )
        .unionByName(
            low.select(
                (F.col("doc_id") + INC_NEAR_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(INC_NEAR_SUFFIX)).alias("text"),
            )
        )
    )
    return new, idx


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.dedup import incremental_dedup

    new, idx = _inc_frames(spark, sf_dir)
    return incremental_dedup(
        new, idx, threshold=JACCARD_T, max_band_freq=MINHASH_MAX_BAND_FREQ
    )


BLOOM_M = 1 << 10  # deliberately small so false positives are observable
BLOOM_K = 4


def _q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe of the new snapshot against the
    index — the compact persisted-index form of incremental dedup.
    m_bits is sized SMALL here so the false_positive column is
    non-trivially exercised (production sizing drives it to ~0)."""
    from eynollah_spark.operators.dedup import bloom_probe

    new, idx = _inc_frames(spark, sf_dir)
    return bloom_probe(new, idx, m_bits=BLOOM_M, k_hashes=BLOOM_K)


TURN_RETRY_OFFSET = 1000
TURN_RETRY_CONVS = 10


def _q_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation repeated-turn detection over the derived
    transcripts, with planted retries (turn 0 of the first convs
    re-emitted at a late turn_idx) so the repeat gate bites — the
    derived corpus has no organic intra-conversation repeats."""
    from eynollah_spark.operators.dedup import turn_dedup

    t = transcripts_from_documents(spark, sf_dir).select(
        "conv_id", "turn_idx", "text"
    )
    docnum = F.substring("conv_id", 4, 12).cast("int")
    plant = t.filter((docnum < TURN_RETRY_CONVS) & (F.col("turn_idx") == 0)).select(
        "conv_id",
        (F.col("turn_idx") + TURN_RETRY_OFFSET).cast("int").alias("turn_idx"),
        "text",
    )
    return turn_dedup(t.unionByName(plant))


TEMP_ALPHA = 0.7


def _q_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.sampling import temperature_weights

    return temperature_weights(_docs(spark, sf_dir), alpha=TEMP_ALPHA)


TRAIN_SHARDS_N = 16
TRAIN_SHARDS_SEED = "s0"


def _q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.sampling import train_shard_stats

    return train_shard_stats(
        _docs(spark, sf_dir), n_shards=TRAIN_SHARDS_N, seed=TRAIN_SHARDS_SEED
    )


def _q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript-corpus analytics over the input_hint table shape:
    per-conversation turn counts, role mix, char mass, mean turn token
    count — the profiling pass a pipeline runs before curation. One
    conv_id groupBy (the pipeline's own exchange key)."""
    from eynollah_spark.operators.text_analysis import token_count

    t = transcripts_from_documents(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("int")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("int")
        .alias("n_assistant"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.round(F.avg(token_count(F.col("text"))), 6).alias(
            "mean_turn_tokens"
        ),
        F.max(F.length("text")).cast("int").alias("max_turn_chars"),
    )


def _q_probe_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return probe_turn_metadata(
        transcripts_from_documents(spark, sf_dir), density_min=PROBE_DENSITY_MIN
    )


BPE_TOP_N = 60


def _q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_n=BPE_TOP_N)


CHUNK_TOKENS = 24
CHUNK_STRIDE = 16


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE
    )


SPLIT_SEED = "split0"


def _q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.sampling import assign_splits

    return (
        assign_splits(_docs(spark, sf_dir), seed=SPLIT_SEED)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


PREF_GROUPS = 40
PREF_MAX_PER_PROMPT = 3


def _q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import preference_pairs

    # plant prompt groups over the documents table: ~N docs share each
    # prompt, their texts compete as candidate responses
    cand = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.concat(
            F.lit("prompt-"), (F.col("doc_id") % PREF_GROUPS).cast("string")
        ).alias("prompt"),
        F.col("text").alias("response"),
    )
    return preference_pairs(cand, max_pairs_per_prompt=PREF_MAX_PER_PROMPT)


NGRAM_DIVERSITY_N = 2


def _q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import ngram_diversity

    return ngram_diversity(_docs(spark, sf_dir), n=NGRAM_DIVERSITY_N)


SFT_CONTEXT_TURNS = 4


def _q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import sft_pairs

    return sft_pairs(
        transcripts_from_documents(spark, sf_dir),
        max_context_turns=SFT_CONTEXT_TURNS,
    )


# one ANSI-SQL text executed verbatim by BOTH spark.sql and the DuckDB
# oracle — the SQL API surface of the engine, portability by sharing
_TOP_NATIONS_SQL = """
SELECT r_name, n_name, revenue, rnk FROM (
  SELECT r_name, n_name, revenue,
         CAST(row_number() OVER (PARTITION BY r_name
                                 ORDER BY revenue DESC, n_name) AS INT) AS rnk
  FROM (
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
  ) rev
) ranked
WHERE rnk <= 3
"""


def _q_sql_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql() surface: the exact oracle SQL text runs on Spark
    too (temp views over the same parquet)."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(_TOP_NATIONS_SQL)


def _q_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        F.max("p_size").alias("max_size"),
        F.countDistinct("p_type").alias("n_types"),
    )


def _q_supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_balance"),
        )
    )


def _q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
        )
    )


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode feature extraction with an EXACT DuckDB oracle: the
    deterministic stub (byte histogram folded to FEATURE_DIM) is pure
    arithmetic over md5-derived payload bytes, so the oracle rebuilds
    the same payloads hex-digit by hex-digit in SQL. Digest columns
    are chosen engine-exact: byte_wsum recovers the INTEGER
    sum(bucket * count) from the normalized feature (round() kills the
    divide-then-multiply ulp), and argmax ties break to the lowest
    bucket in both engines."""
    assets = synthetic_assets(spark, n=64, seed=7)
    feats = extract_features(assets, fake_decode=True)
    wsum = F.aggregate(
        F.zip_with(
            "feature",
            F.sequence(F.lit(0), F.lit(FEATURE_DIM - 1)),
            lambda v, i: v * i,
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, v: a + v), 6).alias(
            "feature_sum"
        ),
        F.round(wsum * F.col("n_bytes"), 0).cast("bigint").alias("byte_wsum"),
        (
            F.array_position("feature", F.array_max("feature")) - 1
        ).cast("int").alias("argmax_bucket"),
    )


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthetic_assets(spark, n=64, seed=7)
    frames = sample_frames(assets, every_ms=1000, fake_decode=True)
    return frames.select(
        "asset_id", "frame_idx", "ts_ms", F.length("frame").alias("frame_bytes")
    )


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = lsh_topk(
        e,
        q,
        dim=EMB_DIM,
        k=TOPK_K,
        n_planes=LSH_PLANES,
        n_tables=LSH_TABLES,
        probe_hamming=LSH_PROBE_R,
    )
    return out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _q_streaming_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface: file-source stream over events ->
    watermarked 1-minute tumbling windows -> memory sink (complete
    mode), driven to completion with availableNow. At rest this equals
    the batch aggregation, so it carries a real SQL oracle."""
    import shutil
    import tempfile

    from eynollah_spark.streaming import stream_events, stream_minute_rollup

    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-000.parquet")
    agg = stream_minute_rollup(stream_events(spark, d))
    q = (
        agg.writeStream.format("memory")
        .queryName("entry_stream_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("entry_stream_rollup").select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("minute"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _q_doc_pagexml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.io.pagexml import regions_to_pagexml

    regions = docpage.doc_region_runs(spark, sf_dir)
    return regions_to_pagexml(regions, ["doc_id"])


def _q_otsu_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.text_analysis import otsu_threshold

    return otsu_threshold(_docs(spark, sf_dir), "n_chars")


def _q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.operators.similarity import ivf_topk

    e = _emb_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = ivf_topk(e, q, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE)
    return out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality probe: recall@k of each approximate index (IVF,
    multi-probe LSH, PQ/ADC) against the brute-force ground truth —
    the evaluation loop an ANN deployment runs before trusting an
    index at corpus scale. One row per index with the probe COST
    alongside the recall (an index evaluated on recall alone always
    "improves" by scanning more):

    - probes_per_query: index cells consulted per query (IVF cells
      probed; LSH buckets probed across tables; PQ's m*k ADC
      lookup-table entries).
    - avg_candidates: mean number of candidates exact-scored per query.
    - scan_frac: avg_candidates / (corpus_size - 1) — the fraction of
      the corpus a query touches (the number that must stay << 1 at
      10^9 vectors; on this near-uniform synthetic corpus recall 0.85
      costs ~0.5, which is exactly what this output is for surfacing).
    """
    from eynollah_spark.operators.similarity import (
        ivf_topk,
        lsh_topk,
        pq_topk,
        probe_masks,
    )

    e = _emb_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    eraw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qraw = eraw.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    # truth is consumed by all three recall joins and each approx frame
    # by both its recall join AND its cost aggregate; without a persist
    # Spark re-executes the brute-force scan 3x and every index build
    # (kmeans, codebooks) 2x. All persisted frames are bounded by
    # n_queries * k rows, so this is scale-safe at any corpus size.
    truth = _q_topk(spark, sf_dir).select("query_id", "vec_id").persist()
    n_corp = e.agg(F.count(F.lit(1)).alias("n_corpus"))
    specs = (
        (
            "ivf",
            ivf_topk(
                e, q, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE,
                with_cost=True,
            ),
            IVF_PROBE,
        ),
        (
            "lsh",
            lsh_topk(
                e, q, dim=EMB_DIM, k=TOPK_K, n_planes=LSH_PLANES,
                n_tables=LSH_TABLES, probe_hamming=LSH_PROBE_R, with_cost=True,
            ),
            len(probe_masks(LSH_PLANES, LSH_PROBE_R)) * LSH_TABLES,
        ),
        (
            "pq",
            pq_topk(
                eraw, qraw, dim=EMB_DIM, m=PQ_M, k=PQ_K,
                iters=KMEANS_ITERS, k_results=TOPK_K, rerank=PQ_RERANK,
                scale=KMEANS_SCALE, with_cost=True,
            ),
            PQ_M * PQ_K,
        ),
    )
    out = None
    for name, approx, probes in specs:
        approx = approx.persist()
        recall = (
            truth.join(
                approx.select("query_id", "vec_id", F.lit(1).alias("_hit")),
                ["query_id", "vec_id"],
                "left",
            )
            .agg(
                F.lit(name).alias("index_name"),
                F.round(
                    F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                    / F.count(F.lit(1)),
                    6,
                ).alias("recall_at_k"),
                F.count(F.lit(1)).alias("n_pairs"),
            )
        )
        cost = (
            approx.groupBy("query_id")
            .agg(F.max("n_candidates").alias("nc"))
            .agg(F.avg("nc").alias("_avg_nc"))
        )
        r = (
            recall.crossJoin(F.broadcast(cost))
            .crossJoin(F.broadcast(n_corp))
            .select(
                "index_name",
                "recall_at_k",
                "n_pairs",
                F.lit(probes).cast("int").alias("probes_per_query"),
                F.round(F.col("_avg_nc"), 6).alias("avg_candidates"),
                F.round(
                    F.col("_avg_nc") / (F.col("n_corpus") - 1), 6
                ).alias("scan_frac"),
            )
        )
        out = r if out is None else out.unionByName(r)
    return out


def _q_extract_spans_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_spans_salted(
        transcripts_from_documents(spark, sf_dir), salt_buckets=8
    )


def _q_curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline (the canonical training-data flow):
    quality gate -> exact dedup (keep lowest doc_id) -> near-dup
    removal (drop the higher id of any Jaccard>=0.5 pair). Each stage
    is an existing operator; the composition stays one declarative
    plan for Catalyst."""
    docs = _docs(spark, sf_dir)
    q = quality_features(docs).filter(F.col("quality_score") >= 0.5).select("doc_id", "text")
    kept = dedup_exact(q).select("doc_id", "text")
    near = ngram_jaccard_pairs(kept, k=JACCARD_K, threshold=0.5).select("doc_b")
    return (
        kept.join(near, kept.doc_id == near.doc_b, "left_anti")
        .select("doc_id")
    )


CURATION_DUP_RATIO_MAX = 0.9  # repetition gates (lenient for the
CURATION_TOP_BG_MAX = 0.5     # lorem-vocabulary corpus)


def _q_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data curation flow as one declarative
    plan: quality gate -> repetition gates (Gopher-style) -> PII gate
    -> exact dedup (keep lowest id) -> near-dup removal (Jaccard) ->
    benchmark decontamination. Every stage is an existing first-class
    operator; Catalyst fuses the scan-side gates into one pass over
    the corpus, and the only shuffles are the dedup hash, the shingle
    join, and the broadcast-bench contamination join."""
    from eynollah_spark.operators.text_analysis import (
        contamination_check,
        pii_scrub,
        repetition_stats,
    )

    docs = _docs(spark, sf_dir)
    q = (
        quality_features(docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "text")
    )
    rep_ok = repetition_stats(docs).filter(
        (F.col("dup_token_ratio") <= CURATION_DUP_RATIO_MAX)
        & (F.col("top_bigram_frac") <= CURATION_TOP_BG_MAX)
    ).select("doc_id")
    pii_ok = pii_scrub(docs).filter(
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) == 0
    ).select("doc_id")
    gated = q.join(rep_ok, "doc_id").join(pii_ok, "doc_id")
    kept = dedup_exact(gated).select("doc_id", "text")
    near = ngram_jaccard_pairs(kept, k=JACCARD_K, threshold=0.5).select("doc_b")
    deduped = kept.join(near, kept.doc_id == near.doc_b, "left_anti")
    bench = docs.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
    contaminated = contamination_check(deduped, bench, k=CONTAM_K).select(
        "doc_id"
    ).distinct()
    return deduped.join(contaminated, "doc_id", "left_anti").select("doc_id")


def _curation_v2_stages(
    spark: SparkSession, sf_dir: str, persist_stages: bool = False
) -> dict:
    """Stage frames of the v2 curation flow, shared by the survivor
    query and the funnel: the bigram-LM cross-entropy cap (CCNet
    perplexity filter analog) and the hashed linear classifier keep
    gate (fastText filter analog) on top of curation_full's chain.

    ``persist_stages`` is set by the funnel query, whose 9 stage
    counts would otherwise each re-execute their full prefix chain
    (O(stages^2) gate work). Only survivor frames are persisted —
    gate outputs are doc_id-only and shrink down-funnel; the corpus
    scan itself is never cached (at 10^12 turns that IS the data)."""
    from eynollah_spark.operators.text_analysis import (
        bigram_lm_scores,
        contamination_check,
        hashed_classifier_scores,
        pii_scrub,
        repetition_stats,
    )

    docs = _docs(spark, sf_dir)
    q = (
        quality_features(docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "text")
    )
    rep_ok = repetition_stats(docs).filter(
        (F.col("dup_token_ratio") <= CURATION_DUP_RATIO_MAX)
        & (F.col("top_bigram_frac") <= CURATION_TOP_BG_MAX)
    ).select("doc_id")
    pii_ok = pii_scrub(docs).filter(
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) == 0
    ).select("doc_id")
    lm_ok = bigram_lm_scores(docs).filter(
        F.col("xent_bits") <= CURATION_LM_MAX
    ).select("doc_id")
    clf_ok = hashed_classifier_scores(docs).filter(F.col("keep")).select("doc_id")
    gated = (
        q.join(rep_ok, "doc_id")
        .join(pii_ok, "doc_id")
        .join(lm_ok, "doc_id")
        .join(clf_ok, "doc_id")
    )
    kept = dedup_exact(gated).select("doc_id", "text")
    near = ngram_jaccard_pairs(kept, k=JACCARD_K, threshold=0.5).select("doc_b")
    deduped = kept.join(near, kept.doc_id == near.doc_b, "left_anti")
    bench = docs.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
    contaminated = contamination_check(deduped, bench, k=CONTAM_K).select(
        "doc_id"
    ).distinct()
    final = deduped.join(contaminated, "doc_id", "left_anti").select("doc_id")
    if persist_stages:
        for frame in (q, rep_ok, pii_ok, lm_ok, clf_ok, gated, kept, deduped):
            frame.persist()
    return {
        "docs": docs,
        "rep_ok": rep_ok,
        "pii_ok": pii_ok,
        "lm_ok": lm_ok,
        "clf_ok": clf_ok,
        "gated": gated,
        "kept": kept,
        "deduped": deduped,
        "final": final,
    }


def _q_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_full plus the two model-based gates (the shape of a
    modern pretraining pipeline's filtering stack)."""
    return _curation_v2_stages(spark, sf_dir)["final"]


def _q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate survivor counts over the v2 chain — the funnel every
    curation pipeline reports (one row; each count a broadcast 1-row
    aggregate crossJoined in)."""
    s = _curation_v2_stages(spark, sf_dir, persist_stages=True)
    counts = [
        ("n_input", s["docs"]),
        ("n_repetition_ok", s["rep_ok"]),
        ("n_pii_ok", s["pii_ok"]),
        ("n_lm_ok", s["lm_ok"]),
        ("n_classifier_ok", s["clf_ok"]),
        ("n_all_gates", s["gated"]),
        ("n_after_exact", s["kept"]),
        ("n_after_near_dup", s["deduped"]),
        ("n_final", s["final"]),
    ]
    out = None
    for name, frame in counts:
        c = frame.agg(F.count(F.lit(1)).alias(name))
        out = c if out is None else out.crossJoin(F.broadcast(c))
    return out


def _q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_spans(transcripts_from_documents(spark, sf_dir))


def _q_extract_spans_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction with the table-detection mode on (-tab analog)."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_from_documents(spark, sf_dir), ExtractConfig(enable_tables=True)
    )


def _q_extract_spans_cl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction with curved-line splitting on (-cl analog): long
    spans subdivide at wide internal gaps."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(enable_line_split=True),
    )


def _q_e2e_extract_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END flagship with a full SQL oracle: transcripts ->
    simple-mode span extraction -> main-content reassembly per
    conversation (text+header spans in reading order, boilerplate/
    tool/separator spans dropped) -> quality gate. The whole journey —
    layout analysis to curated training text — is ONE declarative
    plan: scan -> narrow kernel -> one conv_id exchange -> windows ->
    filter -> reassembly groupBy -> scan-side quality columns."""
    from eynollah_spark.config import ExtractConfig

    spans = extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=1, small_fragment_max_len=0),
    )
    main = (
        spans.filter(F.col("region_type").isin("text", "header"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("reading_order", "text"))
                    ),
                    lambda s: s.getField("text"),
                ),
                "\n",
            ).alias("text"),
        )
    )
    return quality_features(main).select(
        "conv_id",
        "n_spans",
        "quality_score",
        (F.col("quality_score") >= 0.5).alias("keep"),
    )


E2E_SHARDS = 8


def _q_e2e_curate_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data journey as one declarative plan with
    a full SQL oracle: transcripts -> simple-mode extraction ->
    main-content reassembly -> quality gate -> deterministic
    train-split assignment -> training shuffle -> per-shard manifest.
    What a user ships to the trainer, end to end."""
    from eynollah_spark.config import ExtractConfig
    from eynollah_spark.operators.sampling import assign_splits, train_shard_stats

    spans = extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=1, small_fragment_max_len=0),
    )
    main = (
        spans.filter(F.col("region_type").isin("text", "header"))
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("reading_order", "text"))),
                    lambda s: s.getField("text"),
                ),
                "\n",
            ).alias("text")
        )
    )
    gated = (
        quality_features(main)
        .filter(F.col("quality_score") >= 0.5)
        .select("conv_id", "text")
    )
    train = assign_splits(gated, id_col="conv_id", seed=SPLIT_SEED).filter(
        F.col("split") == "train"
    )
    return train_shard_stats(
        train, n_shards=E2E_SHARDS, seed=TRAIN_SHARDS_SEED, id_col="conv_id"
    )


def _q_extract_spans_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship extraction family with an EXACT SQL oracle: in
    'simple mode' (max_columns=1 -> no column splits/deskew effects/
    page-column mode; small_fragment_max_len=0 -> no fragment
    adherence) the kernel degenerates to border strip + fences +
    two-model classify/gate + header vote + bands/region runs +
    reading order + drop-capital merge + conversation windows — all of
    which IS SQL-expressible, giving the driver an independent
    hash-checked signal on the extraction path (the full kernel stays
    gated by the fixture/fuzz pytest suites)."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=1, small_fragment_max_len=0),
    )


def _q_extract_spans_cl_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-mode extraction with curved-line splitting ON (-cl
    analog, separate_lines.py:128-673) and an EXACT SQL oracle: §9L
    subdivides long spans at the smoothed valleys of their own
    char-ink profile (integer-gaussian sigma scaled by span length),
    and in simple mode that is the ONLY non-degenerate machinery on
    top of extract_spans_simple — so the oracle is the simple-mode SQL
    plus a per-span convolution/valley/piece-renumber tail. Runs over
    the GAPPED corpus (planted 3-space valleys) so long spans really
    split. Gives the driver an independent hash-checked signal on the
    -cl path (the full-mode extract_spans_cl row stays
    rows+schema-only)."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_gapped_from_documents(spark, sf_dir),
        ExtractConfig(
            max_columns=1,
            small_fragment_max_len=0,
            enable_line_split=True,
            # lorem 8-token lines top out at ~59 chars; the default 80
            # floor (sized for real page lines) would never arm §9L on
            # this corpus, so the query pins the knob (mirrored in the
            # oracle) to make the split branch demonstrably fire
            line_split_min_len=40,
        ),
    )


def _q_extract_spans_salted_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew-hardened fan-out (X1/X2) run in simple mode and
    hash-checked against the UNSALTED simple oracle — the external-
    engine version of the partition-invariance test: the salted
    repartition + order-preserving merge must be byte-invisible in the
    output, so the oracle SQL is literally extract_spans_simple's."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans_salted(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=1, small_fragment_max_len=0),
        salt_buckets=8,
    )


def _q_page_diags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analyze_pages(transcripts_from_documents(spark, sf_dir))


def _q_extract_spans_tables_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-mode extraction with table detection on (-tab analog):
    table rows classify/group/fuse per SPEC §12; same SQL-expressible
    degeneration as extract_spans_simple otherwise."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(
            max_columns=1, small_fragment_max_len=0, enable_tables=True
        ),
    )


def _q_extract_spans_nofull_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-mode extraction with full_layout off (the reference's
    --no-full-layout): no header/drop-capital detection."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(
            max_columns=1, small_fragment_max_len=0, full_layout=False
        ),
    )


def _q_extract_spans_twocol_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NON-DEGENERATE column path with an EXACT SQL oracle: over
    the fixed-width two-column corpus (transcripts_twocol_from_
    documents) with max_columns=2, the §6 valley machinery (integer-
    gaussian smoothing, relative depth, two-sided prominence, W6
    deepest-first suppression), the §6p page-column mode (union
    profile, band recompute with gutter-crossing separators,
    column-major reading order) and the §6m projection marginalia
    check ALL run — and all of it is SQL-expressible because lead == 0
    everywhere (no §6d deskew) and small_fragment_max_len=0 (no §9
    adherence). Reference: find_num_col utils/__init__.py:363-532;
    return_boxes_of_images_by_order_of_reading_new
    utils/__init__.py:1599-2255; marginals utils/marginals.py:11-252."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_twocol_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=2, small_fragment_max_len=0),
    )


def _q_extract_spans_margin_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_spans_twocol_simple with a NARROW right column
    (cell_l=40, cell_r=12): the emitted right column is <= 25% of the
    page width, at most half as wide as its sibling, and short-lined,
    so the §6m projection-based marginalia relabel fires and
    marginalia regions order after text (reading-order type group 2).
    Reference: utils/marginals.py:11-252."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_twocol_from_documents(spark, sf_dir, cell_l=40, cell_r=12),
        ExtractConfig(max_columns=2, small_fragment_max_len=0),
    )


def _q_extract_spans_shear_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §6d DESKEW path with an EXACT SQL oracle: over the skewed
    two-column corpus (transcripts_shear_from_documents) the integer
    LS-slope gate fires on every >= 3-line block, the shear-grid
    argmax (candidates {0, sls+-0.5, sls+-0.25, sls}, np.rint shift
    vectors mirrored by DuckDB round_even, exact-integer variance
    scores compared by cross-multiplied wp^2) picks the de-indenting
    shear, the §6 valley machinery runs on the SHEARED profile, and
    split emission slices each line at its own shift. Blocks where the
    argmax lands under the threshold or the sheared profile has no
    valley fall back exactly like the kernel (§6d: emit as unsheared).
    Reference: separate_lines.py:1572-1798 (return_deskew_slop),
    utils/__init__.py:363-532 (find_num_col)."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_shear_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=2, small_fragment_max_len=0),
    )


def _q_extract_spans_enhanced_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §1e enhancement pre-pass (M1 analog: run_enhancement,
    reference eynollah.py:381-450,1988-2010) with an EXACT SQL oracle:
    over the padded low-density corpus, flagged pages are rewritten
    (rtrim + blank-run collapse; re-wrap is a provable no-op because
    corpus lines are pre-truncated to the wrap width) before
    classification, and span offsets refer to the enhanced text. The
    re-wrap branch stays gated by the kernel/oracle fixture + fuzz
    suites."""
    from eynollah_spark.config import ExtractConfig

    return extract_spans(
        transcripts_padded_from_documents(spark, sf_dir),
        ExtractConfig(
            max_columns=1, small_fragment_max_len=0, enable_enhancement=True
        ),
    )


def _q_page_diags_enhanced_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEC §11 diagnostics over the enhanced padded corpus: the
    was_enhanced flag (is_image_enhanced analog) is oracle-checked."""
    from eynollah_spark.config import ExtractConfig

    return analyze_pages(
        transcripts_padded_from_documents(spark, sf_dir),
        ExtractConfig(
            max_columns=1, small_fragment_max_len=0, enable_enhancement=True
        ),
    )


def _q_page_diags_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEC §11 diagnostics of the simple-mode kernel, with an exact
    SQL oracle (see _q_extract_spans_simple for the mode)."""
    from eynollah_spark.config import ExtractConfig

    return analyze_pages(
        transcripts_from_documents(spark, sf_dir),
        ExtractConfig(max_columns=1, small_fragment_max_len=0),
    )


# ORDER for the driver's time-budgeted correctness pass (r3 and r4
# each covered ~50 entries before the budget ran out): (1) rows whose
# semantics changed or were added in round 5 — they need a FRESH
# external check; (2) rows the driver has never hash-checked, cheapest
# first (costs from CORRECTNESS_local.json per-query timings); (3)
# previously driver-green rows, cheapest first, with the heavy ANN /
# curation composites last. Cheapest-first maximizes how many of the
# 101 rows fit inside the driver's budget; the local mirror still runs
# every entry each round.
_DRIVER_ORDER = [
    # (1) changed/new in round 5
    "extract_spans_cl_simple", "extract_spans_salted_simple",
    "multimodal_features", "frame_sample", "hard_negatives_ann",
    "hard_negatives_ann_recall", "gopher_rules", "c4_rules",
    "ccnet_buckets",
    # (2) never driver-checked, cheapest first
    "token_stats", "doc_boilerplate_strip", "stratified_sample",
    "pii_scrub", "top_tokens", "chunk_documents",
    "customers_without_orders", "split_counts", "length_percentiles",
    "per_source_quota", "lang_id", "temperature_weights",
    "quality_scores", "dedup_exact", "parts_by_brand",
    "events_json_extract", "supplier_nation_balance",
    "doc_line_classify", "bpe_pair_counts", "source_mix",
    "train_shards", "events_minute_rollup", "priority_with_lineitems",
    "pack_documents", "preference_pairs", "sft_pairs",
    "ngram_diversity", "doc_fingerprint", "bm25_topk",
    "events_sessionize", "contamination_check", "doc_region_runs",
    "sql_top_nations", "doc_pagexml", "otsu_nchars",
    "classifier_filter", "bloom_probe", "order_price_buckets",
    "customer_top_order", "repetition_stats", "session_containment",
    "activity_bands", "dsir_select", "turn_dedup", "lm_quality",
    "streaming_minute_rollup", "incremental_dedup",
    # (3) previously driver-green, cheapest first
    "probe_metadata", "embedding_topk", "page_diags",
    "winnowing_fingerprints", "conv_stats", "hard_negatives",
    "extract_spans_tables", "token_budget_sample", "extract_spans_cl",
    "extract_spans", "extract_spans_salted", "embedding_near_dup",
    "paragraph_dedup", "ann_ivf_topk", "page_diags_enhanced_simple",
    "jaccard_pairs", "extract_spans_enhanced_simple", "top_orders",
    "extract_spans_tables_simple", "extract_spans_nofull_simple",
    "page_diags_simple", "pricing_summary", "minhash_lsh_pairs",
    "cdc_dedup", "region_revenue", "substring_scrub", "ann_lsh_topk",
    "extract_spans_twocol_simple", "extract_spans_margin_simple",
    "extract_spans_shear_simple", "simhash_pairs",
    "e2e_curate_to_shards", "curation_survivors", "e2e_extract_curate",
    "semdedup", "curation_full", "kmeans_embeddings", "pq_codes",
    "near_dup_clusters", "near_dup_keep_best", "curation_v2",
    "curation_funnel", "extract_spans_simple", "ann_pq_topk",
    "ann_recall",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The literal below is the source of truth for ENTRIES (grouped by
    # subsystem for readability); _DRIVER_ORDER above fixes the
    # driver-facing ordering. Any entry missing from the order list
    # falls to the end rather than getting lost.
    base = {
        # the eynollah graft itself. The *_simple family carries exact
        # SQL oracles (SQL-expressible kernel modes: degenerate,
        # two-column §6/§6p, §6m marginalia, §1e enhancement); the
        # full-kernel variants are rows-only here — per-turn equality
        # is gated by the fixture pytest suites
        # (tests/test_extract_e2e.py, tests/test_kernel_oracle.py)
        "extract_spans_simple": _q_extract_spans_simple,
        "extract_spans_cl_simple": _q_extract_spans_cl_simple,
        "extract_spans_salted_simple": _q_extract_spans_salted_simple,
        "extract_spans_twocol_simple": _q_extract_spans_twocol_simple,
        "extract_spans_margin_simple": _q_extract_spans_margin_simple,
        "extract_spans_shear_simple": _q_extract_spans_shear_simple,
        "extract_spans_enhanced_simple": _q_extract_spans_enhanced_simple,
        "extract_spans_tables_simple": _q_extract_spans_tables_simple,
        "extract_spans_nofull_simple": _q_extract_spans_nofull_simple,
        "page_diags_simple": _q_page_diags_simple,
        "page_diags_enhanced_simple": _q_page_diags_enhanced_simple,
        "e2e_extract_curate": _q_e2e_extract_curate,
        "e2e_curate_to_shards": _q_e2e_curate_to_shards,
        "extract_spans": _q_extract_spans,
        "extract_spans_salted": _q_extract_spans_salted,
        "extract_spans_tables": _q_extract_spans_tables,
        "extract_spans_cl": _q_extract_spans_cl,
        "page_diags": _q_page_diags,
        # S2 metadata probe (check_dpi analog)
        "probe_metadata": _q_probe_metadata,
        "conv_stats": _q_conv_stats,
        # round-4 additions (driver-unchecked yet — keep early in order)
        "winnowing_fingerprints": _q_winnowing,
        "token_budget_sample": _q_token_budget_sample,
        "cdc_dedup": _q_cdc_dedup,
        "gopher_rules": _q_gopher_rules,
        "c4_rules": _q_c4_rules,
        "ccnet_buckets": _q_ccnet_buckets,
        "hard_negatives": _q_hard_negatives,
        "hard_negatives_ann": _q_hard_negatives_ann,
        "hard_negatives_ann_recall": _q_hard_negatives_ann_recall,
        # dedup family (driver-unchecked in r03)
        "paragraph_dedup": _q_paragraph_dedup,
        "substring_scrub": _q_substring_scrub,
        "jaccard_pairs": _q_jaccard,
        "minhash_lsh_pairs": _q_minhash,
        "near_dup_clusters": _q_near_dup_clusters,
        "near_dup_keep_best": _q_near_dup_keep_best,
        "simhash_pairs": _q_simhash,
        # curation funnels
        "curation_survivors": _q_curation_survivors,
        "curation_full": _q_curation_full,
        "curation_v2": _q_curation_v2,
        "curation_funnel": _q_curation_funnel,
        # similarity search (ANN paths are md5-deterministic, so even
        # the approximate ones carry exact DuckDB oracles)
        "embedding_topk": _q_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_pq_topk": _q_ann_pq_topk,
        "ann_recall": _q_ann_recall,
        "kmeans_embeddings": _q_kmeans,
        "pq_codes": _q_pq_codes,
        "semdedup": _q_semdedup,
        # multimodal plumbing (decode stubbed; Spark shapes real) — rows-only
        "multimodal_features": _q_multimodal_features,
        "frame_sample": _q_frame_sample,
        # --- everything below was driver-verified green in r03 ---
        # relational operator families (SURVEY §2.2-2.7) on TPC-H-ish tables
        "pricing_summary": relational.pricing_summary,
        "top_orders": relational.top_orders,
        "region_revenue": relational.region_revenue,
        "customer_top_order": relational.customer_top_order,
        "customers_without_orders": relational.customers_without_orders,
        "order_price_buckets": relational.order_price_buckets,
        "priority_with_lineitems": relational.priority_with_lineitems,
        "events_sessionize": relational.events_sessionize,
        "events_minute_rollup": relational.events_minute_rollup,
        "activity_bands": relational.activity_bands,
        "session_containment": relational.session_containment,
        "streaming_minute_rollup": _q_streaming_minute_rollup,
        "sql_top_nations": _q_sql_top_nations,
        "parts_by_brand": _q_parts_by_brand,
        "supplier_nation_balance": _q_supplier_nation_balance,
        "events_json_extract": _q_events_json,
        # extraction-domain analogs with exact SQL oracles (SURVEY §2.8)
        "doc_line_classify": docpage.doc_line_classify,
        "doc_region_runs": docpage.doc_region_runs,
        "doc_boilerplate_strip": docpage.doc_boilerplate_strip,
        "doc_pagexml": _q_doc_pagexml,
        "otsu_nchars": _q_otsu_nchars,
        # text analysis (training-data ops)
        "token_stats": _q_token_stats,
        "lang_id": _q_lang_id,
        "quality_scores": _q_quality,
        "source_mix": _q_source_mix,
        "lm_quality": _q_lm_quality,
        "classifier_filter": _q_classifier_filter,
        "doc_fingerprint": _q_fingerprint,
        "contamination_check": _q_contamination,
        "pii_scrub": _q_pii_scrub,
        "top_tokens": _q_top_tokens,
        "length_percentiles": _q_length_percentiles,
        "pack_documents": _q_pack_documents,
        "repetition_stats": _q_repetition_stats,
        "bm25_topk": _q_bm25_topk,
        "stratified_sample": _q_stratified_sample,
        "per_source_quota": _q_per_source_quota,
        "dsir_select": _q_dsir_select,
        "temperature_weights": _q_temperature_weights,
        "train_shards": _q_train_shards,
        "sft_pairs": _q_sft_pairs,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "ngram_diversity": _q_ngram_diversity,
        "preference_pairs": _q_preference_pairs,
        "split_counts": _q_split_counts,
        "chunk_documents": _q_chunk_documents,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "incremental_dedup": _q_incremental_dedup,
        "bloom_probe": _q_bloom_probe,
        "turn_dedup": _q_turn_dedup,
    }
    ordered = {k: base[k] for k in _DRIVER_ORDER if k in base}
    ordered.update({k: v for k, v in base.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------
_H64 = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


def _h64sql(x: str) -> str:
    return _H64.format(x=x)


# token-wrapped lines CTE (mirror of docpage.doc_lines)
_LINES_CTE = """
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM toks
),
lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
classified AS (
  SELECT doc_id, line_idx, line,
         CAST(len(regexp_split_to_array(line, '\\s+')) AS INT) AS n_tokens,
         CASE WHEN len(regexp_split_to_array(line, '\\s+')) <= 3 THEN 'fragment'
              WHEN {h} % 7 = 0 THEN 'header'
              ELSE 'paragraph' END AS label
  FROM lines
)
""".format(h=_h64sql("line"))

# distinct word-shingle CTE (mirror of dedup.word_shingles, k=3)
_SHINGLES_CTE = """
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - 3, 0) + 1),
             i -> array_to_string(tk[i+1 : i+3], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents)
  ) WHERE length(shingle) > 0
)
"""

def _jaccard_body(src: str = "sh") -> str:
    """sizes/inter/jac CTE block over a named shingle relation."""
    return f"""
sizes AS (SELECT doc_id, count(*) AS n_sh FROM {src} GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, n_common,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""



# doc-frequency cap over the distinct-shingle relation (mirror of
# ngram_jaccard_pairs(max_doc_freq=...); shingles are distinct per doc
# so count(*) per shingle IS the doc frequency)
_SH_CAPPED_CTE = f"""
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {JACCARD_MAX_DF}) ok USING (shingle)
)
"""


def _stop_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _hits_expr(words: tuple[str, ...]) -> str:
    return (
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"t -> t IN ({_stop_in_list(words)}))) AS INT)"
    )


def oracle_sql() -> dict[str, str]:
    all_stop = tuple(sorted({w for ws in LANG_LEXICON.values() for w in ws}))
    n_ws = ("CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) END")
    n_chars = "CAST(length(text) AS INT)"
    n_punct = "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
    n_stop = _hits_expr(all_stop)

    sql: dict[str, str] = {}

    sql["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["top_orders"] = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

    sql["region_revenue"] = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

    sql["customer_top_order"] = """
SELECT o_custkey, top_orderkey, top_price FROM (
  SELECT o_custkey, o_orderkey AS top_orderkey,
         round(o_totalprice, 2) AS top_price,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC) AS rk
  FROM orders)
WHERE rk = 1
"""

    sql["customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

    buckets = ", ".join(
        f"({lo}, {hi}, '{name}')" for lo, hi, name in relational.PRICE_BUCKETS
    )
    sql["order_price_buckets"] = f"""
SELECT bucket, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
JOIN (VALUES {buckets}) b(lo, hi, bucket)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY bucket
"""

    sql["priority_with_lineitems"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
"""

    sql["events_sessionize"] = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL {relational.SESSION_GAP_S} SECOND
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       round(sum(value), 6) AS session_value
FROM s
GROUP BY user_id, session_seq
"""

    sql["events_minute_rollup"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

    sql["sql_top_nations"] = _TOP_NATIONS_SQL

    sql["parts_by_brand"] = """
SELECT p_brand, count(*) AS n_parts,
       round(avg(p_retailprice), 6) AS avg_price,
       max(p_size) AS max_size,
       count(DISTINCT p_type) AS n_types
FROM part GROUP BY p_brand
"""

    sql["supplier_nation_balance"] = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_balance
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""

    sql["events_json_extract"] = """
SELECT event_type, count(*) AS n_events,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
       min(CAST(json_extract(props, '$.k') AS INT)) AS min_k
FROM events GROUP BY event_type
"""

    sql["activity_bands"] = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts,
         CAST(sum(CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL {relational.SESSION_GAP_S} SECOND
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
),
sess AS (
  SELECT date_trunc('second', min(ts)) AS st, date_trunc('second', max(ts)) AS en
  FROM s GROUP BY user_id, session_seq
),
swept AS (
  SELECT st, en,
         max(en) OVER (ORDER BY st, en
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
  FROM sess
),
b AS (
  SELECT st, en,
         CAST(sum(CASE WHEN prev_max_e IS NULL OR st > prev_max_e THEN 1 ELSE 0 END)
              OVER (ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS band_id
  FROM swept
)
SELECT band_id,
       strftime(min(st), '%Y-%m-%d %H:%M:%S') AS band_start,
       strftime(max(en), '%Y-%m-%d %H:%M:%S') AS band_end,
       count(*) AS n_sessions
FROM b GROUP BY band_id
"""

    sql["session_containment"] = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts,
         CAST(sum(CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL {relational.SESSION_GAP_S} SECOND
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
),
sess AS (
  SELECT user_id, session_seq,
         date_trunc('second', min(ts)) AS st, date_trunc('second', max(ts)) AS en
  FROM s GROUP BY user_id, session_seq
)
SELECT a.user_id, a.session_seq,
       CASE WHEN EXISTS (
         SELECT 1 FROM sess b
         WHERE b.st <= a.st AND a.en <= b.en
           AND (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
       ) THEN 1 ELSE 0 END AS has_mother,
       CASE WHEN EXISTS (
         SELECT 1 FROM sess c
         WHERE a.st <= c.st AND c.en <= a.en
           AND (a.user_id <> c.user_id OR a.session_seq <> c.session_seq)
       ) THEN 1 ELSE 0 END AS has_child
FROM sess a
"""

    sql["streaming_minute_rollup"] = """
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["doc_line_classify"] = f"""
WITH {_LINES_CTE}
SELECT doc_id, line_idx, line, n_tokens, label FROM classified
"""

    sql["doc_region_runs"] = f"""
WITH {_LINES_CTE},
runs AS (
  SELECT doc_id, line_idx, line, label,
         CASE WHEN label = lag(label) OVER w THEN 0 ELSE 1 END AS new_run
  FROM classified
  WINDOW w AS (PARTITION BY doc_id ORDER BY line_idx)
),
seq AS (
  SELECT doc_id, line_idx, line, label,
         CAST(sum(new_run) OVER (PARTITION BY doc_id ORDER BY line_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS region_seq
  FROM runs
)
SELECT doc_id,
       printf('region_%04d', region_seq) AS region_id,
       CAST(region_seq - 1 AS INT) AS reading_order,
       min(label) AS label,
       min(line_idx) AS start_line,
       max(line_idx) AS end_line,
       count(*) AS n_lines,
       string_agg(line, chr(10) ORDER BY line_idx) AS region_text
FROM seq
GROUP BY doc_id, region_seq
"""

    sql["doc_pagexml"] = f"""
WITH {_LINES_CTE},
runs AS (
  SELECT doc_id, line_idx, line, label,
         CASE WHEN label = lag(label) OVER w THEN 0 ELSE 1 END AS new_run
  FROM classified
  WINDOW w AS (PARTITION BY doc_id ORDER BY line_idx)
),
seq AS (
  SELECT doc_id, line_idx, line, label,
         CAST(sum(new_run) OVER (PARTITION BY doc_id ORDER BY line_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS region_seq
  FROM runs
),
regions AS (
  SELECT doc_id,
         printf('region_%04d', region_seq) AS region_id,
         CAST(region_seq - 1 AS INT) AS reading_order,
         min(label) AS label,
         string_agg(line, chr(10) ORDER BY line_idx) AS region_text
  FROM seq GROUP BY doc_id, region_seq
),
esc AS (
  SELECT doc_id, region_id, reading_order, label,
         replace(replace(replace(region_text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
           AS etext
  FROM regions
)
SELECT doc_id,
       '<Page>' || '<ReadingOrder><OrderedGroup>'
       || string_agg(printf('<RegionRefIndexed index="%d" regionRef="%s"/>',
                            reading_order, region_id), '' ORDER BY reading_order)
       || '</OrderedGroup></ReadingOrder>'
       || string_agg(printf('<TextRegion id="%s" type="%s"><TextEquiv>%s</TextEquiv></TextRegion>',
                            region_id, label, etext), '' ORDER BY reading_order)
       || '</Page>' AS page_xml
FROM esc GROUP BY doc_id
"""

    sql["otsu_nchars"] = """
WITH hist AS (
  SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c FROM documents GROUP BY 1
),
cum AS (
  SELECT v, c,
         CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n0,
         CAST(sum(v * c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s0
  FROM hist
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt, CAST(sum(v * c) AS BIGINT) AS st FROM hist),
scored AS (
  -- engine-exact form: D^2 / (n0*(nt-n0)) with integer D = s0*nt-st*n0
  -- (one double multiply + one divide on exactly-representable ints)
  SELECT v, n0, nt,
         (CAST(s0 * nt - st * n0 AS DOUBLE)
          * CAST(s0 * nt - st * n0 AS DOUBLE))
           / CAST(n0 * (nt - n0) AS DOUBLE) AS between
  FROM cum, tot WHERE n0 < nt
)
SELECT v AS threshold, between AS between_var,
       n0 AS n_below, nt - n0 AS n_above
FROM scored ORDER BY between DESC, v ASC LIMIT 1
"""

    sql["doc_boilerplate_strip"] = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_raw,
       CAST(length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS INT) AS n_chars_clean,
       substring(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, 40) AS clean_prefix
FROM documents
"""

    sql["token_stats"] = f"""
SELECT doc_id,
       {n_ws} AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
         AS n_bpe_tokens
FROM documents
"""

    hit_cols = ",\n       ".join(
        f"{_hits_expr(words)} AS hits_{lang}" for lang, words in LANG_LEXICON.items()
    )
    sql["lang_id"] = f"""
WITH h AS (
  SELECT doc_id,
       {hit_cols}
  FROM documents
)
SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
       CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
            WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
            WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
            WHEN hits_fr >= hits_es THEN 'fr'
            ELSE 'es' END AS lang_guess
FROM h
"""

    sql["quality_scores"] = f"""
SELECT doc_id,
       {n_chars} AS n_chars,
       {n_ws} AS n_tokens,
       round({n_punct} / greatest({n_chars}, 1), 6) AS punct_ratio,
       round({n_stop} / greatest({n_ws}, 1), 6) AS stopword_ratio,
       round(CASE WHEN {n_ws} > 0
                  THEN ({n_chars} - ({n_ws} - 1)) / {n_ws}
                  ELSE 0.0 END, 6) AS mean_token_len,
       round(least({n_ws} / 100.0, 1.0) * 0.4
             + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
             + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
             6) AS quality_score
FROM documents
"""

    sql["source_mix"] = f"""
WITH smper AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CAST({n_ws} AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
smtot AS (SELECT sum(n_tokens) AS tot FROM smper)
SELECT source, n_docs, n_tokens,
       round(n_tokens / CAST(tot AS DOUBLE), 6) AS token_share
FROM smper CROSS JOIN smtot
"""

    # quantized bigram-LM cross-entropy (mirror of bigram_lm_scores):
    # bits(x) = length(bin(x)); the shared +1 offset of floor(log2)+1
    # cancels in the difference
    sql["lm_quality"] = f"""
WITH lmtk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
),
occ0 AS (
  SELECT doc_id,
         unnest(list_transform(
           range(greatest(len(tk) - 1, 0)),
           i -> struct_pack(bg := tk[i+1] || ' ' || tk[i+2],
                            pre := tk[i+1]))) AS p
  FROM lmtk
),
occ AS (
  SELECT doc_id, {_h64sql("p.bg")} AS bh, {_h64sql("p.pre")} AS ph FROM occ0
),
cb AS (SELECT bh, count(*) AS c_big FROM occ GROUP BY bh),
cp AS (SELECT ph, count(*) AS c_pre FROM occ GROUP BY ph),
vv AS (SELECT count(DISTINCT ph) AS v FROM occ),
sc AS (
  SELECT doc_id,
         length(bin(c_pre + v)) - length(bin(c_big + 1)) AS cost_bits
  FROM occ JOIN cb USING (bh) JOIN cp USING (ph) CROSS JOIN vv
),
lmper AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(avg(cost_bits), 4) AS xent_bits
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, xent_bits
FROM documents d LEFT JOIN lmper USING (doc_id)
"""

    # hashed linear classifier (mirror of hashed_classifier_scores)
    clf_w = _h64sql("('w:' || CAST(i AS VARCHAR))")
    clf_tok = _h64sql("tok")
    sql["classifier_filter"] = f"""
WITH w AS (
  SELECT i AS bucket, ({clf_w} % 2001) - 1000 AS w
  FROM (SELECT unnest(range(65536)) AS i)
),
ctk AS (
  SELECT doc_id, {clf_tok} % 65536 AS bucket
  FROM (SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> length(t) > 0)) AS tok
        FROM documents)
),
cper AS (
  SELECT doc_id, count(*) AS n_toks, round(avg(w.w), 4) AS logit,
         avg(w.w) > 0 AS keep
  FROM ctk JOIN w USING (bucket) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(n_toks, 0) AS n_toks, logit, keep
FROM documents d LEFT JOIN cper USING (doc_id)
"""

    shingle_h = _h64sql("array_to_string(tk[i+1 : i+3], ' ')")
    sql["doc_fingerprint"] = f"""
SELECT doc_id,
       list_min(list_transform(range(greatest(len(tk) - 3, 0) + 1),
                               i -> {shingle_h})) AS fingerprint
FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents)
"""

    win_h = _h64sql(f"array_to_string(tk[i+1 : i+{WINNOW_K}], ' ')")
    sql["winnowing_fingerprints"] = f"""
WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents),
h AS (
  SELECT doc_id,
         list_transform(range(greatest(len(tk) - {WINNOW_K}, 0) + 1),
                        i -> {win_h}) AS hs
  FROM tk
),
wm AS (
  SELECT doc_id, hs,
         list_distinct(list_transform(range(greatest(len(hs) - {WINNOW_W}, 0) + 1),
                                      j -> list_min(hs[j+1 : j+{WINNOW_W}]))) AS fps
  FROM h
)
SELECT doc_id, CAST(len(hs) AS INT) AS n_grams,
       CAST(len(fps) AS INT) AS n_fingerprints,
       list_min(fps) AS min_fp,
       CAST(list_aggregate(fps, 'bit_xor') AS BIGINT) AS fp_xor
FROM wm
"""

    tb_h = _h64sql("(CAST(doc_id AS VARCHAR) || ':tb0')")
    sql["token_budget_sample"] = f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         {tb_h} % 1000000 AS hk
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {TOKEN_BUDGET}
"""

    cdc_h = _h64sql("tk[i]")
    sql["cdc_dedup"] = f"""
WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
bp AS (
  SELECT doc_id, tk,
         list_filter(range(1, len(tk) + 1), i -> ({cdc_h} % {CDC_MOD}) = 0) AS bpos
  FROM tk
),
se AS (
  SELECT doc_id, tk,
         list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
         list_append(bpos, len(tk)) AS ends
  FROM bp
),
ch AS (
  SELECT doc_id,
         md5(array_to_string(tk[starts[j+1] : ends[j+1]], ' ')) AS h,
         ends[j+1] - starts[j+1] + 1 AS nw
  FROM se, UNNEST(range(len(starts))) AS u(j)
  WHERE starts[j+1] <= ends[j+1]
),
sh AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
SELECT ch.doc_id,
       CAST(count(*) AS INT) AS n_chunks,
       CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_dup_chunks,
       round(sum(CASE WHEN sh.h IS NOT NULL THEN nw ELSE 0 END) * 1.0 / sum(nw), 6)
         AS dup_token_frac
FROM ch LEFT JOIN sh ON ch.h = sh.h
GROUP BY ch.doc_id
"""

    sql["hard_negatives"] = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM e WHERE vec_id < {TOPK_QUERY_MAX_ID}),
s AS (
  SELECT q.query_id, q.query_label, e.vec_id, e.label AS neg_label,
         round(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM q, e WHERE e.label <> q.query_label
)
SELECT query_id, query_label, vec_id, neg_label, cosine,
       CAST(rk AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM s)
WHERE rk <= {TOPK_K}
"""

    # multimodal fake path: synthetic_assets(n=64, seed=7) payloads are
    # (md5('7:i') * (4 + i%7))[:64 + (i*13)%256] — rebuilt here hex-digit
    # by hex-digit (the Python slice silently truncates to 16*reps bytes,
    # hence the least()); the stub feature is the byte histogram folded
    # mod FEATURE_DIM and normalized, so sum(bucket*cnt) and the
    # lowest-index argmax are integer-exact in both engines
    _MM_META = """meta AS (
  SELECT i,
         printf('asset%05d', i) AS asset_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
         least(64 + (i * 13) % 256, 16 * (4 + i % 7)) AS plen,
         repeat(md5('7:' || CAST(i AS VARCHAR)), 4 + i % 7) AS hx
  FROM (SELECT CAST(unnest(range(64)) AS INT) AS i)
)"""
    sql["multimodal_features"] = f"""
WITH {_MM_META},
vals AS (
  SELECT m.i,
         ((strpos('0123456789abcdef', substr(m.hx, 2 * b.j + 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(m.hx, 2 * b.j + 2, 1)) - 1)
           % 16 AS bucket
  FROM meta m
  JOIN (SELECT i, CAST(unnest(range(plen)) AS INT) AS j FROM meta) b
    ON b.i = m.i
),
hist AS (
  SELECT i, bucket, count(*) AS cnt FROM vals GROUP BY i, bucket
)
SELECT m.asset_id, m.modality,
       CAST(m.plen AS BIGINT) AS n_bytes,
       round(sum(h.cnt * 1.0 / m.plen), 6) AS feature_sum,
       CAST(sum(h.bucket * h.cnt) AS BIGINT) AS byte_wsum,
       CAST(min(CASE WHEN h.cnt = mx.mx THEN h.bucket END) AS INT)
         AS argmax_bucket
FROM meta m
JOIN hist h USING (i)
JOIN (SELECT i, max(cnt) AS mx FROM hist GROUP BY i) mx ON mx.i = m.i
GROUP BY m.asset_id, m.modality, m.plen
"""

    sql["frame_sample"] = f"""
WITH {_MM_META},
vids AS (SELECT asset_id, plen, i % 10 + 1 AS n FROM meta
         WHERE modality = 'video')
SELECT asset_id,
       CAST(f.j AS INT) AS frame_idx,
       CAST(f.j * 1000 AS BIGINT) AS ts_ms,
       CAST(((f.j + 1) * plen) // n - (f.j * plen) // n AS INT)
         AS frame_bytes
FROM vids, (SELECT asset_id AS aid, unnest(range(n)) AS j FROM vids) f
WHERE f.aid = vids.asset_id
"""

    ccnet_h = _h64sql("(CAST(doc_id AS VARCHAR) || ':ccnet')")
    sql["ccnet_buckets"] = f"""
WITH lmq AS ({sql["lm_quality"]}),
sc AS (SELECT doc_id, xent_bits FROM lmq WHERE n_bigrams > 0),
v AS (SELECT xent_bits, count(*) AS c FROM sc GROUP BY xent_bits),
cum AS (SELECT xent_bits,
               sum(c) OVER (ORDER BY xent_bits
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM v),
nn AS (SELECT count(*) AS n FROM sc),
th AS (SELECT min(CASE WHEN cum >= (n + 2) // 3 THEN xent_bits END) AS t1,
              min(CASE WHEN cum >= (2 * n + 2) // 3 THEN xent_bits END) AS t2
       FROM cum CROSS JOIN nn),
b AS (
  SELECT doc_id, xent_bits,
         CASE WHEN xent_bits <= t1 THEN 'head'
              WHEN xent_bits <= t2 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM sc CROSS JOIN th
)
SELECT doc_id, xent_bits, bucket,
       {ccnet_h} % 1000000 <
         CASE bucket WHEN 'head' THEN 1000000
                     WHEN 'middle' THEN 500000
                     ELSE 100000 END AS kept
FROM b
"""

    gopher_stops = GOPHER_QUERY_STOPS
    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(lt, '{s}') THEN 1 ELSE 0 END)"
        for s in gopher_stops
    )
    sql["gopher_rules"] = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> length(x) > 0) AS toks,
         str_split(text, chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS nw,
         len(lines) AS nl,
         length(text) - length(regexp_replace(text, '#', '', 'g')) AS n_hash,
         (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3.0 AS n_ell,
         len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS bullet,
         len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS ell_end,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
         list_transform(toks, x -> lower(x)) AS lt,
         CASE WHEN len(toks) > 0
              THEN list_aggregate(list_transform(toks, x -> length(x)), 'sum') * 1.0 / len(toks)
              ELSE 0.0 END AS mean_wl
  FROM t
),
s AS (
  SELECT *, ({stop_sum}) AS stop_hits,
         CASE WHEN nw > 0 THEN (n_hash + n_ell) / nw ELSE 0.0 END AS sym_ratio
  FROM m
)
SELECT doc_id,
       CAST(nw AS INT) AS n_words,
       round(mean_wl, 6) AS mean_word_len,
       round(sym_ratio, 6) AS symbol_ratio,
       round(bullet * 1.0 / nl, 6) AS bullet_frac,
       round(ell_end * 1.0 / nl, 6) AS ellipsis_frac,
       round(CASE WHEN nw > 0 THEN alpha * 1.0 / nw ELSE 0.0 END, 6) AS alpha_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       (nw >= 50 AND nw <= 100000 AND mean_wl >= 3 AND mean_wl <= 10
        AND sym_ratio <= 0.1 AND bullet * 1.0 / nl <= 0.9
        AND ell_end * 1.0 / nl <= 0.3 AND nw > 0
        AND alpha * 1.0 / nw >= 0.8 AND stop_hits >= 2) AS gopher_keep
FROM s
"""

    sql["c4_rules"] = f"""
WITH {_LINES_CTE.split('classified AS')[0].rstrip().rstrip(',')},
deco AS (
  SELECT doc_id, line_idx,
         CASE WHEN doc_id % 101 = 0 AND line_idx = 0
              THEN 'lorem ipsum dolor sit amet consectetur.'
              ELSE line
                   || (CASE WHEN line_idx % 3 < 2 THEN '.' ELSE '' END)
                   || (CASE WHEN doc_id % 97 = 0 AND line_idx = 1
                            THEN ' {{' ELSE '' END)
         END AS line
  FROM lines
),
docs2 AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM deco GROUP BY doc_id
),
t AS (
  SELECT doc_id, text, str_split(text, chr(10)) AS lns,
         list_filter(
           str_split(text, chr(10)),
           l -> regexp_matches(l, '[.!?"]\\s*$')
                AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                                    x -> length(x) > 0)) >= 5
         ) AS kept,
         CAST(length(text) - length(regexp_replace(regexp_replace(
              regexp_replace(text, '\\.', '', 'g'), '!', '', 'g'),
              '\\?', '', 'g')) AS INT) AS n_sentences,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         regexp_matches(text, '[{{}}]') AS has_brace
  FROM docs2
)
SELECT doc_id,
       CAST(len(lns) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept_lines,
       n_sentences, has_lorem, has_brace,
       (NOT has_lorem AND NOT has_brace AND n_sentences >= 3
        AND len(kept) > 0) AS c4_keep,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM t
"""

    pc_chars = ", ".join(
        f"round(quantile_cont(n_chars, {p}), 6) AS chars_p{int(p*100)}"
        for p in PCTS
    )
    pc_toks = ", ".join(
        f"round(quantile_cont(nt, {p}), 6) AS tokens_p{int(p*100)}"
        for p in PCTS
    )
    sql["pack_documents"] = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM t
"""

    sql["length_percentiles"] = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs, {pc_chars}, {pc_toks}
FROM (SELECT n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS nt
      FROM documents)
"""

    sql["top_tokens"] = f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents)
WHERE length(token) > 0
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {TOP_TOKENS_K}
"""

    from eynollah_spark.operators.search import BM25_B, BM25_K1

    _tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
        f" t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    _df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    _score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * ({BM25_K1} + 1.0))"
        f" / (tf_{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(BM25_TERMS))
    )
    sql["bm25_topk"] = f"""
WITH tf AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
              AS DOUBLE) AS dl,
         {_tf_cols}
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, {_df_cols}
  FROM tf
)
SELECT doc_id, score, n_tokens FROM (
  SELECT doc_id, round({_score}, 6) AS score, CAST(dl AS BIGINT) AS n_tokens
  FROM tf CROSS JOIN stats)
WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""

    _rate_case = " ".join(
        f"WHEN '{k}' THEN {int(round(v * 1_000_000))}"
        for k, v in sorted(SAMPLE_RATES.items())
    )
    sql["stratified_sample"] = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_h64sql("CAST(doc_id AS VARCHAR)")} % 1000000 <
      CASE lang {_rate_case}
           ELSE {int(round(SAMPLE_DEFAULT_RATE * 1_000_000))} END
"""

    sql["per_source_quota"] = f"""
SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= {QUOTA_PER_SOURCE}
"""

    sql["contamination_check"] = f"""
WITH shd AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - {CONTAM_K}, 0) + 1),
             i -> array_to_string(tk[i+1 : i+{CONTAM_K}], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents)
  ) WHERE length(shingle) > 0
),
shb AS (
  SELECT doc_id AS bench_id, shingle FROM shd
  WHERE doc_id < {CONTAM_BENCH_MAX_ID}
)
SELECT d.doc_id, b.bench_id, count(*) AS n_shared
FROM shd d JOIN shb b USING (shingle)
WHERE d.doc_id <> b.bench_id
GROUP BY d.doc_id, b.bench_id
"""

    from eynollah_spark.operators.text_analysis import EMAIL_RE, IP_RE, PHONE_RE

    sql["pii_scrub"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{IP_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{IP_RE}', '[IP]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g') AS scrubbed,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{IP_RE}', '[IP]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g')) AS INT) AS n_chars_scrubbed
FROM documents
"""

    sql["repetition_stats"] = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
base AS (
  SELECT doc_id,
         CAST(len(tk) AS INT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS INT) AS n_distinct
  FROM t
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(len(tk) - 1),
                               i -> array_to_string(tk[i+1 : i+2], ' '))) AS bg
  FROM t WHERE len(tk) >= 2
),
top AS (
  SELECT doc_id,
         CAST(max(c) AS INT) AS top_bigram_n,
         CAST(sum(c) AS INT) AS n_bigrams,
         round(max(c) / sum(c), 6) AS top_bigram_frac
  FROM (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       round(CASE WHEN b.n_tokens > 0
                  THEN (b.n_tokens - b.n_distinct) / CAST(b.n_tokens AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_token_ratio,
       coalesce(t2.top_bigram_n, 0) AS top_bigram_n,
       coalesce(t2.n_bigrams, 0) AS n_bigrams,
       coalesce(t2.top_bigram_frac, 0.0) AS top_bigram_frac
FROM base b LEFT JOIN top t2 USING (doc_id)
"""

    sql["dedup_exact"] = """
SELECT doc_id, text_hash FROM (
  SELECT doc_id, md5(text) AS text_hash,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn = 1
"""

    # CCNet-style cross-document paragraph dedup: split on blank
    # lines, drop occurrences whose (>= min_len chars) paragraph first
    # appeared in a lower doc_id, reassemble survivors in order.
    # `dropped` is built from IS NOT NULL + <> so it is never NULL
    # (SQL three-valued logic would otherwise leak dropped=NULL rows
    # through the NOT filter).
    sql["paragraph_dedup"] = f"""
WITH {_LINES_CTE},
turns AS (
  SELECT doc_id * 1000 + line_idx // {LINES_PER_TURN} AS doc_id,
         string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM lines GROUP BY doc_id, line_idx // {LINES_PER_TURN}
),
paras AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
        FROM turns)
), hashed AS (
  SELECT doc_id, pos, para,
         CASE WHEN length(para) >= {PARA_MIN_LEN} THEN md5(para) END AS ph
  FROM paras
), stats AS (
  SELECT ph, min(doc_id) AS first_doc
  FROM hashed WHERE ph IS NOT NULL GROUP BY ph
), flagged AS (
  SELECT h.doc_id, h.pos, h.para,
         (s.first_doc IS NOT NULL AND h.doc_id <> s.first_doc) AS dropped
  FROM hashed h LEFT JOIN stats s USING (ph)
)
SELECT doc_id,
       md5(coalesce(
         array_to_string(list(para ORDER BY pos) FILTER (WHERE NOT dropped),
                         chr(10)),
         '')) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM flagged
GROUP BY doc_id
"""


    sql["curation_survivors"] = f"""
WITH q AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           round(least({n_ws} / 100.0, 1.0) * 0.4
                 + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
                 + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
                 6) AS qs
    FROM documents)
  WHERE qs >= 0.5
),
kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q)
  WHERE rn = 1
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - 3, 0) + 1),
             i -> array_to_string(tk[i+1 : i+3], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM kept)
  ) WHERE length(shingle) > 0
),
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {JACCARD_MAX_DF}) ok USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
drop_b AS (
  SELECT DISTINCT doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
)
SELECT doc_id FROM kept
WHERE NOT EXISTS (SELECT 1 FROM drop_b WHERE drop_b.doc_b = kept.doc_id)
"""

    def _curation_sql(
        gate_ctes: str, gate_joins: str, final_select: str | None = None
    ) -> str:
        """curation_full body, parameterized so curation_v2 composes
        extra model-gate CTEs/joins — and the funnel swaps the final
        select — without duplicating the SQL."""
        return f"""
WITH {gate_ctes}rep AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           CAST(len(tk) AS INT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
           CASE WHEN len(tk) >= 2 THEN
             (SELECT max(c) * 1.0 / sum(c) FROM (
                SELECT count(*) AS c FROM (
                  SELECT unnest(list_transform(range(len(tk) - 1),
                         i -> array_to_string(tk[i+1 : i+2], ' '))) AS bg)
                GROUP BY bg))
           ELSE 0.0 END AS top_bg
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents))
  WHERE round(CASE WHEN n_tokens > 0
                   THEN (n_tokens - n_distinct) / CAST(n_tokens AS DOUBLE)
                   ELSE 0.0 END, 6) <= {CURATION_DUP_RATIO_MAX}
    AND round(coalesce(top_bg, 0.0), 6) <= {CURATION_TOP_BG_MAX}
),
pii AS (
  SELECT doc_id FROM documents
  WHERE len(regexp_extract_all(text, '{EMAIL_RE}'))
        + len(regexp_extract_all(text, '{IP_RE}'))
        + len(regexp_extract_all(text, '{PHONE_RE}')) = 0
),
q AS (
  SELECT d.doc_id, d.text FROM (
    SELECT doc_id, text,
           round(least({n_ws} / 100.0, 1.0) * 0.4
                 + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
                 + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
                 6) AS qs
    FROM documents) d
  JOIN rep USING (doc_id) JOIN pii USING (doc_id){gate_joins}
  WHERE d.qs >= 0.5
),
kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q)
  WHERE rn = 1
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - 3, 0) + 1),
             i -> array_to_string(tk[i+1 : i+3], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM kept)
  ) WHERE length(shingle) > 0
),
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {JACCARD_MAX_DF}) ok USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
drop_b AS (
  SELECT DISTINCT doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
),
deduped AS (
  SELECT doc_id, text FROM kept
  WHERE NOT EXISTS (SELECT 1 FROM drop_b WHERE drop_b.doc_b = kept.doc_id)
),
shd8 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - {CONTAM_K}, 0) + 1),
             i -> array_to_string(tk[i+1 : i+{CONTAM_K}], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM deduped)
  ) WHERE length(shingle) > 0
),
shb8 AS (
  SELECT DISTINCT doc_id AS bench_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - {CONTAM_K}, 0) + 1),
             i -> array_to_string(tk[i+1 : i+{CONTAM_K}], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk
          FROM documents WHERE doc_id < {CONTAM_BENCH_MAX_ID})
  ) WHERE length(shingle) > 0
),
contam AS (
  SELECT DISTINCT d.doc_id FROM shd8 d JOIN shb8 b USING (shingle)
  WHERE d.doc_id <> b.bench_id
)
{final_select if final_select is not None else '''SELECT doc_id FROM deduped
WHERE NOT EXISTS (SELECT 1 FROM contam WHERE contam.doc_id = deduped.doc_id)'''}
"""

    sql["curation_full"] = _curation_sql("", "")

    # curation_v2 = curation_full + the two model gates: bigram-LM
    # cross-entropy cap (drops the most surprising/gibberish tail)
    # and the hashed linear classifier keep gate. CTE names are
    # prefixed to avoid colliding with the template's.
    v2_kh = _h64sql("p.bg")
    v2_ph = _h64sql("p.pre")
    v2_wh = _h64sql("('w:' || CAST(i AS VARCHAR))")
    v2_th = _h64sql("tok")
    v2_gates = f"""lmtk2 AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
),
lmocc AS (
  SELECT doc_id, {v2_kh} AS bh, {v2_ph} AS ph FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - 1, 0)),
             i -> struct_pack(bg := tk[i+1] || ' ' || tk[i+2],
                              pre := tk[i+1]))) AS p
    FROM lmtk2)
),
lmcb AS (SELECT bh, count(*) AS c_big FROM lmocc GROUP BY bh),
lmcp AS (SELECT ph, count(*) AS c_pre FROM lmocc GROUP BY ph),
lmvv AS (SELECT count(DISTINCT ph) AS v FROM lmocc),
lmok AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           round(avg(length(bin(c_pre + v)) - length(bin(c_big + 1))), 4)
             AS xent_bits
    FROM lmocc JOIN lmcb USING (bh) JOIN lmcp USING (ph) CROSS JOIN lmvv
    GROUP BY doc_id)
  WHERE xent_bits <= {CURATION_LM_MAX}
),
clfw AS (
  SELECT i AS bucket, ({v2_wh} % 2001) - 1000 AS w
  FROM (SELECT unnest(range(65536)) AS i)
),
clfok AS (
  SELECT doc_id FROM (
    SELECT t.doc_id, avg(clfw.w) AS lg FROM (
      SELECT doc_id, {v2_th} % 65536 AS bucket
      FROM (SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                      t -> length(t) > 0)) AS tok
            FROM documents)) t
    JOIN clfw USING (bucket) GROUP BY t.doc_id)
  WHERE lg > 0
),
"""
    sql["curation_v2"] = _curation_sql(
        v2_gates, " JOIN lmok USING (doc_id) JOIN clfok USING (doc_id)"
    )

    # per-gate survivor counts over the SAME CTE chain — the funnel
    # every curation pipeline reports
    sql["curation_funnel"] = _curation_sql(
        v2_gates,
        " JOIN lmok USING (doc_id) JOIN clfok USING (doc_id)",
        final_select="""SELECT
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_input,
  CAST((SELECT count(*) FROM rep) AS BIGINT) AS n_repetition_ok,
  CAST((SELECT count(*) FROM pii) AS BIGINT) AS n_pii_ok,
  CAST((SELECT count(*) FROM lmok) AS BIGINT) AS n_lm_ok,
  CAST((SELECT count(*) FROM clfok) AS BIGINT) AS n_classifier_ok,
  CAST((SELECT count(*) FROM q) AS BIGINT) AS n_all_gates,
  CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_after_exact,
  CAST((SELECT count(*) FROM deduped) AS BIGINT) AS n_after_near_dup,
  CAST((SELECT count(*) FROM deduped d
        WHERE NOT EXISTS (SELECT 1 FROM contam
                          WHERE contam.doc_id = d.doc_id)) AS BIGINT)
    AS n_final""",
    )

    # exact duplicate-substring scrub (mirror of duplicate_ngram_scrub)
    sub_kh = _h64sql(f"array_to_string(tk[i+1 : i+{SUBSTR_K}], ' ')")
    sql["substring_scrub"] = f"""
WITH sdt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
),
socc AS (
  SELECT doc_id, p.pos AS pos, p.kh AS kh FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - {SUBSTR_K} + 1, 0)),
             i -> struct_pack(pos := i, kh := {sub_kh}))) AS p
    FROM sdt)
),
sstats AS (
  SELECT kh, count(*) AS freq, min(doc_id) AS first_doc FROM socc GROUP BY kh
),
srm AS (
  SELECT doc_id, pos,
         (freq > {SUBSTR_MAXF} AND doc_id <> first_doc) AS rm
  FROM socc JOIN sstats USING (kh)
),
stok AS (
  SELECT doc_id, q.pos AS pos, q.tok AS tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(tk)),
                  i -> struct_pack(pos := i, tok := tk[i+1]))) AS q
    FROM sdt)
),
scov AS (
  SELECT t.doc_id, t.pos, t.tok,
         coalesce(max(CASE WHEN rm THEN 1 ELSE 0 END) OVER (
           PARTITION BY t.doc_id ORDER BY t.pos
           ROWS BETWEEN {SUBSTR_K - 1} PRECEDING AND CURRENT ROW), 0) = 1
           AS cov
  FROM stok t LEFT JOIN srm USING (doc_id, pos)
)
SELECT doc_id, count(*) AS n_tokens,
       sum(CASE WHEN cov THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN NOT cov THEN tok END, ' ' ORDER BY pos),
                '') AS text
FROM scov GROUP BY doc_id
"""

    sql["jaccard_pairs"] = f"""
WITH {_SHINGLES_CTE},
{_SH_CAPPED_CTE},
{_jaccard_body("shc")}
SELECT doc_a, doc_b, n_common, jaccard FROM jac WHERE jaccard >= {JACCARD_T}
"""

    # permutation i = xor-rotate bijection of ONE 60-bit md5 per
    # shingle (mirror of dedup._perm_consts/_perm_mix): the VALUES
    # table carries the baked (i, k, r) constants
    from eynollah_spark.operators.dedup import _perm_consts

    perm_rows = ", ".join(
        f"({i}, {kk}, {rr})" for i, (kk, rr) in enumerate(_perm_consts(MINHASH_N))
    )
    minhash_mix = (
        "((xor(hb, p.k) & ((1::BIGINT << (60 - p.r)) - 1)) << p.r)"
        " | (xor(hb, p.k) >> (60 - p.r))"
    )
    # hb-domain chain (mirror of dedup.shingle_hashes): the distinct,
    # signatures AND the jaccard verification all work over the 60-bit
    # shingle hashes — identical to the Spark plan, which never
    # shuffles shingle strings in the MinHash family
    minhash_ctes = f"""{_SHINGLES_CTE},
mhb AS (
  SELECT DISTINCT doc_id, {_h64sql("shingle")} AS hb FROM sh
),
mh AS (
  SELECT doc_id, p.i, min({minhash_mix}) AS h
  FROM mhb, (VALUES {perm_rows}) AS p(i, k, r)
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {MINHASH_N // MINHASH_BANDS} AS band,
         md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS bsig
  FROM mh GROUP BY doc_id, i // {MINHASH_N // MINHASH_BANDS}
),
bandsc AS (
  SELECT doc_id, band, bsig FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bsig) AS bf FROM bands
  ) WHERE bf <= {MINHASH_MAX_BAND_FREQ}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsc a JOIN bandsc b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
msizes AS (SELECT doc_id, count(*) AS n_sh FROM mhb GROUP BY doc_id),
minter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM mhb a JOIN mhb b ON a.hb = b.hb AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, n_common,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM minter
  JOIN msizes sa ON sa.doc_id = doc_a
  JOIN msizes sb ON sb.doc_id = doc_b
)"""

    sql["minhash_lsh_pairs"] = f"""
WITH {minhash_ctes}
SELECT doc_a, doc_b, jaccard
FROM cand JOIN jac USING (doc_a, doc_b)
WHERE jaccard >= {JACCARD_T}
"""

    # near-dup clustering: connected components over the LSH pair
    # graph — transitive min-label reachability as a recursive CTE,
    # mirroring the Spark iterative label propagation exactly. The
    # cluster CTE block is shared with near_dup_keep_best so the two
    # oracles can never disagree about what a cluster is.
    _cluster_ctes = f"""pairsq AS (
  SELECT doc_a, doc_b FROM cand JOIN jac USING (doc_a, doc_b)
  WHERE jaccard >= {CLUSTER_T}
),
edges AS (
  SELECT CAST(doc_a AS BIGINT) AS s, CAST(doc_b AS BIGINT) AS d FROM pairsq
  UNION ALL
  SELECT CAST(doc_b AS BIGINT), CAST(doc_a AS BIGINT) FROM pairsq
),
reach(node, lab) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
  UNION
  SELECT e.s, r.lab FROM reach r JOIN edges e ON e.d = r.node
),
cl AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)"""

    sql["near_dup_clusters"] = f"""
WITH RECURSIVE {minhash_ctes},
{_cluster_ctes}
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cl
"""

    sql["near_dup_keep_best"] = f"""
WITH RECURSIVE {minhash_ctes},
{_cluster_ctes},
qs AS (
  SELECT doc_id,
         round(least({n_ws} / 100.0, 1.0) * 0.4
               + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
               + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
               6) AS quality_score
  FROM documents
)
SELECT doc_id, cluster_id, quality_score FROM (
  SELECT c.doc_id, c.cluster_id, q.quality_score,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn
  FROM cl c JOIN qs q USING (doc_id))
WHERE rn = 1
"""

    tok_h = _h64sql("tok")
    sql["simhash_pairs"] = f"""
WITH eligible AS (
  -- min-token guard: near-empty docs are excluded from banding
  -- (mirror of simhash_hamming_pairs(min_tokens=...))
  SELECT doc_id, text FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'),
                        t -> length(t) > 0)) >= {SIMHASH_MIN_TOKENS}
),
th AS (
  SELECT doc_id, {tok_h} AS h
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
        FROM eligible)
  WHERE length(tok) > 0
),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, (SELECT unnest(range(60)) AS i)
  GROUP BY doc_id, i
),
sig AS (
  SELECT doc_id,
         bit_or(CASE WHEN v > 0 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END) AS s
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, s,
         (s >> 0) & 65535 AS band0, (s >> 16) & 65535 AS band1,
         (s >> 32) & 65535 AS band2, (s >> 48) & 65535 AS band3
  FROM sig
),
-- per-band hot-bucket cap (mirror of max_band_freq): docs in a band
-- bucket larger than the cap drop out of THAT band's self-join only
bc0 AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band0) AS bf FROM banded) WHERE bf <= {SIMHASH_MAX_BAND_FREQ}),
bc1 AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band1) AS bf FROM banded) WHERE bf <= {SIMHASH_MAX_BAND_FREQ}),
bc2 AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band2) AS bf FROM banded) WHERE bf <= {SIMHASH_MAX_BAND_FREQ}),
bc3 AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band3) AS bf FROM banded) WHERE bf <= {SIMHASH_MAX_BAND_FREQ}),
cand AS (
  SELECT DISTINCT doc_a, doc_b, sa, sb FROM (
    SELECT a.doc_id doc_a, b.doc_id doc_b, a.s sa, b.s sb
    FROM bc0 a JOIN bc0 b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id, a.s, b.s
    FROM bc1 a JOIN bc1 b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id, a.s, b.s
    FROM bc2 a JOIN bc2 b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id, a.s, b.s
    FROM bc3 a JOIN bc3 b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
  )
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_DIST}
"""

    sql["embedding_topk"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {TOPK_QUERY_MAX_ID}),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM q, e WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, CAST(rk AS INT) AS rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM s)
WHERE rk <= {TOPK_K}
"""

    # --- deterministic-ANN oracles: all randomness is md5-derived, so
    # DuckDB reproduces the hyperplanes / centroid picks exactly ---
    _E_CTE = """
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)"""
    # hyperplane component: md5('plane<p>:<j>')[0:8] as a fraction of
    # 16^8, shifted to [-0.5, 0.5) — mirror of similarity.hyperplane
    _PLANE = (
        "CAST(('0x' || substring(md5('plane' || CAST({p} AS VARCHAR) || ':' "
        "|| CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5"
    )
    _COS = (
        "round(list_dot_product({a}.v, {b}.v) / "
        "(sqrt(list_dot_product({a}.v, {a}.v)) * "
        "sqrt(list_dot_product({b}.v, {b}.v))), 6)"
    )

    sql["embedding_near_dup"] = f"""
WITH {_E_CTE},
planes AS (
  SELECT i,
         list_transform(range({EMB_DIM}), j -> {_PLANE.format(p='i')}) AS pv
  FROM (SELECT unnest(range({NEAR_DUP_PLANES})) AS i)
),
buckets AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(e.v, planes.pv) > 0
                       THEN CAST(pow(2, planes.i) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM e, planes GROUP BY e.vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
s AS (
  SELECT id_a, id_b, {_COS.format(a='ea', b='eb')} AS cosine
  FROM pairs JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
)
SELECT id_a, id_b, cosine FROM s WHERE cosine >= {NEAR_DUP_T}
"""

    # multi-probe perturbation masks (mirror of similarity.probe_masks)
    from eynollah_spark.operators.similarity import probe_masks as _probe_masks

    _LSH_MASKS = ", ".join(str(m) for m in _probe_masks(LSH_PLANES, LSH_PROBE_R))
    # full body keeps the per-query candidate count so ann_recall can
    # report the probe cost; the plain topk query projects it away
    _lsh_full = f"""
WITH {_E_CTE},
planes AS (
  SELECT t, i,
         list_transform(range({EMB_DIM}),
                        j -> {_PLANE.format(p=f't * {LSH_PLANES} + i')}) AS pv
  FROM (SELECT unnest(range({LSH_TABLES})) AS t),
       (SELECT unnest(range({LSH_PLANES})) AS i)
),
buckets AS (
  SELECT e.vec_id, planes.t,
         CAST(sum(CASE WHEN list_dot_product(e.v, planes.pv) > 0
                       THEN CAST(pow(2, planes.i) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM e, planes GROUP BY e.vec_id, planes.t
),
qprobe AS (
  SELECT qb.vec_id, qb.t, xor(qb.bucket, CAST(m.mask AS BIGINT)) AS bucket
  FROM buckets qb, (SELECT unnest([{_LSH_MASKS}]) AS mask) m
  WHERE qb.vec_id < {TOPK_QUERY_MAX_ID}
),
cand AS (
  SELECT DISTINCT qp.vec_id AS query_id, cb.vec_id AS vec_id
  FROM qprobe qp JOIN buckets cb ON qp.t = cb.t AND qp.bucket = cb.bucket
  WHERE cb.vec_id <> qp.vec_id
),
s AS (
  SELECT query_id, c.vec_id, {_COS.format(a='qe', b='ce')} AS cosine
  FROM cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ce ON ce.vec_id = c.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rk AS INT) AS rank, n_candidates FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rk,
         count(*) OVER (PARTITION BY query_id) AS n_candidates
  FROM s)
WHERE rk <= {TOPK_K}
"""
    sql["ann_lsh_topk"] = (
        f"SELECT query_id, vec_id, cosine, rank FROM ({_lsh_full})"
    )

    _ivf_full = f"""
WITH {_E_CTE},
h AS (
  SELECT vec_id, v,
         CAST(('0x' || substring(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hk
  FROM e
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INT) AS centroid_id,
         v AS cvec
  FROM (SELECT * FROM h ORDER BY hk, vec_id LIMIT {IVF_CENTROIDS})
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                      c.centroid_id ASC) AS rn
    FROM e, cent c)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.vec_id AS query_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.cvec)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                      c.centroid_id ASC) AS rn
    FROM e q, cent c WHERE q.vec_id < {TOPK_QUERY_MAX_ID})
  WHERE rn <= {IVF_PROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assigned a USING (centroid_id)
  WHERE a.vec_id <> p.query_id
),
s AS (
  SELECT query_id, c.vec_id, {_COS.format(a='qe', b='ce')} AS cosine
  FROM cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ce ON ce.vec_id = c.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rk AS INT) AS rank, n_candidates FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rk,
         count(*) OVER (PARTITION BY query_id) AS n_candidates
  FROM s)
WHERE rk <= {TOPK_K}
"""
    sql["ann_ivf_topk"] = (
        f"SELECT query_id, vec_id, cosine, rank FROM ({_ivf_full})"
    )

    # ann_recall is composed AFTER the pq oracle exists (it embeds the
    # ivf/lsh/pq topk bodies as subqueries) — see below.

    # kmeans_embeddings: Lloyd iterations unrolled. Exactness design
    # mirrors operators/similarity.kmeans_lloyd: 2^20-quantized bigint
    # components, centroids as INTEGER SUM vectors (cosine is
    # scale-invariant so the mean's division never happens), dot/norm
    # folds exact integer -> double conversions are bit-identical.
    def _kcos_d(d: int, av: str = "e.v", bv: str = "c.cvec") -> str:
        return (
            f"coalesce(CAST(list_sum(list_transform(range({d}), j -> {av}[j+1] * {bv}[j+1])) AS DOUBLE)"
            f" / (sqrt(CAST(list_sum(list_transform(range({d}), j -> {av}[j+1] * {av}[j+1])) AS DOUBLE))"
            f" * sqrt(CAST(list_sum(list_transform(range({d}), j -> {bv}[j+1] * {bv}[j+1])) AS DOUBLE))), -2.0)"
        )

    _kcos = _kcos_d(EMB_DIM)

    def _k_assign(src_c: str, src_e: str = "ei", d: int = EMB_DIM) -> str:
        return f"""
  SELECT vec_id, v, centroid_id, cos FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, centroid_id ASC) AS rn
    FROM (SELECT e.vec_id, e.v, c.centroid_id, {_kcos_d(d)} AS cos
          FROM {src_e} e, {src_c} c))
  WHERE rn = 1
"""

    def _k_sums(src_a: str) -> str:
        return f"""
  SELECT centroid_id, list(CAST(s AS BIGINT) ORDER BY j) AS cvec FROM (
    SELECT centroid_id, j, sum(val) AS s FROM (
      SELECT centroid_id, generate_subscripts(v, 1) - 1 AS j, unnest(v) AS val
      FROM {src_a})
    GROUP BY centroid_id, j)
  GROUP BY centroid_id
"""

    sql["kmeans_embeddings"] = f"""
WITH ei AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
ranked AS (
  SELECT vec_id, v,
         CAST(('0x' || substring(md5('kmeans:' || CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM ei
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS centroid_id,
         v AS cvec
  FROM (SELECT * FROM ranked ORDER BY h, vec_id LIMIT {KMEANS_K})
),
a0 AS ({_k_assign('c0')}),
c1 AS ({_k_sums('a0')}),
a1 AS ({_k_assign('c1')}),
c2 AS ({_k_sums('a1')}),
a2 AS ({_k_assign('c2')})
SELECT vec_id, centroid_id,
       CAST(count(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_size,
       round(cos, 6) AS cosine
FROM a2
"""

    # semdedup: the kmeans chain over the copy-augmented corpus, then
    # within-cluster pairwise cosine with the keep-lowest-id rule.
    # Pair cosines reuse the exact int64 quantized folds.
    _pcos = (
        "coalesce(CAST(list_sum(list_transform(range({d}), j -> a.v[j+1] * b.v[j+1])) AS DOUBLE)"
        " / (sqrt(CAST(list_sum(list_transform(range({d}), j -> a.v[j+1] * a.v[j+1])) AS DOUBLE))"
        " * sqrt(CAST(list_sum(list_transform(range({d}), j -> b.v[j+1] * b.v[j+1])) AS DOUBLE))), -2.0)"
    ).format(d=EMB_DIM)
    sql["semdedup"] = f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEMDEDUP_PLANT_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id < {SEMDEDUP_PLANT_N}
),
ei AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT)) AS v
  FROM aug
),
ranked AS (
  SELECT vec_id, v,
         CAST(('0x' || substring(md5('kmeans:' || CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM ei
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS centroid_id,
         v AS cvec
  FROM (SELECT * FROM ranked ORDER BY h, vec_id LIMIT {KMEANS_K})
),
a0 AS ({_k_assign('c0')}),
c1 AS ({_k_sums('a0')}),
a1 AS ({_k_assign('c1')}),
c2 AS ({_k_sums('a1')}),
a2 AS ({_k_assign('c2')}),
pairs AS (
  SELECT b.vec_id AS vec_id, round({_pcos}, 6) AS pc
  FROM a2 a JOIN a2 b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
),
dropped AS (SELECT DISTINCT vec_id FROM pairs WHERE pc >= {SEMDEDUP_T})
SELECT a2.vec_id, a2.centroid_id,
       CAST(count(*) OVER (PARTITION BY a2.centroid_id) AS BIGINT) AS cluster_size,
       (d.vec_id IS NULL) AS kept
FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
"""

    # pq_codes / ann_pq_topk: per-subspace Lloyd chains (the kmeans
    # oracle pattern over 16-dim slices), integer mean reconstruction
    # (one correctly-rounded double division per component), exact
    # int64 cosine folds for recon quality and ADC scores.
    _pq_sub = EMB_DIM // PQ_M
    _pq_blocks = []
    for s in range(PQ_M):
        lo, hi = s * _pq_sub + 1, (s + 1) * _pq_sub
        _pq_blocks.append(f"""
e{s} AS (
  SELECT vec_id,
         list_transform(embedding[{lo}:{hi}],
             x -> CAST(round(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
r{s} AS (
  SELECT vec_id, v,
         CAST(('0x' || substring(md5('kmeans:' || CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM e{s}
),
c0_{s} AS (
  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS centroid_id,
         v AS cvec
  FROM (SELECT * FROM r{s} ORDER BY h, vec_id LIMIT {PQ_K})
),
a0_{s} AS ({_k_assign(f'c0_{s}', f'e{s}', _pq_sub)}),
c1_{s} AS ({_k_sums(f'a0_{s}')}),
a1_{s} AS ({_k_assign(f'c1_{s}', f'e{s}', _pq_sub)}),
c2_{s} AS ({_k_sums(f'a1_{s}')}),
a2_{s} AS ({_k_assign(f'c2_{s}', f'e{s}', _pq_sub)}),
sz_{s} AS (SELECT centroid_id, count(*) AS n FROM a1_{s} GROUP BY 1),
rc_{s} AS (
  SELECT c.centroid_id,
         list_transform(c.cvec,
             x -> CAST(round(CAST(x AS DOUBLE) / z.n) AS BIGINT)) AS rvec
  FROM c2_{s} c JOIN sz_{s} z USING (centroid_id)
),
pc_{s} AS (
  SELECT a.vec_id, a.centroid_id AS code, r.rvec
  FROM a2_{s} a JOIN rc_{s} r USING (centroid_id)
)""")
    _pq_code_cols = ", ".join(f"pc_{s}.code AS code{s}" for s in range(PQ_M))
    _pq_joins = "\n  ".join(
        f"JOIN pc_{s} ON pc_{s}.vec_id = e.vec_id" for s in range(PQ_M)
    )
    _pq_rfull = "pc_0.rvec"
    for s in range(1, PQ_M):
        _pq_rfull = f"list_concat({_pq_rfull}, pc_{s}.rvec)"
    _pq_common = ",".join(_pq_blocks) + f""",
ef AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
recon AS (
  SELECT e.vec_id, {_pq_code_cols}, e.v AS v, {_pq_rfull} AS rvec
  FROM ef e
  {_pq_joins}
)"""

    sql["pq_codes"] = f"""
WITH {_pq_common}
SELECT vec_id, {", ".join(f"code{s}" for s in range(PQ_M))},
       round({_kcos_d(EMB_DIM, 'v', 'rvec')}, 6) AS recon_cosine
FROM recon
"""

    _pq_full = f"""
WITH {_pq_common},
q AS (SELECT vec_id AS query_id, v AS qv FROM ef WHERE vec_id < {TOPK_QUERY_MAX_ID}),
s AS (
  SELECT q.query_id, r.vec_id,
         round({_kcos_d(EMB_DIM, 'q.qv', 'r.rvec')}, 6) AS adc
  FROM recon r, q WHERE r.vec_id <> q.query_id
),
short AS (
  SELECT query_id, vec_id, n_candidates FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc DESC, vec_id ASC) AS srk,
           count(*) OVER (PARTITION BY query_id) AS n_candidates
    FROM s)
  WHERE srk <= {PQ_RERANK}
),
rer AS (
  SELECT sh.query_id, sh.vec_id, sh.n_candidates,
         round({_kcos_d(EMB_DIM, 'q.qv', 'ev.v')}, 6) AS score
  FROM short sh
  JOIN ef ev ON ev.vec_id = sh.vec_id
  JOIN q ON q.query_id = sh.query_id
)
SELECT query_id, vec_id, score, CAST(rk AS INT) AS rank, n_candidates FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS rk
  FROM rer)
WHERE rk <= {TOPK_K}
"""
    sql["ann_pq_topk"] = (
        f"SELECT query_id, vec_id, score, rank FROM ({_pq_full})"
    )

    # ann_recall: recall@k + probe cost of each approximate index vs
    # brute force — composes the three cost-bearing topk bodies as
    # subqueries (mirror of _q_ann_recall: probes_per_query is the
    # knob-derived cells-consulted count, avg_candidates the mean
    # per-query exact-scored candidate count, scan_frac that mean over
    # corpus_size - 1)
    _LSH_PROBES = len(_probe_masks(LSH_PLANES, LSH_PROBE_R)) * LSH_TABLES

    def _recall_arm(name: str, body: str, probes: int) -> str:
        return f"""
SELECT '{name}' AS index_name,
       round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS recall_at_k,
       count(*) AS n_pairs,
       CAST({probes} AS INT) AS probes_per_query,
       (SELECT round(avg(nc), 6) FROM
          (SELECT query_id, max(n_candidates) AS nc FROM ({body})
           GROUP BY query_id)) AS avg_candidates,
       (SELECT round(avg(nc) / ((SELECT count(*) FROM embeddings) - 1), 6) FROM
          (SELECT query_id, max(n_candidates) AS nc FROM ({body})
           GROUP BY query_id)) AS scan_frac
FROM tr LEFT JOIN (SELECT query_id, vec_id FROM ({body})) a
     USING (query_id, vec_id)
"""

    sql["ann_recall"] = f"""
WITH tr AS (SELECT query_id, vec_id FROM ({sql["embedding_topk"]}))
{_recall_arm("ivf", _ivf_full, IVF_PROBE)}
UNION ALL
{_recall_arm("lsh", _lsh_full, _LSH_PROBES)}
UNION ALL
{_recall_arm("pq", _pq_full, PQ_M * PQ_K)}
"""

    # hard_negatives_ann: the _ivf_full chain with labels carried
    # through and the different-label predicate on the candidate
    # stream (below scoring), mirroring similarity.hard_negatives_ann
    _hna_full = f"""
WITH el AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
h AS (
  SELECT vec_id, v,
         CAST(('0x' || substring(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hk
  FROM el
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INT) AS centroid_id,
         v AS cvec
  FROM (SELECT * FROM h ORDER BY hk, vec_id LIMIT {IVF_CENTROIDS})
),
assigned AS (
  SELECT vec_id, label, centroid_id FROM (
    SELECT e.vec_id, e.label, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                      c.centroid_id ASC) AS rn
    FROM el e, cent c)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, query_label, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.label AS query_label, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.cvec)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                      c.centroid_id ASC) AS rn
    FROM el q, cent c WHERE q.vec_id < {TOPK_QUERY_MAX_ID})
  WHERE rn <= {HNA_PROBE}
),
cand AS (
  SELECT p.query_id, p.query_label, a.vec_id, a.label AS neg_label
  FROM probes p JOIN assigned a USING (centroid_id)
  WHERE a.label <> p.query_label
),
s AS (
  SELECT query_id, query_label, c.vec_id, neg_label,
         {_COS.format(a='qe', b='ce')} AS cosine
  FROM cand c JOIN el qe ON qe.vec_id = c.query_id
              JOIN el ce ON ce.vec_id = c.vec_id
)
SELECT query_id, query_label, vec_id, neg_label, cosine,
       CAST(rk AS INT) AS rank, n_candidates FROM (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rk,
         count(*) OVER (PARTITION BY query_id) AS n_candidates
  FROM s)
WHERE rk <= {TOPK_K}
"""
    sql["hard_negatives_ann"] = (
        "SELECT query_id, query_label, vec_id, neg_label, cosine, rank "
        f"FROM ({_hna_full})"
    )
    sql["hard_negatives_ann_recall"] = f"""
WITH tr AS (SELECT query_id, vec_id FROM ({sql["hard_negatives"]}))
SELECT round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS recall_at_k,
       count(*) AS n_pairs,
       CAST({HNA_PROBE} AS INT) AS probes_per_query,
       (SELECT round(avg(nc), 6) FROM
          (SELECT query_id, max(n_candidates) AS nc FROM ({_hna_full})
           GROUP BY query_id)) AS avg_candidates,
       (SELECT round(avg(nc) / ((SELECT count(*) FROM embeddings) - 1), 6) FROM
          (SELECT query_id, max(n_candidates) AS nc FROM ({_hna_full})
           GROUP BY query_id)) AS scan_frac
FROM tr LEFT JOIN (SELECT query_id, vec_id FROM ({_hna_full})) a
     USING (query_id, vec_id)
"""

    # dsir_select: bucket histograms + add-one-smoothed log-likelihood
    # ratio quantized to 1e-6 BIGINTs (exact int64 per-doc folds), md5
    # Gumbel keys, top-N.
    sql["dsir_select"] = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS tk
  FROM documents
),
feats AS (
  SELECT doc_id,
         unnest(list_concat(tk,
           CASE WHEN len(tk) >= 2
                THEN list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2])
                ELSE [] END)) AS feat
  FROM tk
),
fb AS (
  SELECT doc_id, {_h64sql("'dsir:' || feat")} % {DSIR_BUCKETS} AS bucket
  FROM feats
),
tgt AS (
  SELECT fb.doc_id, fb.bucket FROM fb
  JOIN documents d ON fb.doc_id = d.doc_id WHERE d.lang = '{DSIR_TARGET_LANG}'
),
rc AS (SELECT bucket, count(*) AS r FROM fb GROUP BY 1),
tc AS (SELECT bucket, count(*) AS t FROM tgt GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM fb) AS rtot, (SELECT count(*) FROM tgt) AS ttot),
lr AS (
  SELECT bucket,
         CAST(round(1e6 * ln(
             CAST((coalesce(t, 0) + 1) * (rtot + {DSIR_BUCKETS}) AS DOUBLE)
           / CAST((r + 1) * (ttot + {DSIR_BUCKETS}) AS DOUBLE))) AS BIGINT) AS lr
  FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot
),
dc AS (SELECT doc_id, bucket, count(*) AS c FROM fb GROUP BY 1, 2),
lw AS (SELECT doc_id, CAST(sum(c * lr) AS BIGINT) AS logw_e6
       FROM dc JOIN lr USING (bucket) GROUP BY 1),
scored AS (
  SELECT d.doc_id,
         CAST(coalesce(lw.logw_e6, 0) AS BIGINT) AS logw_e6,
         CAST(coalesce(lw.logw_e6, 0) AS BIGINT)
           + CAST(round(1e6 * -ln(-ln(
               (({_h64sql("'gumbel:' || CAST(d.doc_id AS VARCHAR)")} % 1000000) + 0.5)
               / 1e6))) AS BIGINT) AS key_e6
  FROM documents d LEFT JOIN lw ON lw.doc_id = d.doc_id
)
SELECT doc_id, logw_e6, key_e6,
       CAST(row_number() OVER (ORDER BY key_e6 DESC, doc_id ASC) AS INT) AS rank
FROM scored ORDER BY key_e6 DESC, doc_id ASC LIMIT {DSIR_N}
"""

    # shared new-snapshot/index split (mirror of _inc_frames)
    _inc_split = f"""split AS (
  SELECT doc_id, text,
         {_h64sql("'inc:' || CAST(doc_id AS VARCHAR)")} % {INC_MOD} = 0 AS isnew
  FROM documents
),
idx AS (SELECT doc_id, text FROM split WHERE NOT isnew),
newd AS (
  SELECT doc_id, text FROM split WHERE isnew
  UNION ALL
  SELECT doc_id + {INC_EXACT_OFFSET}, text FROM idx WHERE doc_id < {INC_PLANT_N}
  UNION ALL
  SELECT doc_id + {INC_NEAR_OFFSET}, text || '{INC_NEAR_SUFFIX}'
  FROM idx WHERE doc_id < {INC_PLANT_N}
)"""

    # incremental_dedup: asymmetric new-vs-index exact + MinHash-LSH
    # gates over the plant-augmented corpus (mirror of
    # _q_incremental_dedup + operators/dedup.incremental_dedup).
    # Universes, signatures, bands and hot-bucket caps are PER SIDE —
    # same as the operator, so a doc_id shared by both snapshots never
    # merges two versions' shingle sets.
    def _inc_side(p: str, src: str) -> str:
        return f"""{p}sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(greatest(len(tk) - 3, 0) + 1),
             i -> array_to_string(tk[i+1 : i+3], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM {src})
  ) WHERE length(shingle) > 0
),
{p}mhb AS (SELECT DISTINCT doc_id, {_h64sql("shingle")} AS hb FROM {p}sh),
{p}mh AS (
  SELECT doc_id, p.i, min({minhash_mix}) AS h
  FROM {p}mhb, (VALUES {perm_rows}) AS p(i, k, r)
  GROUP BY doc_id, p.i
),
{p}bands AS (
  SELECT doc_id, i // {MINHASH_N // MINHASH_BANDS} AS band,
         md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS bsig
  FROM {p}mh GROUP BY doc_id, i // {MINHASH_N // MINHASH_BANDS}
),
{p}bc AS (
  SELECT doc_id, band, bsig FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bsig) AS bf FROM {p}bands
  ) WHERE bf <= {MINHASH_MAX_BAND_FREQ}
),
{p}sz AS (SELECT doc_id, count(*) AS n_sh FROM {p}mhb GROUP BY doc_id)"""

    sql["incremental_dedup"] = f"""
WITH {_inc_split},
{_inc_side("n", "newd")},
{_inc_side("x", "idx")},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM nbc a JOIN xbc b ON a.band = b.band AND a.bsig = b.bsig
),
vint AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN nmhb a ON a.doc_id = c.doc_a
  JOIN xmhb b ON b.doc_id = c.doc_b AND b.hb = a.hb
  GROUP BY 1, 2
),
near AS (
  SELECT DISTINCT doc_a AS doc_id
  FROM vint
  JOIN nsz sa ON sa.doc_id = vint.doc_a
  JOIN xsz sb ON sb.doc_id = vint.doc_b
  WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= {JACCARD_T}
),
ex AS (
  SELECT DISTINCT n.doc_id FROM newd n
  JOIN (SELECT DISTINCT md5(text) AS th FROM idx) i ON md5(n.text) = i.th
)
SELECT n.doc_id,
       (e.doc_id IS NOT NULL) AS dup_exact,
       (nr.doc_id IS NOT NULL) AS dup_near,
       (e.doc_id IS NULL AND nr.doc_id IS NULL) AS kept
FROM newd n LEFT JOIN ex e USING (doc_id) LEFT JOIN near nr USING (doc_id)
"""

    # bloom_probe: compact Bloom bitmap over index text hashes (32-bit
    # words in BIGINTs; 1<<63 overflows DuckDB's shift), probed by the
    # new snapshot, with the exact gate alongside to expose the FP rate
    perm_bloom = ", ".join(
        f"({i}, {kk}, {rr})"
        for i, (kk, rr) in enumerate(_perm_consts(BLOOM_K))
    )
    sql["bloom_probe"] = f"""
WITH {_inc_split},
ihb AS (SELECT DISTINCT {_h64sql("text")} AS hb FROM idx),
ipos AS (
  SELECT ({minhash_mix}) % {BLOOM_M} AS pos
  FROM ihb, (VALUES {perm_bloom}) AS p(i, k, r)
),
bloom AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM ipos GROUP BY 1
),
nhb AS (SELECT doc_id, {_h64sql("text")} AS hb FROM newd),
npos AS (
  SELECT doc_id, ({minhash_mix}) % {BLOOM_M} AS pos
  FROM nhb, (VALUES {perm_bloom}) AS p(i, k, r)
),
hits AS (
  SELECT doc_id,
         min(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::BIGINT << CAST(pos % 32 AS INT))) <> 0
                  THEN 1 ELSE 0 END) = 1 AS maybe_dup
  FROM (SELECT doc_id, pos, pos // 32 AS word FROM npos) n
  LEFT JOIN bloom b USING (word)
  GROUP BY doc_id
),
bex AS (
  SELECT DISTINCT n.doc_id FROM newd n
  JOIN (SELECT DISTINCT md5(text) AS th FROM idx) i ON md5(n.text) = i.th
)
SELECT h.doc_id, h.maybe_dup,
       (e.doc_id IS NOT NULL) AS dup_exact,
       (h.maybe_dup AND e.doc_id IS NULL) AS false_positive
FROM hits h LEFT JOIN bex e USING (doc_id)
"""

    # turn_dedup: repeated-turn flags over the derived transcripts +
    # planted retries (mirror of _q_turn_dedup / dedup.turn_dedup)
    sql["turn_dedup"] = f"""
WITH {_LINES_CTE},
turns AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // {LINES_PER_TURN} AS INT) AS turn_idx,
         string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM lines GROUP BY doc_id, line_idx // {LINES_PER_TURN}
),
base AS (
  SELECT conv_id, turn_idx, text FROM turns
  UNION ALL
  SELECT conv_id, CAST(turn_idx + {TURN_RETRY_OFFSET} AS INT), text FROM turns
  WHERE CAST(substring(conv_id, 4) AS INT) < {TURN_RETRY_CONVS} AND turn_idx = 0
)
SELECT conv_id, turn_idx,
       CAST(min(turn_idx) OVER (PARTITION BY conv_id, md5(text)) AS INT)
         AS first_turn_idx,
       turn_idx > min(turn_idx) OVER (PARTITION BY conv_id, md5(text))
         AS is_repeat
FROM base
"""

    # temperature_weights: alpha-scaled mixture weights per source
    sql["temperature_weights"] = f"""
WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (
  SELECT sum(pow(CAST(n_docs AS DOUBLE), {TEMP_ALPHA})) AS z,
         CAST(sum(n_docs) AS BIGINT) AS n_tot
  FROM cnt
)
SELECT source, n_docs,
       round(pow(CAST(n_docs AS DOUBLE), {TEMP_ALPHA}) / z, 6) AS weight,
       round((pow(CAST(n_docs AS DOUBLE), {TEMP_ALPHA}) / z)
             / (n_docs / n_tot), 6) AS boost
FROM cnt CROSS JOIN tot
"""

    # train_shards: deterministic training shuffle — per-shard manifest
    shard_key = _h64sql(f"CAST(doc_id AS VARCHAR) || ':{TRAIN_SHARDS_SEED}'")
    sql["train_shards"] = f"""
WITH sh AS (
  SELECT text, {shard_key} AS shuffle_key FROM documents
)
SELECT CAST(shuffle_key % {TRAIN_SHARDS_N} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum({n_ws}) AS BIGINT) AS total_tokens,
       min(shuffle_key) AS min_key,
       max(shuffle_key) AS max_key,
       bit_xor(shuffle_key) AS key_xor
FROM sh GROUP BY 1 ORDER BY 1
"""

    # bpe_pair_counts: one BPE merge step's pair-frequency statistic
    sql["bpe_pair_counts"] = f"""
WITH words AS (
  SELECT w AS word, count(*) AS wc
  FROM documents,
       unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE length(trim(text)) > 0 AND w <> ''
  GROUP BY 1
),
pairs AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, wc
  FROM words, unnest(range(1, length(word))) AS r(i)
  WHERE length(word) >= 2
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS n
FROM pairs GROUP BY 1
ORDER BY n DESC, pair LIMIT {BPE_TOP_N}
"""

    # chunk_documents: overlapping fixed-window chunking of long docs
    sql["chunk_documents"] = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id,
       CAST(st // {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(least({CHUNK_TOKENS}, len(toks) - st) AS INT) AS n_tokens,
       array_to_string(
         toks[CAST(st + 1 AS INT):CAST(st + {CHUNK_TOKENS} AS INT)], ' ')
         AS chunk_text
FROM t, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS r(st)
"""

    # split_counts: deterministic train/val/test assignment histogram
    split_h = _h64sql(f"CAST(doc_id AS VARCHAR) || ':{SPLIT_SEED}'")
    sql["split_counts"] = f"""
WITH h AS (SELECT {split_h} % 1000000 AS hv FROM documents)
SELECT CASE WHEN hv < 980000 THEN 'train'
            WHEN hv < 990000 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM h GROUP BY 1 ORDER BY 1
"""

    # preference_pairs: chosen/rejected construction over planted
    # prompt groups; score is the whitespace token count of response
    score_resp = n_ws.replace("text", "response")
    sql["preference_pairs"] = f"""
WITH cand AS (
  SELECT CAST(doc_id AS VARCHAR) AS conv_id, 0 AS turn_idx,
         'prompt-' || CAST(doc_id % {PREF_GROUPS} AS VARCHAR) AS prompt,
         text AS response,
         md5('prompt-' || CAST(doc_id % {PREF_GROUPS} AS VARCHAR)) AS pk
  FROM documents
),
scored AS (SELECT *, {score_resp} AS score FROM cand),
j AS (
  SELECT a.pk, a.prompt, a.response AS chosen, b.response AS rejected,
         a.score AS chosen_score, b.score AS rejected_score,
         a.score - b.score AS margin,
         a.conv_id AS ac, a.turn_idx AS ati,
         b.conv_id AS bc, b.turn_idx AS bti
  FROM scored a JOIN scored b
    ON a.pk = b.pk AND a.score > b.score AND a.response <> b.response
)
SELECT pk, prompt, chosen, rejected, chosen_score, rejected_score, margin,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT j.*, row_number() OVER (
           PARTITION BY pk ORDER BY margin DESC, ac, ati, bc, bti) AS rnk
  FROM j
)
WHERE rnk <= {PREF_MAX_PER_PROMPT}
"""

    # ngram_diversity: distinct/total n-gram ratio per source
    sql["ngram_diversity"] = f"""
WITH toked AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  SELECT source,
         array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + {NGRAM_DIVERSITY_N - 1}], ' ')
           AS gram
  FROM toked, unnest(range(1, len(toks) - {NGRAM_DIVERSITY_N - 2})) AS r(i)
  WHERE len(toks) >= {NGRAM_DIVERSITY_N}
)
SELECT source,
       count(*) AS n_grams,
       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
       round(count(DISTINCT gram) * 1.0 / count(*), 6) AS diversity
FROM grams GROUP BY 1 ORDER BY 1
"""

    # sft_pairs: frame-bounded prompt assembly per assistant turn
    sql["sft_pairs"] = f"""
WITH {_LINES_CTE},
turns AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // {LINES_PER_TURN} AS INT) AS turn_idx,
         string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM lines GROUP BY doc_id, line_idx // {LINES_PER_TURN}
),
t AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text
  FROM turns
),
p AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(string_agg(role || ': ' || text, chr(10) || chr(10))
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN {SFT_CONTEXT_TURNS} PRECEDING AND 1 PRECEDING),
           '') AS prompt,
         CAST(count(*)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN {SFT_CONTEXT_TURNS} PRECEDING AND 1 PRECEDING)
           AS INT) AS n_context_turns
  FROM t
)
SELECT conv_id, turn_idx, prompt, text AS response, n_context_turns
FROM p WHERE role = 'assistant'
"""

    sql["conv_stats"] = f"""
WITH {_LINES_CTE},
turns AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // {LINES_PER_TURN} AS INT) AS turn_idx,
         string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM lines GROUP BY doc_id, line_idx // {LINES_PER_TURN}
)
SELECT conv_id,
       CAST(count(*) AS INT) AS n_turns,
       CAST(sum(CASE WHEN turn_idx % 2 = 0 THEN 1 ELSE 0 END) AS INT) AS n_user,
       CAST(sum(CASE WHEN turn_idx % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS n_assistant,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 6)
         AS mean_turn_tokens,
       CAST(max(length(text)) AS INT) AS max_turn_chars
FROM turns GROUP BY conv_id
"""

    sql["probe_metadata"] = f"""
WITH {_LINES_CTE},
turns AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // {LINES_PER_TURN} AS INT) AS turn_idx,
         string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM lines GROUP BY doc_id, line_idx // {LINES_PER_TURN}
)
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
       CAST(length(text) AS INT) AS n_chars,
       round(length(text) * 1.0 / len(string_split(text, chr(10))), 6) AS density,
       round(length(text) * 1.0 / len(string_split(text, chr(10))), 6)
         < {PROBE_DENSITY_MIN} AS needs_enhancement,
       'none' AS tool_name,
       '2025-01-01 00:00:00' AS ts_s
FROM turns
"""

    # extract_spans_simple: the FULL simple-mode kernel (SPEC minus the
    # config-disabled column/fragment machinery) in one DuckDB query —
    # border strip (SPEC §2), fences (§3), two-model classify + gate
    # (§4), bands/region runs (§5), header majority vote (§5h),
    # reading order (§7), drop-capital merge (§8), emission (§10) and
    # the conversation-level windows. Constants mirror ExtractConfig
    # defaults: border_scan_lines=3, binarize_retry_threshold=40.0,
    # header_max_len=60, header_vote_max_lines=2, band_blank_gap=2,
    # separator_min_len=3; LINES_PER_TURN=4, TOKENS_PER_LINE=8.
    def _cls_case(c: str, tables: bool = False, full_layout: bool = True) -> str:
        # the table rule sits after every other class, before 'text'
        # (SPEC §12) — mirrored only in the tables variant; the
        # header/dropcap arms only exist in full-layout mode (SPEC §4
        # full-layout gate) — without them the §5h vote (hmass = 0)
        # and the §8 merge (no dropcap regions) are automatic no-ops
        table_arm = (
            "WHEN length({c}) - length(replace({c}, '|', '')) >= 2 "
            "THEN 'table' "
            if tables
            else ""
        )
        layout_arms = (
            "WHEN length({c}) <= 60 AND "
            "regexp_matches({c}, '^(#{1,6} |[A-Z][A-Z0-9_]{2,11}:)') "
            "THEN 'header' "
            "WHEN length({c}) = 1 AND {c} >= 'A' AND {c} <= 'Z' THEN 'dropcap' "
            if full_layout
            else ""
        )
        return (
            "CASE WHEN {c} = '' THEN 'blank' "
            "WHEN length({c}) >= 3 AND regexp_full_match({c}, '[-*=_—–~]+') "
            "THEN 'separator' "
            "WHEN {c} LIKE '[note:%' AND {c} LIKE '%]' THEN 'marginalia' "
            + layout_arms
            + table_arm
            + "ELSE 'text' END"
        ).replace("{c}", c)

    # corpus CTE chains: each must end in a `tl` CTE with columns
    # (conv_id, turn_idx, tli, line). The standard corpus mirrors
    # transcripts_from_documents (8-token wrap, 4 lines/turn); the
    # twocol corpus mirrors transcripts_twocol_from_documents
    # (fixed-width paired columns, 6 wrapped lines/turn with a blank
    # page line inserted after the 3rd).
    _STD_CORPUS = """toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM toks
),
l0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
tl AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // 4 AS INT) AS turn_idx,
         CAST(line_idx % 4 AS INT) AS tli,
         line
  FROM l0
)"""

    # std corpus with the planted 3-space gap after the 4th token of
    # every full 8-token line (transcripts_gapped_from_documents):
    # Spark F.slice(words, 5, size-4) == DuckDB tk5[5:] (both take
    # elements 5..end)
    _GAPPED_CORPUS = """toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM toks
),
l0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
gl AS (
  SELECT doc_id, line_idx,
         CASE WHEN len(str_split(line, ' ')) >= 8
              THEN array_to_string(str_split(line, ' ')[1:4], ' ')
                   || '   '
                   || array_to_string(str_split(line, ' ')[5:], ' ')
              ELSE line END AS line
  FROM l0
),
tl AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(line_idx // 4 AS INT) AS turn_idx,
         CAST(line_idx % 4 AS INT) AS tli,
         line
  FROM gl
)"""

    def _twocol_corpus(cell_l: int, cell_r: int, gap: int) -> str:
        return """toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM toks
),
l0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
twl AS (  -- fixed-width two-column page lines: left cell at 0, right at __RS__
  SELECT doc_id,
         CAST(line_idx // 6 AS INT) AS turn_idx,
         line_idx % 6 AS k,
         CASE WHEN trim(substr(line, __CL__ + 1, __CR__), ' ') = ''
              THEN rtrim(substr(line, 1, __CL__), ' ')
              ELSE rpad(rtrim(substr(line, 1, __CL__), ' '), __RS__, ' ')
                   || trim(substr(line, __CL__ + 1, __CR__), ' ') END AS pline
  FROM l0
),
tl AS (  -- 6 wrapped lines per turn; blank page line inserted at tli=3
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id, turn_idx,
         CAST(CASE WHEN k < 3 THEN k ELSE k + 1 END AS INT) AS tli,
         pline AS line
  FROM twl
  UNION ALL
  SELECT 'doc' || CAST(doc_id AS VARCHAR), turn_idx, 3, ''
  FROM twl GROUP BY doc_id, turn_idx HAVING count(*) > 3
)""".replace("__CL__", str(cell_l)).replace("__CR__", str(cell_r)).replace(
            "__RS__", str(cell_l + gap)
        )

    def _core_prefix(
        corpus: str, tables: bool = False, full_layout: bool = True
    ) -> str:
        return """
WITH """ + corpus + """,
ft AS (
  SELECT conv_id, turn_idx, tli, line,
         length(line) AS rlen,
         length(line) - length(ltrim(line, ' ')) AS lead,
         trim(line, ' ') AS s,
         trim(regexp_replace(line, '[^\\x00-\\x7F]', '', 'g'), ' ') AS bs
  FROM tl
),
ft2 AS (  -- char offset of each line within its turn text (SPEC §0)
  SELECT *,
         coalesce(sum(rlen + 1) OVER (PARTITION BY conv_id, turn_idx ORDER BY tli
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_start
  FROM ft
),
cl AS (
  SELECT *,
         length(s) AS slen,
         CASE WHEN length(s) >= 6 AND s LIKE '===%' AND s LIKE '%===' THEN 1 ELSE 0 END AS is_banner,
         CASE WHEN s LIKE '(c)%' OR s LIKE '©%' OR s LIKE 'Legal:%' THEN 1 ELSE 0 END AS is_footer,
         CASE WHEN s LIKE '```%' THEN 1 ELSE 0 END AS is_fence,
         __CLS_A__ AS cls_a,
         __CLS_B__ AS cls_b
  FROM ft2
),
bd AS (  -- SPEC §2 border: first banner in the first 3 lines
  SELECT conv_id, turn_idx, count(*) AS n,
         coalesce(min(CASE WHEN is_banner = 1 AND tli < 3 THEN tli END) + 1, 0) AS lo0
  FROM cl GROUP BY conv_id, turn_idx
),
bd2 AS (  -- first footer in the trailing window [max(lo, n-3), n)
  SELECT b.conv_id, b.turn_idx, b.n, b.lo0,
         coalesce(min(CASE WHEN c.is_footer = 1
                            AND c.tli >= greatest(b.lo0, b.n - 3) THEN c.tli END),
                  b.n) AS hi0
  FROM bd b JOIN cl c USING (conv_id, turn_idx)
  GROUP BY b.conv_id, b.turn_idx, b.n, b.lo0
),
al AS (
  SELECT c.*, b.lo0, b.hi0 FROM cl c JOIN bd2 b USING (conv_id, turn_idx)
  WHERE c.tli >= b.lo0 AND c.tli < b.hi0
),
fn AS (  -- SPEC §3 fence parity (exclusive prefix of markers)
  SELECT *,
         coalesce(sum(is_fence) OVER (PARTITION BY conv_id, turn_idx ORDER BY tli
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 2
           AS in_fence_before
  FROM al
),
gt AS (  -- SPEC §4 agreement gate
  SELECT conv_id, turn_idx,
         CASE WHEN count(*) FILTER (WHERE is_fence = 0 AND in_fence_before = 0) = 0
              THEN 100.0
              ELSE 100.0 * count(*) FILTER (WHERE is_fence = 0 AND in_fence_before = 0
                                              AND cls_a = cls_b)
                   / count(*) FILTER (WHERE is_fence = 0 AND in_fence_before = 0)
         END AS ratio
  FROM fn GROUP BY conv_id, turn_idx
),
lc0 AS (
  SELECT f.*,
         CASE WHEN f.is_fence = 1 THEN 'fence'
              WHEN f.in_fence_before = 1 THEN 'tool'
              WHEN g.ratio <= 40.0 THEN f.cls_b
              ELSE f.cls_a END AS cls
  FROM fn f JOIN gt g USING (conv_id, turn_idx)
),
lc AS (  -- SPEC §12 table-separator fusion (no-op without 'table'
         -- classes): a separator directly between two table lines is
         -- absorbed into the table BEFORE band counting
  SELECT * REPLACE (
    CASE WHEN cls = 'separator'
          AND lag(cls) OVER w = 'table' AND lead(cls) OVER w = 'table'
         THEN 'table' ELSE cls END AS cls)
  FROM lc0
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY tli)
),
b1 AS (  -- SPEC §5 bands: blank-run length via last-non-blank barrier
  SELECT *,
         tli - coalesce(max(CASE WHEN cls <> 'blank' THEN tli END)
                        OVER (PARTITION BY conv_id, turn_idx ORDER BY tli
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        lo0 - 1) AS run_len
  FROM lc
),
b2 AS (
  SELECT *,
         CASE WHEN (cls = 'blank' AND run_len = 2) OR cls = 'separator'
              THEN 1 ELSE 0 END AS band_event
  FROM b1
),
b3 AS (
  SELECT *,
         coalesce(sum(band_event) OVER (PARTITION BY conv_id, turn_idx ORDER BY tli
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS band
  FROM b2
),
rg AS (  -- SPEC §5 region runs; header/dropcap/separator are singletons
  SELECT *,
         CASE WHEN cls IN ('blank', 'fence') THEN 0
              WHEN lag(cls) OVER (PARTITION BY conv_id, turn_idx ORDER BY tli) = cls
                   AND cls IN ('text', 'tool', 'marginalia', 'table') THEN 0
              ELSE 1 END AS new_region
  FROM b3
),
rr AS (
  SELECT *,
         sum(new_region) OVER (PARTITION BY conv_id, turn_idx ORDER BY tli
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM rg
),
regions AS (
  SELECT conv_id, turn_idx, rid,
         min(cls) AS rcls, min(band) AS band, min(tli) AS first_tli,
         count(*) AS n_lines, sum(slen) AS allmass, max(slen) AS maxlen,
         sum(CASE WHEN cls_b = 'header' THEN slen ELSE 0 END) AS hmass
  FROM rr WHERE cls NOT IN ('blank', 'fence')
  GROUP BY conv_id, turn_idx, rid
),
voted AS (  -- SPEC §5h per-region header majority vote (J8)
  SELECT *,
         CASE WHEN rcls = 'text' AND n_lines <= 2 AND maxlen <= 60
                   AND hmass > 0 AND 2 * hmass >= allmass
              THEN 'header' ELSE rcls END AS vcls
  FROM regions
),
rspans AS (  -- SPEC §10 span candidates: non-empty stripped lines
  SELECT conv_id, turn_idx, rid, tli, s, slen,
         line_start + lead AS cs
  FROM rr WHERE cls NOT IN ('blank', 'fence') AND slen > 0
)""".replace("__CLS_A__", _cls_case("s", tables, full_layout)).replace(
            "__CLS_B__", _cls_case("bs", tables, full_layout)
        )

    # the simple-family tail: no column machinery (max_columns=1), so
    # the ordered-region -> dropcap-merge -> emission chain runs on the
    # regions themselves
    _SIMPLE_TAIL = """,
rne AS (  -- SPEC §7 reading order over non-empty regions
  SELECT v.*,
         row_number() OVER (PARTITION BY v.conv_id, v.turn_idx
             ORDER BY v.band,
                      CASE v.vcls WHEN 'header' THEN 0 WHEN 'marginalia' THEN 2
                                  WHEN 'separator' THEN 3 ELSE 1 END,
                      v.first_tli) AS ord
  FROM voted v
  WHERE EXISTS (SELECT 1 FROM rspans sp
                WHERE sp.conv_id = v.conv_id AND sp.turn_idx = v.turn_idx
                  AND sp.rid = v.rid)
),
dc AS (  -- SPEC §8 drop-capital merge over adjacent ordered regions.
         -- NOTE: through the 8-token transcript wrap a dropcap line
         -- can only be a doc's FINAL line (shorter-than-8-token lines
         -- exist nowhere else), so it always sorts last in its band
         -- and the merge branch cannot fire on wrap-derived corpora —
         -- it is implemented for spec completeness; the kernel-side
         -- merge is gated by tests/test_kernel_oracle.py fixtures
  SELECT *,
         lead(vcls) OVER w AS nx_cls, lead(band) OVER w AS nx_band,
         lag(vcls) OVER w AS pv_cls, lag(band) OVER w AS pv_band,
         lag(rid) OVER w AS pv_rid
  FROM rne WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ord)
),
surv AS (
  SELECT *,
         CASE WHEN vcls = 'text' AND pv_cls = 'dropcap' AND pv_band = band
              THEN pv_rid END AS dc_rid,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord) - 1
           AS region_seq
  FROM dc
  -- IS NOT TRUE: a trailing dropcap has NULL lead() values and must
  -- survive (NOT(NULL) would filter it)
  WHERE (vcls = 'dropcap' AND nx_cls = 'text' AND nx_band = band) IS NOT TRUE
),
sp1 AS (
  SELECT s.conv_id, s.turn_idx, r.region_seq, r.ord, r.dc_rid, s.tli,
         CASE r.vcls WHEN 'dropcap' THEN 'drop-capital' ELSE r.vcls END
           AS region_type,
         row_number() OVER (PARTITION BY s.conv_id, s.turn_idx, r.rid
                            ORDER BY s.tli) AS line_in_region,
         s.cs, s.cs + s.slen AS ce, s.s AS stext
  FROM rspans s JOIN surv r USING (conv_id, turn_idx, rid)
),
patched AS (
  SELECT p.conv_id, p.turn_idx, p.region_seq, p.region_type, p.ord, p.tli,
         CASE WHEN p.line_in_region = 1 AND p.dc_rid IS NOT NULL
              THEN d.cs ELSE p.cs END AS char_start,
         p.ce AS char_end,
         CASE WHEN p.line_in_region = 1 AND p.dc_rid IS NOT NULL
              THEN d.s || p.stext ELSE p.stext END AS text
  FROM sp1 p
  LEFT JOIN rspans d ON d.conv_id = p.conv_id AND d.turn_idx = p.turn_idx
                    AND d.rid = p.dc_rid
),
numbered AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord, tli) - 1
           AS span_idx
  FROM patched
),
withreg AS (
  SELECT *,
         dense_rank() OVER (PARTITION BY conv_id ORDER BY turn_idx, region_seq)
           AS region_num
  FROM numbered
)"""

    def _simple_prefix(tables: bool = False, full_layout: bool = True) -> str:
        return _core_prefix(_STD_CORPUS, tables, full_layout) + _SIMPLE_TAIL

    _spans_final = """
SELECT conv_id,
       CAST(turn_idx AS INT) AS turn_idx,
       CAST(span_idx AS INT) AS span_idx,
       region_type,
       CAST(region_seq AS INT) AS region_seq,
       CAST(char_start AS INT) AS char_start,
       CAST(char_end AS INT) AS char_end,
       text,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, span_idx)
            - 1 AS INT) AS reading_order,
       printf('region_%04d', region_num) AS region_id,
       printf('region_%04d_line_%04d', region_num,
              row_number() OVER (PARTITION BY conv_id, turn_idx, region_seq
                                 ORDER BY span_idx)) AS line_id
FROM withreg
"""
    sql["extract_spans_simple"] = _simple_prefix(False) + _spans_final

    # extract_spans_salted_simple: the salted fan-out must be
    # byte-invisible in the output, so its oracle IS the unsalted
    # simple-mode SQL — a hash mismatch here means the salt/merge
    # machinery leaked into results
    sql["extract_spans_salted_simple"] = sql["extract_spans_simple"]

    # extract_spans_cl_simple: §9L curved-line splitting on top of the
    # simple-mode chain (separate_lines.py:128-673 analog). Long text
    # spans (L >= 80) subdivide at space runs (width >= 2) whose
    # integer-gaussian-smoothed ink depth is <= 40% of the span's
    # profile max with two-sided prominence >= 50%; sigma scales with
    # span length: sigma = min(1 + L // 160, 8). The weights table is
    # generated by the SAME integerized-kernel function the Spark
    # kernel uses, so the convolution is bit-identical by construction.
    from eynollah_spark.kernel.textpage import _gauss_weights

    _clw_rows = []
    for _s in range(1, 9):
        _r, _wts = _gauss_weights(1.0 * _s)
        for _k in range(-_r, _r + 1):
            _clw_rows.append(f"({_s},{_k},{_wts[_k + _r]})")
    _CL_TAIL = """,
clbase AS MATERIALIZED (  -- pin the simple-mode chain to ONE
  SELECT * FROM withreg   -- execution: the tail references it 3x and
),                        -- DuckDB would re-run the inlined windows
clsp AS MATERIALIZED (  -- SPEC §9L candidates (min_len knob = 40)
  SELECT conv_id, turn_idx, span_idx, text, length(text) AS L,
         least(1 + length(text) // 160, 8) AS sig
  FROM clbase WHERE region_type = 'text' AND length(text) >= 40
),
clw(sig, k, wt) AS (VALUES __CLW__),
clink AS MATERIALIZED (  -- per-char ink mask of each candidate span
  SELECT conv_id, turn_idx, span_idx, sig, pos,
         CASE WHEN substr(text, CAST(pos + 1 AS INT), 1) <> ' '
              THEN 1 ELSE 0 END AS ink
  FROM (SELECT *, unnest(range(L)) AS pos FROM clsp)
),
clsm AS MATERIALIZED (  -- zero-padded integer gaussian convolution
  SELECT a.conv_id, a.turn_idx, a.span_idx, a.pos,
         coalesce(sum(w.wt * b.ink), 0) AS sm
  FROM clink a
  JOIN clw w ON w.sig = a.sig
  LEFT JOIN clink b
    ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx
   AND b.span_idx = a.span_idx AND b.pos = a.pos + w.k
  GROUP BY a.conv_id, a.turn_idx, a.span_idx, a.pos
),
clpm AS MATERIALIZED (
  SELECT conv_id, turn_idx, span_idx, pos, sm,
         max(sm) OVER (PARTITION BY conv_id, turn_idx, span_idx) AS max_s,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, span_idx
                  ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS lmax,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, span_idx
                  ORDER BY pos
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
           AS rmax
  FROM clsm
),
clruns AS (  -- maximal space runs of width >= 2 (line_split_gap)
  SELECT conv_id, turn_idx, span_idx, min(pos) AS a, max(pos) AS b
  FROM (SELECT i.*, pos - row_number() OVER (
               PARTITION BY conv_id, turn_idx, span_idx ORDER BY pos) AS grp
        FROM clink i WHERE ink = 0)
  GROUP BY conv_id, turn_idx, span_idx, grp
  HAVING count(*) >= 2
),
clq AS MATERIALIZED (  -- depth <= 40% of max_s, prominence >= 50%
  SELECT d.conv_id, d.turn_idx, d.span_idx, d.a, d.b
  FROM (SELECT r.conv_id, r.turn_idx, r.span_idx, r.a, r.b,
               min(s.sm) AS depth
        FROM clruns r JOIN clsm s
          ON s.conv_id = r.conv_id AND s.turn_idx = r.turn_idx
         AND s.span_idx = r.span_idx AND s.pos BETWEEN r.a AND r.b
        GROUP BY r.conv_id, r.turn_idx, r.span_idx, r.a, r.b) d
  JOIN clpm pa ON pa.conv_id = d.conv_id AND pa.turn_idx = d.turn_idx
              AND pa.span_idx = d.span_idx AND pa.pos = d.a
  JOIN clpm pb ON pb.conv_id = d.conv_id AND pb.turn_idx = d.turn_idx
              AND pb.span_idx = d.span_idx AND pb.pos = d.b
  WHERE pa.max_s > 0 AND d.depth * 100 <= 40 * pa.max_s
    AND least(pa.lmax, pb.rmax) * 100 >= 50 * pa.max_s
),
clpieces AS MATERIALIZED (  -- complement segments of the cut runs
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, turn_idx, span_idx
                            ORDER BY ps) AS pseq,
         count(*) OVER (PARTITION BY conv_id, turn_idx, span_idx)
           AS npieces
  FROM (
    SELECT conv_id, turn_idx, span_idx,
           coalesce(lag(b) OVER (PARTITION BY conv_id, turn_idx, span_idx
                                 ORDER BY a) + 1, 0) AS ps,
           a AS pe
    FROM clq
    UNION ALL
    SELECT q.conv_id, q.turn_idx, q.span_idx,
           max(q.b) + 1 AS ps, min(t.L) AS pe
    FROM clq q JOIN clsp t USING (conv_id, turn_idx, span_idx)
    GROUP BY q.conv_id, q.turn_idx, q.span_idx
  ) WHERE ps < pe
),
clrows AS (  -- splice pieces in place of spans that split >= 2 ways
  SELECT conv_id, turn_idx, region_seq, region_type, char_start,
         char_end, text, span_idx AS osi, 0 AS pseq, region_num
  FROM clbase w
  WHERE NOT EXISTS (SELECT 1 FROM clpieces p
                    WHERE p.conv_id = w.conv_id
                      AND p.turn_idx = w.turn_idx
                      AND p.span_idx = w.span_idx AND p.npieces >= 2)
  UNION ALL
  SELECT w.conv_id, w.turn_idx, w.region_seq, w.region_type,
         w.char_start + p.ps AS char_start,
         w.char_start + p.pe AS char_end,
         substr(w.text, CAST(p.ps + 1 AS INT),
                CAST(p.pe - p.ps AS INT)) AS text,
         w.span_idx AS osi, p.pseq, w.region_num
  FROM clbase w JOIN clpieces p USING (conv_id, turn_idx, span_idx)
  WHERE p.npieces >= 2
),
clnum AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY osi, pseq) - 1 AS span_idx
  FROM clrows
)
SELECT conv_id,
       CAST(turn_idx AS INT) AS turn_idx,
       CAST(span_idx AS INT) AS span_idx,
       region_type,
       CAST(region_seq AS INT) AS region_seq,
       CAST(char_start AS INT) AS char_start,
       CAST(char_end AS INT) AS char_end,
       text,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, span_idx)
            - 1 AS INT) AS reading_order,
       printf('region_%04d', region_num) AS region_id,
       printf('region_%04d_line_%04d', region_num,
              row_number() OVER (PARTITION BY conv_id, turn_idx, region_seq
                                 ORDER BY span_idx)) AS line_id
FROM clnum
""".replace("__CLW__", ", ".join(_clw_rows))
    sql["extract_spans_cl_simple"] = (
        _core_prefix(_GAPPED_CORPUS, False, True) + _SIMPLE_TAIL + _CL_TAIL
    )

    # extract_spans / _salted / _tables (FULL default config): on the
    # std corpus the §6 column machinery is provably vacuous (token
    # joins leave no >= 2-space runs, so the gutter quick-reject fires
    # on every block; leads are all 0, so the §6d slope gate never
    # arms) — the only semantics beyond the simple chain is the §9
    # overlap-argmax small-fragment adherence
    # (small_fragment_max_len = 2), reproduced here: each fragment
    # merges into the big span with maximal column overlap (ties:
    # index-nearest, then earliest big), fragment-only regions keep
    # their spans, then spans renumber. This hash-checks the
    # PRODUCTION-default extraction path against an independent
    # engine; reference analog utils/__init__.py:923-948 (the pairwise
    # small-x-big overlap matrix in 1-D).
    _ADH_TAIL = """,
adsp AS MATERIALIZED (  -- spans + §9 column ranges + intra-region ordinal
  SELECT w.conv_id, w.turn_idx, w.region_seq, w.region_type,
         w.region_num, w.span_idx, w.char_start, w.char_end, w.text,
         w.char_start - f.line_start AS fa,
         w.char_start - f.line_start + length(w.text) AS fe,
         length(w.text) AS slen2,
         row_number() OVER (PARTITION BY w.conv_id, w.turn_idx, w.region_seq
                            ORDER BY w.span_idx) - 1 AS j
  FROM withreg w JOIN ft2 f
    ON f.conv_id = w.conv_id AND f.turn_idx = w.turn_idx AND f.tli = w.tli
),
adfr AS MATERIALIZED (
  SELECT * FROM adsp WHERE region_type = 'text' AND slen2 <= 2
),
adbg AS MATERIALIZED (
  SELECT * FROM adsp WHERE region_type = 'text' AND slen2 > 2
),
adas AS MATERIALIZED (  -- frag -> big: max overlap, nearest, earliest
  SELECT conv_id, turn_idx, region_seq, fj, bj FROM (
    SELECT fr.conv_id, fr.turn_idx, fr.region_seq, fr.j AS fj, bg.j AS bj,
           row_number() OVER (
             PARTITION BY fr.conv_id, fr.turn_idx, fr.region_seq, fr.j
             ORDER BY greatest(least(fr.fe, bg.fe)
                               - greatest(fr.fa, bg.fa), 0) DESC,
                      abs(fr.j - bg.j) ASC, bg.j ASC) AS rn
    FROM adfr fr JOIN adbg bg
      ON bg.conv_id = fr.conv_id AND bg.turn_idx = fr.turn_idx
     AND bg.region_seq = fr.region_seq)
  WHERE rn = 1
),
admg AS (  -- per big: prepend pre-fragments, append suf-fragments
  SELECT b.conv_id, b.turn_idx, b.region_seq, b.region_type,
         b.region_num, b.span_idx,
         coalesce(p.pcs, b.char_start) AS char_start,
         coalesce(s.sce, b.char_end) AS char_end,
         CASE WHEN p.ptext IS NOT NULL THEN p.ptext || ' ' ELSE '' END
           || b.text
           || CASE WHEN s.stext IS NOT NULL THEN ' ' || s.stext
              ELSE '' END AS text
  FROM adbg b
  LEFT JOIN (
    SELECT a.conv_id, a.turn_idx, a.region_seq, a.bj,
           string_agg(f.text, ' ' ORDER BY f.j) AS ptext,
           arg_min(f.char_start, f.j) AS pcs
    FROM adas a JOIN adfr f
      ON f.conv_id = a.conv_id AND f.turn_idx = a.turn_idx
     AND f.region_seq = a.region_seq AND f.j = a.fj
    WHERE a.fj < a.bj
    GROUP BY a.conv_id, a.turn_idx, a.region_seq, a.bj
  ) p ON p.conv_id = b.conv_id AND p.turn_idx = b.turn_idx
     AND p.region_seq = b.region_seq AND p.bj = b.j
  LEFT JOIN (
    SELECT a.conv_id, a.turn_idx, a.region_seq, a.bj,
           string_agg(f.text, ' ' ORDER BY f.j) AS stext,
           arg_max(f.char_end, f.j) AS sce
    FROM adas a JOIN adfr f
      ON f.conv_id = a.conv_id AND f.turn_idx = a.turn_idx
     AND f.region_seq = a.region_seq AND f.j = a.fj
    WHERE a.fj > a.bj
    GROUP BY a.conv_id, a.turn_idx, a.region_seq, a.bj
  ) s ON s.conv_id = b.conv_id AND s.turn_idx = b.turn_idx
     AND s.region_seq = b.region_seq AND s.bj = b.j
),
adout AS (
  SELECT conv_id, turn_idx, region_seq, region_type, region_num,
         span_idx, char_start, char_end, text
  FROM adsp WHERE region_type <> 'text'
  UNION ALL
  SELECT conv_id, turn_idx, region_seq, region_type, region_num,
         span_idx, char_start, char_end, text
  FROM admg
  UNION ALL
  SELECT f.conv_id, f.turn_idx, f.region_seq, f.region_type,
         f.region_num, f.span_idx, f.char_start, f.char_end, f.text
  FROM adfr f  -- fragment-only regions keep their spans
  WHERE NOT EXISTS (SELECT 1 FROM adbg b
                    WHERE b.conv_id = f.conv_id
                      AND b.turn_idx = f.turn_idx
                      AND b.region_seq = f.region_seq)
),
adnum AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY span_idx) - 1 AS nsi
  FROM adout
)"""
    _ADH_FINAL = """
SELECT conv_id,
       CAST(turn_idx AS INT) AS turn_idx,
       CAST(nsi AS INT) AS span_idx,
       region_type,
       CAST(region_seq AS INT) AS region_seq,
       CAST(char_start AS INT) AS char_start,
       CAST(char_end AS INT) AS char_end,
       text,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, nsi)
            - 1 AS INT) AS reading_order,
       printf('region_%04d', region_num) AS region_id,
       printf('region_%04d_line_%04d', region_num,
              row_number() OVER (PARTITION BY conv_id, turn_idx, region_seq
                                 ORDER BY nsi)) AS line_id
FROM adnum
"""
    sql["extract_spans"] = _simple_prefix(False) + _ADH_TAIL + _ADH_FINAL
    # the salted fan-out must be byte-invisible in full mode too
    sql["extract_spans_salted"] = sql["extract_spans"]
    # tables mode: the '|'-rule classification arm is active (and
    # vacuous on this corpus — no pipe lines), adherence identical
    sql["extract_spans_tables"] = _simple_prefix(True) + _ADH_TAIL + _ADH_FINAL
    # -cl in FULL mode: no std-corpus span reaches the 80-char split
    # floor, so the per-page -cl walk must equal the fast-path output
    # exactly — an external check that the two emission paths agree
    sql["extract_spans_cl"] = sql["extract_spans"]

    # twocol tail: the full SPEC §6/§6p/§6m column machinery in SQL.
    # Valid because on the twocol corpus lead == 0 on every line (§6d
    # deskew can never fire) and the query sets max_columns=2 (W6
    # keeps kmax = 1 valley; the 2-entry §6m sibling width is
    # total - own) and small_fragment_max_len=0 (no §9 adherence).
    _TWOCOL_TAIL = """,
txtl AS (  -- lines of post-vote TEXT regions (profiles + split emission)
  SELECT r.conv_id, r.turn_idx, r.rid, r.tli, r.line, r.rlen, r.line_start,
         v.n_lines
  FROM rr r JOIN voted v USING (conv_id, turn_idx, rid)
  WHERE v.vcls = 'text' AND r.cls NOT IN ('blank', 'fence')
),
scopel AS (  -- SPEC §6 per-block scopes (>= min_block_lines=3) + §6p page scope
  SELECT conv_id, turn_idx, 'b' AS sc, rid AS sk, line, rlen
  FROM txtl WHERE n_lines >= 3
  UNION ALL
  SELECT conv_id, turn_idx, 'p' AS sc, 0 AS sk, line, rlen FROM txtl
),
sw AS (
  SELECT conv_id, turn_idx, sc, sk, max(rlen) AS w FROM scopel
  GROUP BY conv_id, turn_idx, sc, sk
),
sink AS (  -- ink profile: # scope lines with a non-space char at pos
  SELECT conv_id, turn_idx, sc, sk, pos, count(*) AS icnt FROM (
    SELECT conv_id, turn_idx, sc, sk, line, unnest(range(rlen)) AS pos
    FROM scopel
  ) WHERE substr(line, CAST(pos + 1 AS INT), 1) <> ' '
  GROUP BY conv_id, turn_idx, sc, sk, pos
),
sprof AS (
  SELECT a.conv_id, a.turn_idx, a.sc, a.sk, a.w, a.pos,
         coalesce(i.icnt, 0) AS cnt
  FROM (SELECT conv_id, turn_idx, sc, sk, w, unnest(range(w)) AS pos
        FROM sw WHERE w >= 2) a
  LEFT JOIN sink i USING (conv_id, turn_idx, sc, sk, pos)
),
ssm AS (  -- integer gaussian smoothing, sigma=1.0: radius 3, weights
          -- round(1e6*exp(-k^2/2)) = [1000000, 606531, 135335, 11109]
  SELECT *,
         1000000 * cnt
         + 606531 * (coalesce(lag(cnt, 1) OVER wp, 0) + coalesce(lead(cnt, 1) OVER wp, 0))
         + 135335 * (coalesce(lag(cnt, 2) OVER wp, 0) + coalesce(lead(cnt, 2) OVER wp, 0))
         + 11109 * (coalesce(lag(cnt, 3) OVER wp, 0) + coalesce(lead(cnt, 3) OVER wp, 0))
           AS sm
  FROM sprof
  WINDOW wp AS (PARTITION BY conv_id, turn_idx, sc, sk ORDER BY pos)
),
sagg AS (
  SELECT *,
         max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk) AS max_s,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS fmax_prev,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk
                    ORDER BY pos
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
           AS bmax_next
  FROM ssm
),
sruns AS (  -- valley runs on the RAW profile: cnt <= stray(1), width >= 2,
            -- >= 1 truly blank column, center within [0.15, 0.85] of width
  SELECT conv_id, turn_idx, sc, sk, min(w) AS w, min(pos) AS a, max(pos) AS b
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY conv_id, turn_idx, sc, sk
                                       ORDER BY pos) AS grp
    FROM sprof WHERE cnt <= 1
  )
  GROUP BY conv_id, turn_idx, sc, sk, grp
  HAVING max(pos) - min(pos) >= 1
     AND max(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) = 1
     AND (min(pos) + max(pos)) // 2 >= CAST(0.15 AS DOUBLE) * min(w)
     AND (min(pos) + max(pos)) // 2 <= CAST(0.85 AS DOUBLE) * min(w)
),
sdep AS (
  SELECT r.conv_id, r.turn_idx, r.sc, r.sk, r.w, r.a, r.b, min(g.sm) AS depth
  FROM sruns r JOIN sagg g USING (conv_id, turn_idx, sc, sk)
  WHERE g.pos BETWEEN r.a AND r.b
  GROUP BY r.conv_id, r.turn_idx, r.sc, r.sk, r.w, r.a, r.b
),
sgut AS (  -- depth + two-sided prominence gates, then W6: deepest kmax=1
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY d.conv_id, d.turn_idx, d.sc, d.sk
                                   ORDER BY d.depth, d.a, d.b) AS rn
    FROM sdep d
    JOIN sagg ga ON ga.conv_id = d.conv_id AND ga.turn_idx = d.turn_idx
                AND ga.sc = d.sc AND ga.sk = d.sk AND ga.pos = d.a
    JOIN sagg gb ON gb.conv_id = d.conv_id AND gb.turn_idx = d.turn_idx
                AND gb.sc = d.sc AND gb.sk = d.sk AND gb.pos = d.b
    WHERE ga.max_s > 0
      AND d.depth * 100 <= 20 * ga.max_s
      AND least(ga.fmax_prev, gb.bmax_next) * 100 >= 50 * ga.max_s
  ) WHERE rn = 1
),
pageg AS (  -- §6p trigger: >= 2 text blocks AND any block shows columns
  SELECT g.conv_id, g.turn_idx, g.a AS pg_a, g.b AS pg_b, g.w AS pg_w
  FROM sgut g
  WHERE g.sc = 'p'
    AND EXISTS (SELECT 1 FROM sgut b WHERE b.sc = 'b'
                AND b.conv_id = g.conv_id AND b.turn_idx = g.turn_idx)
    AND (SELECT count(*) FROM voted v WHERE v.conv_id = g.conv_id
         AND v.turn_idx = g.turn_idx AND v.vcls = 'text') >= 2
),
pband AS (  -- §6p band recompute: the 2nd consecutive blank or a gutter-
            -- CROSSING separator advances the band for later lines
  SELECT r.conv_id, r.turn_idx, r.tli,
         coalesce(sum(CASE WHEN (r.cls = 'blank' AND r.run_len = 2)
                             OR (r.cls = 'separator' AND r.slen > 0
                                 AND r.lead <= p.pg_b
                                 AND r.lead + r.slen - 1 > p.pg_b)
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY r.conv_id, r.turn_idx ORDER BY r.tli
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pb
  FROM rr r JOIN pageg p USING (conv_id, turn_idx)
),
teff AS (  -- effective gutter per text region: page gutters override block's
  SELECT v.conv_id, v.turn_idx, v.rid,
         coalesce(pg.pg_a, bg.a) AS g_a, coalesce(pg.pg_b, bg.b) AS g_b,
         CASE WHEN pg.pg_a IS NOT NULL THEN pg.pg_w ELSE bg.w END AS g_w
  FROM voted v
  LEFT JOIN pageg pg ON pg.conv_id = v.conv_id AND pg.turn_idx = v.turn_idx
  LEFT JOIN sgut bg ON bg.sc = 'b' AND bg.conv_id = v.conv_id
                   AND bg.turn_idx = v.turn_idx AND bg.sk = v.rid
                   AND pg.pg_a IS NULL
  WHERE v.vcls = 'text'
),
csp AS (  -- §6 split emission: per-line per-column stripped pieces
  SELECT c.conv_id, c.turn_idx, c.rid, c.col, t.tli,
         substr(t.line, CAST(c.seg_a + 1 AS INT),
                CAST(c.seg_b - c.seg_a AS INT)) AS piece,
         trim(piece, ' ') AS s,
         t.line_start + c.seg_a + length(piece) - length(ltrim(piece, ' '))
           AS cs
  FROM (
    SELECT conv_id, turn_idx, rid, 0 AS col, 0 AS seg_a, g_a AS seg_b
    FROM teff WHERE g_a IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, rid, 1, g_b + 1, g_w
    FROM teff WHERE g_a IS NOT NULL
  ) c
  JOIN txtl t USING (conv_id, turn_idx, rid)
  WHERE trim(substr(t.line, CAST(c.seg_a + 1 AS INT),
                    CAST(c.seg_b - c.seg_a AS INT)), ' ') <> ''
),
cent AS (  -- §6m column entries; with 2 columns both entries are OUTER and
           -- the widest sibling is total - own
  SELECT c.conv_id, c.turn_idx, c.rid, c.col, c.max_sp_len,
         CASE c.col WHEN 0 THEN e.g_a ELSE e.g_w - (e.g_b + 1) END AS wd,
         e.g_w
  FROM (SELECT conv_id, turn_idx, rid, col, max(length(s)) AS max_sp_len
        FROM csp GROUP BY conv_id, turn_idx, rid, col) c
  JOIN teff e USING (conv_id, turn_idx, rid)
),
centr AS (
  SELECT *,
         CASE WHEN count(*) OVER wr >= 2
                   AND wd * 100 <= 25 * g_w
                   AND 2 * wd <= sum(wd) OVER wr - wd
                   AND max_sp_len <= 24
              THEN 'marginalia' ELSE 'text' END AS rt
  FROM cent
  WINDOW wr AS (PARTITION BY conv_id, turn_idx, rid)
)"""

    # emission suffix shared by every column-splitting tail (twocol,
    # margin, shear): consumes centr/teff/pageg/pband/csp/rspans/voted
    # and ends in withreg
    _COLS_EMIT_TAIL = """,
units AS (  -- emission units: split col entries + unsplit/non-text regions
  SELECT c.conv_id, c.turn_idx, c.rid, c.col, c.rt,
         v.first_tli, v.band AS band0, true AS is_entry
  FROM centr c JOIN voted v USING (conv_id, turn_idx, rid)
  UNION ALL
  SELECT v.conv_id, v.turn_idx, v.rid, 0, v.vcls, v.first_tli, v.band, false
  FROM voted v LEFT JOIN teff e USING (conv_id, turn_idx, rid)
  WHERE v.vcls <> 'text' OR e.g_a IS NULL
),
uord AS (  -- effective band/column + §7 type-group ordering keys
  SELECT u.*, (pg.conv_id IS NOT NULL) AS pmod,
         CASE WHEN pg.conv_id IS NOT NULL THEN pb.pb ELSE u.band0 END AS band,
         CASE WHEN pg.conv_id IS NOT NULL AND NOT u.is_entry
              THEN CASE WHEN fl.lead > pg.pg_b THEN 1 ELSE 0 END
              ELSE u.col END AS ecol,
         CASE u.rt WHEN 'header' THEN 0 WHEN 'marginalia' THEN 2
                   WHEN 'separator' THEN 3 ELSE 1 END AS tg
  FROM units u
  LEFT JOIN pageg pg ON pg.conv_id = u.conv_id AND pg.turn_idx = u.turn_idx
  LEFT JOIN pband pb ON pb.conv_id = u.conv_id AND pb.turn_idx = u.turn_idx
                    AND pb.tli = u.first_tli
  LEFT JOIN rr fl ON fl.conv_id = u.conv_id AND fl.turn_idx = u.turn_idx
                 AND fl.tli = u.first_tli
),
rne AS (  -- SPEC §7/§7p: page-column mode orders column-major ACROSS bands
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, turn_idx
             ORDER BY CASE WHEN pmod THEN ecol ELSE band END,
                      CASE WHEN pmod THEN band ELSE tg END,
                      CASE WHEN pmod THEN tg ELSE first_tli END,
                      CASE WHEN pmod THEN first_tli ELSE ecol END) AS ord
  FROM uord
),
uspans AS (
  SELECT conv_id, turn_idx, rid, col, tli, s, cs, cs + length(s) AS ce
  FROM csp
  UNION ALL
  SELECT r.conv_id, r.turn_idx, r.rid, 0, r.tli, r.s, r.cs, r.cs + r.slen
  FROM rspans r JOIN rne u ON u.conv_id = r.conv_id AND u.turn_idx = r.turn_idx
                          AND u.rid = r.rid AND NOT u.is_entry
),
dc AS (  -- SPEC §8 drop-capital merge over adjacent ordered units
  SELECT *,
         lead(rt) OVER w AS nx_rt, lead(band) OVER w AS nx_band,
         lag(rt) OVER w AS pv_rt, lag(band) OVER w AS pv_band,
         lag(rid) OVER w AS pv_rid
  FROM rne WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ord)
),
surv AS (
  SELECT *,
         CASE WHEN rt = 'text' AND pv_rt = 'dropcap' AND pv_band = band
              THEN pv_rid END AS dc_rid,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord) - 1
           AS region_seq
  FROM dc
  WHERE (rt = 'dropcap' AND nx_rt = 'text' AND nx_band = band) IS NOT TRUE
),
sp1 AS (
  SELECT s.conv_id, s.turn_idx, r.region_seq, r.ord, r.dc_rid, s.tli,
         CASE r.rt WHEN 'dropcap' THEN 'drop-capital' ELSE r.rt END
           AS region_type,
         row_number() OVER (PARTITION BY s.conv_id, s.turn_idx, r.rid, r.col
                            ORDER BY s.tli) AS line_in_region,
         s.cs, s.ce, s.s AS stext
  FROM uspans s JOIN surv r ON r.conv_id = s.conv_id AND r.turn_idx = s.turn_idx
                           AND r.rid = s.rid AND r.col = s.col
),
patched AS (
  SELECT p.conv_id, p.turn_idx, p.region_seq, p.region_type, p.ord, p.tli,
         CASE WHEN p.line_in_region = 1 AND p.dc_rid IS NOT NULL
              THEN d.cs ELSE p.cs END AS char_start,
         p.ce AS char_end,
         CASE WHEN p.line_in_region = 1 AND p.dc_rid IS NOT NULL
              THEN d.s || p.stext ELSE p.stext END AS text
  FROM sp1 p
  LEFT JOIN uspans d ON d.conv_id = p.conv_id AND d.turn_idx = p.turn_idx
                    AND d.rid = p.dc_rid AND d.col = 0
),
numbered AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord, tli) - 1
           AS span_idx
  FROM patched
),
withreg AS (
  SELECT *,
         dense_rank() OVER (PARTITION BY conv_id ORDER BY turn_idx, region_seq)
           AS region_num
  FROM numbered
)"""

    # materialize every CTE: DuckDB inlines CTEs per reference, and the
    # twocol chain's fan-out (sagg/sgut/teff each referenced 3-5x over
    # an already deep prefix) would otherwise explode into thousands of
    # parquet scans of the same file
    import re as _re

    def _materialize(sql_text: str) -> str:
        return _re.sub(
            r"(?m)^(WITH )?(\w+) AS \(",
            lambda m: (m.group(1) or "") + m.group(2) + " AS MATERIALIZED (",
            sql_text,
        )

    def _twocol_sql(cell_l: int, cell_r: int, gap: int) -> str:
        return _materialize(
            _core_prefix(_twocol_corpus(cell_l, cell_r, gap), False, True)
            + _TWOCOL_TAIL
            + _COLS_EMIT_TAIL
            + _spans_final
        )

    sql["extract_spans_twocol_simple"] = _twocol_sql(
        TWOCOL_CELL, TWOCOL_CELL, TWOCOL_GAP
    )
    # narrow right column: the §6m projection-marginalia relabel fires
    sql["extract_spans_margin_simple"] = _twocol_sql(40, 12, TWOCOL_GAP)

    # --- §6d deskew (shear-grid) oracle -------------------------------
    # corpus: the twocol page lines, indented by k spaces (k = line
    # index within the 6-line turn, NO blank line -> one block/turn)
    _SHEAR_CORPUS = """toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM linelists_src
),
l0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
twl AS (
  SELECT doc_id,
         CAST(line_idx // 6 AS INT) AS turn_idx,
         line_idx % 6 AS k,
         CASE WHEN trim(substr(line, __CL__ + 1, __CR__), ' ') = ''
              THEN rtrim(substr(line, 1, __CL__), ' ')
              ELSE rpad(rtrim(substr(line, 1, __CL__), ' '), __RS__, ' ')
                   || trim(substr(line, __CL__ + 1, __CR__), ' ') END AS base
  FROM l0
),
tl AS (  -- 6 page lines per turn, line k indented by k spaces (§6d skew)
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id, turn_idx,
         CAST(k AS INT) AS tli,
         repeat(' ', CAST(k AS INT)) || base AS line
  FROM twl
)""".replace(
        "linelists_src", "toks"
    ).replace(
        "__CL__", str(TWOCOL_CELL)
    ).replace(
        "__CR__", str(TWOCOL_CELL)
    ).replace(
        "__RS__", str(TWOCOL_CELL + TWOCOL_GAP)
    )

    # the shear tail: §6d shear-grid argmax in SQL (np.rint ==
    # round_even; exact-integer variance scores compared by
    # cross-multiplied wp^2, first-wins), sheared-profile valley scan,
    # per-line shifted split emission, and the kernel's exact
    # fallbacks (argmax under threshold / no sheared valley -> emit as
    # unsheared). Reference: separate_lines.py:1572-1798
    # (return_deskew_slop), utils/__init__.py:363-532 (find_num_col).
    _SHEAR_TAIL = """,
txtl AS (  -- lines of post-vote TEXT regions + within-block index k
  SELECT r.conv_id, r.turn_idx, r.rid, r.tli, r.line, r.rlen, r.lead,
         r.line_start, v.n_lines,
         row_number() OVER (PARTITION BY r.conv_id, r.turn_idx, r.rid
                            ORDER BY r.tli) - 1 AS k
  FROM rr r JOIN voted v USING (conv_id, turn_idx, rid)
  WHERE v.vcls = 'text' AND r.cls NOT IN ('blank', 'fence')
),
inkc AS (  -- inked cells (pos < rlen, non-space) of every text line
  SELECT conv_id, turn_idx, rid, tli, k, pos FROM (
    SELECT conv_id, turn_idx, rid, tli, k, line, unnest(range(rlen)) AS pos
    FROM txtl
  ) WHERE substr(line, CAST(pos + 1 AS INT), 1) <> ' '
),
slp AS (  -- exact integer LS slope A/B of lead vs k per >= 3-line block
  SELECT conv_id, turn_idx, rid,
         count(*) * sum(k * lead) - sum(k) * sum(lead) AS sa,
         count(*) * sum(k * k) - sum(k) * sum(k) AS sb
  FROM txtl GROUP BY conv_id, turn_idx, rid
  HAVING count(*) >= 3
),
sg8 AS (  -- §6d gate: B > 0 and |A| >= slope_threshold * B
  SELECT *, CAST(sa AS DOUBLE) / sb AS sls FROM slp
  WHERE sb > 0 AND abs(sa) >= 0.13 * sb
),
cands AS (  -- shear grid: {0, sls-0.5, sls-0.25, sls, sls+0.25, sls+0.5}
  SELECT conv_id, turn_idx, rid, ci,
         CASE ci WHEN 0 THEN 0.0 WHEN 1 THEN sls - 0.5 WHEN 2 THEN sls - 0.25
                 WHEN 3 THEN sls WHEN 4 THEN sls + 0.25 ELSE sls + 0.5 END AS c
  FROM sg8, (SELECT CAST(unnest(range(6)) AS INT) AS ci)
),
shv0 AS (  -- raw shift per (candidate, line): np.rint == round_even
  SELECT cd.conv_id, cd.turn_idx, cd.rid, cd.ci, cd.c, t.k, t.tli, t.rlen,
         CAST(round_even(cd.c * t.k, 0) AS BIGINT) AS rw
  FROM cands cd JOIN txtl t USING (conv_id, turn_idx, rid)
),
shv AS (  -- normalized shift vector (min 0)
  SELECT *, rw - min(rw) OVER (PARTITION BY conv_id, turn_idx, rid, ci) AS sh
  FROM shv0
),
shwp AS (  -- per-candidate sheared width wp = max(len_k - shift_k)
  SELECT conv_id, turn_idx, rid, ci, any_value(c) AS c,
         max(rlen - sh) AS wp
  FROM shv GROUP BY conv_id, turn_idx, rid, ci
),
cprof AS (  -- sheared ink profile per candidate (idx >= 0 only)
  SELECT s.conv_id, s.turn_idx, s.rid, s.ci, i.pos - s.sh AS idx,
         count(*) AS cnt
  FROM shv s JOIN inkc i USING (conv_id, turn_idx, rid, tli)
  WHERE i.pos - s.sh >= 0
  GROUP BY s.conv_id, s.turn_idx, s.rid, s.ci, idx
),
cscore AS (  -- exact-integer variance score: wp * sum(p^2) - sum(p)^2
  SELECT w.conv_id, w.turn_idx, w.rid, w.ci, w.c, w.wp,
         w.wp * coalesce(sum(p.cnt * p.cnt), 0)
           - coalesce(sum(p.cnt), 0) * coalesce(sum(p.cnt), 0) AS score
  FROM shwp w
  LEFT JOIN cprof p USING (conv_id, turn_idx, rid, ci)
  WHERE w.wp > 0
  GROUP BY w.conv_id, w.turn_idx, w.rid, w.ci, w.c, w.wp
),
cwinner AS (  -- first-wins argmax under the exact rational order
  SELECT w.* FROM cscore w
  WHERE NOT EXISTS (
    SELECT 1 FROM cscore o
    WHERE o.conv_id = w.conv_id AND o.turn_idx = w.turn_idx
      AND o.rid = w.rid AND o.ci <> w.ci
      AND (o.score * w.wp * w.wp > w.score * o.wp * o.wp
           OR (o.score * w.wp * w.wp = w.score * o.wp * o.wp
               AND o.ci < w.ci))
  )
),
shwin AS (  -- sheared blocks: the winner passes the final |s| gate
  SELECT * FROM cwinner WHERE abs(c) >= 0.13
),
spw AS (  -- valley-scan scopes: sheared blocks / normal blocks / page
  SELECT conv_id, turn_idx, 's' AS sc, rid AS sk, CAST(wp AS BIGINT) AS w
  FROM shwin
  UNION ALL
  SELECT t.conv_id, t.turn_idx, 'b', t.rid, max(t.rlen)
  FROM txtl t
  WHERE t.n_lines >= 3 AND NOT EXISTS (
    SELECT 1 FROM shwin sw WHERE sw.conv_id = t.conv_id
      AND sw.turn_idx = t.turn_idx AND sw.rid = t.rid)
  GROUP BY t.conv_id, t.turn_idx, t.rid
  UNION ALL
  SELECT conv_id, turn_idx, 'p', 0, max(rlen) FROM txtl
  GROUP BY conv_id, turn_idx
),
rawcnt AS (  -- raw per-position ink counts per scope
  SELECT s.conv_id, s.turn_idx, 's' AS sc, s.rid AS sk,
         i.pos - s.sh AS pos, count(*) AS icnt
  FROM shv s
  JOIN shwin w USING (conv_id, turn_idx, rid, ci)
  JOIN inkc i USING (conv_id, turn_idx, rid, tli)
  WHERE i.pos - s.sh >= 0
  GROUP BY s.conv_id, s.turn_idx, s.rid, (i.pos - s.sh)
  UNION ALL
  SELECT i.conv_id, i.turn_idx, 'b', i.rid, i.pos, count(*)
  FROM inkc i
  WHERE EXISTS (SELECT 1 FROM spw w WHERE w.sc = 'b'
                AND w.conv_id = i.conv_id AND w.turn_idx = i.turn_idx
                AND w.sk = i.rid)
  GROUP BY i.conv_id, i.turn_idx, i.rid, i.pos
  UNION ALL
  SELECT conv_id, turn_idx, 'p', 0, pos, count(*)
  FROM inkc GROUP BY conv_id, turn_idx, pos
),
sprof AS (
  SELECT a.conv_id, a.turn_idx, a.sc, a.sk, a.w, a.pos,
         coalesce(i.icnt, 0) AS cnt
  FROM (SELECT conv_id, turn_idx, sc, sk, w, unnest(range(w)) AS pos
        FROM spw WHERE w >= 2) a
  LEFT JOIN rawcnt i USING (conv_id, turn_idx, sc, sk, pos)
),
ssm AS (  -- integer gaussian smoothing, sigma=1.0: radius 3, weights
          -- round(1e6*exp(-k^2/2)) = [1000000, 606531, 135335, 11109]
  SELECT *,
         1000000 * cnt
         + 606531 * (coalesce(lag(cnt, 1) OVER wp, 0) + coalesce(lead(cnt, 1) OVER wp, 0))
         + 135335 * (coalesce(lag(cnt, 2) OVER wp, 0) + coalesce(lead(cnt, 2) OVER wp, 0))
         + 11109 * (coalesce(lag(cnt, 3) OVER wp, 0) + coalesce(lead(cnt, 3) OVER wp, 0))
           AS sm
  FROM sprof
  WINDOW wp AS (PARTITION BY conv_id, turn_idx, sc, sk ORDER BY pos)
),
sagg AS (
  SELECT *,
         max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk) AS max_s,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS fmax_prev,
         coalesce(max(sm) OVER (PARTITION BY conv_id, turn_idx, sc, sk
                    ORDER BY pos
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
           AS bmax_next
  FROM ssm
),
sruns AS (  -- valley runs on the RAW profile: cnt <= stray(1), width >= 2,
            -- >= 1 truly blank column, center within [0.15, 0.85] of width
  SELECT conv_id, turn_idx, sc, sk, min(w) AS w, min(pos) AS a, max(pos) AS b
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY conv_id, turn_idx, sc, sk
                                       ORDER BY pos) AS grp
    FROM sprof WHERE cnt <= 1
  )
  GROUP BY conv_id, turn_idx, sc, sk, grp
  HAVING max(pos) - min(pos) >= 1
     AND max(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) = 1
     AND (min(pos) + max(pos)) // 2 >= CAST(0.15 AS DOUBLE) * min(w)
     AND (min(pos) + max(pos)) // 2 <= CAST(0.85 AS DOUBLE) * min(w)
),
sdep AS (
  SELECT r.conv_id, r.turn_idx, r.sc, r.sk, r.w, r.a, r.b, min(g.sm) AS depth
  FROM sruns r JOIN sagg g USING (conv_id, turn_idx, sc, sk)
  WHERE g.pos BETWEEN r.a AND r.b
  GROUP BY r.conv_id, r.turn_idx, r.sc, r.sk, r.w, r.a, r.b
),
sgut AS (  -- depth + two-sided prominence gates, then W6: deepest kmax=1
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY d.conv_id, d.turn_idx, d.sc, d.sk
                                   ORDER BY d.depth, d.a, d.b) AS rn
    FROM sdep d
    JOIN sagg ga ON ga.conv_id = d.conv_id AND ga.turn_idx = d.turn_idx
                AND ga.sc = d.sc AND ga.sk = d.sk AND ga.pos = d.a
    JOIN sagg gb ON gb.conv_id = d.conv_id AND gb.turn_idx = d.turn_idx
                AND gb.sc = d.sc AND gb.sk = d.sk AND gb.pos = d.b
    WHERE ga.max_s > 0
      AND d.depth * 100 <= 20 * ga.max_s
      AND least(ga.fmax_prev, gb.bmax_next) * 100 >= 50 * ga.max_s
  ) WHERE rn = 1
),
beff AS (  -- per-block effective gutters (pre page-mode): sheared or not
  SELECT conv_id, turn_idx, sk AS rid, a, b, w, true AS sheared
  FROM sgut WHERE sc = 's'
  UNION ALL
  SELECT conv_id, turn_idx, sk, a, b, w, false FROM sgut WHERE sc = 'b'
),
pageg AS (  -- §6p trigger: >= 2 text blocks AND any block shows columns
  SELECT g.conv_id, g.turn_idx, g.a AS pg_a, g.b AS pg_b, g.w AS pg_w
  FROM sgut g
  WHERE g.sc = 'p'
    AND EXISTS (SELECT 1 FROM beff b WHERE b.conv_id = g.conv_id
                AND b.turn_idx = g.turn_idx)
    AND (SELECT count(*) FROM voted v WHERE v.conv_id = g.conv_id
         AND v.turn_idx = g.turn_idx AND v.vcls = 'text') >= 2
),
pband AS (  -- §6p band recompute (same rule as the twocol tail)
  SELECT r.conv_id, r.turn_idx, r.tli,
         coalesce(sum(CASE WHEN (r.cls = 'blank' AND r.run_len = 2)
                             OR (r.cls = 'separator' AND r.slen > 0
                                 AND r.lead <= p.pg_b
                                 AND r.lead + r.slen - 1 > p.pg_b)
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY r.conv_id, r.turn_idx ORDER BY r.tli
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pb
  FROM rr r JOIN pageg p USING (conv_id, turn_idx)
),
teff AS (  -- effective gutter per text region: page overrides block;
           -- page mode discards the block's shear (kernel: shifts=None)
  SELECT v.conv_id, v.turn_idx, v.rid,
         coalesce(pg.pg_a, bg.a) AS g_a, coalesce(pg.pg_b, bg.b) AS g_b,
         CASE WHEN pg.pg_a IS NOT NULL THEN pg.pg_w ELSE bg.w END AS g_w,
         CASE WHEN pg.pg_a IS NOT NULL THEN false
              ELSE coalesce(bg.sheared, false) END AS sheared
  FROM voted v
  LEFT JOIN pageg pg ON pg.conv_id = v.conv_id AND pg.turn_idx = v.turn_idx
  LEFT JOIN beff bg ON bg.conv_id = v.conv_id
                   AND bg.turn_idx = v.turn_idx AND bg.rid = v.rid
                   AND pg.pg_a IS NULL
  WHERE v.vcls = 'text'
),
wsh AS (  -- the winning shift vector per sheared block line
  SELECT s.conv_id, s.turn_idx, s.rid, s.tli, s.sh
  FROM shv s JOIN shwin w USING (conv_id, turn_idx, rid, ci)
),
csp AS (  -- §6 split emission: per-line per-column stripped pieces,
          -- each line sliced at [seg + its own shift)
  SELECT c.conv_id, c.turn_idx, c.rid, c.col, t.tli,
         CASE WHEN c.sheared THEN coalesce(ws.sh, 0) ELSE 0 END AS shx,
         substr(t.line, CAST(c.seg_a + shx + 1 AS INT),
                CAST(c.seg_b - c.seg_a AS INT)) AS piece,
         trim(piece, ' ') AS s,
         t.line_start + c.seg_a + shx + length(piece)
           - length(ltrim(piece, ' ')) AS cs
  FROM (
    SELECT conv_id, turn_idx, rid, 0 AS col, 0 AS seg_a, g_a AS seg_b, sheared
    FROM teff WHERE g_a IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, rid, 1, g_b + 1, g_w, sheared
    FROM teff WHERE g_a IS NOT NULL
  ) c
  JOIN txtl t USING (conv_id, turn_idx, rid)
  LEFT JOIN wsh ws ON ws.conv_id = c.conv_id AND ws.turn_idx = c.turn_idx
                  AND ws.rid = c.rid AND ws.tli = t.tli
  WHERE s <> ''
),
cent AS (  -- §6m column entries (2 columns: sibling width = total - own)
  SELECT c.conv_id, c.turn_idx, c.rid, c.col, c.max_sp_len,
         CASE c.col WHEN 0 THEN e.g_a ELSE e.g_w - (e.g_b + 1) END AS wd,
         e.g_w
  FROM (SELECT conv_id, turn_idx, rid, col, max(length(s)) AS max_sp_len
        FROM csp GROUP BY conv_id, turn_idx, rid, col) c
  JOIN teff e USING (conv_id, turn_idx, rid)
),
centr AS (
  SELECT *,
         CASE WHEN count(*) OVER wr >= 2
                   AND wd * 100 <= 25 * g_w
                   AND 2 * wd <= sum(wd) OVER wr - wd
                   AND max_sp_len <= 24
              THEN 'marginalia' ELSE 'text' END AS rt
  FROM cent
  WINDOW wr AS (PARTITION BY conv_id, turn_idx, rid)
)"""

    sql["extract_spans_shear_simple"] = _materialize(
        _core_prefix(_SHEAR_CORPUS, False, True)
        + _SHEAR_TAIL
        + _COLS_EMIT_TAIL
        + _spans_final
    )

    # padded corpus + §1e enhancement (M1 analog) in SQL: lines are
    # pre-truncated to the wrap width (substr 80) so the greedy re-wrap
    # is a provable no-op and the SQL transform reduces to rtrim +
    # blank-run collapse + renumber, applied only to low-density turns
    # (the kernel's re-wrap branch stays pytest/fuzz-gated)
    _PADDED_CORPUS = """toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
linelists AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(tk) / 8.0) AS INT)),
                        i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS ls
  FROM toks
),
l0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS line_idx,
         unnest(ls) AS line
  FROM linelists
),
pl0 AS (  -- truncate to the wrap width: §1e re-wrap can never fire
  SELECT doc_id, line_idx, substr(line, 1, 80) AS line FROM l0
),
pl AS (  -- each content line followed by (line_idx % 3) blank pad lines
  SELECT doc_id, CAST(line_idx // 4 AS INT) AS turn_idx, line_idx, 0 AS sub,
         line
  FROM pl0
  UNION ALL
  SELECT doc_id, CAST(line_idx // 4 AS INT), line_idx, CAST(u.s + 1 AS INT), ''
  FROM (SELECT doc_id, line_idx, unnest(range(line_idx % 3)) AS s FROM pl0) u
),
pt AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS conv_id, turn_idx,
         row_number() OVER (PARTITION BY doc_id, turn_idx
                            ORDER BY line_idx, sub) - 1 AS tli0,
         line,
         sum(length(line)) OVER (PARTITION BY doc_id, turn_idx) AS sum_len,
         count(*) OVER (PARTITION BY doc_id, turn_idx) AS n0
  FROM pl
),
pflag AS (  -- §1e gate: density = len(text) / n_lines < 30.0
  SELECT *, (CAST(sum_len + n0 - 1 AS DOUBLE) / n0) < 30.0 AS flagged FROM pt
),
penh AS (  -- §1e rewrite of flagged turns: rtrim + blank-run collapse
  SELECT conv_id, turn_idx, tli0, rtrim(line, ' ') AS line,
         (rtrim(line, ' ') = '') AS blank,
         lag(rtrim(line, ' ') = '')
           OVER (PARTITION BY conv_id, turn_idx ORDER BY tli0) AS pblank
  FROM pflag WHERE flagged
),
tl AS (
  SELECT conv_id, turn_idx,
         CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY tli0) - 1 AS INT) AS tli,
         line
  FROM penh WHERE NOT (blank AND coalesce(pblank, false))
  UNION ALL
  SELECT conv_id, turn_idx, CAST(tli0 AS INT), line FROM pflag WHERE NOT flagged
)"""

    # materialized for the same reason as the twocol family: the padded
    # corpus + enhancement CTEs sit under the whole simple tail, and
    # DuckDB's CTE inlining re-evaluates them per reference (measured
    # ~30 s vs ~3 s materialized at sf0.01)
    sql["extract_spans_enhanced_simple"] = _materialize(
        _core_prefix(_PADDED_CORPUS, False, True) + _SIMPLE_TAIL + _spans_final
    )

    # end-to-end: simple-mode extraction -> main-content reassembly ->
    # quality gate, as one nested query over the spans oracle (the
    # quality fragments are the same n_ws/n_chars/n_punct/n_stop
    # expressions the standalone quality oracle uses, applied to the
    # reassembled text)
    sql["e2e_extract_curate"] = f"""
SELECT conv_id, n_spans,
       round(least({n_ws} / 100.0, 1.0) * 0.4
             + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
             + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
             6) AS quality_score,
       round(least({n_ws} / 100.0, 1.0) * 0.4
             + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
             + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
             6) >= 0.5 AS keep
FROM (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_spans,
         string_agg(text, chr(10) ORDER BY reading_order) AS text
  FROM ({_simple_prefix(False) + _spans_final}) es
  WHERE region_type IN ('text', 'header')
  GROUP BY conv_id)
"""
    # e2e_curate_to_shards: the full journey to the trainer's shards
    sql["e2e_curate_to_shards"] = f"""
WITH curated AS (
  SELECT conv_id, text,
         round(least({n_ws} / 100.0, 1.0) * 0.4
               + least({n_stop} / greatest({n_ws}, 1) * 5.0, 1.0) * 0.4
               + (1.0 - least({n_punct} / greatest({n_chars}, 1) * 4.0, 1.0)) * 0.2,
               6) AS q
  FROM (
    SELECT conv_id, string_agg(text, chr(10) ORDER BY reading_order) AS text
    FROM ({_simple_prefix(False) + _spans_final}) es
    WHERE region_type IN ('text', 'header')
    GROUP BY conv_id) reasm
),
gated AS (
  SELECT conv_id, text FROM curated
  WHERE q >= 0.5
    AND {_h64sql(f"conv_id || ':{SPLIT_SEED}'")} % 1000000 < 980000
),
keyed AS (
  SELECT text,
         {_h64sql(f"conv_id || ':{TRAIN_SHARDS_SEED}'")} AS shuffle_key
  FROM gated
)
SELECT CAST(shuffle_key % {E2E_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum({n_ws}) AS BIGINT) AS total_tokens,
       min(shuffle_key) AS min_key,
       max(shuffle_key) AS max_key,
       bit_xor(shuffle_key) AS key_xor
FROM keyed GROUP BY 1 ORDER BY 1
"""

    # tables variant (-tab in simple mode): table classification, run
    # grouping and §12 fusion live in the same CTE chain. NOTE: a
    # separator line is single-token through the 8-token wrap, so the
    # fusion arm cannot fire on wrap-derived corpora (kernel fixtures
    # gate it); the table class/runs ARE exercised adversarially.
    sql["extract_spans_tables_simple"] = _simple_prefix(True) + _spans_final
    # --no-full-layout variant: no header/dropcap classes, no vote,
    # no drop-capital merge (all structural no-ops in the shared CTEs)
    sql["extract_spans_nofull_simple"] = (
        _simple_prefix(False, full_layout=False) + _spans_final
    )

    # page_diags_simple: SPEC §11 diagnostics of the same simple-mode
    # kernel — n_lines/n_spans/n_regions (post drop-capital merge),
    # max_columns (structurally 1 with max_columns=1), the LS slope
    # over unsplit text-block lines (index-within-block vs leading
    # indent; structurally 0 on token-wrapped transcripts but the full
    # formula is evaluated), the §4 agreement ratio and gate flag.
    def _diag_tail(was_enhanced_sql: str) -> str:
        return """,
turnsl AS (
  SELECT conv_id, turn_idx, count(*) AS n_lines FROM tl GROUP BY conv_id, turn_idx
),
spanagg AS (
  SELECT conv_id, turn_idx, count(*) AS n_spans,
         count(DISTINCT region_seq) AS n_regions
  FROM numbered GROUP BY conv_id, turn_idx
),
pts AS (
  SELECT rr.conv_id, rr.turn_idx,
         row_number() OVER (PARTITION BY rr.conv_id, rr.turn_idx, rr.rid
                            ORDER BY rr.tli) - 1 AS k,
         rr.lead AS y
  FROM rr JOIN voted v USING (conv_id, turn_idx, rid)
  WHERE v.vcls = 'text' AND rr.cls NOT IN ('blank', 'fence')
),
slopes AS (
  SELECT conv_id, turn_idx,
         CASE WHEN count(*) >= 2 AND sum((k - mk) * (k - mk)) > 0
              THEN sum((k - mk) * (y - my)) / sum((k - mk) * (k - mk))
              ELSE 0.0 END AS slope
  FROM (SELECT *, avg(k) OVER w AS mk, avg(y) OVER w AS my FROM pts
        WINDOW w AS (PARTITION BY conv_id, turn_idx))
  GROUP BY conv_id, turn_idx
)
SELECT t.conv_id,
       CAST(t.turn_idx AS INT) AS turn_idx,
       CAST(t.n_lines AS INT) AS n_lines,
       CAST(coalesce(s.n_spans, 0) AS INT) AS n_spans,
       CAST(coalesce(s.n_regions, 0) AS INT) AS n_regions,
       CAST(1 AS INT) AS max_columns,
       coalesce(sl.slope, 0.0) AS slope,
       abs(coalesce(sl.slope, 0.0)) >= 0.13 AS is_deskewed,
       coalesce(g.ratio, 100.0) AS agreement_ratio,
       coalesce(g.ratio, 100.0) <= 40.0 AS used_binarized,
       __WAS_ENHANCED__ AS was_enhanced
FROM turnsl t
LEFT JOIN spanagg s USING (conv_id, turn_idx)
LEFT JOIN gt g USING (conv_id, turn_idx)
LEFT JOIN slopes sl USING (conv_id, turn_idx)
__DIAG_EXTRA_JOIN__
""".replace("__WAS_ENHANCED__", was_enhanced_sql).replace(
            "__DIAG_EXTRA_JOIN__",
            ""
            if was_enhanced_sql == "FALSE"
            else "LEFT JOIN (SELECT conv_id, turn_idx, bool_or(flagged) AS fl\n"
            "           FROM pflag GROUP BY conv_id, turn_idx) pf\n"
            "USING (conv_id, turn_idx)",
        )

    # enable_enhancement is off in the simple family's config, so the
    # §1e gate can never fire there
    sql["page_diags_simple"] = _simple_prefix(False) + _diag_tail("FALSE")
    # full-mode diagnostics: the simple diag tail with n_spans /
    # n_regions counted AFTER the adherence merge
    sql["page_diags"] = (
        _simple_prefix(False)
        + _ADH_TAIL
        + _diag_tail("FALSE").replace(
            "FROM numbered GROUP BY", "FROM adout GROUP BY"
        )
    )
    # the was_enhanced flag (is_image_enhanced analog) is oracle-checked
    # over the padded corpus via the per-turn density gate
    sql["page_diags_enhanced_simple"] = _materialize(
        _core_prefix(_PADDED_CORPUS, False, True)
        + _SIMPLE_TAIL
        + _diag_tail("coalesce(pf.fl, FALSE)")
    )

    # extract_spans (full kernel), page_diags, multimodal: rows-only by
    # design (the kernel's gate is the fixture-equality pytest suite;
    # multimodal decode is stubbed pending image/audio libs)
    return sql
