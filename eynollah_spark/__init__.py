"""eynollah_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the computation performed by the
reference document-layout-analysis tool (eynollah, at /root/reference)
in the *text domain*: multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` go in; ordered, typed
text spans (main text, headers, marginalia, tool output, separators,
drop-capitals) come out, with byte-exact per-turn text equality against
a single-node reference oracle.

Architecture (Spark-first, see SURVEY.md):

- the per-turn layout kernel (region classification, column split,
  reading order, drop-capital / small-fragment merging) is a pure
  numpy-vectorized function applied through ``mapInPandas`` — a
  *narrow* transformation: no shuffle is needed for the heavy work;
- conversation-level semantics (global reading order, stateful
  ``region_%04d`` ids) are window functions over
  ``Window.partitionBy("conv_id").orderBy("turn_idx", ...)`` — the
  only shuffle in the pipeline;
- everything relational (dedup, similarity search, text analytics,
  metrics) is plain DataFrame / Catalyst code.
"""

from eynollah_spark.config import ExtractConfig
from eynollah_spark.session import get_spark
from eynollah_spark.operators.extract import (
    analyze_pages,
    extract_spans,
    extract_spans_salted,
    probe_turn_metadata,
)
from eynollah_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    near_dup_clusters,
    paragraph_dedup,
)
from eynollah_spark.operators.sampling import (
    assign_splits,
    train_shards,
    write_training_shards,
)
from eynollah_spark.operators.text_analysis import (
    bpe_pair_counts,
    chunk_documents,
    contamination_check,
    ngram_diversity,
    pack_documents,
    pii_scrub,
    preference_pairs,
    quality_features,
    repetition_stats,
    sft_pairs,
)
from eynollah_spark.operators.similarity import brute_force_topk, kmeans_lloyd, semdedup

__all__ = [
    "ExtractConfig",
    "get_spark",
    "extract_spans",
    "extract_spans_salted",
    "analyze_pages",
    "probe_turn_metadata",
    "dedup_exact",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "paragraph_dedup",
    "bpe_pair_counts",
    "chunk_documents",
    "contamination_check",
    "ngram_diversity",
    "preference_pairs",
    "sft_pairs",
    "assign_splits",
    "train_shards",
    "write_training_shards",
    "pack_documents",
    "pii_scrub",
    "quality_features",
    "repetition_stats",
    "brute_force_topk",
    "kmeans_lloyd",
    "semdedup",
]
__version__ = "0.1.0"
