"""Lexical retrieval over the document corpus: BM25 top-k.

The training-data-pipeline counterpart of the embedding ANN family in
``operators/similarity.py``: given a literal list of query terms, score
every document with BM25 (Robertson/Spärck Jones; the +1 idf variant
used by Lucene) and return the top-k.

Scale posture (the whole point of the formulation):

- per-term tf is computed *map-side* with ``F.size(F.filter(tokens,
  ...))`` — no explode, no (doc, term) shuffle.  A naive explode +
  ``groupBy(doc_id, token)`` shuffles the full token stream (~corpus
  size); this shuffles nothing.
- corpus statistics (N, avgdl, per-term df) reduce to a SINGLE ROW via
  partial aggregation, then come back as a broadcast-joined scalar row
  (Catalyst turns the 1-row cross join into BroadcastNestedLoopJoin
  over one row — free).
- the top-k is ``orderBy().limit()`` → TakeOrderedAndProject:
  per-partition heaps merged at the driver, never a global sort.

So the plan is: scan → 1-row agg (tree-reduced) → map-side score →
top-k.  At 100 TB that is two passes over the corpus and no wide
shuffle at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from eynollah_spark.operators.text_analysis import token_count

# BM25 constants (public standard values)
BM25_K1 = 1.2
BM25_B = 0.75


def _tf(term: str) -> F.Column:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 score for ``terms``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Ranking is by (score rounded to 6 dp DESC, doc_id ASC) so the
    order — and the DuckDB oracle hash — is stable under float
    addition-order nondeterminism.
    """
    terms = tuple(dict.fromkeys(terms))  # dedup, keep order
    with_tf = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("double").alias("dl"),
        *[_tf(t).cast("double").alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = with_tf.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = with_tf.crossJoin(F.broadcast(stats))
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        parts.append(idf * (tf * (k1 + 1.0)) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return (
        scored.select(
            "doc_id",
            F.round(score, 6).alias("score"),
            F.col("dl").cast("long").alias("n_tokens"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
