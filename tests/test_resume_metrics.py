"""Resume-from-checkpoint and metrics tests (SURVEY §5 graft strategy 5)."""

import pandas as pd
import pytest

from eynollah_spark.fixtures.transcripts import TRANSCRIPT_SCHEMA, CorpusSpec, generate_local
from eynollah_spark.io.sinks import BucketedSpanSink, filter_pending_turns
from eynollah_spark.metrics import ExtractMetrics, partition_metrics
from eynollah_spark.operators.extract import extract_spans

SPEC = CorpusSpec(n_convs=25, seed=31)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "turn_idx", "span_idx"]).reset_index(drop=True)


def test_resume_no_dupes_no_loss(spark, tmp_path):
    local = generate_local(SPEC)
    turns = spark.createDataFrame(local, schema=TRANSCRIPT_SCHEMA)
    spans = extract_spans(turns)
    full = _sorted(spans.toPandas())

    sink = BucketedSpanSink(str(tmp_path / "out"), n_buckets=8, run_tag="r1")
    # "crash" after 3 buckets
    first = sink.write(spans, buckets=[0, 1, 2])
    assert first == [0, 1, 2]
    assert sink.done_buckets() == {0, 1, 2}

    # restart: only pending turns reach the kernel
    pending = filter_pending_turns(turns, sink)
    assert pending.count() < turns.count()
    rest = sink.resume(extract_spans(pending))
    assert set(rest) == {3, 4, 5, 6, 7}

    got = _sorted(sink.read(spark).toPandas())
    pd.testing.assert_frame_equal(got, full)

    # idempotence: resuming a complete run writes nothing
    assert sink.resume(spans) == []

    # single-job layout: one hive-partitioned write, not one
    # directory-per-bucket job sequence
    import os

    data = str(tmp_path / "out" / "data")
    assert any(n.startswith("_bucket=") for n in os.listdir(data))
    assert not any(n.startswith("bucket=") for n in os.listdir(data))


def test_accumulator_metrics(spark):
    local = generate_local(SPEC)
    turns = spark.createDataFrame(local, schema=TRANSCRIPT_SCHEMA)
    m = ExtractMetrics.create(spark)
    out = extract_spans(turns, metrics=m)
    n_spans = out.count()
    snap = m.snapshot()
    assert snap["turns_in"] == len(local)
    assert snap["spans_emitted"] == n_spans
    assert snap["bytes_parsed"] == int(local["text"].str.len().sum())


def test_partition_metrics_table(spark):
    local = generate_local(SPEC)
    turns = spark.createDataFrame(local, schema=TRANSCRIPT_SCHEMA)
    spans = extract_spans(turns)
    pm = partition_metrics(spans, run_id="t1").toPandas()
    assert pm["spans_emitted"].sum() == spans.count()
    assert set(pm.columns) >= {
        "run_id",
        "partition_id",
        "turns_out",
        "spans_emitted",
        "bytes_parsed",
        "committed_at",
    }


def test_sink_read_committed_empty_returns_empty_frame(spark, tmp_path):
    """Committed-but-empty buckets are a legitimate empty result (an
    empty frame with the span schema), not a FileNotFoundError; a sink
    with NO commits at all still raises."""
    from eynollah_spark.operators.extract import SPAN_SCHEMA, extract_spans

    sink = BucketedSpanSink(str(tmp_path / "out"), n_buckets=4, run_tag="r1")
    with pytest.raises(FileNotFoundError):
        sink.read(spark)

    empty_turns = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string"
    )
    committed = sink.write(extract_spans(empty_turns))
    assert sorted(committed) == [0, 1, 2, 3]
    got = sink.read(spark)
    assert got.count() == 0
    assert got.schema == SPAN_SCHEMA


def test_ls_gate_oversize_fallback(monkeypatch):
    """Blocks past _LS_GATE_MAX_LINES route the deskew gate through
    Python's exact integers — output must stay byte-equal to the
    oracle (here forced low so the fallback path actually runs)."""
    import pandas as pd

    from eynollah_spark.kernel import textpage
    from eynollah_spark.kernel.textpage import analyze_turns_batch
    from eynollah_spark.oracle.reference import analyze_turn_naive

    monkeypatch.setattr(textpage, "_LS_GATE_MAX_LINES", 2)
    body = "aaaaaaaaaa   bbbbbbbbbb"
    text = "\n".join(" " * k + body for k in range(5))  # skewed 2-col
    pdf = pd.DataFrame(
        {"conv_id": ["c"], "turn_idx": [0], "role": ["user"], "text": [text]}
    )
    got = [
        (int(t.span_idx), t.region_type, int(t.region_seq), int(t.char_start),
         int(t.char_end), t.text)
        for t in analyze_turns_batch(pdf).itertuples(index=False)
    ]
    want = [
        (s.span_idx, s.region_type, s.region_seq, s.char_start, s.char_end, s.text)
        for s in analyze_turn_naive(text, "user")
    ]
    assert got == want
    assert [g[5] for g in got] == ["aaaaaaaaaa"] * 5 + ["bbbbbbbbbb"] * 5


def test_span_sink_dispatch_and_catalog_probe(spark, tmp_path):
    """No Iceberg catalog in this container: the probe returns None and
    the factory hands back the parquet+manifest sink."""
    from eynollah_spark.io.sinks import (
        BucketedSpanSink,
        iceberg_catalog,
        span_sink,
    )

    assert iceberg_catalog(spark) is None
    sink = span_sink(spark, str(tmp_path / "spans"))
    assert isinstance(sink, BucketedSpanSink)


def test_iceberg_span_sink_commit_semantics(spark, tmp_path):
    """Runs ONLY where an Iceberg catalog is configured (real cluster):
    snapshot-committed buckets resume exactly like the parquet sink."""
    import pytest

    from eynollah_spark.io.sinks import IcebergSpanSink, iceberg_catalog

    cat = iceberg_catalog(spark)
    if cat is None:
        pytest.skip("no Iceberg catalog configured in this environment")
    sink = IcebergSpanSink(spark, f"{cat}.default.spans_test", n_buckets=4)
    df = spark.createDataFrame(
        [(f"c{i}", 0, 0, "text", 0, 0, 4, "t", i, "r", "l") for i in range(20)],
        "conv_id string, turn_idx int, span_idx int, region_type string, "
        "region_seq int, char_start int, char_end int, text string, "
        "reading_order int, region_id string, line_id string",
    )
    committed = sink.write(df)
    assert sorted(committed) == [0, 1, 2, 3]
    assert sink.write(df) == []  # all buckets committed -> no-op
    assert sink.read().count() == 20
