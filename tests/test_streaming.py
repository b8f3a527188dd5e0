"""Structured Streaming surface tests — file sources driven with
availableNow against driver testdata; results cross-checked against
the batch operators."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from eynollah_spark.operators.relational import events_sessionize
from eynollah_spark.streaming import (
    stream_dedup_docs,
    stream_events,
    stream_extract_spans,
    stream_minute_rollup,
    stream_sessionize,
)

EVENTS_FILE = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File streams need a directory source; testdata ships one file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS_FILE, d / "part-000.parquet")
    return str(d)


def _run_to_memory(df, name, timeout=120):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def test_minute_rollup_matches_batch(spark, events_dir):
    ev = stream_events(spark, events_dir)
    agg = stream_minute_rollup(ev)
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from rollup").collect()
    }
    batch = (
        spark.read.parquet(EVENTS_FILE)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in batch}
    # the watermark may drop nothing in availableNow over sorted files,
    # but late files can legitimately prune; require got <= want and
    # substantial coverage
    assert got
    for k, v in got.items():
        assert want.get(k) == v
    assert len(got) >= 0.9 * len(want)


def test_stream_sessionize_closed_sessions_match_batch(spark, events_dir):
    ev = stream_events(spark, events_dir)
    sess = stream_sessionize(ev)
    q = _run_to_memory(sess, "sessions")
    got = spark.sql("select * from sessions").collect()
    # streaming emits sessions CLOSED by a later event; each user's
    # final (still-open) session stays in state. Compare against the
    # batch sessionizer minus each user's last session.
    batch = events_sessionize(spark, "/root/testdata/sf0.001").collect()
    last_seq = {}
    for r in batch:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
    want = sorted(
        (r["user_id"], r["n_events"], r["session_value"])
        for r in batch
        if r["session_seq"] < last_seq[r["user_id"]]
    )
    have = sorted((r["user_id"], r["n_events"], r["session_value"]) for r in got)
    assert have == want


def test_session_fn_seq_survives_timeout():
    """A timeout-emitted session must NOT reset the user's sequence:
    the next session continues at seq+1 (and seq is 1-based, matching
    the batch sessionizer's keys)."""
    import pandas as pd

    from eynollah_spark.streaming.jobs import _session_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v = None
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    state = FakeState()
    ts0 = pd.Timestamp("2025-01-01 00:00:00")

    def batch(*offsets_s):
        return pd.DataFrame(
            {
                "ts": [ts0 + pd.Timedelta(seconds=o) for o in offsets_s],
                "event_id": list(range(len(offsets_s))),
                "value": [1.0] * len(offsets_s),
            }
        )

    # first events open session 1 (1-based)
    out = list(_session_fn((7,), iter([batch(0, 10)]), state))
    assert out == []
    assert state._v[0] == 1  # current seq
    # timeout closes session 1 and pre-advances the stored seq
    state.hasTimedOut = True
    out = list(_session_fn((7,), iter([]), state))
    assert len(out) == 1 and out[0]["session_seq"].tolist() == [1]
    assert state.exists and state._v[0] == 2
    # the user returns: next session is seq 2, not a reset to 1
    state.hasTimedOut = False
    out = list(_session_fn((7,), iter([batch(10_000)]), state))
    assert out == []
    assert state._v[0] == 2

    # close session 2 -> dormant record (seq 3) with the GC timeout
    state.hasTimedOut = True
    out = list(_session_fn((7,), iter([]), state))
    assert len(out) == 1 and out[0]["session_seq"].tolist() == [2]
    assert state.exists and state._v == (3, 0, 0.0, None)
    # the GC timeout fires on the dormant record: state is REMOVED
    # (bounded by active users), nothing emitted
    out = list(_session_fn((7,), iter([]), state))
    assert out == []
    assert not state.exists
    # after the horizon the user restarts at seq 1 (accepted tradeoff)
    state.hasTimedOut = False
    out = list(_session_fn((7,), iter([batch(20_000)]), state))
    assert out == [] and state._v[0] == 1


def test_stream_extract_matches_batch(spark, tmp_path):
    from eynollah_spark.fixtures.transcripts import CorpusSpec, generate_spark
    from eynollah_spark.operators.extract import extract_spans

    corpus_dir = str(tmp_path / "turns")
    out_dir = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")
    turns = generate_spark(spark, CorpusSpec(n_convs=12, seed=5), parallelism=4)
    turns.write.parquet(corpus_dir)

    q = stream_extract_spans(spark, corpus_dir, out_dir, ckpt)
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out_dir)
        .orderBy("conv_id", "turn_idx", "span_idx")
        .select("conv_id", "turn_idx", "span_idx", "region_type", "text")
        .collect()
    )
    want = (
        extract_spans(spark.read.parquet(corpus_dir))
        .orderBy("conv_id", "turn_idx", "span_idx")
        .select("conv_id", "turn_idx", "span_idx", "region_type", "text")
        .collect()
    )
    # per-turn span equality; reading_order/ids are per-micro-batch in
    # streaming so global order columns are excluded by selection
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_stream_extract_spans_batch_local_ids(spark, tmp_path):
    """VERDICT r3 #8 — the documented id contract, asserted: a
    conversation split across two micro-batches gets (a) per-turn
    spans byte-equal to the batch pipeline (kernel is stateless), and
    (b) BATCH-LOCAL reading_order/region ids — restarting from 0 in
    each _batch_id partition — so ids are unique only within
    (_batch_id, conv_id) and joins must key on
    (conv_id, turn_idx, span_idx)."""
    import time

    from eynollah_spark.operators.extract import extract_spans

    corpus_dir = str(tmp_path / "turns")
    out_dir = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")

    def turn(conv, idx, text):
        import datetime

        return (conv, idx, "user", text, None, datetime.datetime(2026, 1, 1))

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    # round 1: 8 files (maxFilesPerTrigger) incl. conv c1's first turn
    part1 = [turn("c1", 0, "first half of the conversation here\n\n## Head")]
    fillers = [[turn(f"f{i}", 0, f"filler conversation {i} text body")] for i in range(7)]
    for piece in [part1] + fillers:
        spark.createDataFrame(piece, schema).coalesce(1).write.mode(
            "append"
        ).parquet(corpus_dir)
    time.sleep(1.1)  # mtime-separate the second trigger's files
    # round 2: conv c1 continues in a later micro-batch
    spark.createDataFrame(
        [turn("c1", 1, "second half arrives later\n\n- bullet one")], schema
    ).coalesce(1).write.mode("append").parquet(corpus_dir)

    q = stream_extract_spans(spark, corpus_dir, out_dir, ckpt)
    q.awaitTermination(180)

    out = spark.read.parquet(out_dir)
    c1 = out.filter("conv_id = 'c1'").collect()
    batches = {r["_batch_id"] for r in c1}
    assert len(batches) == 2, "conversation must span two micro-batches"
    # (b) ids are batch-local: reading_order restarts at 0 per batch
    for b in batches:
        ro = sorted(r.reading_order for r in c1 if r["_batch_id"] == b)
        assert ro[0] == 0 and ro == list(range(len(ro)))
    # region ids restart too — the bare id is NOT globally unique
    first_regions = {r.region_id for r in c1}
    assert "region_0001" in first_regions and len(c1) > len(batches) - 1
    # (a) per-turn spans equal the batch pipeline (keyed correctly)
    got = sorted(
        (r.conv_id, r.turn_idx, r.span_idx, r.region_type, r.text)
        for r in out.collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.span_idx, r.region_type, r.text)
        for r in extract_spans(spark.read.parquet(corpus_dir)).collect()
    )
    assert got == want


def test_stream_dedup_docs(spark, tmp_path):
    """In-flight exact dedup: one survivor per text hash, state
    bounded by the watermark."""
    import datetime

    texts = ["alpha text", "beta text", "alpha text", "gamma", "beta text"]
    rows = [
        (i, texts[i % 5], datetime.datetime(2025, 1, 1, 0, i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    src = spark.readStream.schema(df.schema).parquet(d)
    q = (
        stream_dedup_docs(src)
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_docs").collect()
    assert len(got) == 3
    assert {r["text"] for r in got} == {"alpha text", "beta text", "gamma"}


def test_stream_extract_resume_no_duplicates(spark, tmp_path):
    """Restarting the availableNow query from its checkpoint must not
    reprocess committed files."""
    from eynollah_spark.fixtures.transcripts import CorpusSpec, generate_spark

    corpus_dir = str(tmp_path / "turns")
    out_dir = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")
    turns = generate_spark(spark, CorpusSpec(n_convs=8, seed=6), parallelism=4)
    turns.write.parquet(corpus_dir)

    q = stream_extract_spans(spark, corpus_dir, out_dir, ckpt)
    q.awaitTermination(180)
    n1 = spark.read.parquet(out_dir).count()
    # restart: no new files -> no new rows
    q2 = stream_extract_spans(spark, corpus_dir, out_dir, ckpt)
    q2.awaitTermination(180)
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2 > 0


def test_stream_near_dup_docs(spark, tmp_path):
    """In-flight MinHash-band near-dup triage: survivors are exactly
    one doc per distinct leading-band signature — verified against the
    batch signatures (the per-row column is byte-identical to them)."""
    import datetime

    import pyspark.sql.functions as F

    from eynollah_spark.operators.dedup import minhash_signatures
    from eynollah_spark.streaming.jobs import stream_near_dup_docs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, datetime.datetime(2025, 1, 1, 0, 1)),
        (2, base, datetime.datetime(2025, 1, 1, 0, 2)),                     # exact dup
        (3, base.replace("dog", "owl"), datetime.datetime(2025, 1, 1, 0, 3)),
        (4, "completely different content entirely here", datetime.datetime(2025, 1, 1, 0, 4)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    src = spark.readStream.schema(df.schema).parquet(d)
    q = (
        stream_near_dup_docs(src)
        .writeStream.format("memory")
        .queryName("near_dup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select doc_id, sig from near_dup_docs").collect()

    # batch-derived expectation: one survivor per distinct 4-hash band
    bands = {
        r.doc_id: tuple(r.sig[:4]) for r in minhash_signatures(df).collect()
    }
    n_distinct_bands = len(set(bands.values()))
    assert len(got) == n_distinct_bands
    assert {tuple(r.sig[:4]) for r in got} == set(bands.values())
    # the exact dup pair collapsed to one survivor
    survivors = {r.doc_id for r in got}
    assert len(survivors & {1, 2}) == 1
    assert 4 in survivors


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    """The in-flight classifier gate must keep exactly the docs the
    batch classifier keeps (and drop tokenless ones)."""
    import datetime

    from eynollah_spark.operators.text_analysis import hashed_classifier_scores
    from eynollah_spark.streaming.jobs import stream_quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    ts = datetime.datetime(2025, 1, 1)
    rows = [(r.doc_id, r.text, ts) for r in docs.collect()] + [(99_999, "   ", ts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    src = spark.readStream.schema(df.schema).parquet(d)
    q = (
        stream_quality_filter(src)
        .writeStream.format("memory")
        .queryName("quality_filter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("select doc_id from quality_filter").collect()}
    want = {
        r.doc_id
        for r in hashed_classifier_scores(df.drop("ts")).filter("keep").collect()
    }
    assert got == want
    assert 99_999 not in got


def test_stream_incremental_dedup(spark, tmp_path):
    """Stream-static anti join vs the index snapshot: streamed docs
    whose text exists in the static index are dropped; intra-stream
    duplicates are NOT this operator's job and pass through. Result
    must equal the batch incremental exact gate."""
    import datetime

    from eynollah_spark.streaming.jobs import stream_incremental_dedup

    idx_rows = [(100 + i, f"indexed text {i}") for i in range(10)]
    idx = spark.createDataFrame(idx_rows, "doc_id long, text string")
    new_rows = (
        [(i, f"fresh text {i}", datetime.datetime(2025, 1, 1, 0, i)) for i in range(5)]
        + [(50 + i, f"indexed text {i}", datetime.datetime(2025, 1, 1, 1, i)) for i in range(4)]
        + [(90, "fresh text 0", datetime.datetime(2025, 1, 1, 2, 0))]  # intra-stream dup
    )
    df = spark.createDataFrame(new_rows, "doc_id long, text string, ts timestamp")
    d = str(tmp_path / "newdocs")
    df.coalesce(1).write.parquet(d)
    src = spark.readStream.schema(df.schema).parquet(d)
    q = (
        stream_incremental_dedup(src, idx)
        .writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("select * from inc_dedup").collect())
    assert got == [0, 1, 2, 3, 4, 90], got


def test_stream_sft_pairs_matches_batch(spark, tmp_path):
    """One availableNow pass over a turn stream produces exactly the
    batch sft_pairs output at the same context bound (in-order input,
    the module's ordering contract)."""
    from eynollah_spark.fixtures.transcripts import CorpusSpec, generate_spark
    from eynollah_spark.operators.text_analysis import sft_pairs
    from eynollah_spark.streaming.jobs import (
        SFT_STREAM_CONTEXT_TURNS,
        stream_sft_pairs,
    )

    turns = generate_spark(spark, CorpusSpec(n_convs=10, seed=5)).select(
        "conv_id", "turn_idx", "role", "text"
    )
    d = str(tmp_path / "turns")
    turns.coalesce(1).write.parquet(d)

    st = spark.readStream.schema(turns.schema).parquet(d)
    q = (
        stream_sft_pairs(st)
        .writeStream.format("memory")
        .queryName("sftp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.conv_id, r.turn_idx, r.prompt, r.response, r.n_context_turns)
        for r in spark.sql("select * from sftp").collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.prompt, r.response, r.n_context_turns)
        for r in sft_pairs(
            turns, max_context_turns=SFT_STREAM_CONTEXT_TURNS
        ).collect()
    )
    assert got and got == want


def test_sft_fn_state_across_batches_and_replay():
    """Context carries across micro-batches; the rolling buffer stays
    bounded at K turns; a replayed turn_idx emits nothing twice."""
    import pandas as pd

    from eynollah_spark.streaming.jobs import SFT_STREAM_CONTEXT_TURNS, _sft_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v = None
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    def batch(idxs):
        return pd.DataFrame(
            {
                "turn_idx": idxs,
                "role": ["user" if i % 2 == 0 else "assistant" for i in idxs],
                "text": [f"t{i}" for i in idxs],
            }
        )

    state = FakeState()
    out1 = list(_sft_fn(("c1",), iter([batch([0, 1])]), state))
    assert out1[0]["prompt"].tolist() == ["user: t0"]
    # batch 2 continues the same conversation AND replays turn 1:
    # the replay is recognized (idx in the seen set) — skipped
    # silently, NOT counted as an ordering violation
    out2 = list(_sft_fn(("c1",), iter([batch([1, 2, 3])]), state))
    assert out2[0]["turn_idx"].tolist() == [3]
    assert out2[0]["prompt"].tolist() == ["user: t0\n\nassistant: t1\n\nuser: t2"]
    assert out2[0]["n_dropped_ooo"].tolist() == [0]
    # a long stream keeps only the last K turns in state
    long = batch(list(range(4, 4 + 3 * SFT_STREAM_CONTEXT_TURNS)))
    list(_sft_fn(("c1",), iter([long]), state))
    ctx, last_idx, seen, n_ooo = state.get
    assert len(ctx) == SFT_STREAM_CONTEXT_TURNS
    assert last_idx == 3 + 3 * SFT_STREAM_CONTEXT_TURNS
    assert n_ooo == 0


def test_sft_fn_flags_late_out_of_order_turn():
    """ADVICE r3: an idx <= last_idx that was NEVER seen is a late
    out-of-order arrival — a violation of the in-order contract. It is
    still dropped (prompts already emitted can't be rewritten) but the
    violation is counted and surfaced on every later pair, so the
    contract is observable instead of documentation-only."""
    import pandas as pd

    from eynollah_spark.streaming.jobs import _sft_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v = None
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    def batch(idxs):
        return pd.DataFrame(
            {
                "turn_idx": idxs,
                "role": ["user" if i % 2 == 0 else "assistant" for i in idxs],
                "text": [f"t{i}" for i in idxs],
            }
        )

    state = FakeState()
    # batch 1 delivers turns 0 and 3 (turns 1-2 delayed in transit)
    list(_sft_fn(("c1",), iter([batch([0, 3])]), state))
    # batch 2: the late turns 1, 2 finally arrive, plus new turn 5
    out = list(_sft_fn(("c1",), iter([batch([1, 2, 5])]), state))
    assert out[0]["turn_idx"].tolist() == [5]
    assert out[0]["n_dropped_ooo"].tolist() == [2]
    # and the count persists in state
    assert state.get[3] == 2
