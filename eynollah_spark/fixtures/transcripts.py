"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Every turn is a pure function of ``(seed, conv_ord, turn_idx)`` — no
global RNG state — so the corpus can be generated either single-node
(for oracle fixtures) or distributed (``spark.range`` over conversation
ordinals + ``mapInPandas`` fan-out) with bit-identical results, and any
subset can be regenerated independently. The feature mix injects one
text shape per reference operator (see FIXTURES.md §1 table):
boilerplate frames, fenced tool blocks, separators, role banners,
marginal notes, multi-column segments, drop capitals, small fragments,
deterministic indent skew, long-conversation skew, empty turns.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat "
    "duis aute irure reprehenderit voluptate velit esse cillum fugiat nulla "
    "pariatur excepteur sint occaecat cupidatat proident sunt culpa officia "
    "deserunt mollit anim laborum"
).split()

_TOOLS = ("search", "calculator", "browser", "python", "db_query")

_HEADINGS = ("Overview", "Details", "Results", "Plan", "Notes", "Summary")

_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


@dataclass(frozen=True)
class CorpusSpec:
    n_convs: int = 100
    seed: int = 42
    # long-conversation skew: every `skew_every`-th conversation gets
    # `skew_mult` x the base turn count (north_rule salting path)
    skew_every: int = 50
    skew_mult: int = 40
    base_turns_min: int = 3
    base_turns_max: int = 16
    # §5h header-vote blocks (off by default so the benchmark corpus
    # stays byte-identical across rounds): short heading PAIRS whose
    # lead char is non-ASCII — the per-line rules see text, model B
    # sees headers, and only the per-REGION majority vote can relabel
    vote_blocks: bool = False


def _rng(spec_seed: int, conv_ord: int, turn_idx: int) -> np.random.RandomState:
    h = hashlib.md5(f"{spec_seed}:{conv_ord}:{turn_idx}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def conv_id_for(conv_ord: int) -> str:
    return f"conv{conv_ord:08d}"


def n_turns_for(conv_ord: int, spec: CorpusSpec) -> int:
    r = _rng(spec.seed, conv_ord, -1)
    base = int(r.randint(spec.base_turns_min, spec.base_turns_max + 1))
    if spec.skew_every and conv_ord % spec.skew_every == spec.skew_every - 1:
        return base * spec.skew_mult
    return base


def _sentence(r: np.random.RandomState, lo=4, hi=10) -> str:
    k = int(r.randint(lo, hi + 1))
    return " ".join(_WORDS[i] for i in r.randint(0, len(_WORDS), k))


def _paragraph_lines(r: np.random.RandomState, n_lines: int, skew: float) -> list[str]:
    out = []
    for i in range(n_lines):
        indent = " " * max(0, int(round(skew * i)))
        out.append(indent + _sentence(r))
    return out


def _multicolumn_lines(r: np.random.RandomState) -> list[str]:
    ncol = int(r.randint(2, 4))
    nrows = int(r.randint(3, 7))
    widths = [int(r.randint(14, 22)) for _ in range(ncol)]
    rows = []
    for _ in range(nrows):
        cells = []
        for w in widths:
            cell = _sentence(r, 2, 3)[:w].strip()
            cells.append(cell.ljust(w))
        rows.append("   ".join(cells).rstrip())
    return rows


def _tool_payload(r: np.random.RandomState) -> str:
    n = int(r.randint(1, 6))
    lines = [
        '{"result": %d, "score": %.3f}' % (int(r.randint(0, 1000)), float(r.rand()))
        for _ in range(n)
    ]
    return "\n".join(lines)


def gen_turn(conv_ord: int, turn_idx: int, spec: CorpusSpec):
    """Returns (role, text, tool, ts) for one turn; pure function."""
    r = _rng(spec.seed, conv_ord, turn_idx)
    ts = _BASE_TS + timedelta(
        seconds=conv_ord * 3600 + turn_idx * 30 + int(r.randint(0, 10))
    )

    # role
    if turn_idx == 0 and r.rand() < 0.3:
        role = "system"
    elif r.rand() < 0.15:
        role = "tool"
    else:
        role = "user" if turn_idx % 2 == 0 else "assistant"

    if role == "tool":
        return role, _tool_payload(r), _TOOLS[int(r.randint(0, len(_TOOLS)))], ts

    # degenerate turns (empty-page early exit path)
    p = r.rand()
    if p < 0.03:
        return role, "", "", ts
    if p < 0.05:
        return role, "   \n \n  ", "", ts

    parts: list[str] = []

    # boilerplate banner (page-border analog)
    if r.rand() < 0.5:
        parts.append(f"=== SESSION {int(r.randint(1000, 9999))} ===")

    n_bands = int(r.randint(1, 4))
    for b in range(n_bands):
        if b > 0:
            # band separation: rule line or double blank
            if r.rand() < 0.6:
                parts.append("")
                parts.append(["---", "***", "=====", "___"][int(r.randint(0, 4))])
                parts.append("")
            else:
                parts.append("")
                parts.append("")

        # heading
        if r.rand() < 0.4:
            if r.rand() < 0.5:
                parts.append(f"## {_HEADINGS[int(r.randint(0, len(_HEADINGS)))]}")
            else:
                parts.append(
                    ["USER:", "ASSISTANT:", "SYSTEM:", "NOTE:"][int(r.randint(0, 4))]
                    + " " * int(r.randint(0, 2))
                )

        shape = r.rand()
        if shape < 0.15:
            # fenced tool block
            parts.append("```")
            for _ in range(int(r.randint(1, 4))):
                parts.append("out = f(%d)" % int(r.randint(0, 99)))
            parts.append("```")
        elif shape < 0.30:
            # multi-column segment
            parts.extend(_multicolumn_lines(r))
        else:
            skew = float(r.uniform(-0.45, 0.45))
            nl = int(r.randint(2, 7))
            # drop capital: single uppercase letter line, then paragraph
            if r.rand() < 0.15:
                parts.append(_WORDS[int(r.randint(0, len(_WORDS)))][0].upper())
            parts.extend(_paragraph_lines(r, nl, skew))
            # small fragment adjacent to the paragraph
            if r.rand() < 0.15:
                parts.append("ok"[: int(r.randint(1, 3))])

        # marginal note
        if r.rand() < 0.15:
            parts.append(f"[note: {_sentence(r, 2, 4)}]")

        # §5h vote block: a 2-line heading block isolated by blanks,
        # each line failing the per-line header regex on the original
        # (leading '§') but model-B-header after binarization
        if spec.vote_blocks and r.rand() < 0.3:
            h1 = _HEADINGS[int(r.randint(0, len(_HEADINGS)))].upper()
            h2 = _HEADINGS[int(r.randint(0, len(_HEADINGS)))].upper()
            parts.append("")
            parts.append(f"§{h1}: {_sentence(r, 1, 3)}")
            parts.append(f"§{h2}: {_sentence(r, 1, 3)}")
            parts.append("")

    # non-ASCII noise turn (binarized-retry path): em-dash rules +
    # unicode-only "text" lines that model A and B disagree on
    if r.rand() < 0.02:
        parts = ["——" * 3, "…", "——" * 4, "•••"] + parts[:1]

    # footer
    if r.rand() < 0.4:
        parts.append("(c) 2025 ExampleCorp. All rights reserved.")

    return role, "\n".join(parts), "", ts


def generate_local(spec: CorpusSpec) -> pd.DataFrame:
    """Single-node generation — for tests and oracle fixtures."""
    rows = []
    for c in range(spec.n_convs):
        cid = conv_id_for(c)
        for t in range(n_turns_for(c, spec)):
            role, text, tool, ts = gen_turn(c, t, spec)
            rows.append((cid, t, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def generate_spark(spark, spec: CorpusSpec, parallelism: int | None = None):
    """Distributed generation: spark.range over conversation ordinals,
    mapInPandas fan-out to turns. Identical bytes to generate_local."""
    import pyspark.sql.functions as F

    n_parts = parallelism or spark.sparkContext.defaultParallelism

    def expand(batches):
        for pdf in batches:
            out = []
            for c in pdf["id"].tolist():
                cid = conv_id_for(c)
                for t in range(n_turns_for(c, spec)):
                    role, text, tool, ts = gen_turn(c, t, spec)
                    out.append((cid, t, role, text, tool, ts))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    # repartition by a hash of the ordinal so skewed (long) conversations
    # spread across tasks instead of clustering at the tail
    ords = (
        spark.range(spec.n_convs)
        .repartition(n_parts, F.col("id"))
    )
    return ords.mapInPandas(expand, schema=TRANSCRIPT_SCHEMA)
