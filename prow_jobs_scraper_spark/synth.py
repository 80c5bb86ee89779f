"""Deterministic synthetic ``transcripts`` corpus + reference query set.

Shape is the authoritative input table from BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Generation (seeded, numpy-vectorized, per FIXTURES.md §1-2):
- conversation lengths ~ Zipf (1..200 turns) + one deliberately giant
  conversation (skew);
- token stream over a ~5000-word vocabulary with Zipfian frequencies;
- 4 ultra-hot terms injected into >30% of turns (exercises hot-term salt
  splitting);
- edge-case turns: empty, punctuation-only, MixedCase, digits, repeated
  terms (tf > 1);
- ts monotone per conversation, spread over 4 ISO weeks (time-partition
  pruning, mirroring the reference's weekly indices —
  reference src/prowjobsscraper/event.py:184-202).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = [
    "bash", "python", "browser", "editor", "search",
    "calculator", "sql", "compiler", "linter", None,
]
HOT_TERMS = ["the_hot_term", "spark", "agent", "tool_call"]

_EDGE_TEXTS = [
    "",
    "!!! ??? ...",
    "MiXeD CaSe TeXt With CAPS",
    "12345 67890 0xdeadbeef 42",
    "dup dup dup dup dup token token",
    "   \t\n  ",
    "under_scored_term and-hyphenated-term",
]


def make_vocab(size: int = 5000) -> np.ndarray:
    """Deterministic vocabulary: w00000..wNNNNN plus the hot terms."""
    vocab = np.array([f"w{i:05d}" for i in range(size)], dtype=object)
    vocab[: len(HOT_TERMS)] = HOT_TERMS
    return vocab


def synth_transcripts_pandas(
    n_turns: int = 2000,
    seed: int = 42,
    vocab_size: int = 5000,
    giant_conv_frac: float = 0.05,
) -> pd.DataFrame:
    """Build the corpus as one pandas frame (small scales / tests).

    For bench scales use :func:`synth_transcripts` which parallelizes
    generation across Spark partitions with per-partition derived seeds.
    """
    rng = np.random.default_rng(seed)
    vocab = make_vocab(vocab_size)

    # --- conversation layout: Zipf lengths + one giant conversation -----
    giant_len = max(1, int(n_turns * giant_conv_frac))
    lengths: list[int] = []
    remaining = n_turns - giant_len
    while remaining > 0:
        ln = int(min(rng.zipf(1.3), 200, remaining))
        lengths.append(ln)
        remaining -= ln
    conv_lens = np.array([giant_len] + lengths, dtype=np.int64)
    n_convs = conv_lens.size
    conv_ids = np.repeat(
        np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object), conv_lens
    )
    turn_idx = np.concatenate([np.arange(ln, dtype=np.int64) for ln in conv_lens])
    n = conv_ids.size

    # --- text: Zipfian tokens, hot-term injection, edge cases -----------
    words_per_turn = rng.integers(3, 40, size=n)
    ranks = rng.zipf(1.15, size=int(words_per_turn.sum()))
    ranks = np.minimum(ranks - 1, vocab_size - 1)
    tokens = vocab[ranks]
    bounds = np.cumsum(words_per_turn)[:-1]
    texts = [" ".join(t) for t in np.split(tokens, bounds)]

    hot_mask = rng.random(n) < 0.35  # >30% of turns carry a hot term
    hot_pick = rng.integers(0, len(HOT_TERMS), size=n)
    for i in np.flatnonzero(hot_mask):
        texts[i] = f"{HOT_TERMS[hot_pick[i]]} {texts[i]}"
    edge_rows = rng.choice(n, size=min(len(_EDGE_TEXTS), n), replace=False)
    for j, i in enumerate(edge_rows):
        texts[i] = _EDGE_TEXTS[j]

    # --- roles / tools / timestamps --------------------------------------
    roles = np.array(ROLES, dtype=object)[turn_idx % len(ROLES)]
    tool_pick = rng.integers(0, len(TOOLS), size=n)
    tools = np.array([TOOLS[t] for t in tool_pick], dtype=object)
    # conversations start spread over 4 ISO weeks; turns 1 minute apart
    conv_start = rng.integers(0, 28 * 24 * 3600, size=n_convs)
    base = pd.Timestamp("2025-06-02 00:00:00")  # a Monday (ISO week start)
    ts = (
        base
        + pd.to_timedelta(np.repeat(conv_start, conv_lens), unit="s")
        + pd.to_timedelta(turn_idx * 60, unit="s")
    )

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def synth_transcripts(spark, n_turns: int, seed: int = 42, n_partitions: int = 32):
    """Distributed corpus generation: one seeded pandas generator per
    partition (mapInPandas over a range frame), so bench-scale corpora are
    built in parallel without ever materializing on the driver."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    per_part = max(1, n_turns // n_partitions)
    parts = spark.range(n_partitions).repartition(n_partitions, "id")

    def gen(batches):
        for pdf in batches:
            for pid in pdf["id"].tolist():
                out = synth_transcripts_pandas(per_part, seed=seed + int(pid))
                out["conv_id"] = out["conv_id"].str.replace(
                    "conv-", f"conv-p{int(pid):04d}-", regex=False
                )
                yield out

    schema = (
        "conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp"
    )
    return parts.mapInPandas(gen, schema=schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def reference_query_set() -> list[dict]:
    """The reference query set (FIXTURES.md §2): single/two-term, hot,
    rare, hot+rare, no-hit, repeated-term, and a >k tie-heavy query.

    The two-term shape mirrors the reference's analyzed conjunctive match
    on "baremetalds-packet-setup" (reference src/jobsautoreport/
    query.py:47-74 — ES ``match`` with ``operator: and``)."""
    return [
        {"query_id": "q-001", "query_text": "spark", "k": 10},
        {"query_id": "q-002", "query_text": "w00042 w00099", "k": 10},
        {"query_id": "q-003", "query_text": "the_hot_term", "k": 5},
        {"query_id": "q-004", "query_text": "w04999", "k": 10},
        {"query_id": "q-005", "query_text": "the_hot_term w01000", "k": 10},
        {"query_id": "q-006", "query_text": "zzz_never_appears", "k": 10},
        {"query_id": "q-007", "query_text": "spark spark agent", "k": 10},
        {"query_id": "q-008", "query_text": "w00005", "k": 5},
        {"query_id": "q-009", "query_text": "agent tool_call", "k": 10},
        {"query_id": "q-010", "query_text": "Dup-Token, DUP!", "k": 10},
    ]
