"""Deterministic synthetic transcripts corpus (north-rule input table).

Schema from BASELINE.json input_hint:
    transcripts(conv_id:string, turn_idx:int32, role:string, text:string,
                tool:string, ts:timestamp)

Every cell is a pure function of (seed, conv_index, turn_idx) computed with
a counter-based splitmix64 hash — so the distributed generator produces
byte-identical rows at any partition count, and the single-process oracle
can regenerate the identical corpus without Spark. Term distribution is
Zipfian over a ~10k-word vocabulary (heavy stopwords) so skew handling is
exercised even at small scale (FIXTURES.md §1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 10_000
ZIPF_EXPONENT = 1.07
MIN_TURNS, MAX_TURNS = 8, 32
MIN_TOKENS, MAX_TOKENS = 5, 200
BASE_EPOCH_S = 1735689600  # 2025-01-01T00:00:00Z
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "python", "browser", "calculator"])

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_U64 = np.uint64


def _mix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    """hash -> float64 in [0,1)."""
    return (_mix(x) >> _U64(11)).astype(np.float64) / float(1 << 53)


def _vocab() -> np.ndarray:
    # wNNNN tokens: pure [a-z0-9]+, round-trip exactly through tokenizer v1
    return np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_EXPONENT
    p /= p.sum()
    return np.cumsum(p)


_VOCAB = _vocab()
_CDF = _zipf_cdf()


def conv_turn_counts(conv_idx: np.ndarray, seed: int) -> np.ndarray:
    h = _mix(conv_idx.astype(np.uint64) ^ _U64(seed * 0x51ED2701))
    return (MIN_TURNS + (h % _U64(MAX_TURNS - MIN_TURNS + 1))).astype(np.int64)


def synth_conversations(conv_idx: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate all turns for the given conversation indices (vectorized)."""
    conv_idx = np.asarray(conv_idx, dtype=np.int64)
    nturns = conv_turn_counts(conv_idx, seed)
    conv_rep = np.repeat(conv_idx, nturns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int64) for n in nturns]) if len(
        nturns
    ) else np.empty(0, dtype=np.int64)

    # one 64-bit key per turn; all turn-level draws derive from it
    tkey = (conv_rep.astype(np.uint64) * _U64(0x100000001B3)) ^ turn_idx.astype(
        np.uint64
    ) ^ _U64(seed * 0xC2B2AE3D)

    tok_counts = (
        MIN_TOKENS + (_mix(tkey ^ _U64(1)) % _U64(MAX_TOKENS - MIN_TOKENS + 1))
    ).astype(np.int64)

    # per-token uniforms: key = turn_key + position (counter-based)
    tok_base = np.repeat(_mix(tkey ^ _U64(2)), tok_counts)
    tok_pos = np.concatenate(
        [np.arange(n, dtype=np.uint64) for n in tok_counts]
    ) if len(tok_counts) else np.empty(0, dtype=np.uint64)
    u = _uniform(tok_base + tok_pos)
    word_ids = np.searchsorted(_CDF, u, side="right")
    words = _VOCAB[word_ids]

    # join tokens per turn
    bounds = np.cumsum(tok_counts)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]

    role_draw = _mix(tkey ^ _U64(3)) % _U64(100)
    roles = np.where(
        turn_idx % 2 == 0,
        np.where(role_draw < 8, "system", "user"),
        np.where(role_draw < 15, "tool", "assistant"),
    )
    tool_pick = (_mix(tkey ^ _U64(4)) % _U64(len(TOOLS) - 1)).astype(np.int64) + 1
    tools = np.where(roles == "tool", TOOLS[tool_pick], "")

    ts = (
        BASE_EPOCH_S
        + conv_rep * 3600
        + turn_idx * 13
        + (_mix(tkey ^ _U64(5)) % _U64(11)).astype(np.int64)
    )

    return pd.DataFrame(
        {
            "conv_id": pd.Series([f"conv_{c:08d}" for c in conv_rep], dtype="string"),
            "turn_idx": turn_idx.astype(np.int32),
            "role": pd.Series(roles, dtype="string"),
            "text": pd.Series(texts, dtype="string"),
            "tool": pd.Series(tools, dtype="string"),
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def transcripts_pdf(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Single-process corpus (oracle / unit tests)."""
    return synth_conversations(np.arange(n_convs, dtype=np.int64), seed)


def transcripts_df(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed corpus: spark.range over conv indices -> mapInPandas
    expansion. Identical bytes at any partition count (content is a pure
    function of conv index), so this scales to any corpus size without a
    driver bottleneck."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield synth_conversations(pdf["id"].to_numpy(dtype=np.int64), seed)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md §2): frequent terms, rare terms,
# stopword-only, multi-term, and no-hit queries. Fixed literals — this is
# "the reference query set" the north rule scores against.
# ---------------------------------------------------------------------------

QUERY_SET: list[tuple[str, str, int]] = [
    ("q_0001", "w0000", 10),                      # heaviest stopword
    ("q_0002", "w0001 w0002", 10),                # two stopwords
    ("q_0003", "w0042 w0137", 10),                # mid-frequency pair
    ("q_0004", "w1234 w5678", 10),                # rare pair
    ("q_0005", "w0007 w9999", 10),                # stopword + ultra-rare
    ("q_0006", "w0003 w0250 w2500 w7500", 10),    # mixed 4-term
    ("q_0007", "zzz9 nohit", 10),                 # no-hit (oov terms)
    ("q_0008", "w0100 w0100 w0200", 10),          # repeated query term
    ("q_0009", "w0011 w0023 w0035", 5),           # k=5
    ("q_0010", "w8000", 10),                      # single rare term
]


def bench_queries_pdf(n: int = 400, seed: int = 7) -> pd.DataFrame:
    """Deterministic n-query workload for throughput benchmarks: 1-4 terms
    drawn across the Zipf range (heavy stopwords through ultra-rare)."""
    keys = np.arange(n, dtype=np.uint64) ^ _U64(seed * 0x9E3779B1)
    n_terms = (1 + (_mix(keys ^ _U64(11)) % _U64(4))).astype(np.int64)
    rows = []
    for i in range(n):
        ks = _mix(keys[i] + np.arange(int(n_terms[i]), dtype=np.uint64))
        # skew term picks like real queries: mostly common, some rare
        ranks = (ks % _U64(VOCAB_SIZE)).astype(np.int64)
        ranks = np.where(ranks % 3 == 0, ranks % 50, ranks)  # bias to head
        text = " ".join(_VOCAB[r] for r in ranks)
        rows.append((f"bq_{i:04d}", text, 10))
    return pd.DataFrame(rows, columns=["query_id", "text", "k"])


def queries_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [(q, t, k) for q, t, k in QUERY_SET],
        columns=["query_id", "text", "k"],
    )


def queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(queries_pdf(), schema="query_id string, text string, k int")
