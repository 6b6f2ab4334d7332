"""Deterministic synthetic transcripts corpus + reference query set.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
  (conv_id string, turn_idx int32, role string, text string,
   tool string nullable, ts timestamp)

Generation is fully seeded and numpy-vectorized: same seed → byte-identical
table → byte-identical index → identical BM25 ranks at any parallelism.
Token distribution is Zipfian so a handful of head terms dominate (exercises
the skew/salting path — the reference's "Rock" problem,
/root/reference/docs/query-performance-optimizations.md:347-356). Edge cases
baked in: mixed case, punctuation, empty strings, unicode, very long turns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "bash", "read_file", "write_file", "browser"])

# Vocabulary: head terms first (Zipf rank 1..V). Deterministic synthetic
# wordforms keep the vocab arbitrary-size without external word lists.
_HEAD_WORDS = [
    "spark", "index", "query", "token", "merge", "shuffle", "agent", "turn",
    "table", "scan", "join", "sort", "batch", "stream", "score", "rank",
]


def _vocab(size: int) -> np.ndarray:
    words = list(_HEAD_WORDS)
    i = 0
    while len(words) < size:
        words.append(f"w{i:05d}")
        i += 1
    return np.array(words[:size])


def make_transcripts(
    n_conversations: int = 500,
    mean_turns: int = 10,
    vocab_size: int = 2000,
    zipf_a: float = 1.3,
    seed: int = 42,
) -> pd.DataFrame:
    """Build the transcripts table as pandas (written to parquet by callers)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)

    turns_per_conv = rng.poisson(mean_turns, n_conversations).clip(1, 60)
    n_turns = int(turns_per_conv.sum())

    conv_ids = np.repeat(
        np.array([f"conv-{i:08d}" for i in range(n_conversations)]),
        turns_per_conv,
    )
    turn_idx = np.concatenate([np.arange(c) for c in turns_per_conv]).astype(np.int32)

    roles = ROLES[rng.integers(0, len(ROLES), n_turns)]
    tools = np.where(
        roles == "tool", TOOLS[rng.integers(0, len(TOOLS), n_turns)], None
    )

    # Zipfian text: tokens-per-turn ~ lognormal; token ranks ~ Zipf(a).
    toks_per_turn = np.maximum(
        1, rng.lognormal(mean=2.5, sigma=0.8, size=n_turns).astype(np.int64)
    )
    total_tokens = int(toks_per_turn.sum())
    ranks = rng.zipf(zipf_a, total_tokens)
    ranks = np.minimum(ranks, vocab_size) - 1
    words = vocab[ranks]
    bounds = np.cumsum(toks_per_turn)[:-1]
    texts = np.array(
        [" ".join(chunk) for chunk in np.split(words, bounds)], dtype=object
    )

    # Edge cases at deterministic positions.
    if n_turns >= 20:
        texts[3] = ""  # empty turn
        texts[7] = "  Spark, INDEX!!  query?? 42 ünïcode—emoji🙂 " + texts[7]
        texts[11] = ("longturn " + texts[11] + " ") * 200  # >10 KB
        texts[15] = "MiXeD CaSe TOKEN Spark SPARK spark"

    base = np.datetime64("2026-01-01T00:00:00")
    ts = base + np.arange(n_turns).astype("timedelta64[s]")

    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            # keep object dtype: .astype(str) would allocate a fixed-width
            # <U{maxlen} array sized by the 20 KB edge-case turn (~10 GB at
            # 100k turns)
            "text": texts,
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def make_queries(
    transcripts: pd.DataFrame, n_queries: int = 40, seed: int = 42
) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): head terms, rare terms, mixed,
    absent terms, case/punctuation variants; k in {10, 100}."""
    rng = np.random.default_rng(seed + 1)
    from discogsography_spark.analysis import tokenize_py

    counts: dict[str, int] = {}
    for t in transcripts["text"]:
        for w in tokenize_py(t):
            counts[w] = counts.get(w, 0) + 1
    by_freq = sorted(counts, key=lambda w: (-counts[w], w))
    head = by_freq[:10]
    rare = [w for w in by_freq if counts[w] <= 3][:40] or by_freq[-40:]

    rows = []
    qid = 0

    def add(qtext: str, k: int) -> None:
        nonlocal qid
        rows.append({"query_id": f"q-{qid:04d}", "query_text": qtext, "k": k})
        qid += 1

    for w in head[:5]:
        add(w, 10)  # single head term (skew path)
    for i in range(5):
        add(rare[i % len(rare)], 10)  # rare term
    for i in range(8):  # mixed head+rare (pruning path)
        h = head[int(rng.integers(0, len(head)))]
        r = rare[int(rng.integers(0, len(rare)))]
        add(f"{h} {r}", 10 if i % 2 else 100)
    for i in range(6):  # multi head terms
        ws = rng.choice(head, size=int(rng.integers(2, 4)), replace=False)
        add(" ".join(ws), 100)
    add("zzz-absent-term-xq", 10)  # absent → empty result
    add(f"{head[0]} zzzabsentxq", 10)  # AND with absent → empty
    add(head[0].upper() + "!!", 10)  # analyzer path: case+punct
    add(f"  {head[1].title()},  {head[2].upper()}. ", 10)
    while qid < n_queries:
        ws = rng.choice(
            by_freq[: min(200, len(by_freq))],
            size=int(rng.integers(1, 5)),
            replace=False,
        )
        add(" ".join(ws), 10 if qid % 3 else 100)
    return pd.DataFrame(rows)


def write_corpus(out_dir: str, **kwargs) -> tuple[str, str]:
    """Write transcripts.parquet + queries.parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tdf = make_transcripts(**kwargs)
    qdf = make_queries(tdf, seed=kwargs.get("seed", 42))
    tpath = os.path.join(out_dir, "transcripts.parquet")
    qpath = os.path.join(out_dir, "queries.parquet")
    tdf.to_parquet(tpath, index=False)
    qdf.to_parquet(qpath, index=False)
    return tpath, qpath
