"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp)

All randomness is a seeded numpy RandomState (seed=42 by default); no
wall-clock.  Guaranteed invariants (tests rely on them):

* (conv_id, turn_idx) unique; turn_idx dense 0..k-1 per conversation
* ts strictly increasing within a conversation
* top-10 vocabulary terms appear in >30% of turns (hot-term skew)
* >=5% of turns carry a unique token ``tok_<n>`` (singleton posting lists)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z, fixed (no now())

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(
    ["search", "browser", "python", "bash", "editor", "calendar",
     "mail", "sql", "scraper", "planner", "vision", "compiler"]
)

# ~5k-word vocabulary: a small core of real-ish words + generated word ids.
_CORE = (
    "the a and of to in for on with error deploy failure retry timeout agent model "
    "token prompt tool call response user system plan step code test build run "
    "query index search result data file line commit branch merge cluster node "
    "task message turn context memory cache batch stream shard split doc term"
).split()


def _vocab(size: int = 5000) -> np.ndarray:
    extra = [f"w{index:04d}" for index in range(size - len(_CORE))]
    return np.array(_CORE + extra)


def generate_transcripts(
    n_conversations: int = 200, seed: int = 42, zipf_a: float = 1.3, id_offset: int = 0
) -> pd.DataFrame:
    """Generate the transcripts table as a pandas DataFrame.

    ``id_offset`` shifts the conv-id range (chunked multi-file generation:
    each chunk is seeded independently, so content is deterministic per
    (chunk, seed) without materializing the whole corpus in RAM)."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    v = len(vocab)

    turns_per_conv = rng.randint(1, 41, size=n_conversations)
    total = int(turns_per_conv.sum())
    conv_ids = np.repeat(
        np.array([f"conv-{i + id_offset:08d}" for i in range(n_conversations)]),
        turns_per_conv,
    )
    turn_idx = np.concatenate([np.arange(k) for k in turns_per_conv]).astype(np.int32)

    # roles: cyclic user/assistant with seeded tool/system insertions
    role_idx = (turn_idx % 2).astype(np.int64)  # user, assistant
    special = rng.rand(total)
    role_idx[special < 0.08] = 3  # tool
    role_idx[(special >= 0.08) & (special < 0.12)] = 2  # system
    roles = ROLES[role_idx]
    tools = np.where(roles == "tool", TOOLS[rng.randint(0, len(TOOLS), size=total)], "")

    # text: Zipf mixture over vocab (hot head) + unique rare tokens + edge cases
    lens = rng.randint(5, 121, size=total)
    flat_n = int(lens.sum())
    word_ranks = rng.zipf(zipf_a, size=flat_n)
    word_ids = np.minimum(word_ranks - 1, v - 1)
    words = vocab[word_ids].astype(object)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))

    texts = np.empty(total, dtype=object)
    # per-turn seeded decorations
    uniq_mask = rng.rand(total) < 0.06  # >=5% unique-token turns
    long_mask = rng.rand(total) < 0.01  # >40-char token (tokenizer edge)
    case_mask = rng.rand(total) < 0.15  # mixed case
    punct_mask = rng.rand(total) < 0.30  # punctuation / multi-sentence
    for i in range(total):
        toks = words[starts[i] : starts[i] + lens[i]].tolist()
        if uniq_mask[i]:
            toks[int(lens[i] // 2)] = f"tok_{seed}_{i:08d}"
        if long_mask[i]:
            toks[0] = "longtoken" + "x" * 40
        if case_mask[i]:
            toks[1] = toks[1].upper()
        if punct_mask[i]:
            mid = len(toks) // 2
            toks[mid] = toks[mid] + "."
            toks[-1] = toks[-1] + "!"
        texts[i] = " ".join(toks)

    # ts strictly increasing within conversation
    steps = rng.randint(1, 301, size=total).astype(np.int64)
    conv_base = (rng.randint(0, 90 * 24 * 3600, size=n_conversations)).astype(np.int64)
    base_rep = np.repeat(conv_base, turns_per_conv)
    # cumulative steps per conversation (segmented cumsum)
    csum = np.cumsum(steps)
    seg_starts = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    seg_base = np.repeat(csum[seg_starts] - steps[seg_starts], turns_per_conv)
    ts_epoch = BASE_EPOCH + base_rep + (csum - seg_base)

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts_epoch, unit="s"),
        }
    )


def write_transcripts_parquet(
    path: str, n_conversations: int = 200, seed: int = 42, n_files: int = 1
) -> int:
    """Materialize the table as parquet; returns row count.

    ``n_files > 1`` writes a directory of part files (chunk-seeded, bounded
    generator memory) — a realistic multi-file source whose scan
    parallelizes across tasks without relying on row-group splitting."""
    if n_files <= 1:
        df = generate_transcripts(n_conversations, seed)
        # microsecond ts: Spark cannot read parquet TIMESTAMP(NANOS)
        df["ts"] = df["ts"].astype("datetime64[us]")
        # small row groups keep the single file splittable: Spark assigns row
        # groups to scan tasks by byte range, so one giant row group would
        # serialize the whole source scan onto one core
        df.to_parquet(path, index=False, row_group_size=25_000)
        return len(df)
    import os

    os.makedirs(path, exist_ok=True)
    per = -(-n_conversations // n_files)
    total = 0
    for i in range(n_files):
        lo, hi = i * per, min(n_conversations, (i + 1) * per)
        if lo >= hi:
            break
        df = generate_transcripts(hi - lo, seed=seed + i, id_offset=lo)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(
            os.path.join(path, f"part-{i:05d}.parquet"), index=False, row_group_size=25_000
        )
        total += len(df)
    return total


# --- micro fixtures (FIXTURES.md F5) ---------------------------------------


def corpus4() -> pd.DataFrame:
    """Analog of the reference's 4-doc test corpus
    (quickwit-indexing/data/test_corpus.json)."""
    return pd.DataFrame(
        {
            "conv_id": ["conv-a"] * 4,
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["hello", "happy", "tax", "payer"],
            "tool": [""] * 4,
            "ts": pd.to_datetime(BASE_EPOCH + np.arange(4), unit="s"),
        }
    )


def snoopy() -> pd.DataFrame:
    """The 2-doc beagle/snoopy pair from the reference
    test_single_node_simple (quickwit-search/src/lib.rs:224-252)."""
    return pd.DataFrame(
        {
            "conv_id": ["conv-s", "conv-s"],
            "turn_idx": np.array([0, 1], dtype=np.int32),
            "role": ["user", "assistant"],
            "text": [
                "snoopy is an anthropomorphic beagle",
                "la flute de pan is a movie about a beagle",
            ],
            "tool": ["", ""],
            "ts": pd.to_datetime([BASE_EPOCH, BASE_EPOCH + 1], unit="s"),
        }
    )


def timefilter30() -> pd.DataFrame:
    """30 'info' turns with ts = 1..30, reproducing the reference
    test_single_node_filtering semantics (quickwit-search/src/lib.rs:326-424)."""
    return pd.DataFrame(
        {
            "conv_id": ["conv-t"] * 30,
            "turn_idx": np.arange(30, dtype=np.int32),
            "role": ["user"] * 30,
            "text": [f"info event number {i}" for i in range(30)],
            "tool": [""] * 30,
            "ts": pd.to_datetime(np.arange(1, 31), unit="s"),
        }
    )
