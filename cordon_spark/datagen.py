"""Deterministic synthetic transcript generator (FIXTURES.md §1-3).

Schema per BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string,
   tool string nullable, ts timestamp)

Content recipe mirrors the reference's integration fixture
(tests/test_integration.py:14-23): mostly templated turns with a seeded
minority of semantically unique anomaly turns planted at known positions.
Edge cases included per FIXTURES.md: conversations shorter than the
window, empty / whitespace-padded turns, one very long conversation
(skew), duplicate turns (k-NN self-exclusion ties), non-ASCII text.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["bash", "read", "search", "edit", "fetch", None]

# (template_id, wildcard template with [*] holes) — the parse stage
# compiles these to regexes exactly like the reference benchmark
# (benchmark/evaluate.py:144-151).
TEMPLATES: list[tuple[str, str]] = [
    ("T01", "user asks to run step [*] of plan [*]"),
    ("T02", "assistant replies status ok for step [*]"),
    ("T03", "tool [*] returned exit code 0 in [*] ms"),
    ("T04", "reading file [*] with offset [*]"),
    ("T05", "search query [*] matched [*] results"),
    ("T06", "writing output chunk [*] bytes to [*]"),
    ("T07", "system checkpoint saved at turn [*]"),
    ("T08", "assistant summarizes progress at [*] percent"),
    ("T09", "tool [*] cache hit for key [*]"),
    ("T10", "user confirms plan item [*]"),
]

ANOMALY_TEXTS = [
    "FATAL segfault in tokenizer worker pid 4412 core dumped unexpectedly",
    "unhandled promise rejection deep in scheduler queue overflow panic",
    "disk quota exceeded while flushing wal journal emergency rollback",
    "OOM killer terminated executor container rss 31g limit 30g",
    "certificate verification failed unknown authority handshake aborted",
    "देवनागरी अपवाद: अप्रत्याशित त्रुटि स्टैक ट्रेस",  # non-ASCII anomaly
]


@dataclass
class TranscriptTruth:
    """Planted anomaly positions: conv_id -> list[(start_idx, end_idx)]."""

    anomalies: dict


def _template_text(rng: np.random.RandomState, tidx: int) -> str:
    _, tpl = TEMPLATES[tidx]
    out = []
    for part in tpl.split("[*]"):
        out.append(part)
        out.append(str(rng.randint(0, 10_000)))
    return "".join(out[:-1])


def generate_transcripts(
    n_convs: int = 20,
    mean_turns: int = 40,
    seed: int = 42,
    anomaly_conv_frac: float = 0.3,
    anomaly_burst: int = 3,
    with_edge_cases: bool = True,
) -> tuple[pd.DataFrame, TranscriptTruth]:
    rng = np.random.RandomState(seed)
    rows = []
    truth: dict[str, list[tuple[int, int]]] = {}
    epoch = datetime(2026, 1, 1, tzinfo=timezone.utc)

    for c in range(n_convs):
        conv_id = f"conv_{c:06d}"
        n_turns = max(1, int(rng.poisson(mean_turns)))
        if with_edge_cases:
            if c == 0:
                n_turns = 2  # shorter than default window_size=4 (partial window)
            elif c == 1:
                n_turns = mean_turns * 100  # very long conversation (skew)
        is_anom = rng.rand() < anomaly_conv_frac and n_turns > anomaly_burst + 4
        anom_start = -1
        if is_anom:
            anom_start = int(rng.randint(2, n_turns - anomaly_burst))
            truth[conv_id] = [(anom_start, anom_start + anomaly_burst - 1)]
        dup_text = None
        for t in range(n_turns):
            role = ROLES[int(rng.randint(0, len(ROLES)))]
            tool = TOOLS[int(rng.randint(0, len(TOOLS)))]
            if is_anom and anom_start <= t < anom_start + anomaly_burst:
                text = ANOMALY_TEXTS[int(rng.randint(0, len(ANOMALY_TEXTS)))]
            else:
                text = _template_text(rng, int(rng.randint(0, len(TEMPLATES))))
            if with_edge_cases and c == 2:
                if t == 0:
                    text = ""  # empty turn
                elif t == 1:
                    # trailing ASCII + Unicode whitespace (str.rstrip parity)
                    text = text + "   \t\xa0\u2028\u3000"
                elif t == 2:
                    dup_text = text
                elif t == 3 and dup_text is not None:
                    text = dup_text  # exact duplicate turn (self-exclusion tie)
            ts = epoch + timedelta(seconds=c * 100_000 + t * 7 + int(rng.randint(0, 3)))
            rows.append((conv_id, t, role, text, tool, ts.replace(tzinfo=None)))

    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf, TranscriptTruth(anomalies=truth)


def tool_registry_pdf() -> pd.DataFrame:
    """Broadcast enrichment dim (FIXTURES.md §2); 'fetch' intentionally
    missing to exercise left-join null handling."""
    rows = [
        ("bash", "exec", 3),
        ("read", "fs", 1),
        ("search", "net", 2),
        ("edit", "fs", 2),
    ]
    pdf = pd.DataFrame(rows, columns=["tool", "tool_category", "risk_level"])
    pdf["risk_level"] = pdf["risk_level"].astype("int32")
    return pdf


def role_taxonomy_pdf() -> pd.DataFrame:
    rows = [
        ("user", "human"),
        ("assistant", "model"),
        ("tool", "system"),
        ("system", "system"),
    ]
    return pd.DataFrame(rows, columns=["role", "role_group"])


def write_fixture(path: str, scale: str = "tiny", seed: int = 42) -> pd.DataFrame:
    """Materialize a deterministic fixture to parquet. Scales per
    FIXTURES.md: tiny ~200 turns, small ~20k, bench ~2M."""
    params = {
        "tiny": dict(n_convs=5, mean_turns=30, with_edge_cases=True),
        "small": dict(n_convs=80, mean_turns=200, with_edge_cases=True),
        "bench": dict(n_convs=2000, mean_turns=1000, with_edge_cases=False),
    }[scale]
    pdf, _ = generate_transcripts(seed=seed, **params)
    write_parquet(pdf, path)
    return pdf


def write_labeled_fixture(path: str, scale: str = "tiny", seed: int = 42) -> pd.DataFrame:
    """write_fixture + the evaluation ground-truth columns the
    benchmark harness requires (is_anomaly from the generator's truth
    spans; template_id from the turn's leading token — the same
    labeling the eval tests use). This is what the shipped
    benchmark/datasets.yaml's toy dataset generates."""
    params = {
        "tiny": dict(n_convs=5, mean_turns=30, with_edge_cases=False),
        "small": dict(n_convs=80, mean_turns=200, with_edge_cases=False),
    }[scale]
    pdf, truth = generate_transcripts(seed=seed, **params)
    spans = {
        (conv, t)
        for conv, rngs in truth.anomalies.items()
        for lo, hi in rngs
        for t in range(lo, hi + 1)
    }
    pdf["is_anomaly"] = [
        (c, t) in spans for c, t in zip(pdf["conv_id"], pdf["turn_idx"])
    ]
    pdf["template_id"] = pdf["text"].fillna("").str.split().str[0].fillna("")
    write_parquet(pdf, path)
    return pdf


def generate_transcripts_fast(
    n_turns: int,
    seed: int = 42,
    turns_per_conv: int = 1000,
    anomaly_frac: float = 0.002,
) -> pd.DataFrame:
    """Vectorized bench-scale generator (numpy, no per-row loop): same
    schema/content recipe as generate_transcripts — templated turns with
    a seeded minority of unique anomaly turns — at millions of rows/sec."""
    rng = np.random.RandomState(seed)
    conv_num = np.arange(n_turns) // turns_per_conv
    turn_idx = (np.arange(n_turns) % turns_per_conv).astype("int32")
    conv_id = np.char.add("conv_", conv_num.astype("U10"))
    roles = np.array(ROLES)[rng.randint(0, len(ROLES), n_turns)]
    tools = np.array([t or "" for t in TOOLS])[rng.randint(0, len(TOOLS), n_turns)]

    tidx = rng.randint(0, len(TEMPLATES), n_turns)
    params = rng.randint(0, 10_000, n_turns).astype("U6")
    # one-hole variants of the templates: pre + param + post
    pres, posts = [], []
    for _, tpl in TEMPLATES:
        head, _, tail = tpl.partition("[*]")
        pres.append(head)
        posts.append(tail.replace("[*]", "7"))
    text = np.char.add(
        np.char.add(np.array(pres)[tidx], params), np.array(posts)[tidx]
    )
    n_anom = int(n_turns * anomaly_frac)
    if n_anom:
        pos = rng.choice(n_turns, n_anom, replace=False)
        text[pos] = np.array(ANOMALY_TEXTS)[rng.randint(0, len(ANOMALY_TEXTS), n_anom)]

    epoch = np.datetime64("2026-01-01T00:00:00")
    ts = epoch + (conv_num * 100_000 + turn_idx * 7).astype("timedelta64[s]")
    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": pd.Series(tools).replace("", None),
            "ts": ts.astype("datetime64[us]"),
        }
    )
    return pdf


def write_parquet(pdf: pd.DataFrame, path: str, row_group_size: int | None = None) -> None:
    """Parquet writer Spark can read: pandas 2.x defaults to TIMESTAMP
    (NANOS) which Spark's reader rejects — coerce to microseconds.

    row_group_size matters for parallelism: Spark splits scans on
    row-group boundaries, so a big fixture written as pyarrow's default
    1M-row groups caps the scan+map side at file_rows/1M tasks (measured:
    a 2M-row bench table ran its whole map side on 2 cores)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    kwargs = {"coerce_timestamps": "us", "allow_truncated_timestamps": True}
    if row_group_size:
        kwargs["row_group_size"] = row_group_size
    pq.write_table(table, path, **kwargs)
