"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input-table shape is fixed by BASELINE.json input_hint:
``(repo, path, commit, lang, content)`` — plus an integer ``file_id`` used as
the stable row key.  Seeded by ``random.Random`` so results are identical
across platforms and runs; content is pure ASCII.

Planted ground truth (returned alongside the rows):
* exact duplicates  (~10%) — byte-identical copies, different repo/path/commit
* near duplicates   (~15%) — token edits at three Jaccard bands (~.95/.85/.5)
* shared substring  (~5%)  — a >=256-char verbatim block inside unrelated text
* hot-band skew     (~20% of one lang) — common boilerplate snippet
* unique remainder  — incl. empty and 1-char files (src/encoder.cpp:913-915
  asserts on zero-length splits; these are the analog edge cases)
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

LANGS = {".py": "python", ".c": "c", ".h": "c", ".md": "markdown", ".json": "json"}
_WORDS = (
    "buffer chunk hash table queue stream stage thread batch offset length "
    "anchor window match encode decode fragment refine dedup compress reorder "
    "index value result status error config input output worker device kernel "
    "memory pointer size count total flag state item node tree heap list"
).split()
_KEYWORDS = "def if for while return static void int char struct const".split()

BOILERPLATE = (
    "/* Copyright (c) project contributors. Licensed under the Apache License, "
    "Version 2.0 (the License); you may not use this file except in compliance "
    "with the License. You may obtain a copy of the License at "
    "http://www.apache.org/licenses/LICENSE-2.0 Unless required by applicable "
    "law or agreed to in writing, software distributed under the License is "
    "distributed on an AS IS BASIS, WITHOUT WARRANTIES OR CONDITIONS OF ANY "
    "KIND, either express or implied. */\n"
)


@dataclass
class CorpusTruth:
    """Ground truth planted by the generator."""

    pairs: list[tuple[int, int, str]] = field(default_factory=list)  # (a,b,kind)
    clusters: dict[int, int] = field(default_factory=dict)  # file_id -> cluster rep


def _random_line(rng: random.Random) -> str:
    n = rng.randint(3, 9)
    toks = [rng.choice(_KEYWORDS)] + [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(toks)


def _random_file(rng: random.Random, n_lines: int) -> str:
    return "\n".join(_random_line(rng) for _ in range(n_lines)) + "\n"


def _mutate(rng: random.Random, content: str, edit_rate: float) -> str:
    """Token-level edits at roughly ``edit_rate`` of tokens."""
    toks = content.split(" ")
    n_edits = max(1, int(len(toks) * edit_rate))
    for _ in range(n_edits):
        i = rng.randrange(len(toks))
        toks[i] = rng.choice(_WORDS)
    return " ".join(toks)


def generate_corpus(
    n_files: int = 500, seed: int = 42
) -> tuple[list[dict], CorpusTruth]:
    """Rows (file_id, repo, path, commit, lang, content) + planted truth."""
    rng = random.Random(seed)
    rows: list[dict] = []
    truth = CorpusTruth()
    exts = list(LANGS)

    def commit() -> str:
        return "".join(rng.choice("0123456789abcdef") for _ in range(40))

    def add(content: str) -> int:
        fid = len(rows)
        ext = rng.choice(exts)
        rows.append(
            {
                "file_id": fid,
                "repo": f"org{rng.randrange(20)}/repo{rng.randrange(50)}",
                "path": f"src/mod{rng.randrange(100)}/file{fid}{ext}",
                "commit": commit(),
                "lang": LANGS[ext],
                "content": content,
            }
        )
        return fid

    n_base = max(1, int(n_files * 0.45))
    n_exact = int(n_files * 0.10)
    n_near = int(n_files * 0.15)
    n_substr = int(n_files * 0.05)
    n_hot = int(n_files * 0.20)

    base_ids = [add(_random_file(rng, rng.randint(5, 60))) for _ in range(n_base)]

    for _ in range(n_exact):
        src = rng.choice(base_ids)
        fid = add(rows[src]["content"])
        truth.pairs.append((src, fid, "exact"))

    near_bands = [0.005, 0.02, 0.15]  # ~Jaccard .95 / .85 / .5 on 9-shingles
    for i in range(n_near):
        src = rng.choice(base_ids)
        rate = near_bands[i % len(near_bands)]
        fid = add(_mutate(rng, rows[src]["content"], rate))
        truth.pairs.append((src, fid, f"near{rate}"))

    shared_block = _random_file(rng, 12)  # well over 256 chars
    assert len(shared_block) >= 256
    substr_ids = []
    for _ in range(n_substr):
        filler = _random_file(rng, rng.randint(10, 30))
        cut = rng.randrange(len(filler))
        fid = add(filler[:cut] + shared_block + filler[cut:])
        substr_ids.append(fid)
    for i in range(1, len(substr_ids)):
        truth.pairs.append((substr_ids[0], substr_ids[i], "substring"))

    hot_ids = []
    for _ in range(n_hot):
        fid = add(BOILERPLATE + _random_file(rng, rng.randint(8, 40)))
        rows[fid]["lang"] = "c"
        hot_ids.append(fid)
    for i in range(1, len(hot_ids)):
        truth.pairs.append((hot_ids[0], hot_ids[i], "boilerplate"))

    # unique remainder incl. edge cases
    add("")
    add("x")
    while len(rows) < n_files:
        add(_random_file(rng, rng.randint(2, 50)))

    return rows, truth


def corpus_df(spark, n_files: int = 500, seed: int = 42, partitions: int = 16):
    """Corpus as a Spark DataFrame (ground truth discarded — use
    ``generate_corpus`` directly in tests)."""
    rows, _ = generate_corpus(n_files, seed)
    df = spark.createDataFrame(rows)
    return df.select("file_id", "repo", "path", "commit", "lang", "content").repartition(
        partitions
    )
