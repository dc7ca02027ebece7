"""Deterministic synthetic source-code corpus (FIXTURES.md F0).

Generates the engine's primary input table
``(repo, path, commit, lang, content)`` + derived integer columns
``(size_bytes, line_count, mtime_epoch)`` entirely from the row id —
every row is a pure function of ``(seed, id)``, so any partitioning
of ``spark.range`` produces the same logical table. Vectorized numpy
inside ``mapInArrow``; the only per-row work is for the ~5%
high-entropy rows (counter-based Philox keyed by id — still
deterministic and cheap).

Shape knobs follow FIXTURES.md F0:
- Zipfian repo sizes with one mega-repo holding ~30% of rows (skew);
- hierarchical clustered paths (RLE-friendly under (repo,path) ranges);
- few commits per repo in long runs (RLE+dict);
- <=16 langs (dict);
- content: repetitive source text (FSST-friendly) + ~5% high-entropy
  rows + edge rows (empty, 1-char, multi-MB outlier, non-ASCII).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEED = 42

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("line_count", IntegerType(), False),
        StructField("mtime_epoch", LongType(), False),
    ]
)

_LANGS = ["py", "java", "ts", "go", "rs", "c", "cpp", "rb", "sh", "sql", "md", "yaml"]
_TOPS = ["src", "lib", "tests", "docs", "internal", "pkg", "app", "core"]

_TEMPLATE_WORDS = [
    "def", "return", "class", "self", "import", "from", "public", "static",
    "void", "const", "let", "function", "interface", "struct", "impl",
    "match", "case", "if", "else", "for", "while", "try", "except",
    "result", "value", "index", "count", "buffer", "stream", "reader",
    "writer", "config", "options", "context", "handler", "request",
    "response", "encode", "decode", "partition", "column", "chunk",
]


def _make_templates(n_templates: int = 32) -> list[str]:
    """Deterministic bank of source-code-like text templates."""
    rng = np.random.RandomState(SEED)
    out = []
    for t in range(n_templates):
        lines = []
        n_lines = 20 + int(rng.randint(0, 60))
        for _ in range(n_lines):
            k = rng.randint(3, 9)
            words = [_TEMPLATE_WORDS[rng.randint(0, len(_TEMPLATE_WORDS))] for _ in range(k)]
            indent = "    " * int(rng.randint(0, 3))
            lines.append(indent + " ".join(words) + ("():" if rng.rand() < 0.3 else ";"))
        out.append("\n".join(lines) + "\n")
    return out


_TEMPLATES = _make_templates()


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic 64-bit mix of row ids → uniform uint64."""
    x = (ids.astype(np.uint64) + np.uint64(salt * 0x9E3779B9)) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def _unif(ids: np.ndarray, salt: int) -> np.ndarray:
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _commit_hex(repo_idx: int, epoch: int) -> str:
    return hashlib.sha1(f"{SEED}:{repo_idx}:{epoch}".encode()).hexdigest()


def _gen_batch(ids: np.ndarray, n_repos: int, big_row_every: int) -> pa.RecordBatch:
    n = ids.size
    u_repo = _unif(ids, 1)
    mega = u_repo < 0.30
    rest = np.floor(((u_repo - 0.30) / 0.70) ** 2 * (n_repos - 1)).astype(np.int64) + 1
    repo_idx = np.where(mega, 0, np.clip(rest, 1, n_repos - 1))

    lang_idx = (_mix(ids, 2) % np.uint64(len(_LANGS))).astype(np.int64)
    top_idx = (_mix(ids, 3) % np.uint64(len(_TOPS))).astype(np.int64)
    mod_idx = (ids // 97) % 30
    commit_epoch = ((ids // 256) % 8).astype(np.int64)

    t_idx = (_mix(ids, 4) % np.uint64(len(_TEMPLATES))).astype(np.int64)
    rep = 1 + (_mix(ids, 5) % np.uint64(4)).astype(np.int64)  # 1..4 template reps
    entropy = _unif(ids, 6) < 0.05

    commit_cache: dict[tuple[int, int], str] = {}
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n):
        rid = int(repo_idx[i])
        _id = int(ids[i])
        lang = _LANGS[lang_idx[i]]
        repos.append(f"org{rid % 7}/repo{rid:05d}")
        paths.append(f"{_TOPS[top_idx[i]]}/module{int(mod_idx[i]):03d}/file{_id:08d}.{lang}")
        ck = (rid, int(commit_epoch[i]))
        c = commit_cache.get(ck)
        if c is None:
            c = _commit_hex(*ck)
            commit_cache[ck] = c
        commits.append(c)
        langs.append(lang)

        if _id % 997 == 0:
            contents.append("")
        elif _id % 499 == 0:
            contents.append("x")
        elif big_row_every and _id % big_row_every == 7:
            contents.append(_TEMPLATES[t_idx[i]] * 400)  # multi-hundred-KB outlier
        elif entropy[i]:
            g = np.random.Generator(np.random.Philox(key=SEED * 1_000_003 + _id))
            raw = g.integers(0x20, 0x7F, size=2048, dtype=np.uint8)
            contents.append(raw.tobytes().decode("ascii"))
        else:
            # per-file identifier renames: real code shares structure but
            # not literal bytes across files — keeps compression honest
            tpl = _TEMPLATES[t_idx[i]]
            tpl = tpl.replace("value", f"value_{(_id * 2654435761) % 9973:x}")
            tpl = tpl.replace("result", f"res_{(_id * 40503) % 887:x}")
            tpl = tpl.replace("index", f"i{_id % 63}")
            body = tpl * int(rep[i])
            extra = "→λ∞ 世界 🎉\n" if _id % 13 == 0 else ""
            contents.append(f"// file {_id} of {repos[-1]}\n{extra}{body}")

    content_arr = pa.array(contents, type=pa.string())
    size_bytes = pa.compute.binary_length(content_arr.cast(pa.binary())).cast(pa.int64())
    line_count = pa.compute.add(
        pa.compute.count_substring(content_arr, "\n"), 1
    ).cast(pa.int32())
    mtime = pa.array(
        1_700_000_000 + (ids % 86_400) * 37 + commit_epoch * 3600, type=pa.int64()
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(repos), pa.array(paths), pa.array(commits), pa.array(langs),
            content_arr, size_bytes, line_count, mtime,
        ],
        names=[f.name for f in CORPUS_SCHEMA.fields],
    )


def corpus_df(
    spark: SparkSession,
    n_rows: int,
    n_repos: int | None = None,
    npartitions: int | None = None,
    big_row_every: int = 100_003,
) -> DataFrame:
    """Lazy deterministic corpus of ``n_rows`` files."""
    if n_repos is None:
        n_repos = max(4, n_rows // 2000)
    if npartitions is None:
        npartitions = spark.sparkContext.defaultParallelism

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id").to_numpy()
            yield _gen_batch(ids, n_repos, big_row_every)

    return spark.range(0, n_rows, 1, npartitions).mapInArrow(kernel, CORPUS_SCHEMA)
