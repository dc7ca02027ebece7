"""FSST-style symbol-table string compression, from scratch.

Implements the *Fast Static Symbol Table* idea from Boncz, Neumann &
Leis, "FSST: Fast Random Access String Compression" (VLDB 2020):
a per-chunk table of up to 255 byte-symbols (each 1..8 bytes) trained
iteratively on a sample; compression replaces each longest-matching
symbol occurrence with a 1-byte code; byte 0xFF escapes literal bytes
not covered by the table.

This replaces the role general-purpose gzip plays in the reference's
export path (/root/reference/howard/objects/database.py:2597-2650):
a *lightweight* scheme whose decode is a vectorized gather, suitable
for inner-loop use inside Arrow UDF kernels.

Matching uses the C-speed ``re`` engine (alternation ordered longest
first == greedy longest match); decode is fully vectorized numpy
(symbol-matrix gather). Only the per-*match* assembly loop is Python —
never per input row.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from .bits import frame, unframe

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254; 255 is the escape marker
MAX_SYMBOL_LEN = 8


class FsstTable:
    """An ordered symbol table. Symbol index == its code byte."""

    __slots__ = ("symbols", "_pattern", "_code", "_matrix", "_lens")

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError(f"too many symbols: {len(symbols)}")
        self.symbols = symbols
        self._pattern = None
        self._code = None
        self._matrix = None
        self._lens = None

    # -- encode side ---------------------------------------------------
    def _compile(self):
        if self._pattern is None:
            ordered = sorted(
                range(len(self.symbols)),
                key=lambda i: (-len(self.symbols[i]), i),
            )
            alt = b"|".join(re.escape(self.symbols[i]) for i in ordered)
            self._pattern = re.compile(b"(" + alt + b")", re.DOTALL)
            self._code = {s: bytes([i]) for i, s in enumerate(self.symbols)}
        return self._pattern, self._code

    # -- decode side ---------------------------------------------------
    def _gather_tables(self):
        if self._matrix is None:
            m = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
            lens = np.zeros(256, dtype=np.int64)
            for i, s in enumerate(self.symbols):
                m[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
                lens[i] = len(s)
            self._matrix = m
            self._lens = lens
        return self._matrix, self._lens

    def serialize(self) -> bytes:
        return frame(*self.symbols) if self.symbols else frame(b"")

    @classmethod
    def deserialize(cls, data: bytes) -> "FsstTable":
        parts = unframe(data)
        if parts == [b""]:
            parts = []
        return cls(parts)


def _escape_gap(gap: bytes) -> bytes:
    """Escape a run of uncovered bytes: each byte b -> 0xFF b (vectorized)."""
    a = np.frombuffer(gap, dtype=np.uint8)
    out = np.empty(a.size * 2, dtype=np.uint8)
    out[0::2] = ESCAPE
    out[1::2] = a
    return out.tobytes()


def compress(data: bytes, table: FsstTable) -> bytes:
    if not data:
        return b""
    if not table.symbols:
        return _escape_gap(data)
    pattern, code = table._compile()
    parts = pattern.split(data)
    out = []
    append = out.append
    for i, p in enumerate(parts):
        if p:
            append(code[p] if i & 1 else _escape_gap(p))
    return b"".join(out)


def decompress(data: bytes, table: FsstTable) -> bytes:
    """Vectorized decode: per-code symbol-matrix gather + boolean mask."""
    if not data:
        return b""
    codes = np.frombuffer(data, dtype=np.uint8)
    matrix, sym_lens = table._gather_tables()
    rows = matrix[codes]
    lens = sym_lens[codes].copy()

    esc_candidates = np.flatnonzero(codes == ESCAPE)
    if esc_candidates.size:
        # Resolve escape chains: an 0xFF consumed as a literal byte of a
        # preceding escape is not itself an escape. Loop is over escape
        # *markers* only (rare for trained text), never over all bytes.
        consumed = -1
        literal_pos = []
        marker_pos = []
        for p in esc_candidates:
            if p == consumed:
                continue
            marker_pos.append(p)
            consumed = p + 1
        marker_pos = np.asarray(marker_pos, dtype=np.int64)
        literal_pos = marker_pos + 1
        lens[marker_pos] = 0
        lens[literal_pos] = 1
        rows[literal_pos] = 0
        rows[literal_pos, 0] = codes[literal_pos]

    mask = np.arange(MAX_SYMBOL_LEN) < lens[:, None]
    return rows[mask].tobytes()


def _sample(data: bytes, budget: int = 1 << 14, slices: int = 8) -> bytes:
    """Spread the training sample across the block (deterministic)."""
    if len(data) <= budget:
        return data
    step = len(data) // slices
    piece = budget // slices
    return b"".join(data[i * step : i * step + piece] for i in range(slices))


def train(data: bytes, iterations: int = 3, max_symbols: int = MAX_SYMBOLS) -> FsstTable:
    """Iterative greedy symbol-table construction (FSST paper §4)."""
    sample = _sample(data)
    if not sample:
        return FsstTable([])

    # Seed: most frequent single bytes.
    counts = np.bincount(np.frombuffer(sample, dtype=np.uint8), minlength=256)
    order = np.argsort(-counts, kind="stable")
    symbols = [bytes([b]) for b in order[: max_symbols] if counts[b] > 0]
    table = FsstTable(symbols)

    for _ in range(iterations):
        pattern, _ = table._compile()
        parts = pattern.split(sample)
        sym_counts: Counter = Counter()
        pair_counts: Counter = Counter()
        prev = None
        for i, p in enumerate(parts):
            if i & 1:  # matched symbol
                sym_counts[p] += 1
                if prev is not None and len(prev) + len(p) <= MAX_SYMBOL_LEN:
                    pair_counts[prev + p] += 1
                prev = p
            else:  # gap: uncovered bytes become single-byte candidates
                if p:
                    for b in p:
                        sym_counts[bytes([b])] += 1
                    prev = None

        candidates: Counter = Counter()
        for s, c in sym_counts.items():
            candidates[s] += c
        for s, c in pair_counts.items():
            candidates[s] += c

        def gain(item):
            s, c = item
            return c * max(len(s) - 1, 1)

        best = sorted(candidates.items(), key=gain, reverse=True)[:max_symbols]
        table = FsstTable([s for s, _ in best])

    return table
