"""FSST-style symbol-table string compression, from scratch, vectorized.

Implements the *Fast Static Symbol Table* idea from Boncz, Neumann &
Leis, "FSST: Fast Random Access String Compression" (VLDB 2020):
a per-chunk table of up to 255 byte-symbols (each 1..8 bytes) trained
iteratively on a sample; compression replaces each longest-matching
symbol occurrence with a 1-byte code; byte 0xFF escapes literal bytes
not covered by the table.

Everything is numpy-vectorized — including the greedy encoder, which
is normally a sequential scan:

1. *Longest-match tables*: 1-2 byte symbols resolve for every position
   with one gather through a direct 65,536-entry 2-byte-prefix table;
   3-8 byte symbols are probed with vectorized open-addressing hash
   lookups (multiply-shift hash of the position's uint64 window),
   only at positions whose 2-byte prefix can extend.
2. *Block-independent greedy scan*: a match is never allowed to cross
   a 64-byte block boundary (the short table supplies the fallback in
   a block's tail), so every block tokenizes independently and the
   greedy jump loop advances ALL blocks simultaneously — one vector
   op per token-round, zero per-token Python. Decode is agnostic to
   the tokenization, so this trades a sliver of ratio for a fully
   data-parallel encoder.
3. Output assembly and decode are mask-gathers.

This replaces the role general-purpose gzip plays in the reference's
export path (/root/reference/howard/objects/database.py:2597-2650)
with a lightweight scheme whose decode is a vectorized gather.
"""

from __future__ import annotations

import numpy as np

from .bits import frame, unframe

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254; 255 is the escape marker
MAX_SYMBOL_LEN = 8


class FsstTable:
    """An ordered symbol table. Symbol index == its code byte."""

    __slots__ = ("symbols", "_match", "_matrix", "_lens")

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError(f"too many symbols: {len(symbols)}")
        self.symbols = symbols
        self._match = None
        self._matrix = None
        self._lens = None

    # -- encode side ---------------------------------------------------
    def _match_tables(self):
        """Match structures: a direct 2-byte-prefix table for short
        symbols (one gather resolves L<=2 for every position) and a
        small open-addressing hash per length L in 3..8, probed only
        at positions whose 2-byte prefix can extend. All lookups are
        vectorized gathers — np.searchsorted is ~30x slower here."""
        if self._match is None:
            short_len = np.zeros(65536, dtype=np.uint8)
            short_code = np.zeros(65536, dtype=np.uint8)
            ext_mask = np.zeros(65536, dtype=bool)
            l1_len = np.zeros(256, dtype=np.uint8)
            l1_code = np.zeros(256, dtype=np.uint8)
            byL: dict[int, list[tuple[int, int]]] = {}
            for code, s in enumerate(self.symbols):
                if len(s) == 1:
                    b = s[0]
                    l1_len[b] = 1
                    l1_code[b] = code
                    short_len[b * 256 : (b + 1) * 256] = np.maximum(
                        short_len[b * 256 : (b + 1) * 256], 1
                    )
                    row = short_len[b * 256 : (b + 1) * 256]
                    short_code[b * 256 : (b + 1) * 256] = np.where(
                        row == 1, code, short_code[b * 256 : (b + 1) * 256]
                    )
                elif len(s) == 2:
                    v = s[0] * 256 + s[1]
                    short_len[v] = 2
                    short_code[v] = code
                else:
                    byL.setdefault(len(s), []).append((int.from_bytes(s, "big"), code))
                    ext_mask[s[0] * 256 + s[1]] = True

            hashes = {}
            HSIZE = 1024
            MULT = 0x9E3779B97F4A7C15
            for L, items in byL.items():
                hv = np.zeros(HSIZE + 8, dtype=np.uint64)
                hc = np.zeros(HSIZE + 8, dtype=np.uint8)
                hf = np.zeros(HSIZE + 8, dtype=bool)
                depth = 1
                for v, code in items:
                    h = ((v * MULT) & 0xFFFFFFFFFFFFFFFF) >> 54  # python ints: no overflow
                    d = 0
                    while hf[h + d]:
                        d += 1
                    hv[h + d] = v
                    hc[h + d] = code
                    hf[h + d] = True
                    depth = max(depth, d + 1)
                hashes[L] = (hv, hc, hf, depth)

            self._match = (short_len, short_code, ext_mask, l1_len, l1_code, hashes)
        return self._match

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


# ---------------------------------------------------------------------------
# Vectorized longest-match + greedy tokenization
# ---------------------------------------------------------------------------

def _window_values(a: np.ndarray, n: int) -> np.ndarray:
    """uint64 big-endian value of the 8 bytes starting at each position
    (zero-padded past the end). ``a`` must have length >= n + 8."""
    w = np.zeros(n, dtype=np.uint64)
    for k in range(MAX_SYMBOL_LEN):
        w |= a[k : k + n].astype(np.uint64) << np.uint64((7 - k) * 8)
    return w


BLOCK = 64  # tokenization block: matches never cross a block boundary


def _emit_plan(a: np.ndarray, n: int, table: FsstTable) -> tuple[np.ndarray, np.ndarray]:
    """Per position: (token length 0=escape, code), block-local greedy.

    Longest match wins, except in the last <=7 bytes of each 64-byte
    block where a long symbol would cross the boundary — there the
    short (<=2 byte) table supplies the fallback. Blocks therefore
    tokenize independently, which is what makes the scan vectorizable;
    the compression loss vs exact greedy is a few short tokens per
    64 bytes. Decode is agnostic to tokenization, so this is purely a
    ratio/speed tradeoff, not a correctness one.
    """
    short_len, short_code, ext_mask, l1_len, l1_code, hashes = table._match_tables()

    # short matches (L <= 2): one gather through the 2-byte-prefix table
    w2 = (a[:n].astype(np.intp) << 8) | a[1 : n + 1]
    bl_s = short_len[w2]
    bc_s = short_code[w2]

    allow = BLOCK - (np.arange(n, dtype=np.int64) % BLOCK)
    allow = np.minimum(allow, n - np.arange(n, dtype=np.int64))

    bl = np.where(bl_s <= allow, bl_s, l1_len[a[:n]]).astype(np.uint8)
    bc = np.where(bl_s <= allow, bc_s, l1_code[a[:n]]).astype(np.uint8)

    if hashes:
        ext_pos = np.flatnonzero(ext_mask[w2] & (allow >= 3))
        if ext_pos.size:
            # build the 8-byte windows only where a long symbol can start
            w8 = np.zeros(ext_pos.size, dtype=np.uint64)
            for k in range(MAX_SYMBOL_LEN):
                w8 |= a[ext_pos + k].astype(np.uint64) << np.uint64((7 - k) * 8)
            sub_allow = allow[ext_pos]
            sub_bl = np.zeros(ext_pos.size, dtype=np.uint8)
            sub_bc = np.zeros(ext_pos.size, dtype=np.uint8)
            MULT = np.uint64(0x9E3779B97F4A7C15)
            for L in range(MAX_SYMBOL_LEN, 2, -1):
                t = hashes.get(L)
                if t is None:
                    continue
                hv, hc, hf, depth = t
                wL = w8 >> np.uint64((MAX_SYMBOL_LEN - L) * 8)
                h = (wL * MULT) >> np.uint64(54)  # uint64 indexes directly
                fit = (sub_allow >= L) & (sub_bl == 0)
                for d in range(depth):
                    hit = hf[h + d] & (hv[h + d] == wL) & fit
                    if hit.any():
                        sub_bl[hit] = L
                        sub_bc[hit] = hc[h + d][hit]
                        fit &= ~hit
            has = sub_bl > 0  # long match overrides any short one
            if has.any():
                tgt = ext_pos[has]
                bl[tgt] = sub_bl[has]
                bc[tgt] = sub_bc[has]
    return bl, bc


def _token_starts(bl: np.ndarray, n: int) -> np.ndarray:
    """Token-start positions: greedy jumps inside independent 64-byte
    blocks, advanced for all blocks simultaneously per round."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    step = np.maximum(bl, 1).astype(np.int64)
    step_p = np.concatenate([step, np.full(BLOCK + 8, 1, dtype=np.int64)])
    nb = (n + BLOCK - 1) // BLOCK
    starts = np.arange(nb, dtype=np.int64) * BLOCK
    ends = np.minimum(starts + BLOCK, n)
    pos = starts.copy()
    bitmap = np.zeros(n + BLOCK, dtype=bool)
    while True:
        live = pos < ends
        if not live.any():
            break
        lp = pos[live]
        bitmap[lp] = True
        pos[live] = lp + step_p[lp]
    return np.flatnonzero(bitmap[:n]).astype(np.int64)


def compress(data: bytes, table: FsstTable) -> bytes:
    n = len(data)
    if n == 0:
        return b""
    a = np.frombuffer(data + b"\0" * (MAX_SYMBOL_LEN + 8), dtype=np.uint8)
    bl, bc = _emit_plan(a, n, table)
    tok = _token_starts(bl, n)
    L = bl[tok]
    esc = L == 0
    out = np.empty((tok.size, 2), dtype=np.uint8)
    out[:, 0] = np.where(esc, ESCAPE, bc[tok])
    out[:, 1] = a[tok]
    lens2 = np.where(esc, 2, 1)
    m = np.arange(2) < lens2[:, None]
    return out[m].tobytes()


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
        # preceding escape is not itself an escape marker. Loop is over
        # escape markers only (rare for trained text).
        consumed = -1
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

    # (n, 8) boolean-mask extraction benchmarked fastest among per-length
    # scatter / per-column scatter / mask variants
    mask = np.arange(MAX_SYMBOL_LEN) < lens[:, None]
    return rows[mask].tobytes()


# ---------------------------------------------------------------------------
# Training (vectorized counting over the tokenization of a sample)
# ---------------------------------------------------------------------------

def _sample(data: bytes, budget: int = 1 << 16, slices: int = 8) -> bytes:
    """Spread the training sample across the block (deterministic)."""
    if len(data) <= budget:
        return data
    step = len(data) // slices
    piece = budget // slices
    return b"".join(data[i * step : i * step + piece] for i in range(slices))


def train(data: bytes, iterations: int = 5, max_symbols: int = MAX_SYMBOLS) -> FsstTable:
    """Iterative greedy symbol-table construction (FSST paper §4):
    seed with frequent single bytes, then repeatedly tokenize the
    sample and promote frequent adjacent-token concatenations."""
    sample = _sample(data)
    n = len(sample)
    if n == 0:
        return FsstTable([])
    a = np.frombuffer(sample + b"\0" * (MAX_SYMBOL_LEN + 8), dtype=np.uint8)

    counts = np.bincount(a[:n], minlength=256)
    order = np.argsort(-counts, kind="stable")
    symbols = [bytes([b]) for b in order[:max_symbols] if counts[b] > 0]
    table = FsstTable(symbols)

    for _ in range(iterations):
        bl, bc = _emit_plan(a, n, table)
        tok = _token_starts(bl, n)
        L = bl[tok]
        esc = L == 0

        sym_lens = np.array([len(s) for s in table.symbols] + [1], dtype=np.int64)
        gains: dict[bytes, int] = {}

        # existing symbols by emission count (vector gain, tiny dict)
        code_counts = np.bincount(bc[tok[~esc]], minlength=256)[: len(table.symbols)]
        g_sym = code_counts * np.maximum(sym_lens[: len(table.symbols)] - 1, 1)
        for code in np.flatnonzero(code_counts):
            gains[table.symbols[code]] = int(g_sym[code])
        # escaped bytes become single-byte candidates
        if esc.any():
            esc_counts = np.bincount(a[tok[esc]], minlength=256)
            for b in np.flatnonzero(esc_counts):
                s = bytes([b])
                gains[s] = gains.get(s, 0) + int(esc_counts[b])
        # adjacent non-escape token pairs -> concatenation candidates;
        # gains computed vectorized, only the top candidates materialize
        if tok.size >= 2:
            both = (~esc[:-1]) & (~esc[1:])
            if both.any():
                keys = bc[tok[:-1][both]].astype(np.int64) * 256 + bc[tok[1:][both]]
                uk, uc = np.unique(keys, return_counts=True)
                pair_len = sym_lens[uk // 256] + sym_lens[uk % 256]
                ok = pair_len <= MAX_SYMBOL_LEN
                uk, uc, pair_len = uk[ok], uc[ok], pair_len[ok]
                g = uc * (pair_len - 1)
                if g.size > max_symbols:
                    top = np.argpartition(-g, max_symbols)[:max_symbols]
                    uk, g = uk[top], g[top]
                for k, gv in zip(uk, g):
                    s = table.symbols[int(k) // 256] + table.symbols[int(k) % 256]
                    gains[s] = gains.get(s, 0) + int(gv)

        best = sorted(gains.items(), key=lambda kv: kv[1], reverse=True)[:max_symbols]
        table = FsstTable([s for s, _ in best])

    return table
