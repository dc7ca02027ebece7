"""Per-column-chunk lightweight codecs + auto-selector.

Every codec is a pure, vectorized function over one Arrow array
(one column chunk): numpy bit tricks + the ``re``/``zlib`` C engines.
No per-row Python anywhere — this is the Arrow-batch style of the
reference's export path (/root/reference/howard/objects/database.py:2653
``fetch_record_batch``), the opposite of its row-apply UDFs
(/root/reference/howard/functions/commons.py:1009-1374).

Codec inventory (north rule):
  integers   : const | frame-of-reference + bit-pack | RLE | dict | raw64
  floats     : const | decimal-scale→int codecs | dict | raw (+zlib)
  strings    : const | dict(codes,values) | raw block via
               plain | zlib | FSST | FSST+zlib   (trial-selected)
  bools      : bit-pack (width 1) via the int path
  temporals  : int64 view → int codecs (FoR shines on tight bands)
  lists      : offsets via int codecs + recursive child encode

Selection = encode the shortlisted candidates and keep the smallest
(chunks are <=64Ki rows, so trial encodes are cheap); large string
blocks are shortlisted on a deterministic sample first.

The per-chunk stats that drive shortlisting (cardinality, run count,
min/max range) are the Spark-side analog of the reference's
per-chromosome min/max probe (/root/reference/howard/objects/
variants.py:6290-6306) — see SURVEY.md §2.4 A10.
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import fsst
from .bits import frame, pack_mask, pack_uints, unframe, unpack_mask, unpack_uints, width_for

ZLIB_LEVEL = 6            # small blocks: ratio-first
ZLIB_LEVEL_BULK = 2       # large blocks: ~4x the throughput at ~3/4 the ratio
ZLIB_BULK_THRESHOLD = 4 << 20
BLOCK_SAMPLE_THRESHOLD = 1 << 18  # trial large blocks on a sample

# zstd (pyarrow's bundled C codec): measured on this corpus' content —
# level 3: ~970 MB/s enc / ~1.7 GB/s dec at 2.8x the zlib-2 ratio;
# level 9: ~200 MB/s enc at a further ~30% size win. Bulk blocks take
# the throughput point, small blocks the ratio point.
ZSTD_LEVEL = 9
ZSTD_LEVEL_BULK = 3


def _zlevel(n: int) -> int:
    return ZLIB_LEVEL_BULK if n >= ZLIB_BULK_THRESHOLD else ZLIB_LEVEL


_ZSTD_CODECS: dict = {}


def _zstd_codec(level: int) -> "pa.Codec":
    c = _ZSTD_CODECS.get(level)
    if c is None:
        c = _ZSTD_CODECS[level] = pa.Codec("zstd", compression_level=level)
    return c


def zstd_compress(data, level: int | None = None) -> bytes:
    """Size-prefixed zstd frame (pyarrow decompress needs the size)."""
    if level is None:
        level = ZSTD_LEVEL_BULK if len(data) >= ZLIB_BULK_THRESHOLD else ZSTD_LEVEL
    import struct as _struct

    comp = _zstd_codec(level).compress(data, asbytes=True)
    return _struct.pack("<Q", len(data)) + comp


def zstd_decompress(payload: bytes) -> bytes:
    import struct as _struct

    (n,) = _struct.unpack_from("<Q", payload, 0)
    return _zstd_codec(ZSTD_LEVEL_BULK).decompress(
        payload[8:], decompressed_size=n, asbytes=True)


# ---------------------------------------------------------------------------
# Arrow type (de)serialization — limited, explicit surface
# ---------------------------------------------------------------------------

_SIMPLE_TYPES = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
    "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(),
    "bool": pa.bool_(),
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
}


def type_to_str(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]" + (f"+{t.tz}" if t.tz else "")
    if pa.types.is_list(t):
        return f"list<{type_to_str(t.value_type)}>"
    if pa.types.is_large_list(t):
        return f"large_list<{type_to_str(t.value_type)}>"
    s = str(t)
    if s in _SIMPLE_TYPES:
        return s
    raise TypeError(f"unsupported arrow type: {t}")


def str_to_type(s: str) -> pa.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("timestamp["):
        rest = s[len("timestamp["):]
        unit, _, tz = rest.partition("]")
        return pa.timestamp(unit, tz=tz[1:] if tz.startswith("+") else None)
    if s.startswith("list<") and s.endswith(">"):
        return pa.list_(str_to_type(s[5:-1]))
    if s.startswith("large_list<") and s.endswith(">"):
        return pa.large_list(str_to_type(s[11:-1]))
    raise TypeError(f"unsupported type string: {s}")


# ---------------------------------------------------------------------------
# Integer codecs (operate on np.int64)
# ---------------------------------------------------------------------------

#: Relative decode cost per byte-block codec. Selection minimizes
#: bytes × decode-cost so a marginally-smaller general-compression block
#: never beats a lightweight dict/RLE representation — at scale, decode
#: throughput and selective reads dominate (SURVEY.md §7.3).
DECODE_COST = {"plain": 1.0, "zstd": 1.05, "fsst": 1.15, "fsst_zstd": 1.25,
               "zlib": 1.35, "fsst_zlib": 1.45}


@dataclass
class Enc:
    c: str          # codec name
    payload: bytes
    m: dict         # JSON-able meta
    cost: float | None = None  # weighted size for selection (default: size)

    @property
    def size(self) -> int:
        return len(self.payload) + len(json.dumps(self.m)) + 8

    @property
    def eff_cost(self) -> float:
        return self.cost if self.cost is not None else float(self.size)

    def nested(self) -> dict:
        return {"c": self.c, "m": self.m}


_DICT_SAMPLE = 2048


def _dict_precheck(vals: np.ndarray, cap: int) -> bool:
    """Cheap dict-eligibility gate (round 6): distinct(sample) <=
    distinct(full), so when even a prefix sample exceeds the dict cap
    the full np.unique pass (the single most expensive trial on
    high-cardinality chunks) is provably pointless — the skip is
    SELECTION-IDENTICAL, never a heuristic."""
    if vals.size <= _DICT_SAMPLE:
        return True
    return np.unique(vals[:_DICT_SAMPLE]).size <= cap


def encode_ints(vals: np.ndarray, _nested: bool = False) -> Enc:
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = vals.size
    if n == 0:
        return Enc("const", b"", {"v": 0})
    mn = int(vals.min())
    mx = int(vals.max())
    if mn == mx:
        return Enc("const", b"", {"v": mn})

    cands: list[Enc] = []
    if mx - mn < 2**63:
        w = width_for(mx - mn)
        cands.append(Enc("for", pack_uints((vals - mn).astype(np.uint64), w), {"b": mn, "w": w}))
    else:
        cands.append(Enc("raw64", vals.astype("<i8").tobytes(), {}))

    if _nested:  # inner plane of RLE/dict: FoR+bitpack is enough, no re-nesting
        return min(cands, key=lambda e: e.size)

    starts = np.empty(n, dtype=bool)
    starts[0] = True
    np.not_equal(vals[1:], vals[:-1], out=starts[1:])
    n_runs = int(starts.sum())
    if n_runs <= n // 2:
        run_vals = vals[starts]
        idx = np.flatnonzero(starts)
        run_lens = np.diff(np.append(idx, n))
        rv = encode_ints(run_vals, _nested=True)
        rl = encode_ints(run_lens.astype(np.int64), _nested=True)
        cands.append(Enc("rle", frame(rv.payload, rl.payload),
                         {"n": n_runs, "v": rv.nested(), "l": rl.nested()}))

    cap = min(max(16, n // 4), (1 << 16) - 1)
    if _dict_precheck(vals, cap):
        # return_inverse re-sort is ~2.4x cheaper than a searchsorted
        # pass on 64Ki rows (CLAUDE.md: searchsorted is slow here); the
        # sample precheck above makes the common all-unique reject path
        # one tiny unique instead of a full-chunk one
        uniq, inv = np.unique(vals, return_inverse=True)
        if uniq.size <= cap:
            uv = encode_ints(uniq, _nested=True)
            cd = encode_ints(inv.astype(np.int64), _nested=True)
            cands.append(Enc("dicti", frame(uv.payload, cd.payload),
                             {"k": int(uniq.size), "u": uv.nested(),
                              "cd": cd.nested()}))

    return min(cands, key=lambda e: e.size)


def decode_ints(c: str, payload: bytes, m: dict, n: int) -> np.ndarray:
    if c == "const":
        return np.full(n, m["v"], dtype=np.int64)
    if c == "for":
        # deltas < 2**63 by construction, so int64 view + base is exact
        u = unpack_uints(payload, m["w"], n)
        return u.astype(np.int64) + np.int64(m["b"])
    if c == "raw64":
        return np.frombuffer(payload, dtype="<i8").astype(np.int64)
    if c == "rle":
        pv, pl = unframe(payload)
        run_vals = decode_ints(m["v"]["c"], pv, m["v"]["m"], m["n"])
        run_lens = decode_ints(m["l"]["c"], pl, m["l"]["m"], m["n"])
        return np.repeat(run_vals, run_lens)
    if c == "dicti":
        pu, pcd = unframe(payload)
        uniq = decode_ints(m["u"]["c"], pu, m["u"]["m"], m["k"])
        codes = decode_ints(m["cd"]["c"], pcd, m["cd"]["m"], n)
        return uniq[codes]
    raise ValueError(f"unknown int codec {c}")


# ---------------------------------------------------------------------------
# Float codecs (operate on np.float64; bit-exact incl. NaN / -0.0)
# ---------------------------------------------------------------------------

def encode_floats(vals: np.ndarray) -> Enc:
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = vals.size
    bits = vals.view(np.uint64)
    if n == 0:
        return Enc("fconst", b"", {"v": "0" * 16})
    if (bits == bits[0]).all():
        return Enc("fconst", b"", {"v": bits[0].tobytes().hex()})

    cands: list[Enc] = []
    for scale in (1, 100):
        with np.errstate(invalid="ignore", over="ignore"):
            scaled = vals * scale
            r = np.round(scaled)
            ok = (
                np.isfinite(vals).all()
                and (np.abs(r) < 2**53).all()
                and ((r / scale).view(np.uint64) == bits).all()
            )
        if ok:
            ie = encode_ints(r.astype(np.int64))
            cands.append(Enc("fdec", ie.payload, {"s": scale, "i": ie.nested()}))
            break

    cap = min(max(16, n // 4), (1 << 16) - 1)
    if _dict_precheck(bits, cap):
        uniq, inv = np.unique(bits, return_inverse=True)  # see int path note
        if uniq.size <= cap:
            cd = encode_ints(inv.astype(np.int64))
            cands.append(Enc("fdict", frame(uniq.tobytes(), cd.payload),
                             {"k": int(uniq.size), "cd": cd.nested()}))

    raw = vals.astype("<f8", copy=False).tobytes()
    # Full-chunk zlib was ~a third of encode_floats on decimal-friendly
    # columns (measured 3-4 ms of a 10 ms 16k-row chunk) and loses to a
    # successful fdec/fdict candidate almost always (measured lineitem:
    # fdec 2.66-15.8x vs zlib 1.9-10.2x, fdec ahead on every column).
    # Gate the full trial on a 16 KiB sample estimate: zlib's ratio is
    # near-uniform within a chunk, so a sample ratio that trails the
    # best candidate by >1.2x cannot win the size race. Floats with no
    # better candidate always get the full trial (zlib is then the only
    # compressor on offer).
    best = min((e.size for e in cands), default=None)
    run_full = True
    if best is not None and len(raw) > (16 << 10):
        zs = zlib.compress(raw[:16 << 10], ZLIB_LEVEL)
        est_ratio = (16 << 10) / max(len(zs), 1)
        run_full = est_ratio * 1.2 >= len(raw) / max(best, 1)
    if run_full:
        z = zlib.compress(raw, ZLIB_LEVEL)
        if len(z) < len(raw):
            cands.append(Enc("fzlib", z, {}))
    cands.append(Enc("fraw", raw, {}))
    return min(cands, key=lambda e: e.size)


def decode_floats(c: str, payload: bytes, m: dict, n: int) -> np.ndarray:
    if c == "fconst":
        v = np.frombuffer(bytes.fromhex(m["v"]), dtype=np.uint64)[0]
        return np.full(n, v, dtype=np.uint64).view(np.float64)
    if c == "fdec":
        ints = decode_ints(m["i"]["c"], payload, m["i"]["m"], n)
        return ints.astype(np.float64) / m["s"]
    if c == "fdict":
        pu, pcd = unframe(payload)
        uniq = np.frombuffer(pu, dtype=np.uint64)
        codes = decode_ints(m["cd"]["c"], pcd, m["cd"]["m"], n)
        return uniq[codes].view(np.float64)
    if c == "fzlib":
        return np.frombuffer(zlib.decompress(payload), dtype="<f8").astype(np.float64)
    if c == "fraw":
        return np.frombuffer(payload, dtype="<f8").astype(np.float64)
    raise ValueError(f"unknown float codec {c}")


# ---------------------------------------------------------------------------
# Byte-block codecs (string data planes): plain | zlib | fsst | fsst+zlib
# ---------------------------------------------------------------------------

#: Above this size, FSST must beat zlib by a margin on the sample trial
#: to be chosen — the numpy FSST encoder runs ~5-10 MB/s/core vs zlib's
#: ~200 MB/s, so on huge blocks a marginal ratio win isn't worth the
#: encode time (decode remains fast either way).
BLOCK_FSST_MARGIN_THRESHOLD = 8 << 20
BLOCK_FSST_MARGIN = 0.85
#: Below this size FSST training overhead never pays off; try zlib/plain.
BLOCK_FSST_MIN = 32 << 10


def encode_block_named(data, name: str) -> tuple[str, bytes]:
    """Encode with one specific block codec (no trials) — used by the
    adaptive per-column selector memo in the encode kernel.
    ``data`` may be bytes or a uint8 ndarray view (zero-copy path)."""
    if len(data) == 0:
        return "plain", b""
    if name == "plain":
        return "plain", _as_bytes(data)
    if name == "zlib":
        payload = zlib.compress(data, _zlevel(len(data)))
        return ("zlib", payload) if len(payload) < len(data) else ("plain", _as_bytes(data))
    if name == "zstd":
        payload = zstd_compress(data)
        return ("zstd", payload) if len(payload) < len(data) else ("plain", _as_bytes(data))
    data_b = _as_bytes(data)
    table = fsst.train(data_b)
    comp = fsst.compress(data_b, table)
    if name == "fsst":
        payload = frame(table.serialize(), comp)
    elif name == "fsst_zstd":
        payload = frame(table.serialize(), zstd_compress(comp))
    else:
        payload = frame(table.serialize(), zlib.compress(comp, _zlevel(len(comp))))
    if len(payload) >= len(data_b):
        return "plain", data_b
    return name, payload


def _sample_view(data, budget: int = 1 << 16, slices: int = 8) -> bytes:
    """fsst._sample semantics over bytes OR a uint8 ndarray view —
    identical output bytes, but only the sample is ever copied."""
    if len(data) <= budget:
        return _as_bytes(data)
    step = len(data) // slices
    piece = budget // slices
    return b"".join(_as_bytes(data[i * step : i * step + piece]) for i in range(slices))


def encode_block(data) -> tuple[str, bytes]:
    """``data`` may be bytes or a uint8 ndarray view (zero-copy path)."""
    if len(data) == 0:
        return "plain", b""

    def _fsst_parts(src: bytes) -> tuple[bytes, bytes, bytes, bytes]:
        """(table bytes, fsst, fsst+zlib, fsst+zstd) — one train, one
        compress, shared between all fsst candidates."""
        table = fsst.train(src)
        comp = fsst.compress(src, table)
        tb = table.serialize()
        return tb, comp, zlib.compress(comp, ZLIB_LEVEL), zstd_compress(comp, ZSTD_LEVEL)

    if len(data) < BLOCK_FSST_MIN:
        cands = [
            ("plain", _as_bytes(data)),
            ("zlib", zlib.compress(data, _zlevel(len(data)))),
            ("zstd", zstd_compress(data)),
        ]
        return min(cands, key=lambda t: len(t[1]))

    if len(data) <= BLOCK_SAMPLE_THRESHOLD:
        data = _as_bytes(data)
        tb, comp, compz, compzs = _fsst_parts(data)
        cands = [
            ("plain", data),
            ("zlib", zlib.compress(data, _zlevel(len(data)))),
            ("zstd", zstd_compress(data, ZSTD_LEVEL)),
            ("fsst", frame(tb, comp)),
            ("fsst_zlib", frame(tb, compz)),
            ("fsst_zstd", frame(tb, compzs)),
        ]
        return min(cands, key=lambda t: len(t[1]))

    # Large block: shortlist on a deterministic sample, then encode once.
    # (sampling on the view copies only the ~64KB sample, not the block)
    s = _sample_view(data, budget=1 << 16)
    table = fsst.train(s)
    comp_s = fsst.compress(s, table)
    tb = table.serialize()
    est = {
        "plain": len(s),
        "zlib": len(zlib.compress(s, ZLIB_LEVEL)),
        "zstd": len(zstd_compress(s, ZSTD_LEVEL)),
        "fsst": len(comp_s) + len(tb),
        "fsst_zlib": len(zlib.compress(comp_s, ZLIB_LEVEL)) + len(tb),
        "fsst_zstd": len(zstd_compress(comp_s, ZSTD_LEVEL)) + len(tb),
    }
    if len(data) > BLOCK_FSST_MARGIN_THRESHOLD:
        # throughput-aware: on huge blocks FSST must win by a clear margin
        # over the fastest entropy codec
        floor = min(est["zlib"], est["zstd"])
        for k in ("fsst", "fsst_zlib", "fsst_zstd"):
            if est[k] > floor * BLOCK_FSST_MARGIN:
                est[k] = 1 << 62
    winner = min(est, key=est.get)
    if winner in ("fsst", "fsst_zlib", "fsst_zstd"):
        # reuse the sample-trained table for the full block (FSST paper
        # trains on a sample; retraining on the full data doesn't pay)
        data_b = _as_bytes(data)
        comp = fsst.compress(data_b, table)
        if winner == "fsst":
            payload = frame(tb, comp)
        elif winner == "fsst_zstd":
            payload = frame(tb, zstd_compress(comp))
        else:
            payload = frame(tb, zlib.compress(comp, _zlevel(len(comp))))
        if len(payload) >= len(data_b):
            return "plain", data_b
        return winner, payload
    name, payload = encode_block_named(data, winner)
    return name, payload


def decode_block(name: str, payload: bytes) -> bytes:
    if name == "plain":
        return payload
    if name == "zlib":
        return zlib.decompress(payload)
    if name == "zstd":
        return zstd_decompress(payload)
    if name in ("fsst", "fsst_zlib", "fsst_zstd"):
        tbl_bytes, comp = unframe(payload)
        table = fsst.FsstTable.deserialize(tbl_bytes)
        if name == "fsst_zlib":
            comp = zlib.decompress(comp)
        elif name == "fsst_zstd":
            comp = zstd_decompress(comp)
        return fsst.decompress(comp, table)
    raise ValueError(f"unknown block codec {name}")


# ---------------------------------------------------------------------------
# String codecs
# ---------------------------------------------------------------------------

def _as_bytes(data) -> bytes:
    """bytes view -> bytes (copy only if needed)."""
    return data.tobytes() if isinstance(data, np.ndarray) else data


def _string_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths int64, concatenated data uint8 VIEW) — zero-copy buffer
    math. The data view aliases the Arrow buffer: consumers that only
    stream it (zlib.compress, pa.py_buffer) never copy; paths that
    genuinely need bytes call _as_bytes at the last moment."""
    a = arr
    if pa.types.is_string(a.type):
        a = a.cast(pa.large_string())
    elif pa.types.is_binary(a.type):
        a = a.cast(pa.large_binary())
    bufs = a.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[a.offset : a.offset + len(a) + 1]
    if bufs[2] is None:
        return np.diff(offsets), np.empty(0, dtype=np.uint8)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    return np.diff(offsets), data


def _string_logical_bytes(arr: pa.Array) -> int:
    """Sum of value lengths WITHOUT touching the data buffer."""
    a = arr
    if pa.types.is_string(a.type):
        a = a.cast(pa.large_string())
    elif pa.types.is_binary(a.type):
        a = a.cast(pa.large_binary())
    bufs = a.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[a.offset : a.offset + len(a) + 1]
    return int(offsets[-1] - offsets[0])


def _strings_from_parts(lens: np.ndarray, data: bytes, mask: np.ndarray | None,
                        storage: pa.DataType | None = None) -> pa.Array:
    """``storage`` may be large_utf8 for string targets: building utf8
    directly via from_buffers skips the binary->string cast's UTF-8
    validation scan (measured ~19% of single-core decode). Trusted-
    decode fast path — the bytes came from our own encoder and chunk
    shas catch corruption upstream.

    TRUST CONTRACT (r5 ADVICE): decode_df/decode_array do NOT verify
    the chunk sha inline — a store of unknown provenance (or one that
    may have been corrupted at rest) must run the opt-in sha verify
    pass (checkpoint.scrub / the q50-style sha gate) BEFORE relying on
    trusted decode, otherwise a corrupted-but-decompressible payload
    yields an Arrow array falsely declared utf8 instead of a clean
    cast error."""
    n = lens.size
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    vbuf = None
    null_count = 0
    if mask is not None:
        vbuf = pa.py_buffer(pack_mask(mask))
        null_count = int(n - mask.sum())
    return pa.Array.from_buffers(
        storage or pa.large_binary(), n,
        [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
        null_count=null_count,
    )


def encode_strings(arr: pa.Array, _nested: bool = False, hint: dict | None = None) -> Enc:
    """``hint`` pins the previous chunk's choice for this column
    ({"c": "sraw"|"sdict", "b": block codec}) so steady-state chunks
    skip the candidate trials — the kernel re-probes periodically."""
    lens, data = _string_parts(arr)
    n = lens.size
    if n == 0:
        return Enc("sconst", b"", {"e": 1})

    # hint fast path: skip cardinality probing entirely (sraw never
    # needs the dictionary; a constant chunk still round-trips fine)
    if hint is not None and hint.get("c") == "sraw":
        le = encode_ints(lens)
        blk_name, blk_payload = encode_block_named(data, hint.get("b", "zlib"))
        return Enc("sraw", frame(le.payload, blk_payload),
                   {"l": le.nested(), "b": blk_name})

    # sampled cardinality gate: dictionary-encoding hashes every byte,
    # which is wasted work on (near-)all-unique columns like content —
    # probe a prefix first (A10-style stats sampling, SURVEY.md §2.4)
    d = None
    nuniq = None
    if n == 1:
        nuniq = 1
    else:
        n_probe = min(n, 1024)
        d_probe = pc.dictionary_encode(arr.slice(0, n_probe))
        if n_probe < n and len(d_probe.dictionary) > 0.9 * n_probe:
            nuniq = n  # effectively all-unique: skip full dict pass
        else:
            d = pc.dictionary_encode(arr)
            nuniq = len(d.dictionary)

    if nuniq == 1:
        return Enc("sconst", _as_bytes(data[: lens[0]]) if n else b"", {"l": int(lens[0])})

    if hint is not None and hint.get("c") == "sdict" and d is not None and nuniq < n:
        codes = np.asarray(d.indices, dtype=np.int64)
        ce = encode_ints(codes)
        ve = encode_strings(d.dictionary, _nested=True)
        return Enc("sdict", frame(ce.payload, ve.payload),
                   {"k": nuniq, "cd": ce.nested(), "v": ve.nested()})

    cands: list[Enc] = []
    le = encode_ints(lens)
    blk_name, blk_payload = encode_block(data)
    cands.append(Enc("sraw", frame(le.payload, blk_payload),
                     {"l": le.nested(), "b": blk_name},
                     cost=len(le.payload) + len(blk_payload) * DECODE_COST[blk_name]))

    if not _nested and d is not None and nuniq <= max(16, n // 2) and nuniq < n:
        codes = np.asarray(d.indices, dtype=np.int64)
        ce = encode_ints(codes)
        ve = encode_strings(d.dictionary, _nested=True)
        cands.append(Enc("sdict", frame(ce.payload, ve.payload),
                         {"k": nuniq, "cd": ce.nested(), "v": ve.nested()},
                         cost=len(ce.payload) + ve.eff_cost))

    return min(cands, key=lambda e: e.eff_cost)


def decode_strings(c: str, payload: bytes, m: dict, n: int,
                   mask: np.ndarray | None,
                   storage: pa.DataType | None = None) -> pa.Array:
    if c == "sconst":
        if m.get("e"):
            return _strings_from_parts(np.zeros(n, dtype=np.int64), b"", mask,
                                       storage)
        ln = m["l"]
        lens = np.full(n, ln, dtype=np.int64)
        # payload is the single value; replicate
        data = payload * n
        return _strings_from_parts(lens, data, mask, storage)
    if c == "sraw":
        pl, pb = unframe(payload)
        lens = decode_ints(m["l"]["c"], pl, m["l"]["m"], n)
        data = decode_block(m["b"], pb)
        return _strings_from_parts(lens, data, mask, storage)
    if c == "sdict":
        pcd, pv = unframe(payload)
        codes = decode_ints(m["cd"]["c"], pcd, m["cd"]["m"], n)
        vals = decode_strings(m["v"]["c"], pv, m["v"]["m"], m["k"], None,
                              storage)
        taken = vals.take(pa.array(codes))
        if mask is None:
            return taken
        lens, data = _string_parts(taken)
        return _strings_from_parts(lens, data, mask, storage)
    raise ValueError(f"unknown string codec {c}")


# ---------------------------------------------------------------------------
# Top-level column-chunk encode / decode
# ---------------------------------------------------------------------------

@dataclass
class ChunkEncoding:
    codec: str
    payload: bytes
    meta: str        # JSON
    n_rows: int
    n_nulls: int
    raw_bytes: int
    enc_bytes: int


def logical_size(arr: pa.Array) -> int:
    """Uncompressed logical size used for throughput/ratio accounting."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _string_logical_bytes(arr) + 4 * len(arr)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return logical_size(arr.flatten()) + 4 * len(arr)
    if pa.types.is_boolean(t):
        return len(arr)
    return len(arr) * max(t.bit_width // 8, 1)


def _combine(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        # single-chunk fast path: combine_chunks() COPIES the buffers
        # even for one chunk — measured 29% of steady-state kernel time
        # on 64Ki-row corpus chunks. Downstream consumers do offset
        # math on the buffers (_string_parts), so a sliced chunk view
        # is fine.
        if arr.num_chunks == 1:
            return arr.chunk(0)
        if arr.num_chunks == 0:
            return pa.array([], type=arr.type)
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else pa.array([], type=arr.type)
    return arr


def encode_array(arr, hint: dict | None = None) -> ChunkEncoding:
    arr = _combine(arr)
    t = arr.type
    atype = type_to_str(t)
    n = len(arr)
    n_nulls = arr.null_count
    raw = logical_size(arr)

    mask = None
    if n_nulls:
        mask = np.asarray(pc.is_valid(arr))

    if n == 0:
        meta = {"atype": atype, "nulls": False, "c": "empty", "m": {}}
        return ChunkEncoding("empty", b"", json.dumps(meta), 0, 0, 0, 0)

    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        if n_nulls:
            work = _combine(pc.fill_null(
                arr, b"" if pa.types.is_binary(t) or pa.types.is_large_binary(t) else ""))
        else:
            work = arr  # no nulls: fill_null would copy for nothing
        enc = encode_strings(work, hint=hint)
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        work = _combine(arr)
        flat = _combine(work.flatten())  # flatten() skips null slots' ranges
        sizes = np.asarray(pc.fill_null(pc.list_value_length(work), 0), dtype=np.int64)
        le = encode_ints(sizes)
        child = encode_array(flat)
        enc = Enc("list", frame(le.payload, child.payload),
                  {"l": le.nested(), "ch": json.loads(child.meta), "cn": len(flat)})
    elif pa.types.is_floating(t):
        vals = np.asarray(pc.fill_null(arr.cast(pa.float64()), 0.0), dtype=np.float64)
        enc = encode_floats(vals)
    elif pa.types.is_boolean(t):
        vals = np.asarray(pc.fill_null(arr, False)).astype(np.int64)
        enc = encode_ints(vals)
    else:
        # ints, temporals, dates
        as64 = arr
        if pa.types.is_timestamp(t):
            as64 = arr.cast(pa.int64())
        elif pa.types.is_date32(t):
            as64 = arr.cast(pa.int32()).cast(pa.int64())
        else:
            as64 = arr.cast(pa.int64())
        vals = np.asarray(pc.fill_null(as64, 0), dtype=np.int64)
        enc = encode_ints(vals)

    payload = enc.payload
    if mask is not None:
        payload = frame(pack_mask(mask), payload)
    meta = {"atype": atype, "nulls": mask is not None, "c": enc.c, "m": enc.m}
    return ChunkEncoding(enc.c, payload, json.dumps(meta), n, n_nulls, raw,
                         len(payload) + len(json.dumps(meta)))


def decode_array(payload: bytes, meta_json: str, n_rows: int) -> pa.Array:
    meta = json.loads(meta_json)
    t = str_to_type(meta["atype"])
    c = meta["c"]
    m = meta["m"]
    if c == "empty":
        return pa.array([], type=t)

    mask = None
    if meta["nulls"]:
        mb, payload = unframe(payload)
        mask = unpack_mask(mb, n_rows)

    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        storage = (pa.large_utf8()
                   if pa.types.is_string(t) or pa.types.is_large_string(t)
                   else pa.large_binary())
        a = decode_strings(c, payload, m, n_rows, mask, storage=storage)
        return a if a.type == t else a.cast(t)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        pl, pch = unframe(payload)
        sizes = decode_ints(m["l"]["c"], pl, m["l"]["m"], n_rows)
        chmeta = m["ch"]
        child = decode_array(pch, json.dumps(chmeta), m["cn"])
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        if mask is not None:
            # null offsets mark null list slots (Arrow from_arrays convention)
            null_at = np.append(~mask, False)
            off_arr = pa.array(offsets, type=pa.int64(), mask=null_at)
        else:
            off_arr = pa.array(offsets, type=pa.int64())
        la = pa.LargeListArray.from_arrays(off_arr, child)
        return la.cast(t)
    if pa.types.is_floating(t):
        vals = decode_floats(c, payload, m, n_rows)
        a = pa.array(vals, type=pa.float64())
        if mask is not None:
            a = pc.if_else(pa.array(mask), a, pa.nulls(n_rows, type=pa.float64()))
        return a.cast(t)

    vals = decode_ints(c, payload, m, n_rows)
    if pa.types.is_boolean(t):
        a = pa.array(vals.astype(bool))
        if mask is not None:
            a = pc.if_else(pa.array(mask), a, pa.nulls(n_rows, type=pa.bool_()))
        return a
    a = pa.array(vals, type=pa.int64())
    if mask is not None:
        a = pc.if_else(pa.array(mask), a, pa.nulls(n_rows, type=pa.int64()))
    if pa.types.is_timestamp(t):
        return a.cast(t)
    if pa.types.is_date32(t):
        return a.cast(pa.int32()).cast(t)
    return a.cast(t)
