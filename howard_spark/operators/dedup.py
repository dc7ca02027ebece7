"""Deduplication operators over the documents table.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash (bit-vote fingerprint), and n-gram Jaccard on
LSH candidate pairs.

Portability design: MinHash uses ``md5`` (identical hex in Spark and
DuckDB) so the whole shingle→minhash→band pipeline is
oracle-checkable SQL in both engines; the lexicographic min of md5
hex strings is a valid min-hash. SimHash (q33) also derives its bits
from md5 hex nibbles and emits the 64-bit fingerprint as a hex STRING,
so it too is fully oracle-checked; only the xxhash64 fast-path minhash
(q36) is engine-internal (rows-only + pytest equivalence vs q31).

Scale notes (the 100 TB story):
- shingling explodes ~SHINGLE_CAP rows per doc; the groupBy that
  follows is a map-side-combinable min() — partial aggregation keeps
  the shuffle tiny (one row per (doc, seed));
- the LSH band join is an equi-join on the band key: self-joins on
  banded signatures shuffle only (doc_id, band_key) pairs, never text;
- exact dedup shuffles only (hash, doc_id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, t

N_HASHES = 8        # minhash signature length
BAND_ROWS = 2       # rows per LSH band -> 4 bands
SHINGLE_K = 9       # character shingle width
SHINGLE_CAP = 512   # max shingles per doc (prefix cap, both engines)


def exact_pair_scores(pairs, sh=None, join_mode: str = "auto",
                      sets=None):
    """Exact set-intersection scores for candidate ``pairs`` — the
    shared verify kernel of q34 and :func:`dedup_estimate_verify`.

    100-TB shape (round-5; closes the r4 verdict's one remaining
    scale-killer — the unconditional full-corpus broadcast):

    1. **Semi-join first.** The per-doc shingle-set table is restricted
       via left-semi join to docs that actually APPEAR in ``pairs``
       before any join strategy is chosen. In the estimate-then-verify
       pipeline only borderline docs' sets are ever built (measured
       19.2% of pairs at the big regime); memory is bounded by the
       candidate fraction, not the corpus.
    2. **Size-driven broadcast vs shuffle.** ``join_mode="auto"``
       (default) writes plain equi-joins and lets AQE decide at
       runtime: the sets side's shuffle stage is materialized, its
       ACTUAL byte size read, and the join is converted to broadcast
       only if it fits under spark.sql.autoBroadcastJoinThreshold —
       the same measure-then-pick discipline as the codec selector,
       done by the engine on real sizes rather than estimates. Above
       the threshold the two equi-joins shuffle the (restricted) set
       table once per side — still linear in pairs, never
       sum_pairs(|A|) rows, and no executor ever holds all sets.
       ``join_mode="broadcast"``/``"shuffle"`` force either strategy
       (used by the equivalence plan tests).

    Returns ``pairs``'s columns plus exact integers (i_cnt, u_cnt);
    jaccard = i_cnt/u_cnt is derivable downstream (float-tie caveat).
    """
    # the pairs plan feeds BOTH the needed-docs semi-join derivation and
    # the final join — persist so candidate generation runs once, not
    # twice (r5 ADVICE; q34 passes the whole unpersisted LSH pipeline
    # here). Bounded: one small row per candidate pair, same pattern as
    # dedup_estimate_verify's est.persist().
    pairs = pairs.persist()
    if sets is None:
        # legacy path: fold the (doc_id, sh) relation into sets here;
        # round-6 callers pass a prebuilt `sets` (shingle_sets_df — one
        # Arrow pass, no explode/distinct/collect_list shuffles)
        sets = sh.groupBy("doc_id").agg(
            F.collect_list("sh").alias("shs"), F.count("*").alias("n"))
    needed = (pairs.select(F.col("doc_a").alias("doc_id"))
              .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
              .distinct())
    sets = sets.join(needed, "doc_id", "left_semi")
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("shs").alias("sa"), F.col("n").alias("n_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("shs").alias("sb"), F.col("n").alias("n_b"))
    if join_mode == "broadcast":
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    elif join_mode == "shuffle":
        sa, sb = sa.hint("shuffle_merge"), sb.hint("shuffle_merge")
    elif join_mode != "auto":
        raise ValueError(f"join_mode must be auto|broadcast|shuffle, "
                         f"got {join_mode!r}")
    i_expr = F.size(F.array_intersect("sa", "sb")).cast("bigint")
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select(*pairs.columns, i_expr.alias("i_cnt"),
                (F.col("n_a") + F.col("n_b") - i_expr)
                .cast("bigint").alias("u_cnt"))
    )


@query(
    "q30_exact_dedup",
    """
    SELECT h AS h, count(*) AS dup_count, min(doc_id) AS keeper
    FROM (SELECT doc_id, md5(text) AS h FROM documents)
    GROUP BY h
    HAVING count(*) > 1
    """,
)
def q30(spark, sf):
    """Exact dedup: md5-hash groupBy, keep the smallest doc_id."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keeper"))
        .where(F.col("dup_count") > 1)
    )


def _shingles_df(spark, sf):
    """doc_id × exploded character shingles (prefix-capped).

    The documents table arrives as one small file = one input split,
    but shingling fans out ~SHINGLE_CAP x — repartition BEFORE the
    explode so the expensive fan-out uses every core (a tiny shuffle
    buys full parallelism; at 100 TB the scan itself is already wide
    and the repartition is a no-op choice)."""
    d = t(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    shingles = F.expr(
        f"transform(sequence(1, least(greatest(length(text) - {SHINGLE_K - 1}, 1), {SHINGLE_CAP})), "
        f"i -> substring(text, i, {SHINGLE_K}))"
    )
    return d.select("doc_id", F.explode(shingles).alias("sh"))


_SHINGLES_SQL = f"""
        SELECT doc_id, substring(text, CAST(i AS INTEGER), {SHINGLE_K}) AS sh
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, greatest(least(length(text) - {SHINGLE_K - 1},
                                                  {SHINGLE_CAP}), 1) + 1)) AS i
            FROM documents
        )
"""

_MINHASH_SQL = f"""
        SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
        FROM ({_SHINGLES_SQL}) s,
             (SELECT unnest(range({N_HASHES})) AS seed) seeds
        GROUP BY doc_id, seed
"""


def _batch_windows(tb, k: int = SHINGLE_K, cap: int = SHINGLE_CAP):
    """Shared shingle-window extraction for the Arrow document kernels:
    (doc_id, text) record batch -> (ids, inv, seg, words) where
    ``words`` is the batch's distinct-window vocabulary (bytes, or
    None for the single NULL window a NULL text produces), ``inv``
    maps every window position to its vocab index, and ``seg`` holds
    each doc's first window position (for np.*.reduceat).

    Windows are substring(text, i, k) for i = 1..n_sh,
    n_sh = min(max(len - k + 1, 1), cap) — CHARACTER positions,
    reproduced byte-exactly on the vectorized path only when the whole
    batch is NUL-free ASCII with every doc >= k chars (one cheap
    buffer check); anything else takes the per-doc Python path, which
    slices `str` exactly like Spark's substring. A NULL text yields
    ONE NULL window: greatest(NULL, 1) is 1 in Spark, so the JVM
    explode emits one NULL element (verified in
    tests/test_minhash_kernel.py)."""
    import numpy as np

    ids = tb.column(0).to_numpy()
    col = tb.column(1)
    offs_all = np.frombuffer(col.buffers()[1], dtype=np.int32)
    offs = offs_all[col.offset:col.offset + len(col) + 1]
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    ascii_ok = (col.null_count == 0 and lens.min() >= k
                and buf[offs[0]:offs[-1]].size > 0
                and buf[offs[0]:offs[-1]].min() > 0
                and buf[offs[0]:offs[-1]].max() < 128)
    if ascii_ok:
        import pyarrow as pa

        n_sh = np.minimum(lens - (k - 1), cap)
        seg = np.cumsum(n_sh) - n_sh              # window-segment starts
        total = int(n_sh.sum())
        starts = np.arange(total) + np.repeat(offs[:-1] - seg, n_sh)
        W = np.lib.stride_tricks.sliding_window_view(buf, k)[starts]
        # distinct windows via Arrow's O(n) hash dictionary instead of
        # np.unique's O(n log n) string sort (measured 7.5 -> 1.0 s on
        # a 14.5M-window batch). The dictionary arrives in first-
        # appearance order; a rank remap of the SMALL vocab restores
        # the exact lexicographic vocab order/inv np.unique produced,
        # so downstream output (set element order, rank minima) is
        # byte-identical to the old path.
        if 7 * k <= 64:
            # ascii bytes are 7-bit: big-endian 7-bit packing into one
            # uint64 is injective AND lex-order-preserving for the
            # equal-length windows of this path
            acc = np.zeros(total, dtype=np.uint64)
            for i in range(k):
                acc |= W[:, i].astype(np.uint64) << np.uint64((k - 1 - i) * 7)
            d = pa.array(acc).dictionary_encode()
            dv = d.dictionary.to_numpy()
            order = np.argsort(dv, kind="stable")
            sv = dv[order]
            M = np.empty((len(sv), k), dtype=np.uint8)
            for i in range(k):
                M[:, i] = ((sv >> np.uint64((k - 1 - i) * 7))
                           & np.uint64(0x7F)).astype(np.uint8)
            uniq = M.view(f"S{k}").ravel()
        else:                                      # wide windows (q49 grams)
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(k), total, [None, pa.py_buffer(W.tobytes())])
            d = fsb.dictionary_encode()
            dvals = np.frombuffer(
                d.dictionary.buffers()[1], dtype=f"S{k}",
                count=len(d.dictionary))
            order = np.argsort(dvals, kind="stable")
            uniq = dvals[order]
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(len(order))
        inv = ranks[d.indices.to_numpy()]
        words = uniq.tolist()                     # exact k-byte windows
    else:                                          # exact general path
        texts = col.to_pylist()
        vocab: dict = {}
        inv_list, n_sh_list = [], []
        for txt in texts:
            if txt is None:
                windows = [None]          # one NULL window (see above)
            else:
                n = min(max(len(txt) - (k - 1), 1), cap)
                windows = [txt[j:j + k] for j in range(n)]
            n_sh_list.append(len(windows))
            for w in windows:
                ki = vocab.get(w)
                if ki is None:
                    ki = len(vocab)
                    vocab[w] = ki
                inv_list.append(ki)
        inv = np.asarray(inv_list, dtype=np.int64)
        n_sh = np.asarray(n_sh_list, dtype=np.int64)
        seg = np.cumsum(n_sh) - n_sh
        words = [None if w is None else w.encode("utf-8") for w in vocab]
    return ids, inv, seg, words


def _minhash_kernel(batches):
    """mapInArrow kernel: documents (doc_id, text) -> wide md5 minhash
    signatures (doc_id, mh0..mh{N-1}), semantically IDENTICAL to the
    JVM pipeline `explode(shingles) -> min(md5(seed:sh)) per doc`
    (window semantics: see _batch_windows):

    - md5 is hashed ONCE PER DISTINCT shingle in the batch (measured
      vocabulary 38k distinct vs 25.6M positions at the x10 regime —
      the r3 hot-shingle fact), then per-doc minima are taken on
      order-preserving integer RANKS of each seed's hex values
      (min rank == lexicographic min hex) via np.minimum.reduceat.
      hashlib md5 hex == Spark md5 == DuckDB md5, so the emitted
      strings are byte-identical to the JVM expression's;
    - a NULL text's row carries mh_s = md5(str(s)) because concat_ws
      skips the NULL shingle."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    md5 = hashlib.md5
    prefixes = [f"{s}:".encode() for s in range(N_HASHES)]

    for tb in batches:
        if tb.num_rows == 0:
            continue
        out_ids, inv, seg, words = _batch_windows(tb)
        hexes = np.empty((N_HASHES, len(words)), dtype="S32")
        for s in range(N_HASHES):
            p = prefixes[s]
            # concat_ws(':', seed, sh) skips a NULL sh: hash the seed
            # alone, WITHOUT the separator
            hexes[s] = [md5(p[:-1] if w is None else p + w).hexdigest()
                        for w in words]
        cols = {"doc_id": pa.array(out_ids, type=pa.int64())}
        for s in range(N_HASHES):
            order = np.argsort(hexes[s])
            ranks = np.empty(len(words), dtype=np.int64)
            ranks[order] = np.arange(len(words))
            rmin = np.minimum.reduceat(ranks[inv], seg)
            cols[f"mh{s}"] = pa.array(
                np.char.decode(hexes[s][order][rmin], "ascii"))
        yield pa.record_batch(cols)


def _shingle_sets_kernel(batches):
    """mapInArrow kernel: documents (doc_id, text) -> per-doc DISTINCT
    shingle sets (doc_id, shs array<string>, n bigint), identical to
    `_shingles_df(...).distinct()` folded through
    `groupBy(doc_id).agg(collect_list(sh), count(*))`:

    - ``n`` counts distinct (doc_id, sh) ROWS, so a NULL shingle (NULL
      text) contributes to n but — like collect_list — is EXCLUDED
      from shs;
    - set order within shs is the batch vocab order (deterministic);
      every consumer is order-free (array_intersect / size)."""
    import numpy as np
    import pyarrow as pa

    for tb in batches:
        if tb.num_rows == 0:
            continue
        ids, inv, seg, words = _batch_windows(tb)
        m = len(ids)
        n_win = len(inv)
        counts = np.diff(np.append(seg, n_win))
        seg_ids = np.repeat(np.arange(m, dtype=np.int64), counts)
        V = len(words)
        uc = np.unique(seg_ids * V + inv)          # distinct (doc, word)
        useg, uinv = uc // V, uc % V
        n_per_doc = np.bincount(useg, minlength=m)
        null_idx = words.index(None) if None in words else -1
        if null_idx >= 0:
            keep = uinv != null_idx
            kseg, kinv = useg[keep], uinv[keep]
        else:
            kseg, kinv = useg, uinv
        # decode each DISTINCT word once and gather with Arrow take —
        # the old per-(doc, word) Python decode loop was 2.35 s vs
        # 0.16 s on a 14M-pair batch (guide §4.2: vocab-sized Python
        # work, batch-sized native work)
        vocab_arr = pa.array(
            [None if w is None else w.decode("utf-8") for w in words],
            type=pa.string())
        flat = vocab_arr.take(pa.array(kinv, type=pa.int64()))
        offsets = np.concatenate(
            ([0], np.cumsum(np.bincount(kseg, minlength=m)))).astype("int32")
        shs = pa.ListArray.from_arrays(pa.array(offsets,
                                                type=pa.int32()), flat)
        yield pa.record_batch({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shs": shs,
            "n": pa.array(n_per_doc, type=pa.int64())})


def shingle_sets_df(spark, sf):
    """Per-doc distinct shingle sets in ONE pass over the documents
    scan (round 6, guide §4.2/§2.4): replaces
    `_shingles_df(...).distinct()` + the collect_list groupBy inside
    exact_pair_scores — two shuffles of ~25M exploded rows — with a
    single mapInArrow stage (measured: the distinct alone cost 1.6 s
    at the x10 regime)."""
    d = (t(spark, sf, "documents")
         .repartition(spark.sparkContext.defaultParallelism, "doc_id")
         .select("doc_id", "text"))
    return d.mapInArrow(_shingle_sets_kernel,
                        "doc_id bigint, shs array<string>, n bigint")


_WIDE_SCHEMA = "doc_id bigint, " + ", ".join(
    f"mh{s} string" for s in range(N_HASHES))
_WIDE_FAST_SCHEMA = "doc_id bigint, " + ", ".join(
    f"mh{s} bigint" for s in range(N_HASHES))

# XXH64 primes (public xxHash spec, the algorithm Spark's xxhash64
# implements in org.apache.spark.sql.catalyst.expressions.XxHash64)
_XX_P = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)


def _xxh64_int(i: int, seed: int) -> int:
    """Spark-exact XXH64 of ONE IntegerType value (the hashInt path:
    4-byte length, unsigned widen) — returns the raw uint64 hash, used
    as the fold seed for the next argument."""
    import numpy as np

    p1, p2, p3, _, p5 = (np.uint64(p) for p in _XX_P)

    def rotl(x, r):
        r = np.uint64(r)
        return (x << r) | (x >> (np.uint64(64) - r))

    with np.errstate(over="ignore"):
        h = np.uint64(seed) + p5 + np.uint64(4)
        h = h ^ (np.uint64(np.uint32(i)) * p1)
        h = rotl(h, 23) * p2 + p3
        h = h ^ (h >> np.uint64(33)); h = h * p2
        h = h ^ (h >> np.uint64(29)); h = h * p3
        h = h ^ (h >> np.uint64(32))
    return int(h)


def _xxh64_bytes_rows(B, seed: int):
    """Vectorized Spark-exact XXH64 over a (n, L) uint8 matrix of
    equal-length byte strings -> np.uint64[n]. Follows the public
    xxHash64 layout Spark implements: 32-byte stripes with four
    accumulators + merge rounds, then 8-byte, 4-byte and single-byte
    tail steps, then the avalanche — validated byte-for-byte against
    F.xxhash64 for every length 0..100 in tests/test_minhash_kernel.py.

    uint64 wraparound is intrinsic to the hash; silence numpy's scalar
    overflow warning here so direct callers need no errstate wrapper."""
    import numpy as np

    with np.errstate(over="ignore"):
        return _xxh64_bytes_rows_impl(np, B, seed)


def _xxh64_bytes_rows_impl(np, B, seed: int):
    p1, p2, p3, p4, p5 = (np.uint64(p) for p in _XX_P)

    def rotl(x, r):
        r = np.uint64(r)
        return (x << r) | (x >> (np.uint64(64) - r))

    n, L = B.shape
    seed = np.uint64(seed)
    off = 0
    if L >= 32:
        v1 = np.full(n, seed + p1 + p2, dtype=np.uint64)
        v2 = np.full(n, seed + p2, dtype=np.uint64)
        v3 = np.full(n, seed, dtype=np.uint64)
        v4 = np.full(n, seed - p1, dtype=np.uint64)
        while off + 32 <= L:
            lanes = np.ascontiguousarray(B[:, off:off + 32]).view("<u8")
            v1 = rotl(v1 + lanes[:, 0] * p2, 31) * p1
            v2 = rotl(v2 + lanes[:, 1] * p2, 31) * p1
            v3 = rotl(v3 + lanes[:, 2] * p2, 31) * p1
            v4 = rotl(v4 + lanes[:, 3] * p2, 31) * p1
            off += 32
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (rotl(v * p2, 31) * p1)) * p1 + p4
    else:
        h = np.full(n, seed + p5, dtype=np.uint64)
    h = h + np.uint64(L)
    while off + 8 <= L:
        lane = np.ascontiguousarray(B[:, off:off + 8]).view("<u8")[:, 0]
        h = h ^ (rotl(lane * p2, 31) * p1)
        h = rotl(h, 27) * p1 + p4
        off += 8
    if off + 4 <= L:
        lane = np.ascontiguousarray(B[:, off:off + 4]).view("<u4")[:, 0] \
            .astype(np.uint64)
        h = h ^ (lane * p1)
        h = rotl(h, 23) * p2 + p3
        off += 4
    while off < L:
        h = h ^ (B[:, off].astype(np.uint64) * p5)
        h = rotl(h, 11) * p1
        off += 1
    h = h ^ (h >> np.uint64(33)); h = h * p2
    h = h ^ (h >> np.uint64(29)); h = h * p3
    h = h ^ (h >> np.uint64(32))
    return h


def _fast_minhash_kernel(batches):
    """xxhash64 twin of :func:`_minhash_kernel`: wide signatures with
    mh_s = min over shingles of xxhash64(s, sh) — F.xxhash64 folds
    left-to-right starting at seed 42 and SKIPS null args, so the
    per-seed string hash uses seed = hashInt(s, 42) and a NULL-text
    doc's value is that seed itself. The numpy XXH64 is validated
    byte-for-byte against Spark in tests/test_minhash_kernel.py; the
    per-doc minima are over SIGNED longs (LongType min), taken on
    ranks exactly like the md5 path."""
    import numpy as np
    import pyarrow as pa

    with np.errstate(over="ignore"):
        seeds = [_xxh64_int(s, 42) for s in range(N_HASHES)]
        for tb in batches:
            if tb.num_rows == 0:
                continue
            out_ids, inv, seg, words = _batch_windows(tb)
            V = len(words)
            vals = np.empty((N_HASHES, V), dtype=np.int64)
            wlens = np.asarray([-1 if w is None else len(w) for w in words])
            for L in np.unique(wlens):
                idx = np.nonzero(wlens == L)[0]
                if L == -1:                      # NULL shingle: seed alone
                    for s in range(N_HASHES):
                        vals[s, idx] = np.uint64(seeds[s]).view(np.int64)
                    continue
                if L == 0:
                    B = np.empty((len(idx), 0), dtype=np.uint8)
                else:
                    B = np.frombuffer(
                        b"".join(words[i] for i in idx), dtype=np.uint8
                    ).reshape(len(idx), int(L))
                for s in range(N_HASHES):
                    vals[s, idx] = _xxh64_bytes_rows(B, seeds[s]) \
                        .view(np.int64)
            cols = {"doc_id": pa.array(out_ids, type=pa.int64())}
            for s in range(N_HASHES):
                order = np.argsort(vals[s])
                ranks = np.empty(V, dtype=np.int64)
                ranks[order] = np.arange(V)
                rmin = np.minimum.reduceat(ranks[inv], seg)
                cols[f"mh{s}"] = pa.array(vals[s][order][rmin])
            yield pa.record_batch(cols)


def _minhash_wide(spark, sf, fast: bool = False):
    """Wide minhash signatures: one row per doc, columns mh0..mh{N-1}
    (md5-hex family, or xxhash64 longs with ``fast=True``).

    Round-6 (guide §4.2): the md5 family runs in the vectorized
    _minhash_kernel — the r5 shape hashed every (position, seed) pair
    in the JVM (~200M md5 calls at the driver's sf1.0); the kernel
    hashes once per DISTINCT shingle per batch and takes per-doc
    minima on integer ranks. The xxhash64 fast path runs the same
    shape via the numpy XXH64 (_fast_minhash_kernel) — the earlier
    Spark-side memo-JOIN attempt regressed (1.21 -> 2.62 s at x10
    docs); hashing inside the kernel avoids the join entirely."""
    d = (t(spark, sf, "documents")
         .repartition(spark.sparkContext.defaultParallelism, "doc_id")
         .select("doc_id", "text"))
    if fast:
        return d.mapInArrow(_fast_minhash_kernel, _WIDE_FAST_SCHEMA)
    return d.mapInArrow(_minhash_kernel, _WIDE_SCHEMA)


def _stack_signature(wide):
    stack = ", ".join(f"{s}L, mh{s}" for s in range(N_HASHES))
    return wide.select(
        "doc_id", F.expr(f"stack({N_HASHES}, {stack}) AS (seed, mh)")
    )


@query(
    "q31_minhash_signatures",
    f"""
    SELECT doc_id, seed AS seed, mh AS mh
    FROM ({_MINHASH_SQL})
    """,
)
def q31(spark, sf):
    """MinHash signatures: per (doc, seed), min over shingles of
    md5(seed:shingle) — lexicographic min of hex == minhash.

    One pass, no seed crossJoin: all N_HASHES mins are computed as
    separate aggregates of the same shingle scan (map-side combinable),
    then unpivoted; since round 6 the md5s come from the distinct-
    shingle memo join (see _minhash_wide)."""
    return _stack_signature(_minhash_wide(spark, sf))


_BANDS_SQL = f"""
        SELECT doc_id, seed // {BAND_ROWS} AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
        FROM ({_MINHASH_SQL})
        GROUP BY doc_id, seed // {BAND_ROWS}
"""


def _pairs_from_bands(bands):
    """(doc_id, band, band_key) -> distinct candidate pairs: group
    doc_ids per (band, band_key) and expand combinations with array
    lambdas — bucket sizes are tiny by construction (LSH), so the
    in-group expansion is bounded."""
    groups = (
        bands.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        groups.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def band_pairs(sig):
    """LSH banding applied to a (doc_id, seed, mh) signature relation:
    docs sharing any band become candidate pairs. Generic over the
    minhash value type (md5 hex or xxhash64 long — concat casts).

    Pairs are generated by grouping doc_ids per (band, band_key) and
    expanding combinations with array lambdas — the signature pipeline
    runs ONCE and no self-join re-computes it."""
    bands = (
        sig.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.lpad("seed", 2, "0"), F.col("mh").cast("string")))))).alias("band_key"))
    )
    return _pairs_from_bands(bands)


def _band_pairs_wide(wide):
    """band_pairs for the WIDE signature relation (doc_id, mh0..mhN):
    each band's key is the '|'-joined pair of its seed-ordered minhash
    values taken straight from the wide columns — the same equivalence
    classes as band_pairs' md5(sorted 'ss:mh' list) key (both are
    injective encodings of the seed-ordered value tuple), without the
    stack to N_HASHES rows, the per-(doc, band) re-aggregation, or the
    band-key md5 (guide §2.4: one less exchange)."""
    n_bands = N_HASHES // BAND_ROWS
    keys = [
        F.concat_ws("|", *[F.col(f"mh{s}").cast("string")
                           for s in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)])
        .alias(f"bk{b}")
        for b in range(n_bands)
    ]
    stack = ", ".join(f"{b}, bk{b}" for b in range(n_bands))
    bands = wide.select("doc_id", *keys).select(
        "doc_id", F.expr(f"stack({n_bands}, {stack}) AS (band, band_key)"))
    return _pairs_from_bands(bands)


@query(
    "q32_lsh_candidate_pairs",
    f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def q32(spark, sf):
    """LSH candidate pairs over the md5 (oracle-portable) signatures
    (round 6: banded straight from the wide signature relation — see
    _band_pairs_wide)."""
    return _band_pairs_wide(_minhash_wide(spark, sf))


@query(
    "q37_jaccard_estimate",
    driver=False,  # subsumed by q39_dedup_estimate_verify (driver gate)
    oracle=f"""
    WITH sigs AS ({_MINHASH_SQL}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a AS doc_a, p.doc_b AS doc_b,
           CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS est_matches
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
    GROUP BY p.doc_a, p.doc_b
    """,
)
def q37(spark, sf):
    """MinHash-ESTIMATED Jaccard on candidate pairs: the number of
    matching signature components (0..N_HASHES; estimate = matches/N).
    The 100-TB verify path runs this first — per-pair cost is
    N_HASHES comparisons against 2 x ~64-byte broadcast rows, vs
    q34's |A|+|B| set intersection — and reserves exact verify (q34)
    for borderline estimates. Wide signatures stay unstacked (one
    ~N_HASHES-column row per doc), broadcast to both sides of the
    pair join: no shuffle beyond candidate generation.

    Round-6: the wide signature table feeds THREE consumers in one
    evaluation (candidate generation + both sides of the estimate
    join) — persist so the shingle -> distinct-hash -> min pipeline
    runs once, not three times (same bounded one-small-row-per-doc
    reuse pattern as dedup_estimate_verify's est.persist)."""
    wide = _minhash_wide(spark, sf).persist()
    pairs = _band_pairs_wide(wide)
    wa = F.broadcast(wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{s}").alias(f"a{s}") for s in range(N_HASHES)]))
    wb = F.broadcast(wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{s}").alias(f"b{s}") for s in range(N_HASHES)]))
    est = sum(
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        for s in range(N_HASHES)
    ).cast("bigint")
    return (pairs.join(wa, "doc_a").join(wb, "doc_b")
            .select("doc_a", "doc_b", est.alias("est_matches")))


@query(
    "q38_dedup_apply",
    f"""
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS doc FROM edges),
    reach(doc, lab) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
    ),
    labels AS (SELECT doc AS doc_id, min(lab) AS keeper FROM reach GROUP BY doc)
    SELECT d.doc_id AS doc_id, l.keeper AS keeper, d.n_chars AS n_chars
    FROM documents d JOIN labels l ON l.doc_id = d.doc_id
    WHERE d.doc_id <> l.keeper
    """,
)
def q38(spark, sf):
    """Dedup APPLY: the drop list — every non-canonical member of a
    near-dup group with its keeper (group minimum), joined back to the
    corpus. The last step a training-data pipeline actually executes:
    anti-join this against documents to materialize the deduped
    corpus. One equi-join on doc_id after the CC labels."""
    d = t(spark, sf, "documents")
    groups = q35(spark, sf)
    return (
        d.join(groups, "doc_id")
        .where(F.col("doc_id") != F.col("group_id"))
        .select("doc_id", F.col("group_id").alias("keeper"), "n_chars")
    )


EST_LO = 3   # est_matches below this: reject, no exact verify
EST_HI = 7   # est_matches at/above this: accept, no exact verify
DUP_NUM, DUP_DEN = 1, 2  # exact-path dup iff jaccard >= NUM/DEN


def dedup_estimate_verify(spark, sf, est_lo: int = EST_LO,
                          est_hi: int = EST_HI):
    """Estimate-THEN-verify dedup decisions in one operator — the
    100-TB shape of the MinHash pipeline's verify stage.

    Every LSH candidate pair first gets the cheap MinHash estimate
    (q37: N_HASHES signature comparisons against two broadcast wide
    rows). Pairs with est >= ``est_hi`` matches are ACCEPTED as dups
    and pairs with est < ``est_lo`` REJECTED outright; only the
    borderline band pays the exact |A|+|B| array_intersect scoring
    (q34's kernel). At the measured big regime the exact stage was the
    55 s wall for 3.8M pairs (BENCH/big_regime.md) — selective exactness
    cuts that to the borderline fraction, while the decision table stays
    fully deterministic and oracle-checkable.

    ``est_lo``/``est_hi`` are the borderline-window knob: widen it for
    recall-critical corpora (more exact scoring), narrow it when the
    estimate is trusted. Output: one row per candidate pair with
    (est_matches, path, i_cnt/u_cnt where exact ran, is_dup)."""
    # est feeds FOUR consumers (accept, reject, borderline, and the
    # semi-join's needed-docs derivation) — persist so the minhash +
    # band-join pipeline runs once, not four times. MEMORY_AND_DISK
    # (the default) spills at scale; the table is one small row per
    # candidate pair. Spark's CacheManager keys on the logical plan, so
    # repeated gate calls in one session share a single cached copy.
    est = q37(spark, sf).persist()
    null_l = F.lit(None).cast("bigint")
    acc = (est.where(F.col("est_matches") >= est_hi)
           .select("doc_a", "doc_b", "est_matches",
                   F.lit("accept_est").alias("path"),
                   null_l.alias("i_cnt"), null_l.alias("u_cnt"),
                   F.lit(1).cast("bigint").alias("is_dup")))
    rej = (est.where(F.col("est_matches") < est_lo)
           .select("doc_a", "doc_b", "est_matches",
                   F.lit("reject_est").alias("path"),
                   null_l.alias("i_cnt"), null_l.alias("u_cnt"),
                   F.lit(0).cast("bigint").alias("is_dup")))
    border = est.where((F.col("est_matches") >= est_lo)
                       & (F.col("est_matches") < est_hi))
    # exact_pair_scores semi-joins the set table to BORDERLINE docs only
    # and picks broadcast vs shuffle from runtime size (see its docstring)
    exact = (
        exact_pair_scores(border, sets=shingle_sets_df(spark, sf))
        .select("doc_a", "doc_b", "est_matches",
                F.lit("exact").alias("path"), "i_cnt", "u_cnt",
                F.when(F.col("i_cnt") * DUP_DEN >= F.col("u_cnt") * DUP_NUM, 1)
                .otherwise(0).cast("bigint").alias("is_dup"))
    )
    return acc.unionByName(exact).unionByName(rej)


_EST_SQL = f"""
        SELECT p.doc_a, p.doc_b,
               CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
                   AS est_matches
        FROM (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ) p
        JOIN ({_MINHASH_SQL}) sa ON sa.doc_id = p.doc_a
        JOIN ({_MINHASH_SQL}) sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
        GROUP BY p.doc_a, p.doc_b
"""


@query(
    "q39_dedup_estimate_verify",
    f"""
    WITH est AS ({_EST_SQL}),
    sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_SQL})),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    border AS (SELECT * FROM est
               WHERE est_matches >= {EST_LO} AND est_matches < {EST_HI}),
    exact AS (
        SELECT b.doc_a, b.doc_b, b.est_matches,
               CAST(coalesce(sum(CASE WHEN sb.sh IS NOT NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS i_cnt
        FROM border b
        LEFT JOIN sh sa ON sa.doc_id = b.doc_a
        LEFT JOIN sh sb ON sb.doc_id = b.doc_b AND sb.sh = sa.sh
        GROUP BY b.doc_a, b.doc_b, b.est_matches
    )
    SELECT doc_a, doc_b, est_matches, 'accept_est' AS path,
           CAST(NULL AS BIGINT) AS i_cnt, CAST(NULL AS BIGINT) AS u_cnt,
           CAST(1 AS BIGINT) AS is_dup
    FROM est WHERE est_matches >= {EST_HI}
    UNION ALL
    SELECT e.doc_a, e.doc_b, e.est_matches, 'exact' AS path,
           e.i_cnt, CAST(za.n + zb.n - e.i_cnt AS BIGINT) AS u_cnt,
           CAST(CASE WHEN e.i_cnt * {DUP_DEN} >= (za.n + zb.n - e.i_cnt) * {DUP_NUM}
                     THEN 1 ELSE 0 END AS BIGINT) AS is_dup
    FROM exact e
    JOIN sizes za ON za.doc_id = e.doc_a
    JOIN sizes zb ON zb.doc_id = e.doc_b
    UNION ALL
    SELECT doc_a, doc_b, est_matches, 'reject_est' AS path,
           CAST(NULL AS BIGINT) AS i_cnt, CAST(NULL AS BIGINT) AS u_cnt,
           CAST(0 AS BIGINT) AS is_dup
    FROM est WHERE est_matches < {EST_LO}
    """,
)
def q39(spark, sf):
    """Gate for :func:`dedup_estimate_verify` at the default borderline
    window (see its docstring for the 100-TB rationale)."""
    return dedup_estimate_verify(spark, sf)


_HEX = "0123456789abcdef"


@query(
    "q33_simhash",
    r"""
    WITH toks AS (
      SELECT doc_id, md5(tok) AS h FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents) WHERE tok <> ''
    ),
    votes AS (
      SELECT doc_id, b.b AS b,
             sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, CAST(b.b // 4 AS INT) + 1, 1)) - 1)
                            >> CAST(b.b % 4 AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM toks, (SELECT unnest(range(64)) AS b) b
      GROUP BY doc_id, b.b
    ),
    nibs AS (
      SELECT doc_id, CAST(b // 4 AS INT) AS nib,
             sum(CASE WHEN v > 0 THEN (1 << CAST(b % 4 AS INT)) ELSE 0 END) AS nv
      FROM votes GROUP BY doc_id, CAST(b // 4 AS INT)
    )
    SELECT doc_id, string_agg(substring('0123456789abcdef', CAST(nv AS INT) + 1, 1),
                              '' ORDER BY nib) AS simhash
    FROM nibs GROUP BY doc_id
    """,
)
def q33(spark, sf):
    """SimHash fingerprint, 64-bit, fully oracle-checked: md5 hex per
    token is the bit source (identical in both engines), ±1 vote per
    bit, sign → bit; the fingerprint is emitted as a 16-nibble hex
    STRING so no engine-specific 64-bit integer surgery is needed.

    Bit b lives in md5-hex nibble b//4 at position b%4; fingerprint
    nibble j packs votes 4j..4j+3. One scan, one groupBy with 64
    map-side-combinable sums — scales like any word-count."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.md5("tok")
    votes = []
    for b in range(64):
        nib = F.conv(F.substring(h, b // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{b}"))
    per_doc = toks.groupBy("doc_id").agg(*votes)
    hex_arr = F.array(*[F.lit(c) for c in _HEX])
    chars = []
    for j in range(16):
        nv = F.lit(0)
        for k in range(4):
            nv = nv + F.when(F.col(f"v{4 * j + k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        chars.append(F.element_at(hex_arr, nv + 1))
    return per_doc.select("doc_id", F.concat(*chars).alias("simhash"))


@query("q36_minhash_fast", driver=False)  # rows-only: xxhash64 isn't portable to DuckDB; pytest parity vs q31 in test_dedup_fast.py
def q36(spark, sf):
    """Engine-internal fast minhash: xxhash64(seed, shingle) instead of
    md5 hex — integer min-aggregation, ~5-10x cheaper per shingle. Same
    banding algebra as q31/q32; md5 variants remain the oracle-checked
    reference path."""
    return _stack_signature(_minhash_wide(spark, sf, fast=True))


def _cc_canon(e):
    """Undirected canonical edge set: (min, max), no self-loops, dedup."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_large_star(e):
    """large-star(u): connect every strictly-larger neighbor of u to
    min(Γ(u) ∪ {u}) — one symmetric groupBy + one equi-join."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (sym.groupBy("u").agg(F.min("v").alias("mv"))
         .select("u", F.least("mv", F.col("u")).alias("m")))
    return (sym.join(m, "u").where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _cc_small_star(e):
    """small-star(u): connect every ≤-neighbor of u (and u itself) to
    min(Γ≤(u) ∪ {u})."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = (o.groupBy("u").agg(F.min("v").alias("mv"))
         .select("u", F.least("mv", F.col("u")).alias("m")))
    emitted = (o.join(m, "u").select(F.col("v").alias("n"), "m")
               .unionByName(m.select(F.col("u").alias("n"), "m")))
    return (emitted.where(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v")).distinct())


def connected_components(edges, max_rounds: int = 50,
                         checkpoint_dir: str | None = None,
                         stats: dict | None = None):
    """Connected components via alternating large-star / small-star
    (Kiveris et al., 'Connected Components in MapReduce and Beyond') —
    O(log n) rounds regardless of graph DIAMETER, unlike min-label
    propagation (O(diameter) rounds). The 100-TB/long-chain path.

    Each round is two groupBy+join passes over the edge set; lineage is
    truncated per round. With ``checkpoint_dir`` set, rounds use
    DURABLE checkpoint() (survives executor loss — the real-cluster
    mode); default localCheckpoint keeps single-box runs cheap.
    Convergence = the canonical edge set reaches a fixpoint (stars
    rooted at component minima); detected with a (count, hash-sum)
    signature and CONFIRMED with an exact except-based set equality, so
    a hash collision cannot smuggle in a wrong fixpoint.

    Input: DataFrame with columns (u, v). Output: (u, group_id) for
    every node incident to an edge, group_id = component minimum.
    ``stats`` (optional dict) receives {"rounds": N} — observability
    for the durable-vs-local checkpoint benchmark.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:
        def _ckpt(df):
            return df.localCheckpoint()

    e = _ckpt(_cc_canon(edges))
    prev, prev_sig = None, None
    for _round in range(max_rounds):
        if stats is not None:
            stats["rounds"] = _round + 1
        e_new = _ckpt(_cc_canon(_cc_small_star(_cc_large_star(e))))
        sig = tuple(e_new.agg(
            F.count("*"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).first())
        if sig == prev_sig and prev is not None:
            same = (e_new.exceptAll(prev).isEmpty()
                    and prev.exceptAll(e_new).isEmpty())
            if same:
                e = e_new
                break
        prev, prev_sig = e_new, sig
        e = e_new
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} "
            f"large-star/small-star rounds")
    # fixpoint is a star forest: every edge is (root=min, member)
    nodes = (e.select(F.col("u").alias("n")).unionByName(
        e.select(F.col("v").alias("n"))).distinct())
    member = e.select(F.col("v").alias("n"), F.col("u").alias("lab"))
    return (
        nodes.join(member, "n", "left")
        .groupBy(F.col("n").alias("u"))
        .agg(F.min(F.coalesce("lab", F.col("n"))).alias("group_id"))
    )


@query(
    "q35_dedup_groups",
    f"""
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS doc FROM edges),
    reach(doc, lab) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
    )
    SELECT doc AS doc_id, min(lab) AS group_id FROM reach GROUP BY doc
    """,
)
def q35(spark, sf):
    """Near-duplicate GROUPS: connected components over the LSH pair
    graph, labels = component-minimum doc_id — computed with the
    large-star/small-star operator (O(log n) rounds, diameter-proof;
    see connected_components). The oracle is a DuckDB recursive CTE
    computing min-reachable-id — same semantics, engine-native
    recursion."""
    pairs = q32(spark, sf)
    edges = pairs.select(F.col("doc_a").alias("u"),
                         F.col("doc_b").alias("v"))
    return connected_components(edges).select(
        F.col("u").alias("doc_id"), "group_id")


@query(
    "q34_ngram_jaccard",
    f"""
    WITH pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_SQL})),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS i_cnt
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.doc_a
        JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
        GROUP BY p.doc_a, p.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
           i.i_cnt AS i_cnt, (za.n + zb.n - i.i_cnt) AS u_cnt
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    """,
)
def q34(spark, sf):
    """Exact n-gram Jaccard, evaluated only on LSH candidate pairs —
    the verify step of the MinHash pipeline.

    Plan (round-3 rewrite): one groupBy folds each doc's distinct
    shingles into an array, the per-doc set table is BROADCAST, and
    each candidate pair is scored with array_intersect in codegen —
    per-pair cost is |A|+|B| with NO join explosion. The previous
    pairs x shingle-rows join materialized sum_pairs(|A|) rows before
    matching (1.9e9 rows at 3.8M near-dup-heavy candidates — timed out
    at the big regime), and the inverted-index alternative is worse
    here because shingles are HOT (measured sum(df^2) = 3.7e10 at 50k
    docs, max df = 77% of docs). Since round 5 the kernel is
    :func:`exact_pair_scores`: the set table is semi-joined to
    candidate docs and broadcast only when its RUNTIME size fits (AQE)
    — at >memory doc counts the two equi-joins shuffle the restricted
    array table once per side instead, still linear in pairs, never
    sum_pairs(|A|) rows.

    Exact integers (intersection, union) instead of a rounded float:
    jaccard = i_cnt/u_cnt is derivable, and count ratios can land
    exactly on rounding-tie boundaries where engines' round() rules
    (HALF_UP vs half-to-even) disagree."""
    return exact_pair_scores(q32(spark, sf),
                             sets=shingle_sets_df(spark, sf))


# --- substring-level exact dedup (duplicated SPANS across docs) ---------
GRAM_W = 16       # fixed gram width of the positional index
GRAM_CAP = 1024   # positions indexed per doc (prefix cap, both engines)
MIN_SPAN = 32     # emit spans at least this many chars long


def _gram_doc_count_kernel(gram_w: int, gram_cap: int):
    """mapInArrow kernel factory: documents (doc_id, text) -> per-batch
    PARTIAL gram document-frequencies (g, nd). Docs are one row each
    and land in exactly one batch, so summing the partials over batches
    gives the global count(DISTINCT doc_id) per gram — the round-6
    replacement for grouping ~51M exploded (doc, pos, gram) rows just
    to find grams present in >= 2 docs. NULL windows are dropped (the
    downstream equi-join on g discards a NULL key anyway)."""
    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for tb in batches:
            if tb.num_rows == 0:
                continue
            ids, inv, seg, words = _batch_windows(tb, gram_w, gram_cap)
            m = len(ids)
            counts = np.diff(np.append(seg, len(inv)))
            seg_ids = np.repeat(np.arange(m, dtype=np.int64), counts)
            V = len(words)
            uc = np.unique(seg_ids * V + inv)      # distinct (doc, gram)
            nd = np.bincount(uc % V, minlength=V)
            keep = [i for i in range(V) if nd[i] > 0 and words[i] is not None]
            yield pa.record_batch({
                "g": pa.array([words[i].decode("utf-8") for i in keep],
                              type=pa.string()),
                "nd": pa.array(nd[keep].astype("int64"))})

    return kernel


def duplicated_spans(spark, sf, gram_w: int = GRAM_W,
                     gram_cap: int = GRAM_CAP,
                     min_span: int = MIN_SPAN):
    """Substring-level EXACT dedup: maximal character spans that are
    duplicated across documents — the suffix-array regime of LLM-corpus
    dedup (doc-level MinHash misses a copied paragraph inside an
    otherwise-unique doc), Spark-shaped:

    1. positional gram index: explode (doc_id, pos, gram) for every
       position (prefix-capped like the minhash shingles);
    2. inverted count: grams present in >= 2 DISTINCT docs are
       'duplicated' — one groupBy with a map-side-combinable
       count(distinct approximated exactly by the two-level agg);
    3. gaps-and-islands: per doc, consecutive duplicated positions
       merge into maximal runs (pos - row_number() is constant within a
       run) — a window partitioned BY DOC, so the pass is fully
       parallel across docs and bounded per partition by doc length;
    4. emit (doc_id, span_start, span_len = run extent + gram_w) for
       runs of at least ``min_span`` chars.

    Scale: the index is |positions| rows but carries only (doc_id,
    pos, gram); the dup-gram filter happens BEFORE the window, so the
    islands pass sees only duplicated positions. No pairwise join
    anywhere — cost is linear in corpus size, independent of how many
    docs share a span (the trap q34 fell into for pair scoring)."""
    d = t(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    grams = F.expr(
        f"transform(sequence(1, least(greatest(length(text) - {gram_w - 1}, 1),"
        f" {gram_cap})), i -> struct(i AS pos, substring(text, i, {gram_w}) AS g))")
    pos_idx = d.select("doc_id", F.explode(grams).alias("pg")) \
               .select("doc_id", F.col("pg.pos").alias("pos"),
                       F.col("pg.g").alias("g"))
    # round 6: gram document-frequencies come from per-batch kernel
    # partials (docs are batch-disjoint, partial distinct-doc counts
    # sum exactly) instead of a count-distinct shuffle over every
    # exploded position row — the df relation shrinks from |positions|
    # to ~|vocabulary| rows before any exchange (guide §2.3 "aggregate
    # before you shuffle")
    partials = (d.select("doc_id", "text")
                .mapInArrow(_gram_doc_count_kernel(gram_w, gram_cap),
                            "g string, nd bigint"))
    dup_grams = (partials.groupBy("g").agg(F.sum("nd").alias("nd"))
                 .where(F.col("nd") >= 2)
                 .select("g"))
    dup_pos = pos_idx.join(dup_grams, "g").select("doc_id", "pos")

    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup_pos.withColumn(
        "island", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") - F.min("pos") + gram_w).alias("span_len"))
        .where(F.col("span_len") >= min_span)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.col("span_start").cast("bigint").alias("span_start"),
                F.col("span_len").cast("bigint").alias("span_len"))
    )


_POS_IDX_SQL = f"""
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               substring(text, CAST(i AS INTEGER), {GRAM_W}) AS g
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, greatest(least(length(text) - {GRAM_W - 1},
                                                  {GRAM_CAP}), 1) + 1)) AS i
            FROM documents
        )
"""


@query(
    "q49_duplicated_spans",
    f"""
    WITH pos_idx AS ({_POS_IDX_SQL}),
    dup_grams AS (
        SELECT g FROM pos_idx GROUP BY g
        HAVING count(DISTINCT doc_id) >= 2
    ),
    dup_pos AS (
        SELECT p.doc_id, p.pos FROM pos_idx p JOIN dup_grams d ON p.g = d.g
    ),
    runs AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM dup_pos
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + {GRAM_W} AS BIGINT) AS span_len
    FROM runs GROUP BY doc_id, island
    HAVING max(pos) - min(pos) + {GRAM_W} >= {MIN_SPAN}
    """,
)
def q49(spark, sf):
    """Gate for :func:`duplicated_spans` at the default gram/span
    parameters (see its docstring)."""
    return duplicated_spans(spark, sf)


@query(
    "q83_dedup_keep_best",
    driver=False,
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS doc FROM edges),
    reach(doc, lab) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
    ),
    labels AS (SELECT doc AS doc_id, min(lab) AS group_id FROM reach GROUP BY doc),
    ranked AS (
        SELECT l.doc_id, l.group_id, d.n_chars,
               row_number() OVER (PARTITION BY l.group_id
                                  ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn
        FROM labels l JOIN documents d ON d.doc_id = l.doc_id
    ),
    keepers AS (SELECT group_id, doc_id AS keeper FROM ranked WHERE rn = 1)
    SELECT r.doc_id AS doc_id, k.keeper AS keeper,
           CAST(r.n_chars AS BIGINT) AS n_chars
    FROM ranked r JOIN keepers k ON k.group_id = r.group_id
    WHERE r.rn > 1
    """,
)
def q83(spark, sf):
    """Quality-driven dedup APPLY: within each near-dup group keep the
    BEST document (longest text; doc_id tiebreak) instead of q38's
    min-id convention — what a curation pipeline actually wants when
    near-dups differ in truncation. One window over the CC labels
    joined to a quality signal; emit every non-keeper with its keeper.
    Extras-tier gate (driver tier is at its 50-entry cap) with a full
    DuckDB recursive-CTE oracle."""
    from pyspark.sql.window import Window

    d = t(spark, sf, "documents")
    groups = q35(spark, sf)
    ranked = groups.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    ranked = ranked.withColumn("rn", F.row_number().over(w))
    keepers = (ranked.where(F.col("rn") == 1)
               .select("group_id", F.col("doc_id").alias("keeper")))
    return (
        ranked.where(F.col("rn") > 1)
        .join(keepers, "group_id")
        .select("doc_id", "keeper", F.col("n_chars").cast("bigint").alias("n_chars"))
    )
