"""Streaming NEAR-duplicate detection: stateful LSH over a document
stream (the continuous-ingest form of the q31->q32 batch pipeline).

Per-document minhash band keys are a pure function of the text, so
they compute row-locally in an Arrow-batched kernel (mapInPandas, no
aggregation, no watermark needed) using EXACTLY the batch pipeline's
arithmetic: md5(seed:shingle) minima over prefix-capped 9-gram
shingles, band_key = md5 of the sorted 'ss:mh' concat (operators/
dedup.py q31 + band_pairs) — pytest asserts bit-parity of the keys.

Candidate pairs then come from one stateful operator
(applyInPandasWithState) keyed on (band, band_key): the state is the
sorted doc_id list seen in that bucket across the whole stream; each
arriving doc pairs with everything already in its bucket (plus
same-batch arrivals, each pair emitted once — a pair is 'new' exactly
when its later doc arrives). A pair that collides in BOTH bands is
emitted once per band; chain ``dedup_stream`` keyed on the pair for
exactly-once, or rely on the downstream exact-verify being idempotent.

State sizing (the 100 TB story): buckets are LSH band keys, so state
shards by content similarity and bucket membership stays small by
construction; ``state_timeout_ms`` expires cold buckets for unbounded
streams (dedup then holds only within the retention horizon).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mirror operators/dedup.py constants — the kernels must stay bit-equal
from ..operators.dedup import BAND_ROWS, N_HASHES, SHINGLE_CAP, SHINGLE_K

BAND_SCHEMA = "doc_id long, band int, band_key string"
PAIR_SCHEMA = "doc_a long, doc_b long, band int, band_key string"


def minhash_band_keys(text: str) -> list[str]:
    """Band keys for one document — bit-identical to the batch
    pipeline (q31 md5 minhash + band_pairs key derivation)."""
    n = max(min(len(text) - (SHINGLE_K - 1), SHINGLE_CAP), 1)
    shingles = [text[i:i + SHINGLE_K] for i in range(n)]
    mins = []
    for s in range(N_HASHES):
        pre = f"{s}:".encode()
        mins.append(min(
            hashlib.md5(pre + sh.encode()).hexdigest() for sh in shingles))
    keys = []
    for b in range(N_HASHES // BAND_ROWS):
        parts = sorted(
            f"{s:02d}:{mins[s]}"
            for s in range(b * BAND_ROWS, (b + 1) * BAND_ROWS))
        keys.append(hashlib.md5("|".join(parts).encode()).hexdigest())
    return keys


def band_keys_df(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, band_key) rows, one per band per doc — row-local
    Arrow kernel, valid on both batch and streaming DataFrames."""
    n_bands = N_HASHES // BAND_ROWS

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bands, keys = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None or (isinstance(txt, float) and pd.isna(txt)):
                    # batch pipeline's shingle explode drops NULL-text docs;
                    # emitting bands for '' would bucket all of them together
                    continue
                for b, k in enumerate(minhash_band_keys(txt)):
                    ids.append(i)
                    bands.append(b)
                    keys.append(k)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "band": pd.Series(bands, dtype="int32"),
                                "band_key": keys})

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, BAND_SCHEMA)


def neardup_pairs_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs from a document stream (see module
    docstring). Batch DataFrames take the equivalent groupBy path so
    tests can assert batch ≡ stream."""
    bands = band_keys_df(docs, text_col, id_col)

    if not docs.isStreaming:
        groups = (bands.groupBy("band", "band_key")
                  .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
                  .where(F.size("ds") > 1))
        pairs = F.expr(
            "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, "
            "size(ds)), y -> struct(x AS doc_a, y AS doc_b))))")
        return (groups.select("band", "band_key", F.explode(pairs).alias("p"))
                .select("p.doc_a", "p.doc_b", "band", "band_key"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "seen array<bigint>"

    def pair_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        band, band_key = key
        seen: list[int] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            new_ids = sorted(int(x) for x in set(pdf["doc_id"]) - set(seen))
            out_a, out_b = [], []
            for d in new_ids:
                # `seen` already accumulates this batch's earlier ids via
                # the append below — iterating it alone emits each pair
                # exactly once (seen + new_ids[:j] double-counted them).
                for other in seen:
                    lo, hi = (other, d) if other < d else (d, other)
                    out_a.append(lo)
                    out_b.append(hi)
                seen.append(d)
            if out_a:
                yield pd.DataFrame({
                    "doc_a": pd.Series(out_a, dtype="int64"),
                    "doc_b": pd.Series(out_b, dtype="int64"),
                    "band": pd.Series([band] * len(out_a), dtype="int32"),
                    "band_key": [band_key] * len(out_a)})
        state.update((sorted(seen),))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms else GroupStateTimeout.NoTimeout)
    return bands.groupBy("band", "band_key").applyInPandasWithState(
        pair_fn, PAIR_SCHEMA, state_schema, "append", timeout)
