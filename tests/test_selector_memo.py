"""Adaptive selector memo: hinted encodes must stay decodable and the
memo must re-probe periodically (encode.py PROBE_EVERY)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from howard_spark.codecs import decode_array, encode_array
from howard_spark.codecs.core import decode_block, encode_block_named
from howard_spark.encode import PROBE_EVERY, encode_chunk

rng = np.random.RandomState(7)


def test_hinted_encode_roundtrips():
    texts = [f"def f{i}(): return {i % 13}\n" * 4 for i in range(3000)]
    arr = pa.array(texts)
    for hint in ({"c": "sraw", "b": "zlib"}, {"c": "sraw", "b": "plain"},
                 {"c": "sraw", "b": "fsst"}, {"c": "sraw", "b": "fsst_zlib"},
                 {"c": "sdict"}):
        enc = encode_array(arr, hint=hint)
        dec = decode_array(enc.payload, enc.meta, enc.n_rows)
        assert dec.equals(arr), hint


def test_hint_ignored_when_inapplicable():
    # sdict hint on an all-unique column must not break (falls back)
    arr = pa.array([f"unique-{i}" for i in range(500)])
    enc = encode_array(arr, hint={"c": "sdict"})
    dec = decode_array(enc.payload, enc.meta, enc.n_rows)
    assert dec.equals(arr)


def test_encode_block_named_never_inflates_past_plain():
    noise = rng.bytes(50_000)
    for name in ("zlib", "fsst", "fsst_zlib"):
        got, payload = encode_block_named(noise, name)
        assert decode_block(got, payload) == noise
        assert len(payload) <= len(noise)


def test_memo_reprobe_cycle():
    tbl = pa.table({"s": pa.array(["abc " * 50] * 100 + [f"v{i}" for i in range(100)])})
    memo: dict = {}
    ages = []
    for chunk_id in range(PROBE_EVERY * 2 + 2):
        encode_chunk(tbl, 0, chunk_id, chunk_id * 200, memo)
        hint, age = memo["s"]
        ages.append(age)
    # age climbs to PROBE_EVERY then resets after the forced re-probe
    assert max(ages) <= PROBE_EVERY
    assert ages.count(0) >= 2  # initial probe + at least one re-probe


def test_memo_encoding_matches_unhinted_decode():
    # chunks encoded via memo decode identically to source
    data = [f"row {i} " + "tok " * (i % 20) for i in range(5000)]
    tbl = pa.table({"s": pa.array(data)})
    memo: dict = {}
    out_rows = []
    for cid in range(5):
        sl = tbl.slice(cid * 1000, 1000)
        rb = encode_chunk(sl, 0, cid, cid * 1000, memo)
        meta = rb.column(rb.schema.get_field_index("meta"))[0].as_py()
        payload = rb.column(rb.schema.get_field_index("payload"))[0].as_py()
        dec = decode_array(payload, meta, 1000)
        out_rows.extend(dec.to_pylist())
    assert out_rows == data
