"""Property-based codec tests (hypothesis): ANY input round-trips
bit-identically through encode_array/decode_array — the north rule's
invariant as a law, not a fixture."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from howard_spark.codecs import decode_array, encode_array
from howard_spark.codecs import fsst

SET = settings(max_examples=60, deadline=None)


def rt(arr: pa.Array):
    enc = encode_array(arr)
    dec = decode_array(enc.payload, enc.meta, enc.n_rows)
    assert dec.equals(arr), f"{arr.type}: {arr[:5]} != {dec[:5]}"


@SET
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1) | st.none(),
                max_size=300))
def test_int64_any(vals):
    rt(pa.array(vals, type=pa.int64()))


@SET
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64) | st.none(),
                max_size=300))
def test_float64_any(vals):
    arr = pa.array(vals, type=pa.float64())
    enc = encode_array(arr)
    dec = decode_array(enc.payload, enc.meta, enc.n_rows)
    # NaN-safe bit-exact compare
    a = np.asarray(arr.fill_null(0.0)).view(np.uint64)
    b = np.asarray(dec.fill_null(0.0)).view(np.uint64)
    assert (a == b).all()
    assert arr.is_null().equals(dec.is_null())


@SET
@given(st.lists(st.text(max_size=80) | st.none(), max_size=200))
def test_strings_any(vals):
    rt(pa.array(vals, type=pa.string()))


@SET
@given(st.lists(st.binary(max_size=60) | st.none(), max_size=150))
def test_binary_any(vals):
    rt(pa.array(vals, type=pa.binary()))


@SET
@given(st.lists(st.booleans() | st.none(), max_size=400))
def test_bool_any(vals):
    rt(pa.array(vals, type=pa.bool_()))


@SET
@given(st.lists(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32),
                         max_size=8) | st.none(), max_size=80))
def test_list_float_any(vals):
    rt(pa.array(vals, type=pa.list_(pa.float32())))


@SET
@given(st.binary(max_size=4000))
def test_fsst_any_bytes(data):
    table = fsst.train(data)
    assert fsst.decompress(fsst.compress(data, table), table) == data


@SET
@given(st.binary(max_size=2000), st.binary(max_size=2000))
def test_fsst_foreign_table(train_on, compress_this):
    """A table trained on one input must still round-trip any other."""
    table = fsst.train(train_on)
    assert fsst.decompress(fsst.compress(compress_this, table), table) == compress_this
