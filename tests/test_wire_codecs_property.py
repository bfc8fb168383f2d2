"""Property-based round-trip tests for the wire codecs — random
records through avro/protobuf/siddhi-binary encode→decode (pure
python, no Spark session needed)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from siddhi_operator_spark.sources import wire_codecs as WC

_ATTRS = [
    ("s", "string"),
    ("d", "double"),
    ("l", "long"),
    ("b", "bool"),
    ("f", "float"),
    ("i", "int"),
    ("o", "object"),
]

_I64 = 2**63

record = st.tuples(
    st.text(max_size=64),
    st.floats(allow_nan=False, allow_infinity=False),
    st.integers(min_value=-_I64, max_value=_I64 - 1),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.binary(max_size=64),
)


def _check(fmt: str, row: tuple) -> None:
    enc = WC.ENCODERS[fmt](row, _ATTRS)
    dec = WC.DECODERS[fmt](enc, _ATTRS)
    s, d, l_, b, f, i, o = row
    ds, dd, dl, db, df_, di, do = dec
    assert ds == s
    assert dd == d or (math.isclose(dd, d, rel_tol=1e-15))
    assert dl == l_
    assert db == b
    # float32 roundtrips through its own precision
    import struct as _s

    assert df_ == _s.unpack("<f", _s.pack("<f", f))[0]
    assert di == i
    assert bytes(do) == o


@settings(max_examples=200, deadline=None)
@given(record)
def test_avro_roundtrip_property(row):
    _check("avro", row)


@settings(max_examples=200, deadline=None)
@given(record)
def test_protobuf_roundtrip_property(row):
    _check("protobuf", row)


@settings(max_examples=200, deadline=None)
@given(record)
def test_binary_roundtrip_property(row):
    _check("binary", row)
