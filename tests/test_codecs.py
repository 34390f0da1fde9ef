"""Codec unit + property tests (SURVEY.md §2.3 C1-C8, §5.3 golden round-trip).

The reference's wire formats: CBOR/JSON envelope encode (borealis-indexer/
src/main.rs:377,424), LZ4F/Zstd payload compression (main.rs:366-372),
decode on the consumer (borealis-consumer/src/main.rs:260-286).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from australis_indexer_spark.functions import codecs

# JSON-compatible CBOR value space (what the envelope carries)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(),  # unbounded: >u64 goes through RFC 8949 bignum tags
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=20,
)


@given(_values)
@settings(max_examples=200, deadline=None)
def test_cbor_roundtrip_property(value):
    out = codecs.cbor_loads(codecs.cbor_dumps(value))

    def norm(v):
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return v

    assert norm(out) == norm(value)


def test_cbor_golden_envelope():
    """Envelope shaped like BorealisMessage::new(height, payload)
    (main.rs:365): the canonical key/payload pair survives the wire."""
    env = {
        "sequence_id": 63_596,
        "subject": "BlockIndex_StreamerMessages_CBOR",
        "msg_format": "CBOR",
        "compression": "ZSTD",
        "payload": b"\x00\x01\xff" * 7,
    }
    assert codecs.cbor_loads(codecs.cbor_dumps(env)) == env


def test_cbor_rejects_trailing_bytes():
    import pytest

    with pytest.raises(ValueError):
        codecs.cbor_loads(codecs.cbor_dumps(1) + b"\x00")


@given(st.binary(max_size=4096))
@settings(max_examples=50, deadline=None)
def test_compression_roundtrip_property(data):
    for codec in codecs.CODECS:
        assert codecs.decompress(codecs.compress(data, codec), codec) == data
    assert codecs.compress(data, "NONE") == data
    assert codecs.decompress(data, None) == data


def test_large_int_survives():
    """u128 yoctoNEAR amounts (34-digit total_supply, main.rs:152) survive
    both as strings and as RFC 8949 bignum-tagged integers."""
    v = {"total_supply": "2050206401403887985811862247311434"}
    assert codecs.cbor_loads(codecs.cbor_dumps(v)) == v
    n = 2050206401403887985811862247311434
    assert codecs.cbor_loads(codecs.cbor_dumps({"n": n, "neg": -n})) == {
        "n": n,
        "neg": -n,
    }
