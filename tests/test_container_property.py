"""Property tests for the round-18 containers: CBOR, Avro OCF, and
SafeTensors round-trip randomized values exactly (no Spark session —
these laws are pure encode/decode)."""

from __future__ import annotations

import json
import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from soda_spark_spark.sources.cbor import decode_cbor, encode_cbor

# -------------------------------------------------------------- CBOR

_scalars = st.one_of(
    st.integers(min_value=-(2**64), max_value=2**64 - 1),
    st.booleans(),
    st.none(),
    st.text(max_size=40),
    st.binary(max_size=40),
    st.floats(allow_nan=False, width=64),
)

_cbor_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(
            st.one_of(st.text(max_size=10),
                      st.integers(min_value=-100, max_value=100)),
            children, max_size=5,
        ),
    ),
    max_leaves=20,
)


@settings(max_examples=300, deadline=None)
@given(_cbor_values)
def test_cbor_roundtrip(v):
    data = encode_cbor(v)
    got, pos = decode_cbor(data)
    assert pos == len(data)
    assert got == v


@settings(max_examples=100, deadline=None)
@given(st.floats(width=64))
def test_cbor_float_bits_roundtrip(x):
    import struct

    got, _ = decode_cbor(encode_cbor(x))
    # bit-for-bit, including NaN payloads and signed zero
    assert struct.pack(">d", got) == struct.pack(">d", x)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=1, max_size=30))
def test_cbor_decoder_never_crashes_on_noise(data):
    """Random bytes either decode to SOMETHING or raise ValueError —
    never any other exception (the quarantine channel depends on it)."""
    try:
        decode_cbor(data)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(_cbor_values, st.integers(min_value=1, max_value=10))
def test_cbor_truncation_always_valueerror(v, cut):
    data = encode_cbor(v)
    if cut >= len(data):
        return
    try:
        got, pos = decode_cbor(data[:-cut])
        # a prefix may still decode if the truncation only removed
        # bytes beyond one complete item — then pos must be in bounds
        assert pos <= len(data) - cut
    except ValueError:
        pass


# ---------------------------------------------------------- Avro OCF

_avro_schema = json.dumps({
    "type": "record", "name": "P",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
})

_avro_record = st.fixed_dictionaries({
    "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "s": st.text(max_size=30),
    "d": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    "b": st.booleans(),
    "raw": st.binary(max_size=20).map(bytes.hex),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(_avro_record, max_size=12),
       st.integers(min_value=1, max_value=5),
       st.sampled_from(["null", "deflate", "snappy"]))
def test_avro_block_roundtrip(records, per_block, codec):
    import struct as _struct
    import tempfile
    import zlib

    from soda_spark_spark.sources.avro_ocf import (
        _decode_field,
        _parse_schema,
        _snappy_decompress,
        _zigzag_decode,
        parse_avro_header,
        write_avro,
    )

    p = tempfile.mktemp(suffix=".avro")
    write_avro(records, _avro_schema, p, codec=codec,
               records_per_block=per_block)
    data = open(p, "rb").read()
    sj, cdc, sync, pos = parse_avro_header(data)
    fields = _parse_schema(sj)
    got = []
    while pos < len(data):
        n, pos = _zigzag_decode(data, pos)
        size, pos = _zigzag_decode(data, pos)
        payload = data[pos : pos + size]
        pos += size
        assert data[pos : pos + 16] == sync
        pos += 16
        if cdc == "deflate":
            payload = zlib.decompress(payload, -15)
        elif cdc == "snappy":
            comp, crc = payload[:-4], payload[-4:]
            payload = _snappy_decompress(comp, 1 << 28)
            assert _struct.pack(
                ">I", zlib.crc32(payload) & 0xFFFFFFFF
            ) == crc
        rpos = 0
        for _ in range(n):
            rec = {}
            for name, d in fields:
                v, rpos = _decode_field(payload, rpos, d)
                rec[name] = v
            got.append(rec)
    assert got == records


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_zigzag_roundtrip(n):
    from soda_spark_spark.sources.avro_ocf import (
        _zigzag_decode,
        _zigzag_encode,
    )

    v, pos = _zigzag_decode(_zigzag_encode(n), 0)
    assert v == n and pos == len(_zigzag_encode(n))


# -------------------------------------------------------- SafeTensors

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["f32", "f16", "i64", "i32", "u8"]),
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=1, max_value=6),
        ),
        min_size=1, max_size=5,
    ),
)
def test_safetensors_header_roundtrip(specs):
    import tempfile

    import numpy as np

    from soda_spark_spark.sources.safetensors import (
        parse_safetensors_header,
        write_safetensors,
    )

    np_dtype = {"f32": np.float32, "f16": np.float16,
                "i64": np.int64, "i32": np.int32, "u8": np.uint8}
    st_name = {"f32": "F32", "f16": "F16", "i64": "I64",
               "i32": "I32", "u8": "U8"}
    tensors = {
        f"t{i}": np.zeros((r, c), dtype=np_dtype[k])
        for i, (k, r, c) in enumerate(specs)
    }
    p = tempfile.mktemp(suffix=".safetensors")
    write_safetensors(tensors, p)
    parsed, meta, _ = parse_safetensors_header(open(p, "rb").read())
    assert set(parsed) == set(tensors)
    for i, (k, r, c) in enumerate(specs):
        dtype, shape, b, e = parsed[f"t{i}"]
        assert dtype == st_name[k] and shape == [r, c]
        assert e - b == tensors[f"t{i}"].nbytes


@settings(max_examples=150, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=32), min_size=1,
                max_size=16))
def test_safetensors_bf16_widening_is_truncation(vals):
    """Widened BF16 must equal the float32 with the low 16 mantissa
    bits zeroed — the defining property of the format."""
    import numpy as np

    from soda_spark_spark.sources.safetensors import _tensor_rows

    f32 = np.array(vals, dtype=np.float32)
    u16 = (f32.view(np.uint32) >> 16).astype("<u2")
    (_, got, _), = _tensor_rows("t", "BF16", [len(vals)], u16.tobytes())
    want = (f32.view(np.uint32) & 0xFFFF0000).view(np.float32)
    assert got == [float(x) for x in want]
