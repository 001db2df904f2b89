"""Avro binary codec tests — byte-level pins from the PUBLIC Avro spec's
worked examples, pure-Python roundtrips, schema derivation, and the Spark
column/transport surfaces (streaming/avro_codec.py)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from rdkafka_streams_spark.streaming.avro_codec import (
    _zigzag_encode,
    avro_to_spark_ddl,
    decode_value,
    encode_value,
    parse_schema,
    spark_to_avro_schema,
)

# ------------------------------------------------------------ spec byte pins

RECORD = parse_schema(
    '{"type":"record","name":"test","fields":'
    '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
)


def test_zigzag_spec_table():
    """The spec's int/long encoding table: 0→00, -1→01, 1→02, -2→03, 2→04,
    -64→7f, 64→80 01."""
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(2) == b"\x04"
    assert _zigzag_encode(-64) == b"\x7f"
    assert _zigzag_encode(64) == b"\x80\x01"


def test_string_and_record_spec_examples():
    """Spec: string "foo" = 06 66 6f 6f; record {a:27,b:"foo"} under the
    two-field test schema = 36 06 66 6f 6f (field concatenation, no tags)."""
    assert encode_value("foo", "string") == b"\x06foo"
    assert encode_value({"a": 27, "b": "foo"}, RECORD) == b"\x36\x06foo"
    assert decode_value(b"\x36\x06foo", RECORD) == ({"a": 27, "b": "foo"}, 5)


def test_array_union_enum_map_spec_examples():
    """Spec: array[long] [3,27] = 04 06 36 00; union ["null","string"]
    null = 00, "a" = 02 02 61; enum third symbol = 04."""
    arr = {"type": "array", "items": "long"}
    assert encode_value([3, 27], arr) == b"\x04\x06\x36\x00"
    assert decode_value(b"\x04\x06\x36\x00", arr) == ([3, 27], 4)

    union = ["null", "string"]
    assert encode_value(None, union) == b"\x00"
    assert encode_value("a", union) == b"\x02\x02a"
    assert decode_value(b"\x02\x02a", union) == ("a", 3)

    enum = {"type": "enum", "name": "e", "symbols": ["A", "B", "C", "D"]}
    assert encode_value("C", enum) == b"\x04"
    assert decode_value(b"\x04", enum) == ("C", 1)

    mp = {"type": "map", "values": "long"}
    assert encode_value({"a": 1}, mp) == b"\x02\x02a\x02\x00"
    assert decode_value(b"\x02\x02a\x02\x00", mp) == ({"a": 1}, 5)


def test_roundtrip_nested_and_logical():
    schema = parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "who", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "flags", "type": {"type": "array", "items": "boolean"}},
            {"name": "blob", "type": "bytes"},
            {"name": "at", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {"name": "sub", "type": {"type": "record", "name": "s", "fields": [
                {"name": "x", "type": "int"}]}},
        ],
    }))
    v = {
        "id": 12345678901234,
        "who": None,
        "score": -2.5,
        "flags": [True, False],
        "blob": b"\x00\xff",
        "at": dt.datetime(2024, 3, 1, 12, 30, 0, 123456),
        "day": dt.date(2024, 3, 1),
        "sub": {"x": -7},
    }
    back, n = decode_value(encode_value(v, schema), schema)
    assert back == v
    assert n == len(encode_value(v, schema))
    # decode consumes every byte it was given


def test_negative_block_count_decode():
    """Writers may emit a negative block count followed by a byte size
    (spec-legal); the decoder must honor it."""
    arr = {"type": "array", "items": "long"}
    # -2 items (zigzag 03), block byte-size 2 (04), items 3, 27, end 00
    assert decode_value(b"\x03\x04\x06\x36\x00", arr)[0] == [3, 27]


def test_encode_type_errors_are_loud():
    with pytest.raises(TypeError):
        encode_value("not-an-int", ["null", "long"])
    with pytest.raises(KeyError):
        encode_value({"a": 1}, RECORD)  # missing field b
    with pytest.raises(ValueError):
        encode_value(b"abc", {"type": "fixed", "name": "f", "size": 2})


# --------------------------------------------------------- schema mapping

def test_avro_to_spark_ddl():
    assert avro_to_spark_ddl('"long"') == "bigint"
    assert avro_to_spark_ddl(RECORD) == "struct<a: bigint, b: string>"
    assert avro_to_spark_ddl(["null", "double"]) == "double"
    assert (
        avro_to_spark_ddl({"type": "array", "items": "string"}) == "array<string>"
    )
    assert (
        avro_to_spark_ddl({"type": "long", "logicalType": "timestamp-micros"})
        == "timestamp"
    )
    with pytest.raises(ValueError):
        avro_to_spark_ddl(["int", "string"])  # multi-branch union


def test_spark_to_avro_schema_roundtrips_through_ddl(spark):
    s = spark_to_avro_schema(
        "id bigint, name string, v double, ts timestamp", name="rec"
    )
    parsed = parse_schema(s)
    assert parsed["type"] == "record"
    # nullable spark fields become ["null", T] unions
    assert parsed["fields"][0]["type"] == ["null", "long"]
    assert avro_to_spark_ddl(parsed) == (
        "struct<id: bigint, name: string, v: double, ts: timestamp>"
    )


# ------------------------------------------------------------ spark surface

def test_to_from_avro_py_roundtrip(spark):
    import pyspark.sql.functions as F

    from rdkafka_streams_spark.streaming.avro_codec import from_avro_py, to_avro_py

    df = spark.createDataFrame(
        [(1, "alpha", 2.5), (2, None, -1.0), (3, "gamma", 0.0)],
        "id bigint, name string, v double",
    )
    schema = spark_to_avro_schema(df.schema, name="rec")
    enc = df.select(to_avro_py(F.struct("id", "name", "v"), schema).alias("b"))
    dec = enc.select(from_avro_py(F.col("b"), schema).alias("v")).select(
        "v.id", "v.name", "v.v"
    )
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))


def test_avro_transport_roundtrip(spark, tmp_path):
    """q90-shape over the wire with Avro values: produce binary records to
    a topiclog topic, batch-consume, decode through KConsumer's avro path."""
    import pyspark.sql.functions as F

    from rdkafka_streams_spark.streaming import KProducer, TopicLog, read_topic
    from rdkafka_streams_spark.streaming.consumer import KConsumer

    root = str(tmp_path / "bus")
    TopicLog(root).create_topic("ev", partitions=2)
    df = spark.createDataFrame(
        [(1, "click", 1.25), (2, "view", -3.5), (3, "click", 0.0)],
        "event_id bigint, event_type string, value double",
    )
    schema = spark_to_avro_schema(df.schema, name="ev")
    KProducer(
        host=root, topic="ev", key="event_id", transport="topiclog",
        value_format="avro", avro_schema=schema,
    ).write_batch(df)

    raw = read_topic(spark, root, "ev")
    c = KConsumer(host=root, topic="ev", schema=schema, value_format="avro",
                  transport="topiclog")
    dec = c.decode(raw).select("value.event_id", "value.event_type", "value.value")
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))
    # the wire really is Avro binary, not JSON: first value byte of id=1's
    # record is zigzag(1) = 0x02, and JSON would start with '{'
    one = raw.where(F.col("key").cast("string") == "1").first()
    assert bytes(one["value"])[0] == 0x02


def test_avro_functions_prefers_available_pair(spark):
    """In this container the spark-avro datasource is absent (ENVPROBE), so
    the probe must fall back to the pandas-UDF pair instead of raising."""
    from rdkafka_streams_spark.streaming.avro_codec import (
        avro_functions,
        from_avro_py,
        to_avro_py,
    )

    to_fn, from_fn = avro_functions()
    assert (to_fn, from_fn) == (to_avro_py, from_avro_py)


# --------------------------------------------------------- property: roundtrip
from hypothesis import given, settings
from hypothesis import strategies as st

_SCALAR_SCHEMAS_AND_VALUES = [
    ("long", st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    ("int", st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    ("string", st.text(max_size=80)),
    ("bytes", st.binary(max_size=64)),
    ("boolean", st.booleans()),
    ("double", st.floats(allow_nan=False)),
]


@st.composite
def _record_and_value(draw):
    """A random flat record schema (nullable-union fields over the scalar
    types) plus a matching value dict — the shape spark_to_avro_schema
    emits for arbitrary DataFrames."""
    n = draw(st.integers(min_value=1, max_value=5))
    fields, value = [], {}
    for i in range(n):
        typ, strat = draw(st.sampled_from(_SCALAR_SCHEMAS_AND_VALUES))
        fields.append({"name": f"f{i}", "type": ["null", typ]})
        value[f"f{i}"] = draw(st.none() | strat)
    return {"type": "record", "name": "r", "fields": fields}, value


@given(_record_and_value())
@settings(max_examples=200, deadline=None)
def test_property_record_roundtrip(rec_and_val):
    """encode(decode) identity over random nullable records: union index,
    zigzag, length prefixes, and IEEE doubles all survive byte-exactly."""
    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    schema, value = rec_and_val
    buf = encode_value(value, schema)
    decoded, pos = decode_value(buf, schema)
    assert pos == len(buf)  # every byte consumed — no trailing garbage
    assert decoded == value


@given(st.lists(st.none() | st.text(max_size=20), max_size=8))
@settings(max_examples=100, deadline=None)
def test_property_array_of_nullable_strings_roundtrip(items):
    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    schema = {"type": "array", "items": ["null", "string"]}
    buf = encode_value(items, schema)
    decoded, pos = decode_value(buf, schema)
    assert pos == len(buf)
    assert decoded == items


# ----------------------------------------------------- logical types (r8)
def test_decimal_bytes_roundtrip_and_minimal_encoding():
    """Avro spec §decimal: bytes carry the minimal-length big-endian
    two's-complement UNSCALED integer. -1 at scale 2 is one byte 0xff
    (unscaled -100 is two — check actual minimality per value)."""
    import decimal

    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    sch = {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}
    for s in ("0.00", "0.01", "-0.01", "1.27", "-1.28", "12345678.99",
              "-12345678.99", "42.00"):
        v = decimal.Decimal(s)
        buf = encode_value(v, sch)
        out, pos = decode_value(buf, sch)
        assert pos == len(buf) and out == v, s
    # minimality: unscaled 127 = 1 byte body, 128 = 2 bytes (sign bit)
    assert len(encode_value(decimal.Decimal("1.27"), sch)) == 1 + 1
    assert len(encode_value(decimal.Decimal("1.28"), sch)) == 1 + 2
    # exactness is enforced — no silent rounding of money
    with pytest.raises(ValueError, match="scale"):
        encode_value(decimal.Decimal("0.005"), sch)
    with pytest.raises(ValueError, match="overflows"):
        encode_value(decimal.Decimal("123456789.01"), sch)


def test_decimal_fixed_sign_extension():
    """fixed-backed decimal pads with the SIGN byte to the declared size."""
    import decimal

    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    sch = {"type": "fixed", "name": "m", "size": 4,
           "logicalType": "decimal", "precision": 10, "scale": 2}
    neg = encode_value(decimal.Decimal("-0.01"), sch)
    assert neg == b"\xff\xff\xff\xff"  # -1 sign-extended to 4 bytes
    pos_ = encode_value(decimal.Decimal("0.01"), sch)
    assert pos_ == b"\x00\x00\x00\x01"
    for s in ("-21474836.48", "21474836.47", "0.00"):
        v = decimal.Decimal(s)
        out, p = decode_value(encode_value(v, sch), sch)
        assert p == 4 and out == v


def test_uuid_and_timestamp_millis():
    import uuid

    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    usch = {"type": "string", "logicalType": "uuid"}
    u = str(uuid.uuid5(uuid.NAMESPACE_DNS, "rdkafka"))
    out, _ = decode_value(encode_value(u, usch), usch)
    assert out == u
    with pytest.raises(ValueError):
        encode_value("not-a-uuid", usch)

    tsch = {"type": "long", "logicalType": "timestamp-millis"}
    t = dt.datetime(2024, 3, 1, 12, 30, 15, 250_000)
    buf = encode_value(t, tsch)
    # wire integer is epoch MILLIS, not micros
    from rdkafka_streams_spark.streaming.avro_codec import _zigzag_decode
    raw, _ = _zigzag_decode(buf, 0)
    assert raw == int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    out, _ = decode_value(buf, tsch)
    assert out == t


def test_logical_types_ddl_mapping():
    from rdkafka_streams_spark.streaming.avro_codec import avro_to_spark_ddl

    assert avro_to_spark_ddl(
        {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2}
    ) == "decimal(12,2)"
    assert avro_to_spark_ddl({"type": "string", "logicalType": "uuid"}) == "string"
    assert avro_to_spark_ddl(
        {"type": "long", "logicalType": "timestamp-millis"}) == "timestamp"


def test_decimal_column_through_pandas_udfs(spark):
    """End-to-end: Spark DecimalType column → auto-derived Avro schema
    (bytes+decimal) → encode → decode → DecimalType again, values exact.
    This is the 'money survives the wire as decimal, not double' check."""
    from pyspark.sql import functions as F

    from rdkafka_streams_spark.streaming.avro_codec import (
        from_avro_py,
        spark_to_avro_schema,
        to_avro_py,
    )

    df = spark.createDataFrame(
        [("a", "12345.67"), ("b", "-0.05"), ("c", "0.00"), ("d", None)],
        "id string, raw string",
    ).select("id", F.col("raw").cast("decimal(12,2)").alias("money"))
    schema = spark_to_avro_schema(df.select("id", "money").schema, name="v")
    parsed = json.loads(schema)
    money_branch = [f for f in parsed["fields"] if f["name"] == "money"][0]["type"]
    assert {"type": "bytes", "logicalType": "decimal",
            "precision": 12, "scale": 2} in money_branch
    enc = df.select("id", to_avro_py(F.struct("id", "money"), schema).alias("v"))
    dec = enc.select("id", from_avro_py("v", schema).alias("r")) \
        .select("id", "r.money")
    assert dict(dec.collect()) == {
        k: (None if v is None else __import__("decimal").Decimal(v))
        for k, v in [("a", "12345.67"), ("b", "-0.05"), ("c", "0.00"), ("d", None)]
    }
    assert dict(dec.dtypes)["money"] == "decimal(12,2)"


from hypothesis import HealthCheck


@given(
    st.decimals(
        min_value="-99999999.99", max_value="99999999.99", places=2,
        allow_nan=False, allow_infinity=False,
    )
)
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_decimal_roundtrip(d):
    from rdkafka_streams_spark.streaming.avro_codec import decode_value, encode_value

    sch = {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}
    buf = encode_value(d, sch)
    out, pos = decode_value(buf, sch)
    assert pos == len(buf) and out == d
