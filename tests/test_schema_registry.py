"""Confluent wire-format framing + schema-registry analog + Avro schema
resolution (streaming/schema_registry.py) — the rolling-evolution surface
a real Kafka estate runs on (r7 verdict item 2)."""

from __future__ import annotations

import json

import pytest

from rdkafka_streams_spark.streaming.avro_codec import encode_value
from rdkafka_streams_spark.streaming.schema_registry import (
    SchemaRegistry,
    can_read,
    frame,
    resolve_read,
    unframe,
)

V1 = json.dumps({
    "type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": "string"},
    ],
})
# v2 adds a defaulted field (BACKWARD-compatible) and widens nothing
V2 = json.dumps({
    "type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": "string"},
        {"name": "score", "type": "int", "default": 7},
    ],
})
# incompatible: new REQUIRED field (old data has no value for it)
V_BAD = json.dumps({
    "type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": "string"},
        {"name": "must", "type": "string"},
    ],
})


def test_frame_unframe_wire_layout():
    body = b"\x36\x06foo"
    msg = frame(17, body)
    assert msg[:5] == b"\x00\x00\x00\x00\x11"  # magic 0x00 + u32 BE id
    assert unframe(msg) == (17, body)
    with pytest.raises(ValueError, match="magic"):
        unframe(b"\x01\x00\x00\x00\x11" + body)  # raw-Avro-on-framed-topic
    with pytest.raises(ValueError, match="short"):
        unframe(b"\x00\x00")


def test_register_is_idempotent_and_versions_monotonic(tmp_path):
    reg = SchemaRegistry(str(tmp_path))
    id1 = reg.register("t-value", V1)
    assert reg.register("t-value", V1) == id1  # same canonical → same id
    # doc/aliases noise doesn't mint a new version
    noisy = json.loads(V1)
    noisy["doc"] = "hello"
    assert reg.register("t-value", json.dumps(noisy)) == id1
    id2 = reg.register("t-value", V2)
    assert id2 != id1
    assert reg.versions("t-value") == [1, 2]
    assert reg.latest("t-value")[0] == id2
    assert reg.get_version("t-value", 1) == (id1, V1)
    assert json.loads(reg.get_by_id(id2)) == json.loads(V2)
    # same schema under ANOTHER subject reuses the global id
    assert reg.register("other-value", V1) == id1
    with pytest.raises(KeyError):
        reg.get_by_id(999)
    with pytest.raises(ValueError, match="invalid subject"):
        reg.register("../esc", V1)


def test_compatibility_gate(tmp_path):
    reg = SchemaRegistry(str(tmp_path))
    reg.register("t-value", V1)
    with pytest.raises(ValueError, match="no default"):
        reg.register("t-value", V_BAD)  # BACKWARD default mode
    # NONE waives the gate
    reg2 = SchemaRegistry(str(tmp_path / "r2"))
    reg2.register("t-value", V1)
    assert reg2.register("t-value", V_BAD, compatibility="NONE") > 0
    # FORWARD: dropping a defaulted field is forward-compatible; dropping a
    # required one is not (old reader lacks a default for it)
    reg3 = SchemaRegistry(str(tmp_path / "r3"))
    reg3.register("s", V2, compatibility="NONE")
    drop_scored = V1  # score had a default in v2 -> v1 reader fills it? no:
    # FORWARD means v2 reader reads v1-written data -> score from default: ok
    assert reg3.register("s", drop_scored, compatibility="FORWARD") > 0


def test_transitive_compatibility_gates_every_prior_version(tmp_path):
    """BACKWARD passes when only the LATEST version is readable;
    BACKWARD_TRANSITIVE also demands every earlier version — the mode a
    real estate needs when v1 writers outlive two schema bumps."""
    a = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"}]})
    ac = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"}, {"name": "c", "type": "string"}]})
    c = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "c", "type": "string"}]})
    reg = SchemaRegistry(str(tmp_path))
    reg.register("s-value", a)
    reg.register("s-value", ac, compatibility="NONE")
    # v3={c}: reads v2 data (has c) but NOT v1 data (no c, no default)
    reg2 = SchemaRegistry(str(tmp_path / "same"))
    reg2.register("s-value", a)
    reg2.register("s-value", ac, compatibility="NONE")
    assert reg2.register("s-value", c, compatibility="BACKWARD") > 0
    with pytest.raises(ValueError, match="BACKWARD vs v1"):
        reg.register("s-value", c, compatibility="BACKWARD_TRANSITIVE")
    # the stored mode resolves at register() time like any other
    reg.set_compatibility("FULL_TRANSITIVE", subject="s-value")
    assert reg.get_compatibility("s-value") == "FULL_TRANSITIVE"
    with pytest.raises(ValueError, match="vs v1"):
        reg.register("s-value", c)
    # transitive gate still admits a schema compatible with ALL versions
    a_plus_default = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"},
        {"name": "c", "type": "string", "default": ""}]})
    assert reg.register("s-value", a_plus_default) > 0
    with pytest.raises(ValueError, match="unknown compatibility mode"):
        reg.set_compatibility("SIDEWAYS")


def test_can_read_matrix():
    assert can_read(V1, V2) == []          # defaults fill the gap
    assert can_read(V2, V1) == []          # extra writer field is skipped
    assert can_read(V1, V_BAD) != []       # required field missing
    # promotions
    assert can_read("int", "long") == []
    assert can_read("long", "double") == []
    assert can_read("double", "long") != []
    assert can_read("string", "bytes") == []
    # unions
    assert can_read("string", ["null", "string"]) == []
    assert can_read(["null", "string"], "string") != []  # null branch unreadable
    # enums: reader must cover writer symbols or declare a default
    e_w = {"type": "enum", "name": "c", "symbols": ["A", "B"]}
    e_r = {"type": "enum", "name": "c", "symbols": ["A"]}
    assert can_read(e_w, e_r) != []
    assert can_read(e_w, {**e_r, "default": "A"}) == []


def test_resolution_old_record_new_reader():
    """v2 consumer reads a v1 record: score comes from the default."""
    body = encode_value({"id": 5, "kind": "click"}, json.loads(V1))
    out, pos = resolve_read(body, json.loads(V1), json.loads(V2))
    assert pos == len(body)
    assert out == {"id": 5, "kind": "click", "score": 7}


def test_resolution_new_record_old_reader():
    """v1 consumer reads a v2 record: unknown field decoded-and-dropped,
    stream position stays exact (the next record would decode cleanly)."""
    body = encode_value(
        {"id": 9, "kind": "view", "score": 123}, json.loads(V2)
    )
    out, pos = resolve_read(body, json.loads(V2), json.loads(V1))
    assert pos == len(body)
    assert out == {"id": 9, "kind": "view"}


def test_resolution_promotions_and_unions():
    # writer int read as long/double
    w, r = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "int"}]}, None
    body = encode_value({"x": 41}, w)
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "double"}]}
    assert resolve_read(body, w, r)[0] == {"x": 41.0}
    # writer non-union read as reader nullable union
    r2 = {"type": "record", "name": "r",
          "fields": [{"name": "x", "type": ["null", "long"]}]}
    assert resolve_read(body, w, r2)[0] == {"x": 41}
    # writer union read as plain (the written branch must match)
    wu = {"type": "record", "name": "r",
          "fields": [{"name": "x", "type": ["null", "int"]}]}
    body2 = encode_value({"x": 41}, wu)
    assert resolve_read(body2, wu, r)[0] == {"x": 41.0}
    with pytest.raises(ValueError):
        resolve_read(encode_value({"x": None}, wu), wu, r)  # null → double


def test_resolution_default_materialization():
    """Defaults: bytes are latin-1 strings, logical dates/decimals become
    typed values, nested records fill recursively."""
    import datetime as dt
    import decimal

    reader = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "bytes", "default": ""},
        {"name": "d",
         "type": {"type": "int", "logicalType": "date"}, "default": 19723},
        {"name": "m",
         "type": {"type": "bytes", "logicalType": "decimal",
                  "precision": 9, "scale": 2},
         "default": "Ò"},
        {"name": "e", "type": {"type": "enum", "name": "c",
                               "symbols": ["A", "B"]}, "default": "B"},
    ]}
    writer = {"type": "record", "name": "r", "fields": []}
    out, _ = resolve_read(b"", writer, reader)
    assert out["b"] == b"\x01\x02"
    assert out["d"] == dt.date(1970, 1, 1) + dt.timedelta(days=19723)
    assert out["m"] == decimal.Decimal("12.34")  # 0x04d2 = 1234, scale 2
    assert out["e"] == "B"


def test_end_to_end_schema_evolution_over_topiclog(spark, tmp_path):
    """The real-estate scenario: batch 1 produced under v1, the subject
    evolves, batch 2 produced under v2 — ONE consumer with the v2 reader
    schema reads both (old records surface score=7 from the default), and
    a v1-pinned consumer reads both too (new field dropped)."""
    from pyspark.sql import functions as F

    from rdkafka_streams_spark.streaming import KProducer, TopicLog, read_topic
    from rdkafka_streams_spark.streaming.consumer import KConsumer

    root = str(tmp_path / "bus")
    TopicLog(root).create_topic("ev", partitions=2)
    b1 = spark.createDataFrame(
        [(1, "click"), (2, "view")], "id long, kind string"
    )
    KProducer(host=root, topic="ev", transport="topiclog",
              value_format="avro-confluent", avro_schema=V1).write_batch(b1)
    b2 = spark.createDataFrame(
        [(3, "click", 50), (4, "buy", 99)], "id long, kind string, score int"
    )
    KProducer(host=root, topic="ev", transport="topiclog",
              value_format="avro-confluent", avro_schema=V2).write_batch(b2)

    reg = SchemaRegistry(f"{root}/.schema_registry")
    assert reg.versions("ev-value") == [1, 2]

    raw = read_topic(spark, root, "ev")
    # v2 reader (subject latest, schema=None) sees all four with score filled
    latest = KConsumer(host=root, topic="ev", transport="topiclog",
                       value_format="avro-confluent").decode(raw)
    got = {r["id"]: (r["kind"], r["score"])
           for r in latest.select("value.*").collect()}
    assert got == {1: ("click", 7), 2: ("view", 7),
                   3: ("click", 50), 4: ("buy", 99)}
    # v1-pinned reader sees all four without score
    pinned = KConsumer(host=root, topic="ev", transport="topiclog",
                       value_format="avro-confluent", schema=V1).decode(raw)
    assert set(pinned.select("value.*").columns) == {"id", "kind"}
    assert pinned.count() == 4
    # incompatible evolution is refused at produce time
    bad = spark.createDataFrame([(5, "x", "req")],
                                "id long, kind string, must string")
    with pytest.raises(Exception, match="incompatible"):
        KProducer(host=root, topic="ev", transport="topiclog",
                  value_format="avro-confluent", avro_schema=V_BAD,
                  ).write_batch(bad)


def test_framed_avro_key_roundtrip(spark, tmp_path):
    """key_format='avro-confluent': the key rides as a framed one-field
    record under <topic>-key; identical keys frame to identical BYTES
    across separate produces (deterministic encoding + idempotent id),
    and the consumer decodes the struct back."""
    from pyspark.sql import functions as F

    from rdkafka_streams_spark.streaming import TopicLog, read_topic
    from rdkafka_streams_spark.streaming.consumer import KConsumer
    from rdkafka_streams_spark.streaming.producer import KProducer
    from rdkafka_streams_spark.streaming.schema_registry import SchemaRegistry

    root = str(tmp_path / "broker")
    log = TopicLog(root)
    log.create_topic("t", partitions=2)
    df = spark.range(4).select(F.col("id").alias("user_id"),
                               (F.col("id") * 10).alias("score"))
    prod = KProducer(host=root, topic="t", key="user_id",
                     transport="topiclog", key_format="avro-confluent")
    prod.write_batch(df)
    prod.write_batch(df)  # second produce: same keys, same bytes
    reg = SchemaRegistry(str(tmp_path / "broker" / ".schema_registry"))
    assert "t-key" in reg.subjects()
    assert reg.versions("t-key") == [1]  # idempotent re-registration

    raw = read_topic(spark, root, "t")
    # identical user_id -> identical framed key bytes (compaction contract)
    distinct_keys = raw.select("key").distinct().count()
    assert distinct_keys == 4
    dec = KConsumer(host=root, topic="t", transport="topiclog",
                    key_format="avro-confluent",
                    schema="user_id long, score long").decode(raw)
    got = {(r.k, r.n) for r in dec.groupBy(
        F.col("key.user_id").alias("k")).count()
        .withColumnRenamed("count", "n").collect()}
    assert got == {(i, 2) for i in range(4)}


def test_compatibility_config_resolution(tmp_path):
    """PUT /config semantics: the gate mode is registry state — subject
    override beats the global default beats BACKWARD; register(None)
    resolves it, an explicit argument still overrides per call."""
    import json as _json

    from rdkafka_streams_spark.streaming.schema_registry import SchemaRegistry

    reg = SchemaRegistry(str(tmp_path / "reg"))
    v1 = _json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}]})
    v2_narrowing = _json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "long"}]})  # no default: BACKWARD-incompatible

    assert reg.get_compatibility("s") == "BACKWARD"
    reg.register("s", v1)
    with pytest.raises(ValueError, match="BACKWARD"):
        reg.register("s", v2_narrowing)
    # global default NONE lets it through on a fresh subject...
    reg.set_compatibility("NONE")
    assert reg.get_compatibility("s") == "NONE"
    # ...but a subject override wins over the global default
    reg.set_compatibility("FULL", subject="s")
    assert reg.get_compatibility("s") == "FULL"
    assert reg.get_compatibility("other") == "NONE"
    with pytest.raises(ValueError, match="FULL"):
        # FULL fails on its BACKWARD half (defaultless new field); the
        # FORWARD half alone would pass
        reg.register("s", v2_narrowing)
    # explicit per-call override still wins over all config
    sid = reg.register("s", v2_narrowing, compatibility="NONE")
    assert reg.versions("s") == [1, 2]
    assert reg.get_version("s", 2)[0] == sid
    # the .config file is not a version
    with pytest.raises(ValueError, match="unknown compatibility"):
        reg.set_compatibility("SIDEWAYS")


def test_subject_deletion_two_phase(tmp_path):
    """Confluent's delete surface: soft first (hidden from reads, version
    slot still blocked), permanent second; global ids always survive."""
    reg = SchemaRegistry(str(tmp_path))
    id1 = reg.register("t-value", V1)
    id2 = reg.register("t-value", V2)
    assert reg.subjects() == ["t-value"]
    # soft-delete one version: gone from reads, numbering doesn't rewind
    reg.delete_version("t-value", 2)
    assert reg.versions("t-value") == [1]
    assert reg.deleted_versions("t-value") == [2]
    id3 = reg.register("t-value", V2, compatibility="NONE")
    assert reg.versions("t-value") == [1, 3]  # v2's slot stays blocked
    assert id3 == id2  # canonical dedup still reuses the global id
    # permanent requires soft first
    with pytest.raises(ValueError, match="soft-deleted before"):
        reg.delete_version("t-value", 1, permanent=True)
    reg.delete_version("t-value", 2, permanent=True)
    # whole-subject: soft hides it from the listing, permanent removes it
    assert reg.delete_subject("t-value") == [1, 3]
    assert reg.subjects() == []
    # permanent whole-subject delete also demands the soft phase first
    reg.register("live-value", V1)
    with pytest.raises(ValueError, match="soft-deleted before"):
        reg.delete_subject("live-value", permanent=True)
    assert reg.delete_subject("t-value", permanent=True) == [1, 3]
    with pytest.raises(KeyError):
        reg.delete_subject("t-value")
    # ids outlive every delete (framed records in flight still carry them)
    assert reg.get_by_id(id1) and reg.get_by_id(id2)


def test_version_publish_never_overwrites_a_concurrent_registrar(tmp_path):
    """ADVICE r8: version numbers were computed from a directory listing
    and published with os.replace — a concurrent registrar's
    same-numbered version file was silently overwritten.  The publish is
    now a link(x) claim: simulate the race by dropping a rival's version
    file into the slot this register() would compute; the loser must
    re-list and take the NEXT number, leaving the rival's registration
    intact."""
    import os

    reg = SchemaRegistry(str(tmp_path / "reg"))
    id1 = reg.register("t-value", V1, compatibility="NONE")
    # rival wins the race for version 2 (its file content = its global id)
    sdir = os.path.join(str(tmp_path / "reg"), "subjects", "t-value")
    with open(os.path.join(sdir, "2"), "w", encoding="utf-8") as f:
        f.write(str(id1))
    id2 = reg.register("t-value", V2, compatibility="NONE")
    assert reg.versions("t-value") == [1, 2, 3]
    # the rival's slot is untouched; ours landed in the next one
    assert reg.get_version("t-value", 2)[0] == id1
    assert reg.get_version("t-value", 3)[0] == id2


def test_union_resolution_matches_named_types_by_name():
    """ADVICE r8: a reader union holding TWO record branches used to
    resolve every writer record to the first record-shaped branch.  The
    Avro spec matches named types by (full) name, then aliases."""
    a = {"type": "record", "name": "A",
         "fields": [{"name": "x", "type": "long"}]}
    b = {"type": "record", "name": "B",
         "fields": [{"name": "x", "type": "long"},
                    {"name": "y", "type": "string", "default": "d"}]}
    buf = encode_value({"x": 9}, a)
    # reader union lists B FIRST: name matching must still pick A
    v, _ = resolve_read(buf, a, [b, a])
    assert v == {"x": 9}
    # writer B resolves to B (and materializes nothing: y was written)
    buf_b = encode_value({"x": 1, "y": "z"}, b)
    v, _ = resolve_read(buf_b, b, [a, b])
    assert v == {"x": 1, "y": "z"}
    # a RENAMED reader branch still matches via aliases
    a2 = {"type": "record", "name": "A2", "aliases": ["A"],
          "fields": [{"name": "x", "type": "long"}]}
    v, _ = resolve_read(buf, a, [b, a2])
    assert v == {"x": 9}
    # namespaces qualify: ns.A != other.A, so only the alias-bearing
    # branch (or first compatible fallback) can take it
    wa = {"type": "record", "name": "A", "namespace": "ns",
          "fields": [{"name": "x", "type": "long"}]}
    ra = {"type": "record", "name": "A", "namespace": "ns",
          "fields": [{"name": "x", "type": "long"}]}
    v, _ = resolve_read(encode_value({"x": 3}, wa), wa, [b, ra])
    assert v == {"x": 3}
    # enums match by name too
    e1 = {"type": "enum", "name": "Color", "symbols": ["R", "G"]}
    e2 = {"type": "enum", "name": "Size", "symbols": ["S", "L"]}
    v, _ = resolve_read(encode_value("G", e1), e1, [e2, e1])
    assert v == "G"


SHARED = json.dumps({
    "type": "record", "name": "Address", "fields": [
        {"name": "city", "type": "string"},
    ],
})
SHARED_V2 = json.dumps({  # BACKWARD-compatible bump of the shared type
    "type": "record", "name": "Address", "fields": [
        {"name": "city", "type": "string"},
        {"name": "zip", "type": "string", "default": ""},
    ],
})
SHARED_BAD = json.dumps({  # breaking bump: new required field
    "type": "record", "name": "Address", "fields": [
        {"name": "city", "type": "string"},
        {"name": "country", "type": "string"},
    ],
})
ENVELOPE = json.dumps({
    "type": "record", "name": "Customer", "fields": [
        {"name": "id", "type": "long"},
        {"name": "home", "type": "Address"},  # by reference, not inline
    ],
})


def test_schema_references_register_resolve_roundtrip(tmp_path):
    """Confluent schema references: an envelope registered with
    ``references`` composes a type registered under ANOTHER subject; the
    resolved closure decodes a framed record end-to-end."""
    from rdkafka_streams_spark.streaming.schema_registry import (
        frame,
        unframe,
    )

    reg = SchemaRegistry(str(tmp_path))
    reg.register("shared-address", SHARED, compatibility="NONE")
    refs = [{"name": "Address", "subject": "shared-address", "version": -1}]
    sid = reg.register("cust-value", ENVELOPE, compatibility="NONE",
                       references=refs)
    # stored references pin the version that was latest at registration
    assert reg.references(sid) == [
        {"name": "Address", "subject": "shared-address", "version": 1}
    ]
    resolved = reg.get_by_id_resolved(sid)
    assert resolved["fields"][1]["type"]["name"] == "Address"
    # encode under the resolved closure, frame, decode through the
    # registry like a consumer that knows only the id
    val = {"id": 7, "home": {"city": "Oslo"}}
    buf = frame(sid, encode_value(val, resolved))
    rid, body = unframe(buf)
    out, _ = resolve_read(body, reg.get_by_id_resolved(rid), resolved)
    assert out == val
    # same text with DIFFERENT references = a different schema id
    reg.register("shared-address2", SHARED, compatibility="NONE")
    sid2 = reg.register(
        "cust2-value", ENVELOPE, compatibility="NONE",
        references=[{"name": "Address", "subject": "shared-address2",
                     "version": 1}],
    )
    assert sid2 != sid
    # idempotent re-register with the same refs returns the same id
    assert reg.register("cust-value", ENVELOPE, references=refs) == sid
    # unknown referenced subject/version raises
    with pytest.raises(KeyError):
        reg.register("x-value", ENVELOPE, compatibility="NONE",
                     references=[{"name": "Address", "subject": "ghost",
                                  "version": 1}])


def test_reference_bump_gated_by_resolved_compatibility(tmp_path):
    """The compatibility gate runs on the RESOLVED closure: re-registering
    the envelope against a compatibly-bumped shared type passes, and a
    BREAKING bump smuggled through the reference is refused — evolution
    of a referenced type is held to the same contract as inline fields."""
    reg = SchemaRegistry(str(tmp_path))
    reg.register("shared-address", SHARED, compatibility="NONE")
    refs_v1 = [{"name": "Address", "subject": "shared-address", "version": 1}]
    sid1 = reg.register("cust-value", ENVELOPE, compatibility="BACKWARD",
                        references=refs_v1)
    # bump the shared subject compatibly and re-register the envelope
    # against the new version: BACKWARD holds (new closure reads old data)
    reg.register("shared-address", SHARED_V2, compatibility="BACKWARD")
    refs_v2 = [{"name": "Address", "subject": "shared-address", "version": 2}]
    sid2 = reg.register("cust-value", ENVELOPE, compatibility="BACKWARD",
                        references=refs_v2)
    assert sid2 != sid1  # same text, new closure -> new schema id
    assert reg.versions("cust-value") == [1, 2]
    # old framed records decode under the NEW resolved reader (defaults)
    from rdkafka_streams_spark.streaming.schema_registry import frame, unframe
    old = frame(sid1, encode_value(
        {"id": 1, "home": {"city": "Bergen"}}, reg.get_by_id_resolved(sid1)))
    _, body = unframe(old)
    out, _ = resolve_read(body, reg.get_by_id_resolved(sid1),
                          reg.get_by_id_resolved(sid2))
    assert out == {"id": 1, "home": {"city": "Bergen", "zip": ""}}
    # a BREAKING shared-type bump is caught at the envelope's gate
    reg.register("shared-address", SHARED_BAD, compatibility="NONE")
    refs_v3 = [{"name": "Address", "subject": "shared-address", "version": 3}]
    with pytest.raises(ValueError, match="incompatible"):
        reg.register("cust-value", ENVELOPE, compatibility="BACKWARD",
                     references=refs_v3)
    # recursive references are refused, not infinitely inlined. A cycle
    # cannot be built through register() (each referenced version must
    # already exist), so forge the sidecar to simulate a corrupt/looped
    # store and check the guard holds.
    import os

    loop = json.dumps({"type": "record", "name": "Node", "fields": [
        {"name": "next", "type": ["null", "Tree"]}]})
    tid = reg.register("tree", loop, compatibility="NONE")
    with open(os.path.join(str(tmp_path), "ids", f"{tid}.refs.json"),
              "w", encoding="utf-8") as f:
        json.dump([{"name": "Tree", "subject": "tree", "version": 1}], f)
    with pytest.raises(ValueError, match="recursive"):
        reg.get_by_id_resolved(tid)
