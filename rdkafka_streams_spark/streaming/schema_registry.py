"""Confluent wire-format framing + a file-backed Schema Registry analog.

Real Kafka estates do not ship raw Avro bodies: every value is framed in
the Confluent wire format — magic byte ``0x00`` + big-endian 4-byte schema
id + Avro body — and the id resolves through a Schema Registry holding
versioned schemas per SUBJECT (TopicNameStrategy: ``<topic>-value``).
Readers fetch the WRITER schema by id and decode with Avro schema
resolution against their own READER schema, which is what makes rolling
schema evolution work: a v2 consumer reads v1 records (new fields filled
from defaults), a v1 consumer reads v2 records (unknown fields skipped).
The reference's JSON envelope (src/Producer.coffee:77) is the schemaless
toy version of exactly this discipline.

This module provides all three pieces jar- and network-free
(ENVPROBE_r08: no confluent_kafka, no registry service, network blocked):

- ``frame``/``unframe`` — the 5-byte Confluent envelope.
- ``SchemaRegistry`` — versioned, append-only schema store on a directory
  (atomic writes beside the topiclog root, like ``__consumer_offsets``
  living beside the data). ``register`` is idempotent (same canonical
  schema → same id), guards with Confluent's compatibility modes
  (BACKWARD / FORWARD / FULL / NONE), and serves lookups by id, by
  subject+version, and latest.
- ``resolve_read`` / ``can_read`` — Avro spec §"Schema Resolution":
  field matching by name, reader defaults for missing fields, writer-only
  fields skipped, promotions (int→long→float→double, string↔bytes),
  union/enum resolution — plus the compatibility checker built on it.
- ``to_avro_confluent`` / ``from_avro_confluent`` — Arrow-batched column
  functions over the codec (avro_codec.py) that frame/unframe and resolve
  by id. Per-executor schema cache; the registry directory only needs to
  be a path every executor can read (at 100 TB: a shared filesystem or
  object store prefix — the same assumption the topiclog makes).

Scale posture: framing adds 5 bytes/record and zero shuffles; decode
resolves each distinct writer id ONCE per executor (schemas are KB-sized
and topics carry a handful of versions, so the cache is trivially small).
"""

from __future__ import annotations

import json
import os
import struct
import uuid as _uuid_mod
from typing import Any

import pandas as pd  # module-level: pandas_udf resolves stringified hints here

from rdkafka_streams_spark.streaming.avro_codec import (
    _schema_type,
    _zigzag_decode,
    avro_to_spark_ddl,
    decode_value,
    encode_value,
    parse_schema,
)

MAGIC = 0x00
_HEADER = struct.Struct(">bI")  # magic byte + big-endian 4-byte schema id

_COMPAT_MODES = (
    "BACKWARD",
    "BACKWARD_TRANSITIVE",
    "FORWARD",
    "FORWARD_TRANSITIVE",
    "FULL",
    "FULL_TRANSITIVE",
    "NONE",
)


# ------------------------------------------------------------- wire framing


def frame(schema_id: int, body: bytes) -> bytes:
    """Confluent wire format: ``0x00`` + u32 big-endian schema id + body."""
    return _HEADER.pack(MAGIC, schema_id) + body


def unframe(buf: bytes) -> tuple[int, bytes]:
    """Split a framed message into (schema_id, avro_body); loud on a
    wrong magic byte — the classic symptom of a raw-Avro producer meeting
    a wire-format consumer."""
    if len(buf) < _HEADER.size:
        raise ValueError(f"framed message too short: {len(buf)} bytes")
    magic, sid = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad magic byte 0x{magic & 0xff:02x} (expected 0x00) — value is "
            "not Confluent-framed (raw Avro producer on a framed topic?)"
        )
    return sid, buf[_HEADER.size:]


# ------------------------------------------------------- schema resolution


_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _plain_type(schema) -> str:
    """Type name with named-type indirection (record/enum/fixed names are
    irrelevant to structural resolution here)."""
    return _schema_type(schema)


def _branch_compatible(writer, reader) -> bool:
    """Can ``reader`` possibly accept values written as ``writer``? Used to
    pick the reader-union branch (spec: first branch that matches)."""
    wt, rt = _plain_type(writer), _plain_type(reader)
    if wt == "union":
        return any(_branch_compatible(b, reader) for b in writer)
    if rt == "union":
        return any(_branch_compatible(writer, b) for b in reader)
    return wt == rt or (wt, rt) in _PROMOTIONS


def _fullname(schema) -> str | None:
    """Qualified name of a named type (record/enum/fixed), else None."""
    if isinstance(schema, dict) and schema.get("type") in (
        "record", "enum", "fixed",
    ):
        n = schema.get("name", "")
        ns = schema.get("namespace")
        return n if ("." in n or not ns) else f"{ns}.{n}"
    return None


def _alias_names(schema) -> set[str]:
    """A named type's aliases, namespace-qualified like the spec says."""
    out: set[str] = set()
    if isinstance(schema, dict):
        ns = schema.get("namespace")
        for a in schema.get("aliases", ()):
            out.add(a if ("." in a or not ns) else f"{ns}.{a}")
    return out


def _inline(s, env: dict):
    """Structural substitution for ``resolved_schema``: replace type-name
    strings found in ``env`` with (copies of) their definitions, walking
    records/arrays/maps/unions. Duplicate inlining of a type used twice
    is fine — this codec resolves structurally, not by a named-type
    table."""
    import copy as _copy

    if isinstance(s, str):
        return _copy.deepcopy(env[s]) if s in env else s
    if isinstance(s, list):
        return [_inline(b, env) for b in s]
    if isinstance(s, dict):
        out = dict(s)
        t = s.get("type")
        if t == "record":
            out["fields"] = [
                dict(f, type=_inline(f["type"], env)) for f in s["fields"]
            ]
        elif t == "array":
            out["items"] = _inline(s["items"], env)
        elif t == "map":
            out["values"] = _inline(s["values"], env)
        elif isinstance(t, (dict, list)) or (isinstance(t, str) and t in env):
            out["type"] = _inline(t, env)
        return out
    return s


def _pick_union_branch(writer, union):
    """Choose the reader-union branch for a writer value — Avro spec
    §Schema Resolution: named types (record/enum/fixed) match BY NAME
    first (full name, then reader aliases), so a union holding two
    record branches resolves the writer to the right one, not just the
    first record-shaped branch; only with no name match does selection
    fall back to the first structurally compatible branch."""
    wt = _plain_type(writer)
    if wt in ("record", "enum", "fixed"):
        wname = _fullname(writer)
        named = [b for b in union if _plain_type(b) == wt]
        for b in named:
            if _fullname(b) == wname:
                return b
        for b in named:
            if wname and wname in _alias_names(b):
                return b
    for b in union:
        if _branch_compatible(writer, b):
            return b
    return None


def default_value(default: Any, schema) -> Any:
    """Materialize a reader-field JSON default as the codec's runtime value
    (spec: bytes/fixed defaults are \\u0000-\\u00ff strings; a union's
    default matches its FIRST branch; logical types decorate the leaf)."""
    t = _plain_type(schema)
    if t == "union":
        return default_value(default, schema[0])
    if t in ("bytes", "fixed"):
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            import decimal as _dec

            raw = default.encode("latin-1") if isinstance(default, str) else bytes(default)
            unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
            return _dec.Decimal(unscaled).scaleb(-int(schema.get("scale", 0)))
        return default.encode("latin-1") if isinstance(default, str) else bytes(default)
    if t in ("int", "long") and isinstance(schema, dict):
        import datetime as _dt

        lt = schema.get("logicalType")
        if lt == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(default))
        if lt == "timestamp-micros":
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(default))
        if lt == "timestamp-millis":
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=int(default))
    if t == "record":
        out = {}
        for f in schema["fields"]:
            sub = default.get(f["name"], f.get("default"))
            out[f["name"]] = default_value(sub, f["type"])
        return out
    if t == "array":
        return [default_value(d, schema["items"]) for d in default]
    if t == "map":
        return {k: default_value(v, schema["values"]) for k, v in default.items()}
    return default


def resolve_read(buf: bytes, writer, reader, pos: int = 0) -> tuple[Any, int]:
    """Decode ``buf`` (written under ``writer``) AS ``reader`` — Avro spec
    §"Schema Resolution". Returns (value, next_pos)."""
    wt, rt = _plain_type(writer), _plain_type(reader)
    if wt == "union":
        i, pos = _zigzag_decode(buf, pos)
        return resolve_read(buf, writer[i], reader, pos)
    if rt == "union":
        branch = _pick_union_branch(writer, reader)
        if branch is not None:
            return resolve_read(buf, writer, branch, pos)
        raise ValueError(f"writer {writer} matches no reader union branch {reader}")
    if wt == "record" and rt == "record":
        rfields = {f["name"]: f for f in reader["fields"]}
        out, seen = {}, set()
        for wf in writer["fields"]:
            rf = rfields.get(wf["name"])
            if rf is not None:
                out[wf["name"]], pos = resolve_read(buf, wf["type"], rf["type"], pos)
                seen.add(wf["name"])
            else:
                _, pos = decode_value(buf, wf["type"], pos)  # skip writer-only
        for rf in reader["fields"]:
            if rf["name"] not in seen:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} absent from writer and "
                        "has no default"
                    )
                out[rf["name"]] = default_value(rf["default"], rf["type"])
        return out, pos
    if wt == "array" and rt == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                v, pos = resolve_read(buf, writer["items"], reader["items"], pos)
                items.append(v)
        return items, pos
    if wt == "map" and rt == "map":
        entries = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                klen, pos = _zigzag_decode(buf, pos)
                k = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                entries[k], pos = resolve_read(
                    buf, writer["values"], reader["values"], pos
                )
        return entries, pos
    if wt == "enum" and rt == "enum":
        i, pos = _zigzag_decode(buf, pos)
        sym = writer["symbols"][i]
        if sym in reader["symbols"]:
            return sym, pos
        if "default" in reader:  # spec 1.9+ enum default
            return reader["default"], pos
        raise ValueError(f"enum symbol {sym!r} unknown to reader {reader['name']}")
    # primitives (and logical leaves): decode with the WRITER (wire layout is
    # the writer's), then promote if the reader widened the type
    v, pos = decode_value(buf, writer, pos)
    if wt == rt:
        return v, pos
    if (wt, rt) in _PROMOTIONS:
        if rt in ("float", "double"):
            return float(v), pos
        if rt == "long":
            return int(v), pos
        if rt == "bytes":
            return v.encode("utf-8"), pos
        if rt == "string":
            return v.decode("utf-8"), pos
    raise ValueError(f"cannot resolve writer {wt} as reader {rt}")


def can_read(writer, reader, path: str = "$") -> list[str]:
    """Static check that ``reader`` can decode anything written under
    ``writer`` — empty list = compatible, else human-readable reasons.
    This is the pairwise primitive under Confluent's compatibility modes."""
    writer, reader = parse_schema(writer), parse_schema(reader)
    wt, rt = _plain_type(writer), _plain_type(reader)
    if wt == "union":
        out = []
        for b in writer:
            out += can_read(b, reader, f"{path}|{_plain_type(b)}")
        return out
    if rt == "union":
        if any(_branch_compatible(writer, b) for b in reader):
            return []
        return [f"{path}: writer {wt} matches no reader union branch"]
    if wt == "record" and rt == "record":
        out = []
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    out.append(
                        f"{path}.{rf['name']}: reader-only field has no default"
                    )
            else:
                out += can_read(wf["type"], rf["type"], f"{path}.{rf['name']}")
        return out
    if wt == rt and wt == "array":
        return can_read(writer["items"], reader["items"], f"{path}[]")
    if wt == rt and wt == "map":
        return can_read(writer["values"], reader["values"], f"{path}{{}}")
    if wt == rt and wt == "enum":
        missing = set(writer["symbols"]) - set(reader["symbols"])
        if missing and "default" not in reader:
            return [f"{path}: enum symbols {sorted(missing)} unknown to reader"]
        return []
    if wt == rt and wt == "fixed":
        if writer.get("size") != reader.get("size"):
            return [f"{path}: fixed size {writer.get('size')} != {reader.get('size')}"]
        return []
    if wt == rt or (wt, rt) in _PROMOTIONS:
        return []
    return [f"{path}: writer {wt} unreadable as reader {rt}"]


# ------------------------------------------------------------ the registry


def _canonical(schema) -> str:
    """Deduplication form: parsed schema minus documentation noise
    (doc/aliases), dict keys sorted. Unlike Avro's Parsing Canonical Form
    this KEEPS logical types — two schemas that decode to different Spark
    types must not collapse to one id."""

    def strip(s):
        if isinstance(s, dict):
            return {
                k: strip(v) for k, v in s.items() if k not in ("doc", "aliases")
            }
        if isinstance(s, list):
            return [strip(x) for x in s]
        return s

    return json.dumps(strip(parse_schema(schema)), sort_keys=True,
                      separators=(",", ":"))


class SchemaRegistry:
    """Versioned schema store on a directory — the Schema Registry analog.

    Layout (all writes atomic; ids AND subject version numbers are both
    allocated under ``O_EXCL``/``link(x)`` claims, so concurrent
    registrars on a shared FS cannot collide — a version-number loser
    re-lists and takes the next slot instead of overwriting)::

        <root>/ids/<id>.avsc                 # schema text by global id
        <root>/subjects/<subject>/<version>  # file content = global id

    Subjects follow Confluent's TopicNameStrategy by convention
    (``<topic>-value``), but any string without path separators works.
    """

    def __init__(self, root: str):
        self.root = root

    # -- paths -------------------------------------------------------------
    def _ids_dir(self) -> str:
        return os.path.join(self.root, "ids")

    def _subject_dir(self, subject: str) -> str:
        if not subject or subject.startswith(".") or "/" in subject or "\\" in subject:
            raise ValueError(f"invalid subject {subject!r}")
        return os.path.join(self.root, "subjects", subject)

    # -- reads -------------------------------------------------------------
    def get_by_id(self, schema_id: int) -> str:
        path = os.path.join(self._ids_dir(), f"{int(schema_id)}.avsc")
        if not os.path.exists(path):
            raise KeyError(f"schema id {schema_id} not registered")
        with open(path, encoding="utf-8") as f:
            return f.read()

    # -- schema references (Confluent's ``references`` field) ---------------
    # A registered schema may REFER to named types registered under other
    # subjects instead of inlining them — the shared-envelope /
    # shared-key-type pattern every Debezium/Connect estate uses. Each
    # reference is ``{"name", "subject", "version"}`` where ``name`` is the
    # exact type-name string the schema uses; ``version=-1`` pins the
    # subject's latest AT REGISTRATION TIME (Confluent pins too — later
    # bumps of the referenced subject do not silently change this schema).
    # References travel with the GLOBAL ID (``ids/<id>.refs.json``), so the
    # decode path can rebuild the closure of any framed record forever.

    def references(self, schema_id: int) -> list[dict]:
        path = os.path.join(self._ids_dir(), f"{int(schema_id)}.refs.json")
        try:
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        except OSError:
            return []

    def resolved_schema(self, schema, references: list[dict] | None,
                        _stack: tuple = ()):
        """Inline the reference closure: every type-name string equal to a
        reference's ``name`` is replaced by the referenced subject
        version's (recursively resolved) definition. Recursive/mutual
        references raise — Avro cannot decode a cycle it cannot inline."""
        env = {}
        for ref in references or []:
            nm = ref["name"]
            if nm in _stack:
                raise ValueError(f"recursive schema reference {nm!r}")
            v = ref.get("version", -1)
            sid, text = (
                self.latest(ref["subject"]) if v in (-1, None)
                else self.get_version(ref["subject"], int(v))
            )
            env[nm] = self.resolved_schema(
                text, self.references(sid), _stack + (nm,)
            )
        return _inline(parse_schema(schema), env)

    def get_by_id_resolved(self, schema_id: int):
        """Parsed schema with its reference closure inlined — what the
        decoder actually needs for a framed record's writer id."""
        return self.resolved_schema(
            self.get_by_id(schema_id), self.references(schema_id)
        )

    def versions(self, subject: str) -> list[int]:
        d = self._subject_dir(subject)
        if not os.path.isdir(d):
            return []
        return sorted(int(v) for v in os.listdir(d) if v.isdigit())

    def get_version(self, subject: str, version: int) -> tuple[int, str]:
        """(global_id, schema_text) of one subject version."""
        path = os.path.join(self._subject_dir(subject), str(int(version)))
        if not os.path.exists(path):
            raise KeyError(f"{subject} version {version} not registered")
        with open(path, encoding="utf-8") as f:
            sid = int(f.read().strip())
        return sid, self.get_by_id(sid)

    def latest(self, subject: str) -> tuple[int, str]:
        vs = self.versions(subject)
        if not vs:
            raise KeyError(f"subject {subject!r} has no versions")
        return self.get_version(subject, vs[-1])

    def subjects(self) -> list[str]:
        """Live subjects only — a fully soft-deleted subject disappears
        from the listing, like Confluent's ``GET /subjects`` without
        ``?deleted=true``."""
        d = os.path.join(self.root, "subjects")
        if not os.path.isdir(d):
            return []
        return sorted(s for s in os.listdir(d) if self.versions(s))

    # -- deletes -----------------------------------------------------------
    # Confluent's two-phase delete: a version is SOFT-deleted first (gone
    # from reads, still blocking its version number) and only then may be
    # PERMANENTLY deleted. Global ids always survive — other subjects may
    # reference the same schema, and framed records in flight still carry
    # the id.

    def deleted_versions(self, subject: str) -> list[int]:
        d = self._subject_dir(subject)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n.split("-", 1)[1])
            for n in os.listdir(d)
            if n.startswith(".deleted-")
        )

    def delete_version(
        self, subject: str, version: int, permanent: bool = False
    ) -> None:
        """``DELETE /subjects/{s}/versions/{v}``: soft by default;
        ``permanent=True`` requires the version to be soft-deleted
        already (Confluent's ordering rule)."""
        d = self._subject_dir(subject)
        live = os.path.join(d, str(int(version)))
        tomb = os.path.join(d, f".deleted-{int(version)}")
        if permanent:
            if os.path.exists(live):
                raise ValueError(
                    f"{subject} v{version} must be soft-deleted before "
                    "permanent deletion"
                )
            if not os.path.exists(tomb):
                raise KeyError(f"{subject} version {version} not registered")
            os.remove(tomb)
        else:
            if not os.path.exists(live):
                raise KeyError(f"{subject} version {version} not registered")
            os.replace(live, tomb)

    def delete_subject(self, subject: str, permanent: bool = False) -> list[int]:
        """``DELETE /subjects/{s}``: soft-deletes every live version (and
        returns them); ``permanent=True`` removes the subject directory —
        config included — and requires a prior soft delete. Version
        numbering never rewinds across a soft delete (``register`` counts
        tombstones), matching Confluent."""
        import shutil

        if permanent:
            if self.versions(subject):
                raise ValueError(
                    f"subject {subject!r} must be soft-deleted before "
                    "permanent deletion"
                )
            dv = self.deleted_versions(subject)
            if not dv:
                raise KeyError(f"subject {subject!r} has no versions")
            shutil.rmtree(self._subject_dir(subject))
            return dv
        vs = self.versions(subject)
        if not vs:
            raise KeyError(f"subject {subject!r} has no versions")
        for v in vs:
            self.delete_version(subject, v)
        return vs

    # -- compatibility config ----------------------------------------------
    # Confluent's ``PUT /config`` and ``PUT /config/{subject}``: the gate
    # mode is registry STATE, resolved subject → global → BACKWARD, so
    # every producer in the estate is held to the same contract without
    # each caller restating it.

    def set_compatibility(self, mode: str, subject: str | None = None) -> None:
        """Set the compatibility mode globally (subject=None) or for one
        subject (overrides the global default for that subject)."""
        if mode not in _COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        if subject is None:
            path = os.path.join(self.root, "config.json")
            os.makedirs(self.root, exist_ok=True)
        else:
            sdir = self._subject_dir(subject)
            os.makedirs(sdir, exist_ok=True)
            path = os.path.join(sdir, ".config")
        tmp = f"{path}.tmp-{_uuid_mod.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"compatibility": mode}, f)
        os.replace(tmp, path)

    def get_compatibility(self, subject: str | None = None) -> str:
        """Effective mode: subject override → global default → BACKWARD."""
        paths = []
        if subject is not None:
            paths.append(os.path.join(self._subject_dir(subject), ".config"))
        paths.append(os.path.join(self.root, "config.json"))
        for path in paths:
            if os.path.exists(path):
                with open(path, encoding="utf-8") as f:
                    return json.load(f)["compatibility"]
        return "BACKWARD"

    # -- writes ------------------------------------------------------------
    def register(
        self, subject: str, schema: str, compatibility: str | None = None,
        references: list[dict] | None = None,
    ) -> int:
        """Register ``schema`` under ``subject`` and return its global id.

        ``references`` composes record types ACROSS subjects (Confluent's
        ``references: [{name, subject, version}]``): the schema may use a
        referenced type's name where a definition would go; ``version=-1``
        pins the referenced subject's current latest. The compatibility
        gate runs on the RESOLVED closure (a breaking change smuggled in
        through a reference bump is still caught), and two registrations
        with identical text but different references get distinct ids.

        Idempotent: a schema canonically equal to an EXISTING version of
        the subject returns that version's id without writing. Otherwise
        the compatibility gate runs against the latest version
        (Confluent's default scope). ``compatibility=None`` resolves the
        mode from registry config (subject → global → BACKWARD);
        passing a mode overrides per call:

        - BACKWARD: new schema can READ data written with the latest
        - FORWARD:  latest can read data written with the new schema
        - FULL:     both
        - NONE:     no check
        - *_TRANSITIVE: same directions, but gated against EVERY prior
          version of the subject, not just the latest (Confluent's
          transitive modes — required when old readers/writers outlive
          several schema bumps, the common state of a large estate)
        """
        if compatibility is None:
            compatibility = self.get_compatibility(subject)
        if compatibility not in _COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {compatibility!r}")
        refs = [
            {
                "name": r["name"], "subject": r["subject"],
                "version": (
                    int(r["version"])
                    if r.get("version", -1) not in (-1, None)
                    else (self.versions(r["subject"]) or [0])[-1]
                ),
            }
            for r in (references or [])
        ]
        for r in refs:  # every referenced version must exist (raises)
            self.get_version(r["subject"], r["version"])
        canon = _canonical(schema)
        for v in reversed(self.versions(subject)):
            sid, existing = self.get_version(subject, v)
            if _canonical(existing) == canon and self.references(sid) == refs:
                return sid
        new_resolved = self.resolved_schema(schema, refs)
        vs = self.versions(subject)
        if vs and compatibility != "NONE":
            base = compatibility.replace("_TRANSITIVE", "")
            scope = vs if compatibility.endswith("_TRANSITIVE") else vs[-1:]
            problems = []
            for v in scope:
                psid, prior = self.get_version(subject, v)
                prior_resolved = self.resolved_schema(
                    prior, self.references(psid)
                )
                if base in ("BACKWARD", "FULL"):
                    problems += [
                        f"BACKWARD vs v{v}: {p}"
                        for p in can_read(prior_resolved, new_resolved)
                    ]
                if base in ("FORWARD", "FULL"):
                    problems += [
                        f"FORWARD vs v{v}: {p}"
                        for p in can_read(new_resolved, prior_resolved)
                    ]
            if problems:
                raise ValueError(
                    f"schema incompatible with {subject} "
                    f"({compatibility}): " + "; ".join(problems)
                )
        sid = self._allocate_id(schema, refs)
        sdir = self._subject_dir(subject)
        os.makedirs(sdir, exist_ok=True)
        # version numbers never rewind: soft-deleted versions still block
        # their slot (Confluent's numbering across deletes). The version
        # file is published with link(x) — an os.replace would silently
        # OVERWRITE a concurrent registrar's same-numbered version,
        # losing its registration; on collision re-list and take the
        # next number (same claim protocol as _publish_segment).
        version = max(vs + self.deleted_versions(subject) + [0]) + 1
        tmp = os.path.join(sdir, f".tmp-{_uuid_mod.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(str(sid))
        try:
            while True:
                try:
                    os.link(tmp, os.path.join(sdir, str(version)))
                    break
                except FileExistsError:
                    version = max(
                        self.versions(subject)
                        + self.deleted_versions(subject) + [version]
                    ) + 1
        finally:
            os.unlink(tmp)
        return sid

    def _allocate_id(self, schema: str, refs: list[dict] | None = None) -> int:
        """Monotonic global id; O_EXCL create arbitrates concurrent
        registrars (same canonical schema under another subject still gets
        a fresh id — Confluent shares ids across subjects, we keep the
        simpler per-registration allocation and dedup within subjects).
        References are part of a schema's identity: same text with
        different references is a DIFFERENT schema (its resolved closure
        differs), so dedup compares both."""
        refs = refs or []
        ids_dir = self._ids_dir()
        os.makedirs(ids_dir, exist_ok=True)
        text = schema if isinstance(schema, str) else json.dumps(schema)
        # reuse an existing id when the exact canonical schema is already
        # stored (cross-subject dedup, like Confluent's global id space)
        canon = _canonical(text)
        existing = sorted(
            int(f[:-5]) for f in os.listdir(ids_dir) if f.endswith(".avsc")
        )
        for sid in existing:
            if _canonical(self.get_by_id(sid)) == canon \
                    and self.references(sid) == refs:
                return sid
        sid = (existing[-1] + 1) if existing else 1
        while True:
            path = os.path.join(ids_dir, f"{sid}.avsc")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                sid += 1  # concurrent registrar claimed it; take the next
                continue
            if refs:
                # sidecar BEFORE the body lands under the claimed name is
                # not possible (the claim IS the body file), so write it
                # immediately after — readers treat a missing sidecar as
                # "no references", and the id is not yet published to any
                # subject version at this point
                with open(os.path.join(ids_dir, f"{sid}.refs.json"), "w",
                          encoding="utf-8") as f:
                    json.dump(refs, f, sort_keys=True)
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(text)
            return sid


# ------------------------------------------------------------- column API


def to_avro_confluent(col, schema: str, schema_id: int):
    """struct column → Confluent-framed Avro binary (magic + id + body)."""
    from pyspark.sql.functions import pandas_udf

    from rdkafka_streams_spark.streaming.avro_codec import _pyify

    parsed = parse_schema(schema)
    sid = int(schema_id)

    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        if isinstance(s, pd.DataFrame):
            rows = s.to_dict("records")
            return pd.Series(
                [frame(sid, encode_value(_pyify(r), parsed)) for r in rows],
                dtype=object,
            )
        return s.map(
            lambda v: None if (w := _pyify(v)) is None
            else frame(sid, encode_value(w, parsed))
        )

    return _enc(col)


def from_avro_confluent(col, registry_root: str, reader_schema: str,
                        reader_references: list[dict] | None = None):
    """Confluent-framed binary column → typed column: unframe, resolve the
    WRITER schema by id from the registry directory (per-executor cache,
    reference closure inlined), decode with schema resolution against
    ``reader_schema``. The column type is the reader's — old records
    surface reader-only fields from defaults, new records drop fields the
    reader doesn't know. ``reader_references`` lets the reader schema
    itself compose registered types across subjects (resolved once,
    driver-side, at plan time)."""
    from pyspark.sql.functions import pandas_udf

    reader = SchemaRegistry(registry_root).resolved_schema(
        reader_schema, reader_references
    ) if reader_references else parse_schema(reader_schema)
    ddl = avro_to_spark_ddl(reader)
    is_record = isinstance(reader, dict) and reader.get("type") == "record"
    root = registry_root

    @pandas_udf(ddl)
    def _dec(s: pd.Series) -> pd.Series:
        reg = SchemaRegistry(root)
        writers: dict[int, Any] = {}

        def one(b):
            if b is None:
                return None
            sid, body = unframe(bytes(b))
            w = writers.get(sid)
            if w is None:
                w = writers[sid] = reg.get_by_id_resolved(sid)
            return resolve_read(body, w, reader)[0]

        vals = [one(b) for b in s]
        if is_record:
            cols = [f["name"] for f in reader["fields"]]
            return pd.DataFrame(
                [v if v is not None else dict.fromkeys(cols) for v in vals],
                columns=cols,
            )
        return pd.Series(vals, dtype=object)

    return _dec(col)
