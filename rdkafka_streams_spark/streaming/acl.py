"""ACL authorizer for the topiclog transport — the ``kafka-acls.sh`` /
``StandardAuthorizer`` analog (KIP-11 semantics), the one ``kafka-*.sh``
admin family the repo's Kafka estate was still missing.

The reference exposes raw librdkafka client config
(`/root/reference/src/Consumer.coffee:21-27`) whose production estates
invariably run under broker-side ACLs: a principal (``User:alice``) is
allowed or denied an OPERATION (READ/WRITE/CREATE/...) on a RESOURCE
(topic/group/cluster/transactional-id) matched by a LITERAL or PREFIXED
pattern (KIP-290), with Kafka's exact evaluation order:

1. **No authorizer configured** (no ``<root>/.acls`` directory) →
   everything is allowed, like a broker without ``authorizer.class.name``.
2. **Super users** (``.acls/super.users``, one principal per line) are
   always allowed, before any binding is consulted.
3. **DENY beats ALLOW**: any matching DENY binding refuses the action no
   matter what ALLOW bindings exist.
4. Otherwise any matching ALLOW binding (including the ``*`` wildcard
   principal / resource) permits.
5. Nothing matched → the default is deny, unless
   ``.acls/config.json`` sets ``allow.everyone.if.no.acl.found`` true
   (the broker flag of the same name).

Operation implication follows the broker: an ALLOW for READ, WRITE,
DELETE or ALTER implies DESCRIBE; ALLOW ALTER_CONFIGS implies
DESCRIBE_CONFIGS; ALL implies everything.  DENY bindings match only
their exact operation or ALL (Kafka's implication is allow-side only).

Storage is one file per binding under ``.acls/bindings/`` whose name is
the sha256 of the canonical binding JSON — add is an ``O_EXCL`` create
(idempotent, race-free on a shared FS, the repo's claim idiom), remove
is an unlink, and the store size is O(bindings): authorization reads
are metadata-only and never touch record data, so enforcement costs
the same at 100 TB as at 100 KB.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass

OPERATIONS = frozenset({
    "READ", "WRITE", "CREATE", "DELETE", "ALTER", "DESCRIBE",
    "ALTER_CONFIGS", "DESCRIBE_CONFIGS", "CLUSTER_ACTION",
    "IDEMPOTENT_WRITE", "ALL",
})
RESOURCE_TYPES = frozenset({"topic", "group", "cluster", "transactional_id"})
PATTERN_TYPES = frozenset({"literal", "prefixed"})
#: allow-side implication (broker rule): granting the left grants DESCRIBE
_IMPLIES_DESCRIBE = frozenset({"READ", "WRITE", "DELETE", "ALTER"})


class AuthorizationError(PermissionError):
    """Raised when a principal is denied — the client would see Kafka's
    TOPIC_AUTHORIZATION_FAILED / GROUP_AUTHORIZATION_FAILED family."""


@dataclass(frozen=True)
class AclBinding:
    """One row of ``kafka-acls.sh --list``: (pattern, principal, op, type)."""

    resource_type: str   # topic | group | cluster | transactional_id
    resource_name: str   # name, prefix, or "*" (cluster uses "kafka-cluster")
    pattern_type: str    # literal | prefixed
    principal: str       # "User:alice" or "User:*"
    operation: str       # READ | WRITE | ... | ALL
    permission: str      # allow | deny
    host: str = "*"      # kept for CLI parity; this transport has no peers

    def __post_init__(self):
        if self.resource_type not in RESOURCE_TYPES:
            raise ValueError(f"unknown resource type {self.resource_type!r}")
        if self.pattern_type not in PATTERN_TYPES:
            raise ValueError(f"unknown pattern type {self.pattern_type!r}")
        if self.operation not in OPERATIONS:
            raise ValueError(f"unknown operation {self.operation!r}")
        if self.permission not in ("allow", "deny"):
            raise ValueError(f"permission must be allow|deny, got {self.permission!r}")
        if ":" not in self.principal:
            raise ValueError(
                f"principal must be '<type>:<name>' (e.g. 'User:alice'), "
                f"got {self.principal!r}"
            )
        if self.pattern_type == "prefixed" and self.resource_name == "*":
            raise ValueError("'*' is a LITERAL wildcard, not a prefix")

    def _key(self) -> str:
        canon = json.dumps(asdict(self), sort_keys=True)
        return hashlib.sha256(canon.encode()).hexdigest()

    def _matches_resource(self, rtype: str, rname: str) -> bool:
        if self.resource_type != rtype:
            return False
        if self.pattern_type == "literal":
            return self.resource_name in ("*", rname)
        return rname.startswith(self.resource_name)

    def _matches_principal(self, principal: str) -> bool:
        if self.principal == principal:
            return True
        ptype, _, _ = self.principal.partition(":")
        return self.principal == f"{ptype}:*" and principal.startswith(ptype + ":")

    def _matches_operation(self, op: str) -> bool:
        if self.operation == "ALL" or self.operation == op:
            return True
        if self.permission != "allow":
            return False  # deny-side: exact or ALL only (broker rule)
        if op == "DESCRIBE" and self.operation in _IMPLIES_DESCRIBE:
            return True
        return op == "DESCRIBE_CONFIGS" and self.operation == "ALTER_CONFIGS"


#: {bindings_dir: (dir_mtime_ns, parsed bindings, loaded_monotonic)}
_BINDINGS_CACHE: dict[str, tuple[int, list["AclBinding"], float]] = {}


class AclStore:
    """File-backed binding store + authorizer for one log root."""

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, ".acls")
        self.bindings_dir = os.path.join(self.dir, "bindings")

    # -- admin (kafka-acls.sh --add / --remove / --list) --------------------

    def enabled(self) -> bool:
        """An authorizer is 'configured' once ``.acls/`` exists — before
        that, like a broker without authorizer.class.name, all allowed."""
        return os.path.isdir(self.dir)

    def enable(self) -> None:
        os.makedirs(self.bindings_dir, exist_ok=True)

    def add(self, binding: AclBinding) -> bool:
        """Idempotent O_EXCL create; True if newly added."""
        self.enable()
        path = os.path.join(self.bindings_dir, binding._key() + ".json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(asdict(binding), f, sort_keys=True)
        _BINDINGS_CACHE.pop(self.bindings_dir, None)
        return True

    def remove(self, binding: AclBinding) -> bool:
        path = os.path.join(self.bindings_dir, binding._key() + ".json")
        try:
            os.unlink(path)
            _BINDINGS_CACHE.pop(self.bindings_dir, None)
            return True
        except FileNotFoundError:
            return False

    def list(self) -> list[AclBinding]:
        """Parsed bindings, cached on the directory's mtime: produce-path
        callers authorize per call, and re-opening every binding file
        each time would be O(bindings) I/O per produce — the cache makes
        repeat authorization a single stat() while adds/removes (which
        bump the directory mtime) still invalidate immediately."""
        if not os.path.isdir(self.bindings_dir):
            return []
        try:
            mtime = os.stat(self.bindings_dir).st_mtime_ns
        except OSError:
            return []
        cached = _BINDINGS_CACHE.get(self.bindings_dir)
        # mtime equality alone can miss a cross-process add/remove landing
        # within the same coarse-clock tick, which for a DENY binding
        # would mean serving a stale allow indefinitely — so cache hits
        # also expire after 1 s (staleness strictly bounded; in-process
        # add/remove still invalidates instantly via the explicit pop)
        if (
            cached is not None and cached[0] == mtime
            and time.monotonic() - cached[2] < 1.0
        ):
            return cached[1]
        out = []
        for name in sorted(os.listdir(self.bindings_dir)):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.bindings_dir, name),
                          encoding="utf-8") as f:
                    out.append(AclBinding(**json.load(f)))
            except (OSError, json.JSONDecodeError, TypeError, ValueError):
                continue
        if len(_BINDINGS_CACHE) > 64:  # one entry per root — bound it
            _BINDINGS_CACHE.pop(next(iter(_BINDINGS_CACHE)))
        _BINDINGS_CACHE[self.bindings_dir] = (mtime, out, time.monotonic())
        return out

    def set_super_users(self, principals: list[str]) -> None:
        self.enable()
        tmp = os.path.join(self.dir, ".tmp-super")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(principals))
        os.replace(tmp, os.path.join(self.dir, "super.users"))

    def super_users(self) -> frozenset[str]:
        path = os.path.join(self.dir, "super.users")
        try:
            with open(path, encoding="utf-8") as f:
                return frozenset(ln.strip() for ln in f if ln.strip())
        except OSError:
            return frozenset()

    def set_allow_everyone_if_no_acl(self, value: bool) -> None:
        self.enable()
        tmp = os.path.join(self.dir, ".tmp-cfg")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"allow.everyone.if.no.acl.found": bool(value)}, f)
        os.replace(tmp, os.path.join(self.dir, "config.json"))

    def _allow_everyone_if_no_acl(self) -> bool:
        try:
            with open(os.path.join(self.dir, "config.json"),
                      encoding="utf-8") as f:
                return bool(json.load(f).get("allow.everyone.if.no.acl.found"))
        except (OSError, json.JSONDecodeError):
            return False

    # -- evaluation (StandardAuthorizer.authorize) --------------------------

    def authorize(
        self, principal: str, operation: str, resource_type: str,
        resource_name: str,
    ) -> bool:
        if operation not in OPERATIONS or operation == "ALL":
            raise ValueError(f"cannot request operation {operation!r}")
        if not self.enabled():
            return True
        if principal in self.super_users():
            return True
        # Kafka's allow.everyone.if.no.acl.found applies only when the
        # RESOURCE has no ACLs AT ALL — a resource with any binding (for
        # whatever principal/operation) is governed, and non-matching
        # requests against it are denied, never world-opened
        on_resource = [
            b for b in self.list()
            if b._matches_resource(resource_type, resource_name)
        ]
        if not on_resource:
            return self._allow_everyone_if_no_acl()
        matched = [
            b for b in on_resource
            if b._matches_principal(principal)
            and b._matches_operation(operation)
        ]
        if any(b.permission == "deny" for b in matched):
            return False
        return any(b.permission == "allow" for b in matched)

    def can_manage(self, principal: str) -> bool:
        """The kafka-acls.sh management gate. An EMPTY store (no bindings,
        no super users) may be bootstrapped by any operator — the broker
        equivalent is the operator configuring super.users in
        server.properties before the authorizer has any state, and
        without this rule the very first management call would lock
        everyone out. The moment ANY binding or super user exists, the
        store is governed: management requires ALTER on the cluster (or
        super-user status). A store holding only resource-level ACLs is
        NOT world-manageable — that would let any principal self-grant
        cluster ALTER (privilege escalation); an operator who skipped
        the bootstrap grant administers out-of-band (the ``.acls/``
        files themselves), exactly like editing server.properties."""
        if not self.enabled():
            return True
        if not self.list() and not self.super_users():
            return True
        return self.authorize(principal, "ALTER", "cluster", "kafka-cluster")

    def require(
        self, principal: str, operation: str, resource_type: str,
        resource_name: str,
    ) -> None:
        if not self.authorize(principal, operation, resource_type,
                              resource_name):
            raise AuthorizationError(
                f"principal {principal!r} is not authorized for {operation} "
                f"on {resource_type}:{resource_name!r} "
                f"({resource_type.upper()}_AUTHORIZATION_FAILED)"
            )
