#!/usr/bin/env python3
"""Operator CLI for the topiclog transport — the ``kafka-topics.sh`` /
``kafka-consumer-groups.sh`` / ``kafka-configs.sh`` analog, one flat tool.

Everything is a thin argparse veneer over ``TopicLog`` admin methods (the
semantics, fencing, and crash-safety live there and are unit-tested); the
CLI exists so an operator can drive a log root without writing Python.
Output is one JSON document on stdout — composable with jq, stable for
scripts.

    python scripts/topiclog_admin.py --root /data/bus topics
    python scripts/topiclog_admin.py --root /data/bus describe-topic ev
    python scripts/topiclog_admin.py --root /data/bus alter-config ev \
        retention.ms=86400000 compression.type=gzip
    python scripts/topiclog_admin.py --root /data/bus groups
    python scripts/topiclog_admin.py --root /data/bus describe-group etl
    python scripts/topiclog_admin.py --root /data/bus reset-offsets etl ev \
        --to earliest
    python scripts/topiclog_admin.py --root /data/bus lag etl ev
    python scripts/topiclog_admin.py --root /data/bus offsets-for-times ev \
        --timestamp 1700000000000
    python scripts/topiclog_admin.py --root /data/bus verify-log ev
    python scripts/topiclog_admin.py --root /data/bus run-retention
    python scripts/topiclog_admin.py --root /data/bus list-transactions \
        --state open --older-than-ms 600000
    python scripts/topiclog_admin.py --root /data/bus abort-transaction \
        etl-pipeline --min-age-ms 600000
    python scripts/topiclog_admin.py --root /data/bus reset-share-offsets \
        payout ev --to earliest
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_kv(pairs: list[str]) -> dict:
    out: dict = {}
    for kv in pairs:
        if "=" not in kv:
            raise SystemExit(f"expected key=value, got {kv!r}")
        k, v = kv.split("=", 1)
        out[k] = None if v in ("", "null", "none") else v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="topiclog-admin", description=__doc__)
    ap.add_argument("--root", required=True, help="log root directory")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("topics", help="list topics")
    p = sub.add_parser("create-topic", help="create a topic")
    p.add_argument("topic")
    p.add_argument("--partitions", type=int, default=1)
    p = sub.add_parser("delete-topic", help="delete a topic (and its tiers)")
    p.add_argument("topic")
    p = sub.add_parser("describe-topic", help="per-partition start/end/bytes")
    p.add_argument("topic")
    p = sub.add_parser("describe-log-dirs", help="on-disk size per partition")
    p.add_argument("topic", nargs="?")
    p = sub.add_parser("describe-configs", help="explicitly-set topic configs")
    p.add_argument("topic")
    p = sub.add_parser("alter-config",
                       help="merge key=value configs ('' / none deletes)")
    p.add_argument("topic")
    p.add_argument("configs", nargs="+", metavar="key=value")
    p = sub.add_parser("create-partitions", help="grow partition count")
    p.add_argument("topic")
    p.add_argument("total", type=int)

    sub.add_parser("groups", help="list consumer groups")
    p = sub.add_parser("describe-group", help="offsets + lag per partition")
    p.add_argument("group")
    p = sub.add_parser("delete-group",
                       help="drop an EMPTY group (GROUP_NOT_EMPTY otherwise)")
    p.add_argument("group")
    p = sub.add_parser("lag", help="end/committed/lag per partition")
    p.add_argument("group")
    p.add_argument("topic")
    p = sub.add_parser("reset-offsets",
                       help="--to earliest|latest|<epoch-ms> or --shift-by N")
    p.add_argument("group")
    p.add_argument("topic")
    p.add_argument("--to", default=None)
    p.add_argument("--shift-by", type=int, default=None)
    p = sub.add_parser("expire-members",
                       help="evict members past session.timeout.ms")
    p.add_argument("group")
    p.add_argument("--session-timeout-ms", type=int, required=True)
    p = sub.add_parser("remove-member", help="admin removal of a static member")
    p.add_argument("group")
    p.add_argument("instance_id")

    p = sub.add_parser("offsets-for-times", help="earliest offset with ts>=T")
    p.add_argument("topic")
    p.add_argument("--timestamp", type=int, required=True)
    p = sub.add_parser("max-timestamp",
                       help="newest data record by CreateTime per partition")
    p.add_argument("topic")
    p = sub.add_parser("verify-log", help="integrity audit across both tiers")
    p.add_argument("topic")
    p = sub.add_parser("run-retention",
                       help="one log-cleaner sweep (retention/tiering/compact)")
    p.add_argument("topic", nargs="?")
    p = sub.add_parser("tier-segments",
                       help="move closed segments past local retention remote")
    p.add_argument("topic")
    p = sub.add_parser("compact", help="keyed compaction (txn-aware)")
    p.add_argument("topic")
    p = sub.add_parser("quotas", help="describe client quotas")
    p = sub.add_parser("alter-quota", help="set client quota keys")
    p.add_argument("client_id")
    p.add_argument("configs", nargs="+", metavar="key=value")
    sub.add_parser("share-groups", help="list share groups")
    p = sub.add_parser(
        "describe-share-group",
        help="kafka-share-groups.sh --describe analog: per-partition "
             "SPSO/SPEO, in-flight locks, redelivery backlog, lag",
    )
    p.add_argument("group")
    p.add_argument("topic")
    p = sub.add_parser(
        "reset-share-offsets",
        help="kafka-share-groups.sh --reset-offsets analog: move SPSO to "
             "earliest/latest or an absolute offset (refused under live "
             "locks; rewinds replay with fresh delivery counts)",
    )
    p.add_argument("group")
    p.add_argument("topic")
    p.add_argument("--to", required=True,
                   help="'earliest', 'latest', or an absolute offset "
                        "applied to every partition")
    p = sub.add_parser(
        "gc-share-epochs",
        help="reap dead coordinator-epoch markers for a (group, topic) — "
             "the OFFLINE admin op (never the claim path: r13 audit, "
             "MARKERS.md family 1); publishes the monotonic floor first, "
             "so a reaped epoch is never re-claimable",
    )
    p.add_argument("group")
    p.add_argument("topic")
    p = sub.add_parser(
        "list-transactions",
        help="kafka-transactions.sh list analog (KIP-664): every "
             "transactional id with state, age, touched partitions; "
             "--older-than-ms is the hung-transaction duration filter",
    )
    p.add_argument("--state", choices=["open", "commit", "abort"])
    p.add_argument("--older-than-ms", type=int, default=None,
                   help="only OPEN transactions at least this old")
    p = sub.add_parser(
        "describe-transaction",
        help="kafka-transactions.sh describe analog: outcome, touched "
             "partitions, LSO floors held down, staged EOS offsets",
    )
    p.add_argument("txn_id")
    p = sub.add_parser(
        "abort-transaction",
        help="kafka-transactions.sh abort analog: operator-forced abort "
             "of a HUNG open transaction (unwedges read_committed "
             "consumers and share-fetch); requires CLUSTER_ACTION",
    )
    p.add_argument("txn_id")
    p.add_argument("--min-age-ms", type=int, default=0,
                   help="refuse unless the txn is at least this old "
                        "(safety interlock against live producers)")
    p = sub.add_parser(
        "acls",
        help="kafka-acls.sh analog: list/add/remove principal × operation "
        "× resource-pattern bindings (deny beats allow; literal + "
        "prefixed patterns; User:* wildcard)",
    )
    g = p.add_mutually_exclusive_group()
    g.add_argument("--add", action="store_true")
    g.add_argument("--remove", action="store_true")
    p.add_argument("--allow-principal", metavar="User:NAME")
    p.add_argument("--deny-principal", metavar="User:NAME")
    p.add_argument("--operation", default="ALL",
                   help="READ|WRITE|CREATE|DELETE|ALTER|DESCRIBE|"
                        "ALTER_CONFIGS|DESCRIBE_CONFIGS|CLUSTER_ACTION|"
                        "IDEMPOTENT_WRITE|ALL")
    r = p.add_mutually_exclusive_group()
    r.add_argument("--topic")
    r.add_argument("--group")
    r.add_argument("--cluster", action="store_true")
    r.add_argument("--transactional-id", dest="txn_id")
    p.add_argument("--resource-pattern-type", default="literal",
                   choices=["literal", "prefixed"])
    p.add_argument("--super-users", nargs="*", metavar="User:NAME",
                   help="replace the super.users list")
    p.add_argument("--allow-everyone-if-no-acl",
                   choices=["true", "false"],
                   help="set the broker flag of the same name")

    ap.add_argument(
        "--principal", default="User:ANONYMOUS",
        help="identity admin operations run as (checked against the "
             "root's ACL store when one exists)",
    )
    a = ap.parse_args(argv)
    from rdkafka_streams_spark.streaming.topiclog import TopicLog

    log = TopicLog(a.root, a.principal)
    if a.cmd == "topics":
        out = log.topics()
    elif a.cmd == "create-topic":
        log.create_topic(a.topic, partitions=a.partitions)
        out = {"created": a.topic, "partitions": a.partitions}
    elif a.cmd == "delete-topic":
        log.delete_topic(a.topic)
        out = {"deleted": a.topic}
    elif a.cmd == "describe-topic":
        out = log.describe_topic(a.topic)
    elif a.cmd == "describe-log-dirs":
        out = log.describe_log_dirs(a.topic)
    elif a.cmd == "describe-configs":
        out = log.describe_configs(a.topic)
    elif a.cmd == "alter-config":
        out = log.alter_configs(a.topic, _parse_kv(a.configs))
    elif a.cmd == "create-partitions":
        log.create_partitions(a.topic, a.total)
        out = {"topic": a.topic, "partitions": a.total}
    elif a.cmd == "groups":
        out = log.groups()
    elif a.cmd == "describe-group":
        out = log.describe_group(a.group)
    elif a.cmd == "delete-group":
        out = {"deleted": a.group, "topics": log.delete_group(a.group)}
    elif a.cmd == "lag":
        out = log.consumer_lag(a.group, a.topic)
    elif a.cmd == "reset-offsets":
        if a.shift_by is not None and a.to is not None:
            # mirror TopicLog.reset_offsets (and the real tool): two reset
            # specs are contradictory, never silently pick one
            raise SystemExit("reset-offsets: --to and --shift-by are "
                             "mutually exclusive")
        if a.shift_by is not None:
            out = log.reset_offsets(a.group, a.topic, shift_by=a.shift_by)
        elif a.to is None:
            raise SystemExit("reset-offsets needs --to or --shift-by")
        else:
            to = int(a.to) if a.to.lstrip("-").isdigit() else a.to
            out = log.reset_offsets(a.group, a.topic, to=to)
    elif a.cmd == "expire-members":
        out = log.expire_members(a.group, a.session_timeout_ms)
    elif a.cmd == "remove-member":
        out = log.remove_member(a.group, a.instance_id)
    elif a.cmd == "offsets-for-times":
        out = log.offsets_for_times(a.topic, a.timestamp)
    elif a.cmd == "max-timestamp":
        out = log.offsets_for_max_timestamp(a.topic)
    elif a.cmd == "verify-log":
        out = log.verify_log(a.topic)
        bad = sum(len(v["issues"]) for v in out.values())
        print(json.dumps(out, indent=1, sort_keys=True))
        return 1 if bad else 0
    elif a.cmd == "run-retention":
        out = log.run_retention(a.topic)
    elif a.cmd == "tier-segments":
        out = log.tier_segments(a.topic)
    elif a.cmd == "compact":
        out = log.compact(a.topic)
    elif a.cmd == "list-transactions":
        out = log.list_transactions(
            state=a.state, older_than_ms=a.older_than_ms
        )
    elif a.cmd == "describe-transaction":
        out = log.describe_transaction(a.txn_id)
    elif a.cmd == "abort-transaction":
        out = log.force_abort_txn(a.txn_id, min_age_ms=a.min_age_ms)
    elif a.cmd == "quotas":
        out = log.describe_client_quotas()
    elif a.cmd == "share-groups":
        d = os.path.join(a.root, ".share_groups")
        out = sorted(
            g for g in os.listdir(d)
            if os.path.isdir(os.path.join(d, g))
        ) if os.path.isdir(d) else []
    elif a.cmd == "describe-share-group":
        from rdkafka_streams_spark.streaming.sharegroups import ShareGroup

        out = ShareGroup(a.root, a.group, a.principal).describe(a.topic)
    elif a.cmd == "reset-share-offsets":
        from rdkafka_streams_spark.streaming.sharegroups import ShareGroup

        sg = ShareGroup(a.root, a.group, a.principal)
        if a.to in ("earliest", "latest"):
            out = sg.reset(a.topic, a.to)
        else:
            parts = TopicLog(a.root).partitions(a.topic)
            out = sg.reset(a.topic, {p: int(a.to) for p in parts})
    elif a.cmd == "gc-share-epochs":
        from rdkafka_streams_spark.streaming.sharegroups import ShareGroup

        sg = ShareGroup(a.root, a.group, a.principal)
        out = {"reaped": sg.gc_epoch_markers(a.topic)}
    elif a.cmd == "acls":
        from dataclasses import asdict

        from rdkafka_streams_spark.streaming.acl import (
            AclBinding,
            AclStore,
            AuthorizationError,
        )

        store = AclStore(a.root)
        # managing ACLs is itself an authorized op (ALTER on the cluster)
        # once an admin authority exists; an unadministered store may be
        # bootstrapped by any operator (see AclStore.can_manage)
        if a.add or a.remove or a.super_users is not None \
                or a.allow_everyone_if_no_acl is not None:
            if not store.can_manage(a.principal):
                raise AuthorizationError(
                    f"principal {a.principal!r} is not authorized for "
                    "ALTER on cluster:'kafka-cluster' "
                    "(CLUSTER_AUTHORIZATION_FAILED)"
                )
        if a.super_users is not None:
            store.set_super_users(a.super_users)
        if a.allow_everyone_if_no_acl is not None:
            store.set_allow_everyone_if_no_acl(
                a.allow_everyone_if_no_acl == "true"
            )
        if a.add or a.remove:
            principal = a.allow_principal or a.deny_principal
            if not principal or (a.allow_principal and a.deny_principal):
                raise SystemExit(
                    "--add/--remove need exactly one of --allow-principal "
                    "or --deny-principal"
                )
            if a.cluster:
                rtype, rname = "cluster", "kafka-cluster"
            elif a.group:
                rtype, rname = "group", a.group
            elif a.txn_id:
                rtype, rname = "transactional_id", a.txn_id
            elif a.topic:
                rtype, rname = "topic", a.topic
            else:
                raise SystemExit(
                    "--add/--remove need --topic/--group/--cluster/"
                    "--transactional-id"
                )
            binding = AclBinding(
                resource_type=rtype, resource_name=rname,
                pattern_type=a.resource_pattern_type, principal=principal,
                operation=a.operation,
                permission="allow" if a.allow_principal else "deny",
            )
            changed = store.add(binding) if a.add else store.remove(binding)
            out = {"changed": changed, "binding": asdict(binding)}
        else:
            out = [asdict(b) for b in store.list()]
    elif a.cmd == "alter-quota":
        out = log.alter_client_quotas(
            a.client_id,
            {k: (None if v is None else int(v))
             for k, v in _parse_kv(a.configs).items()},
        )
    else:  # pragma: no cover - argparse enforces the choices
        raise SystemExit(f"unknown command {a.cmd}")
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
