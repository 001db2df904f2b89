"""Share groups over the topiclog transport — the KIP-932 "Queues for
Kafka" analog (Kafka 4.0's second consumption model).

The reference's Consumer (`/root/reference/src/Consumer.coffee`) is a
classic consumer-group client: partitions are OWNED by one member and
progress is one committed offset per partition.  Share groups are the
queue-shaped alternative shipping in modern Kafka: every member may
consume from EVERY partition, records are handed out under short
acquisition locks, acknowledged individually, re-delivered when a lock
expires or the member releases them, and archived after too many
delivery attempts — work-queue semantics with per-record state instead
of a single watermark.

Per-record states follow KIP-932: **Available** (deliverable — fresh,
released, or lock-expired), **Acquired** (locked by a member until
``lock_ms`` passes), **Acknowledged** (done), **Archived** (rejected or
over the delivery-attempt limit; never delivered again).  The
share-partition start/end offsets (SPSO/SPEO) bound the live window,
and the coordinator state is **O(in-flight + out-of-order gap)** — the
acknowledged prefix collapses into SPSO, so state NEVER grows with
consumed history: the same boundedness story as the broker's share
coordinator, and the property that makes the model safe at 100 TB.

Config keys (topic-level via ``alter_configs`` naming kept here as
constructor args, matching KIP-932's group configs):
``group.share.delivery.attempt.limit`` (default 5),
``group.share.record.lock.duration.ms`` (default 30 000),
``group.share.partition.max.record.locks`` (default 200).

Determinism: every time-dependent API takes ``now_ms`` so tests and
oracle queries replay identically.  All state mutations are atomic
(tmp + ``os.replace``) and the single-writer rule is ENFORCED, not
assumed: each instance claims a per-(group, topic) coordinator epoch
(O_EXCL marker protocol, same as producer fencing) at its first
mutating operation, and a superseded coordinator raises
``FencedShareCoordinatorError`` instead of last-writer-wins
overwriting per-record state — the broker's share coordinator is a
single writer per share-partition for the same reason. One lock-free
residue remains (documented at ``_save``): a coordinator fenced
between its pre-write check and ``os.replace`` can land one stale
write, which the post-replace re-check surfaces as FENCED instead of
letting it pass silently; the new coordinator's next save supersedes
the stale bytes.

ACLs: fetch/ack/release/reject require READ on the group AND the topic
(share groups reuse the consumer ACL model in KIP-932).
"""

from __future__ import annotations

import fcntl
import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field

from rdkafka_streams_spark.streaming.topiclog import (
    TopicLog,
    _check_name,
    _read_range,
)

_STATES = ("available", "acquired", "acknowledged", "archived")


class InvalidRecordStateError(ValueError):
    """KIP-932 INVALID_RECORD_STATE: ack/release/reject of a record the
    member does not currently hold (never acquired, lock expired and
    re-dispensed, or already finalized)."""


class FencedShareCoordinatorError(RuntimeError):
    """This coordinator's epoch for a (group, topic) share-partition state
    has been superseded — another ``ShareGroup`` instance (a second
    drainer, a ``reset-share-offsets`` CLI run) claimed a newer epoch
    since. The stale coordinator must NOT write: a last-writer-wins
    overwrite would silently resurrect released locks, lose acks (double
    delivery past the attempt-limit accounting), or un-archive poison
    records. Mirrors the broker's single-writer share coordinator and
    this repo's producer-epoch fence (``ProducerFencedError``)."""


@dataclass
class ShareGroup:
    """Coordinator + client surface for one share group on one log root."""

    root: str
    group: str
    principal: str = "User:ANONYMOUS"
    delivery_attempt_limit: int = 5
    lock_duration_ms: int = 30_000
    max_record_locks: int = 200
    #: "read_uncommitted" (default) or "read_committed"
    isolation: str = "read_uncommitted"
    _log: TopicLog = field(init=False, repr=False)
    #: fetch-session cache (KIP-227's idea, client-side): {(topic, pid):
    #: {"next", "end", "it"}} — a sequential drain resumes the open
    #: segment iterator instead of re-parsing the segment from its start
    #: on every fetch, turning an O(n²) drain into O(n). Reused only
    #: when the fetch pointer AND the frozen end both still match;
    #: anything else (new appends, reset, another coordinator writing
    #: the state) rebuilds from a fresh scan.
    _sessions: dict = field(init=False, default_factory=dict, repr=False)
    #: bounded client-side cache of recently delivered rows keyed by
    #: (topic, pid, offset): a released/expired record is usually
    #: re-dispensed shortly after its first delivery, and serving the
    #: redelivery from memory avoids re-parsing the segment below it
    #: (the broker reads from its page cache for the same reason).
    #: Capacity-bounded FIFO; misses fall back to the coalesced scan.
    _recent: dict = field(init=False, default_factory=dict, repr=False)
    recent_cache_records: int = 50_000
    #: {topic: coordinator epoch claimed by THIS instance} — claimed
    #: lazily at the first mutating operation per topic (read-only admin
    #: like describe/state_size never fences a running drainer).
    _epochs: dict = field(init=False, default_factory=dict, repr=False)

    def __post_init__(self):
        if self.delivery_attempt_limit < 1:
            raise ValueError("delivery_attempt_limit must be >= 1")
        _check_name(self.group, "group")  # becomes a path component below
        self._log = TopicLog(self.root, self.principal)

    # -- state plumbing ------------------------------------------------------

    def _state_path(self, topic: str) -> str:
        # NOT under .groups/<group>/: the consumer-offset machinery
        # (expire_group_offsets' grandfathering + reaping, delete_group's
        # topic listing) treats every *.json there as a commit file and
        # would stamp __meta into — then delete — the share state. Share
        # coordination is its own subsystem with its own lifecycle, like
        # the broker's share coordinator vs the group coordinator.
        _check_name(topic, "topic")  # same traversal rule as _group_file
        return os.path.join(
            self.root, ".share_groups", self.group, f"{topic}.json"
        )

    def _epoch_marker_re(self, topic: str):
        return re.compile(re.escape(f".{topic}.epoch-") + r"(\d+)$")

    def _published_epochs(self, topic: str) -> list[int]:
        gdir = os.path.dirname(self._state_path(topic))
        pat = self._epoch_marker_re(topic)
        try:
            names = os.listdir(gdir)
        except FileNotFoundError:
            return []
        return [int(m.group(1)) for n in names if (m := pat.match(n))]

    def _floor_path(self, topic: str) -> str:
        return os.path.join(
            os.path.dirname(self._state_path(topic)), f".{topic}.floor"
        )

    def _read_floor(self, topic: str) -> int:
        """Highest epoch ever GC'd for this (group, topic) — every live
        claim must be strictly above it.  -1 when no GC has ever run."""
        try:
            with open(self._floor_path(topic), encoding="utf-8") as f:
                return int(f.read().strip() or -1)
        except FileNotFoundError:
            return -1

    def _claim_coordinator(self, topic: str) -> int:
        """Claim the next coordinator epoch for (group, topic): the O_EXCL
        creation of marker ``.{topic}.epoch-{n}`` IS the publication —
        there is no separate mutable record to regress, so the dual-
        unfenced publish-ordering race of a claim-then-publish protocol
        (review r10 on the first draft, and the documented residue in
        ``init_producer_id``) is closed by construction: markers are
        never overwritten and the CLAIM PATH NEVER DELETES them.

        The r12 review found the previous in-claim dead-marker GC unsound:
        unlinking epoch markers makes a claimed epoch re-claimable (A
        claims 2; C claims 3 and GC-unlinks 2; B — which read max=1 before
        A's claim — O_EXCLs the now-deleted marker 2 and SUCCEEDS), i.e.
        two coordinators at one epoch.  The invariant is therefore:
        **deleted ⇒ never re-claimable**, enforced two ways —

        1. the claim path performs NO deletion at all (markers are
           zero-byte; accumulation is one inode per coordinator claim,
           bounded by claims, not by data); and
        2. the only deleter, :meth:`gc_epoch_markers` (an explicit
           offline admin op), first publishes a monotonic **floor** file
           covering everything it will unlink, and every claim starts
           above ``max(markers, floor)`` and RE-CHECKS the floor after
           its O_EXCL succeeds — a claim that lands at-or-below the
           floor is treated as dead (its marker may be a re-creation of
           a GC'd one) and retried above, the commit-record re-check
           pattern ``init_producer_id`` uses (``topiclog.py``)."""
        gdir = os.path.dirname(self._state_path(topic))
        os.makedirs(gdir, exist_ok=True)
        epoch = max(
            max(self._published_epochs(topic), default=-1),
            self._read_floor(topic),
        ) + 1
        while True:
            try:
                fd = os.open(
                    os.path.join(gdir, f".{topic}.epoch-{epoch}"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
            except FileExistsError:
                epoch += 1
                continue
            # the claim succeeded — but if a concurrent gc_epoch_markers
            # raised the floor to/above our epoch, our marker may be a
            # re-creation of a GC'd one: retry strictly above the floor.
            # (The dead low marker left behind is harmless: it is <= the
            # floor, and both claiming and fencing read max(markers,
            # floor), so it can never win or unfence anything.)
            floor = self._read_floor(topic)
            if floor >= epoch:
                epoch = floor + 1
                continue
            break
        return epoch

    def gc_epoch_markers(self, topic: str) -> int:
        """Offline admin op: reap dead coordinator-epoch markers (every
        marker strictly below the current maximum).  NOT called from the
        claim path — see :meth:`_claim_coordinator` for why in-claim GC
        is unsound.  Publishes the monotonic floor file FIRST (atomic
        tmp + ``os.replace``; never regressed — the max of the current
        floor and the new one is written), then unlinks; a crash between
        the two steps leaves extra markers, never a re-claimable epoch.

        Concurrent GC runs SERIALIZE on an ``flock``'d lock file: the
        floor update is a read-modify-write (max in-process, then
        replace), so two unsynchronized GCs could regress the floor
        (the staler writer wins the replace — review r13; safety held
        only because fencing reads max(markers, floor), but MARKERS.md
        §1 states the floor is *only ever raised* and that is now
        enforced, not assumed).  Returns the number of markers reaped."""
        self._log._require("READ", "group", self.group)
        gdir = os.path.dirname(self._state_path(topic))
        os.makedirs(gdir, exist_ok=True)
        fpath = self._floor_path(topic)
        lock_fd = os.open(f"{fpath}.lock", os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            epochs = self._published_epochs(topic)
            if len(epochs) <= 1:
                return 0
            top = max(epochs)
            new_floor = max(self._read_floor(topic), top - 1)
            tmp = f"{fpath}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(new_floor))
            os.replace(tmp, fpath)
            reaped = 0
            for i in epochs:
                # the max always survives, so a scan never regresses
                if i < top:
                    try:
                        os.unlink(os.path.join(gdir, f".{topic}.epoch-{i}"))
                        reaped += 1
                    except OSError:
                        pass
            return reaped
        finally:
            os.close(lock_fd)  # closing releases the flock

    def _ensure_coordinator(self, topic: str) -> None:
        if topic not in self._epochs:
            self._epochs[topic] = self._claim_coordinator(topic)

    def _check_fenced(self, topic: str) -> None:
        # max(markers, floor): the floor covers epochs whose markers an
        # admin GC reaped, so a claim below it is fenced even if every
        # higher marker were somehow gone (deleted ⇒ never re-claimable,
        # and also never un-fenceable).
        cur = max(
            max(self._published_epochs(topic), default=-1),
            self._read_floor(topic),
        )
        if cur > self._epochs[topic]:
            raise FencedShareCoordinatorError(
                f"share-group coordinator for {self.group!r}/{topic!r} "
                f"fenced: this instance holds epoch {self._epochs[topic]}, "
                f"epoch {cur} has since been claimed (another drainer or a "
                "reset-share-offsets run) — FENCED"
            )

    def _load(self, topic: str) -> dict:
        try:
            with open(self._state_path(topic), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {}  # no state yet — the one legitimate empty case
        except json.JSONDecodeError as e:
            # a corrupt state file must fail LOUDLY: silently resetting
            # to {} would rewind SPSO to the log beginning and re-deliver
            # every already-acknowledged record with fresh delivery counts
            raise ValueError(
                f"share-group state {self._state_path(topic)!r} is corrupt "
                f"({e}) — refusing to reset silently; repair or delete it"
            ) from e
        # any other OSError (permissions, I/O) propagates: a transiently
        # unreadable file is NOT an empty group

    def _save(self, topic: str, state: dict) -> None:
        # Check-fence → write → RE-CHECK. The lock-free file protocol has
        # the same narrow residue init_producer_id's _publish documents: a
        # coordinator fenced BETWEEN the pre-check and os.replace still
        # lands its bytes over the new coordinator's state (last-writer-
        # wins inside that window). The post-replace re-check turns the
        # silent overwrite into a loud FENCED error while the stale bytes
        # are at most one os.replace old — the new coordinator (whose
        # epoch marker survives; markers are never deleted at the max)
        # re-publishes its state on its next _save, so the exposure is
        # bounded to the race window instead of persisting unnoticed.
        self._check_fenced(topic)  # a superseded coordinator never writes
        path = self._state_path(topic)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f, sort_keys=True)
        os.replace(tmp, path)
        try:
            self._check_fenced(topic)
        except FencedShareCoordinatorError as e:
            raise FencedShareCoordinatorError(
                f"{e} — and this instance's LAST WRITE raced the fencing "
                f"claim and may have overwritten the new coordinator's "
                f"state at {path!r}; the new coordinator's next save "
                "supersedes it"
            ) from None

    @staticmethod
    def _part_state(state: dict, pid: int, begin: int) -> dict:
        return state.setdefault(str(pid), {
            "spso": begin, "next": begin, "acq": {}, "avail": {},
            "acked": [], "arch": [],
        })

    @staticmethod
    def _advance_spso(ps: dict) -> None:
        """Collapse the acknowledged/archived PREFIX into SPSO — the state
        compaction that keeps the coordinator O(in-flight), not
        O(history)."""
        done = set(ps["acked"]) | set(ps["arch"])
        spso = ps["spso"]
        while spso in done:
            done.discard(spso)
            spso += 1
        # everything below the (possibly advanced) spso is forgotten
        ps["spso"] = spso
        ps["acked"] = sorted(o for o in ps["acked"] if o >= spso)
        ps["arch"] = sorted(o for o in ps["arch"] if o >= spso)

    def _excluded(self):
        if self.isolation == "read_committed":
            return self._log.unresolved_txn_ids()
        return None

    # -- the client surface --------------------------------------------------

    def fetch(
        self,
        topic: str,
        member: str,
        max_records: int = 100,
        *,
        now_ms: int | None = None,
    ) -> list[dict]:
        """ShareFetch: acquire up to ``max_records`` Available records
        across the topic's partitions under this member's lock.

        Delivery order per partition: expired/released records FIRST
        (their redelivery is why the queue model exists), then fresh
        records from the share-partition end pointer.  Acquisition
        increments the delivery count; a record whose count would exceed
        ``delivery_attempt_limit`` is ARCHIVED instead of delivered
        (KIP-932's poison-record handling — the queue never wedges on a
        record no one can process).  Acquisition respects
        ``max_record_locks`` in-flight records per partition.  Returns
        ``[{partition, offset, key, value, timestamp, delivery_count}]``.
        """
        self._log._require("READ", "group", self.group)
        self._log._require("READ", "topic", topic)
        self._ensure_coordinator(topic)
        self._check_fenced(topic)  # fail fast; _save re-checks before write
        if self.isolation == "read_committed":
            # the mirror's LSO gate, for the same reason: an OPEN txn's
            # offsets would be skipped by the advancing end pointer and
            # never revisited once the txn commits. (Aborted txns filter
            # fine — they never become deliverable.)
            for txn in sorted(self._log.unresolved_txn_ids()):
                st = self._log.txn_state(txn)
                if st["state"] == "open" and topic in st.get(
                        "partitions", {}):
                    raise ValueError(
                        f"open transaction {txn!r} touches {topic!r}: a "
                        "read_committed share-fetch would skip its offsets "
                        "(LSO gate) — commit or abort it first"
                    )
        now = int(time.time() * 1000) if now_ms is None else int(now_ms)
        state = self._load(topic)
        begins = self._log.beginning_offsets(topic)
        ends = self._log.end_offsets(topic)
        excl = self._excluded()
        out: list[dict] = []
        budget = int(max_records)
        for pid in sorted(self._log.partitions(topic)):
            if budget <= 0:
                break
            ps = self._part_state(state, pid, begins.get(pid, 0))
            # lock expiry: acquired records whose lock lapsed go back to
            # Available with their delivery count intact
            for o, ent in sorted(
                list(ps["acq"].items()), key=lambda kv: int(kv[0])
            ):
                if ent["exp"] <= now:
                    ps["avail"][o] = ent["dc"]
                    del ps["acq"][o]
            take: list[tuple[int, int]] = []  # (offset, prior dc)
            # redeliveries first, oldest offset first
            for o in sorted(int(k) for k in ps["avail"]):
                if budget <= 0 or len(ps["acq"]) + len(take) >= \
                        self.max_record_locks:
                    break
                dc = ps["avail"][str(o)]
                if dc >= self.delivery_attempt_limit:
                    # over the attempt limit: archive, never deliver
                    ps["arch"].append(o)
                    del ps["avail"][str(o)]
                    continue
                take.append((o, dc))
                del ps["avail"][str(o)]
                budget -= 1
            # then fresh records past the end pointer
            fresh_cap = min(
                budget,
                self.max_record_locks - len(ps["acq"]) - len(take),
            )
            fresh: list[tuple] = []
            if fresh_cap > 0 and ps["next"] < ends.get(pid, 0):
                old_next = ps["next"]
                sess = self._sessions.pop((topic, pid), None)
                if (
                    sess is not None and sess["next"] == old_next
                    and sess["end"] == ends[pid]
                ):
                    it = sess["it"]
                else:
                    it = _read_range(
                        self.root, topic, pid, old_next, ends[pid],
                        excluded_txns=excl,
                    )
                for row in it:
                    fresh.append(row)
                    if len(fresh) >= fresh_cap:
                        break
                if fresh and len(fresh) >= fresh_cap:
                    new_next = fresh[-1][4] + 1
                    self._sessions[(topic, pid)] = {
                        "next": new_next, "end": ends[pid], "it": it,
                    }
                else:
                    # the scan exhausted the range below the cap: only
                    # control records (and, under the LSO gate, resolved-
                    # aborted runs) remain — skip the pointer past them
                    new_next = ends[pid]
                # offsets in the scanned window that did NOT yield are
                # undeliverable forever (txn control markers; resolved-
                # aborted records under read_committed). Finalize them as
                # archived NOW, or SPSO could never collapse past them
                # and the acked set would grow O(consumed history) on any
                # transactional topic — the exact unboundedness this
                # module exists to rule out.
                yielded = {row[4] for row in fresh}
                ps["arch"].extend(
                    o for o in range(old_next, new_next)
                    if o not in yielded
                )
                ps["next"] = new_next
                budget -= len(fresh)
            # materialize redelivered payloads: ONE coalesced range scan
            # over [min, max] of the take set (take is offset-sorted) —
            # per-offset point reads would re-parse the segment once per
            # redelivery, O(redeliveries × segment size) in a batch
            redeliver_rows: dict[int, tuple] = {}
            if take:
                want = {o for o, _ in take}
                for o in list(want):
                    hit = self._recent.get((topic, pid, o))
                    if hit is not None:
                        redeliver_rows[o] = hit
                        want.discard(o)
                if want:  # cache misses: one coalesced range scan
                    lo, hi = min(want), max(want) + 1
                    redeliver_rows.update({
                        row[4]: row
                        for row in _read_range(
                            self.root, topic, pid, lo, hi,
                            excluded_txns=excl,
                        )
                        if row[4] in want
                    })
            for o, dc in take:
                row = redeliver_rows.get(o)
                if row is None:
                    # compacted/trimmed away while Available: archive it
                    ps["arch"].append(o)
                    continue
                ps["acq"][str(o)] = {
                    "m": member, "exp": now + self.lock_duration_ms,
                    "dc": dc + 1,
                }
                out.append(self._rec(row, dc + 1))
                self._remember(topic, pid, row)
            for row in fresh:
                ps["acq"][str(row[4])] = {
                    "m": member, "exp": now + self.lock_duration_ms, "dc": 1,
                }
                out.append(self._rec(row, 1))
                self._remember(topic, pid, row)
            self._advance_spso(ps)
        self._save(topic, state)
        return out

    def _remember(self, topic: str, pid: int, row: tuple) -> None:
        if len(self._recent) >= self.recent_cache_records:
            # FIFO eviction (dict preserves insertion order)
            self._recent.pop(next(iter(self._recent)))
        self._recent[(topic, pid, row[4])] = row

    @staticmethod
    def _rec(row: tuple, dc: int) -> dict:
        return {
            "key": row[0], "value": row[1], "topic": row[2],
            "partition": row[3], "offset": row[4], "timestamp": row[5],
            "delivery_count": dc,
        }

    def _finalize(
        self, topic: str, member: str, offsets: dict[int, list[int]],
        now_ms: int | None, to: str,
    ) -> None:
        self._log._require("READ", "group", self.group)
        self._log._require("READ", "topic", topic)
        self._ensure_coordinator(topic)
        self._check_fenced(topic)
        now = int(time.time() * 1000) if now_ms is None else int(now_ms)
        state = self._load(topic)
        begins = self._log.beginning_offsets(topic)
        for pid, raw_offs in offsets.items():
            offs = sorted(set(raw_offs))  # a duplicate must not escape
            # validation and KeyError out of the apply loop below
            ps = self._part_state(state, pid, begins.get(pid, 0))
            for o in offs:
                ent = ps["acq"].get(str(o))
                if ent is None or ent["m"] != member or ent["exp"] <= now:
                    raise InvalidRecordStateError(
                        f"{topic}/p{pid} offset {o}: not acquired by "
                        f"{member!r} (never fetched, lock expired, or "
                        "already finalized) — INVALID_RECORD_STATE"
                    )
            for o in offs:
                ent = ps["acq"].pop(str(o))
                if to == "ack":
                    ps["acked"].append(o)
                elif to == "reject":
                    ps["arch"].append(o)
                else:  # release: back to Available, count preserved
                    ps["avail"][str(o)] = ent["dc"]
            self._advance_spso(ps)
        self._save(topic, state)

    def ack(self, topic: str, member: str, offsets: dict[int, list[int]],
            *, now_ms: int | None = None) -> None:
        """ShareAcknowledge ACCEPT: Acquired → Acknowledged (done).  Must
        still hold the lock — an ack after expiry raises (the record may
        already be re-dispensed to another member)."""
        self._finalize(topic, member, offsets, now_ms, "ack")

    def release(self, topic: str, member: str,
                offsets: dict[int, list[int]],
                *, now_ms: int | None = None) -> None:
        """ShareAcknowledge RELEASE: Acquired → Available for immediate
        redelivery (delivery count preserved) — 'I can't process this
        right now, give it to someone else'."""
        self._finalize(topic, member, offsets, now_ms, "release")

    def reject(self, topic: str, member: str,
               offsets: dict[int, list[int]],
               *, now_ms: int | None = None) -> None:
        """ShareAcknowledge REJECT: Acquired → Archived (permanent —
         'this record is unprocessable', the explicit poison path)."""
        self._finalize(topic, member, offsets, now_ms, "reject")

    # -- admin (kafka-share-groups.sh analog) --------------------------------

    def describe(self, topic: str) -> dict[int, dict]:
        """Per-partition SPSO/SPEO, in-flight locks, redelivery backlog,
        archived count, and lag (records not yet acknowledged/archived:
        in-flight + awaiting redelivery + undispensed) — the
        ``kafka-share-groups.sh --describe`` view."""
        self._log._require("READ", "group", self.group)
        self._log._require("READ", "topic", topic)
        state = self._load(topic)
        begins = self._log.beginning_offsets(topic)
        ends = self._log.end_offsets(topic)
        out: dict[int, dict] = {}
        for pid in sorted(self._log.partitions(topic)):
            ps = self._part_state(state, pid, begins.get(pid, 0))
            done_above = len(ps["acked"]) + len(ps["arch"])
            speo = ends.get(pid, 0)
            out[pid] = {
                "spso": ps["spso"],
                "speo": speo,
                "next_fetch": ps["next"],
                "in_flight": len(ps["acq"]),
                "awaiting_redelivery": len(ps["avail"]),
                "archived": len(ps["arch"]),
                # unfinalized records (in-flight + awaiting redelivery +
                # not yet dispensed) — kafka-share-groups.sh's lag notion
                "lag": max(0, speo - ps["spso"] - done_above),
            }
        return out

    def reset(self, topic: str, to: dict[int, int] | str) -> dict[int, int]:
        """``kafka-share-groups.sh --reset-offsets`` analog: move the
        share-partition start offset (and the fetch pointer) to an
        absolute per-partition offset, or ``"earliest"``/``"latest"``.
        Requires an idle group — resetting under live locks would hand
        the same records to two members, so any in-flight acquisition
        raises (the tool's own you-must-stop-the-group rule). All
        per-record state below the new SPSO is forgotten; a rewind makes
        records deliverable AGAIN with fresh delivery counts (a replay
        is a new processing attempt, not a continuation). Returns the
        applied {partition: spso}."""
        self._log._require("READ", "group", self.group)
        self._log._require("READ", "topic", topic)
        self._ensure_coordinator(topic)
        self._check_fenced(topic)
        state = self._load(topic)
        begins = self._log.beginning_offsets(topic)
        ends = self._log.end_offsets(topic)
        applied: dict[int, int] = {}
        for pid in sorted(self._log.partitions(topic)):
            ps = self._part_state(state, pid, begins.get(pid, 0))
            if ps["acq"]:
                raise ValueError(
                    f"{topic}/p{pid}: {len(ps['acq'])} record(s) still "
                    "acquired — stop the group's members before resetting "
                    "share offsets"
                )
            if to == "earliest":
                tgt = begins.get(pid, 0)
            elif to == "latest":
                tgt = ends.get(pid, 0)
            else:
                if pid not in to:
                    continue
                tgt = max(begins.get(pid, 0),
                          min(int(to[pid]), ends.get(pid, 0)))
            state[str(pid)] = {
                "spso": tgt, "next": tgt, "acq": {}, "avail": {},
                "acked": [], "arch": [],
            }
            self._sessions.pop((topic, pid), None)  # cursor is now stale
            applied[pid] = tgt
        self._save(topic, state)
        return applied

    def state_size(self, topic: str) -> int:
        """Total tracked offsets across partitions — the boundedness
        observable: O(in-flight + out-of-order gap), never O(consumed)."""
        state = self._load(topic)
        return sum(
            len(ps["acq"]) + len(ps["avail"]) + len(ps["acked"])
            + len(ps["arch"])
            for ps in state.values()
        )
