"""Iceberg-layout checkpointed, resumable, snapshot-isolated writer.

No Iceberg runtime jar exists in this sandbox (BASELINE.md), so this
implements the *protocol* Iceberg provides — MVCC snapshot isolation
via an atomic metadata pointer over immutable data, per-partition
manifests with lineage + metrics, idempotent partition rewrites —
over partitioned Parquet:

    <root>/data/part=<p>/snapv=<v>/*.parquet   (immutable once committed)
    <root>/metadata/manifest-<p>-v<v>.json     (lineage row per part version)
    <root>/metadata/snapshot-<n>.json          (maps part -> version)
    <root>/metadata/CURRENT                    (atomic pointer, tmp+rename)

**MVCC**: a rewrite of partition p writes a NEW ``snapv`` directory
(version = the snapshot id being produced) and the new snapshot points
at it; the previous version's files are untouched, so a reader that
resolved an older snapshot keeps reading consistent data for as long
as it runs (until ``expire_snapshots`` garbage-collects). This is what
in-place dynamic overwrite cannot give — there, the old snapshot's
"committed" partition is deleted mid-rewrite under the reader.

Resume: a killed run leaves data files but no manifest/snapshot for
incomplete partitions; the next run lists committed partitions from
CURRENT's snapshot, recomputes ONLY the missing ones, writes them
under the next version (clobbering only same-version leftovers —
idempotent), and commits. Readers only ever follow CURRENT → committed
versions.

Time travel: ``read_tier(spark, snapshot_id=n)`` reads the exact
partition-version set snapshot n committed.

**Schema evolution** (field-id based, the Iceberg model): the table
schema is a list of ``{id, name, type}`` fields stored in immutable
``metadata/schema-<n>.json`` files; each snapshot carries its
``schema_id`` and each manifest records the schema its files were
WRITTEN under. Reads map written columns to the target snapshot's
schema **by field id** — so ``rename_column`` is a metadata-only
commit (zero data rewritten, old files keep serving under the new
name), ``add_column`` back-fills NULL on pre-existing files,
``widen_column`` (int→bigint chain, float→double) casts at read time,
and ``drop_column`` projects the column away without touching data
(re-adding the same name later mints a NEW field id, so dropped data
never resurrects). Writes auto-merge genuinely new columns into a new
schema version; incompatible type changes are refused. Evolution
commits are validated against the base schema id under the commit
lock, so two concurrent evolutions conflict instead of silently
clobbering each other.

Where a real Iceberg catalog exists this module is replaced by
``df.writeTo(table).overwritePartitions()`` — the pipeline code only
depends on ``write_tier``/``overwrite_parts``/``read_tier``.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time


class ConcurrentWriteConflict(RuntimeError):
    """Another writer rewrote a partition this commit also writes,
    after this writer's base snapshot was read (Iceberg's commit
    validation failure). The losing writer's data files are orphans in
    their own ``snapv`` directory — committed data is untouched."""

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_PART_SECONDS = 7 * 86400  # weekly time partitions (spec 0)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class IcebergLayoutTable:
    DEFAULT_SORT_ORDER = ("url", "bucket_s")

    def __init__(
        self,
        root: str,
        sort_order: tuple[str, ...] | None = None,
        cluster_writes: bool = True,
        branch: str = "main",
    ):
        # ``branch``: every read and commit on this handle resolves
        # through the named branch ref instead of CURRENT ("main").
        # Branch handles enable write-audit-publish: stage commits on
        # a branch (main readers never see them), validate, then
        # ``publish_branch`` fast-forwards main atomically.
        self.root = root
        self.branch = branch
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        # cluster_writes=False keeps the caller's partitioning (files
        # land as tasks emit them — the small-file regime compact_parts
        # exists for, and what streaming micro-batches produce)
        self.cluster_writes = cluster_writes
        # write clustering (Iceberg's write.distribution-mode=hash +
        # sort-order analog): columns present in the frame are used to
        # sort rows WITHIN each output file, after a REBALANCE shuffle
        # on the partition column. Without it, tier data arrives
        # url-hash-partitioned and partitionBy(part) scatters every
        # task across every partition directory — file count grows as
        # tasks x parts (100k+ files per write on a 1000-executor
        # cluster); with it, files per part are bounded by AQE's
        # rebalance (1 for normal parts, split only when skewed) and
        # row groups are url-clustered (RLE/dict encoding + min/max
        # pruning for per-url reads).
        # sort_order=None resolves lazily: explicit arg > the value
        # persisted in the current snapshot (commits record it, so a
        # fresh handle — e.g. the maintenance CLI — compacts/stats the
        # same columns the writer clustered) > the tier default.
        self._sort_order = tuple(sort_order) if sort_order else None
        os.makedirs(self.meta_dir, exist_ok=True)

    @property
    def sort_order(self) -> tuple[str, ...]:
        if self._sort_order:
            return self._sort_order
        snap = self.current_snapshot() or {}
        persisted = snap.get("sort_order")
        return tuple(persisted) if persisted else self.DEFAULT_SORT_ORDER

    # ------------------------------------------------------------ metadata
    def _ref_path(self, branch: str | None = None) -> str:
        b = self.branch if branch is None else branch
        return os.path.join(
            self.meta_dir, "CURRENT" if b == "main" else f"branch-{b}.json"
        )

    def current_snapshot(self) -> dict | None:
        cur = _read_json(self._ref_path())
        if not cur:
            if self.branch != "main":
                raise FileNotFoundError(
                    f"no branch {self.branch!r} in {self.meta_dir} — "
                    "create_branch first"
                )
            return None
        return self.snapshot(None, cur["snapshot"])

    def snapshot(self, snapshot_id: int | None, name: str | None = None) -> dict | None:
        if name is None:
            name = f"snapshot-{snapshot_id}.json"
        snap = _read_json(os.path.join(self.meta_dir, name))
        if snap and isinstance(snap.get("parts"), list):
            # pre-MVCC layout: unversioned parts lived directly under
            # part=<p>; treat as version -1 (sentinel, no snapv dir)
            snap["parts"] = {p: -1 for p in snap["parts"]}
        return snap

    # ------------------------------------------------------------ branches
    def create_branch(self, name: str, from_snapshot: int | None = None) -> dict:
        """Create a branch ref pointing at ``from_snapshot`` (default:
        the current head of THIS handle's branch). Writes through an
        ``IcebergLayoutTable(root, branch=name)`` handle then chain
        snapshots on the branch — main readers never see them until
        :meth:`publish_branch` (the write-audit-publish pattern)."""
        if name == "main":
            raise ValueError("'main' is the default ref — cannot create it")
        if from_snapshot is None:
            snap = self.current_snapshot()
            if snap is None:
                raise FileNotFoundError("empty table: nothing to branch from")
            from_snapshot = snap["snapshot_id"]
        ref = self._ref_path(name)
        sname = f"snapshot-{from_snapshot}.json"
        if self.snapshot(None, sname) is None:
            raise FileNotFoundError(f"no snapshot {from_snapshot} to branch from")
        with self._commit_lock():
            if os.path.exists(ref):
                raise ConcurrentWriteConflict(f"branch {name!r} already exists")
            _atomic_write_json(ref, {"snapshot": sname})
        return {"branch": name, "snapshot_id": from_snapshot}

    def list_branches(self) -> dict[str, int]:
        """All refs (including main) → their head snapshot ids."""
        out = {}
        for f in sorted(os.listdir(self.meta_dir)):
            if f == "CURRENT":
                b = "main"
            elif f.startswith("branch-") and f.endswith(".json"):
                b = f[len("branch-"):-len(".json")]
            else:
                continue
            ref = _read_json(os.path.join(self.meta_dir, f))
            if ref:
                out[b] = int(ref["snapshot"].split("-")[1].split(".")[0])
        return out

    def publish_branch(self, name: str) -> dict:
        """Fast-forward main to the branch head — the atomic PUBLISH
        of write-audit-publish. Valid only when main's current head is
        an ancestor of the branch head (walked via parent pointers);
        if main advanced since the branch was cut, raises
        :class:`ConcurrentWriteConflict` — re-branch and replay, the
        same rule as Iceberg's fast-forward. The branch ref survives
        (now pointing at main's head); ``drop_branch`` removes it."""
        with self._commit_lock():
            ref = _read_json(self._ref_path(name))
            if ref is None:
                raise FileNotFoundError(f"no branch {name!r} in {self.meta_dir}")
            cur = _read_json(os.path.join(self.meta_dir, "CURRENT"))
            main_id = (
                self.snapshot(None, cur["snapshot"])["snapshot_id"]
                if cur else None
            )
            node = self.snapshot(None, ref["snapshot"])
            head_id = node["snapshot_id"]
            while node is not None:
                if node["snapshot_id"] == main_id:
                    break
                parent = node.get("parent")
                node = self.snapshot(parent) if parent is not None else None
            else:
                if main_id is not None:
                    raise ConcurrentWriteConflict(
                        f"main advanced past branch {name!r}'s base "
                        f"(main={main_id}, not an ancestor of branch head "
                        f"{head_id}) — re-branch from current main and replay"
                    )
            _atomic_write_json(
                os.path.join(self.meta_dir, "CURRENT"), dict(ref)
            )
        return {"branch": name, "published_snapshot_id": head_id}

    def drop_branch(self, name: str) -> None:
        """Delete a branch ref; its unpublished snapshots become
        expirable by :meth:`expire_snapshots` / orphan GC."""
        with contextlib.suppress(OSError):
            os.remove(self._ref_path(name))

    def snapshot_as_of(self, ts: float) -> dict:
        """Timestamp time travel (``FOR SYSTEM_TIME AS OF``): the
        newest snapshot on THIS ref's history whose commit time is
        ≤ ``ts`` (epoch seconds), found by walking parent pointers
        from the head — never a snapshot from another branch."""
        node = self.current_snapshot()
        while node is not None:
            if node.get("committed_at", 0) <= ts:
                return node
            parent = node.get("parent")
            node = self.snapshot(parent) if parent is not None else None
        raise FileNotFoundError(
            f"no snapshot at or before ts={ts} on branch {self.branch!r}"
        )

    def committed_parts(self, snapshot_id: int | None = None) -> set[str]:
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        return set(snap["parts"]) if snap else set()

    def part_versions(self, snapshot_id: int | None = None) -> dict[str, int]:
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        return dict(snap["parts"]) if snap else {}

    def lineage(self) -> list[dict]:
        """Manifests of every live data-file set (base versions plus
        merge-on-read appended versions). Row counts are PHYSICAL —
        merge-on-read deletes are not subtracted until compaction."""
        snap = self.current_snapshot()
        if not snap:
            return []
        out = []
        for p, v in sorted(self._version_pairs(snap)):
            m = self._manifest(p, v)
            if m:
                out.append(m)
        return out

    def _next_snapshot_id(self) -> int:
        # GLOBAL max across every snapshot file: branches share one
        # snapshot-id namespace, so ids never collide across refs
        ids = [
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        return max(ids, default=-1) + 1

    def _claim_version(self) -> int:
        """Atomically claim a unique data-version id (O_EXCL marker):
        concurrent writers land data in DISTINCT ``snapv`` directories,
        so a lost commit race leaves orphan files — never a mixed or
        clobbered partition directory. Version ids are a separate
        namespace from snapshot ids (the parts map carries the actual
        version per partition)."""
        n = self._next_snapshot_id()
        while True:
            try:
                fd = os.open(
                    os.path.join(self.meta_dir, f"version-{n}.claim"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return n
            except FileExistsError:
                n += 1

    @contextlib.contextmanager
    def _commit_lock(self, timeout_s: float = 30.0, stale_s: float = 120.0):
        """Filesystem mutex for the read-validate-write commit section
        (the CAS primitive a real Iceberg catalog provides). Stale
        locks (a writer that died mid-commit) are broken after
        ``stale_s``."""
        path = os.path.join(self.meta_dir, "COMMIT.lock")
        t0 = time.time()
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()} {time.time()}".encode())
                os.close(fd)
                break
            except FileExistsError:
                if time.time() - t0 > timeout_s:
                    raise TimeoutError(f"commit lock busy > {timeout_s}s: {path}")
                # judge staleness by the timestamp the holder wrote
                # INTO the lock (falls back to mtime for empty/corrupt
                # locks) — the same identity the break path below uses
                # to decide whether it stole a fresh lock, so a
                # restored lock is never immediately re-broken
                try:
                    try:
                        with open(path) as fh:
                            born = float(fh.read().split()[1])
                    except (IndexError, ValueError):
                        born = os.path.getmtime(path)
                    age = time.time() - born
                except OSError:
                    continue  # raced with a release — retry
                if age > stale_s:
                    # break the stale lock by ATOMIC RENAME, not bare
                    # remove: with remove, two waiters can both judge
                    # the lock stale, the first deletes + re-creates,
                    # and the second's remove then deletes the FRESH
                    # lock — two writers in the commit section. Rename
                    # moves exactly one inode, so exactly one breaker
                    # wins; any lock created after the rename is
                    # respected by the O_EXCL create above.
                    grave = os.path.join(
                        self.meta_dir,
                        f"COMMIT.lock.stale-{os.getpid()}-{time.monotonic_ns()}",
                    )
                    try:
                        os.rename(path, grave)
                    except OSError:
                        continue  # someone broke/released it first
                    # narrow residual race: if the inode we moved was
                    # actually a FRESH lock re-created in the
                    # getmtime→rename window, put it back (os.link is
                    # atomic-exclusive — it refuses if a newer lock
                    # already took the path)
                    try:
                        with open(grave) as fh:
                            born = float(fh.read().split()[1])
                        stolen_fresh = time.time() - born <= stale_s
                    except (OSError, IndexError, ValueError):
                        stolen_fresh = False
                    if stolen_fresh:
                        with contextlib.suppress(OSError):
                            os.link(grave, path)
                    with contextlib.suppress(OSError):
                        os.remove(grave)
                    continue
                time.sleep(0.05)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.remove(path)

    # snapshot-level application state (e.g. the exactly-once
    # applied-delta ledger) and the current schema pointer must survive
    # maintenance commits like compaction — these keys carry forward
    # unless explicitly replaced
    CARRIED_EXTRA_KEYS = (
        "applied_deltas", "pending", "schema_id", "applied_upserts",
        "part_spec_id",
    )

    # sentinel: "don't validate the schema pointer at commit time"
    _SCHEMA_UNCHECKED = object()

    def _commit(
        self,
        parts: dict[str, int],
        extra: dict,
        update: dict[str, int] | None = None,
        base_versions: dict[str, int] | None = None,
        expect_schema=_SCHEMA_UNCHECKED,
        add_deletes: dict[str, list[dict]] | None = None,
        add_adds: dict[str, list[int]] | None = None,
        expect_row_state: dict[str, tuple] | None = None,
        remove: set[str] | None = None,
        expect_extra: dict | None = None,
    ) -> dict:
        """Commit a new snapshot. Single-writer form: ``parts`` is the
        full map (as computed by the caller). Optimistic-concurrency
        form (``update`` given): under the commit lock, re-read the
        LATEST snapshot, validate that no partition in ``update``
        changed since ``base_versions`` was read (raise
        :class:`ConcurrentWriteConflict` otherwise — Iceberg's commit
        validation), and merge ``update`` onto the latest parts map —
        concurrent writers to disjoint partitions all land."""
        with self._commit_lock():
            prev = self.current_snapshot() or {}
            for k, v in (expect_extra or {}).items():
                # generic metadata CAS (same shape as the schema check
                # below): the committer derived its work from prev[k]
                # == v; a concurrent commit moving that pointer means
                # this commit would silently clobber it
                if prev.get(k) != v:
                    raise ConcurrentWriteConflict(
                        f"{k} changed since base: expected {v!r}, "
                        f"found {prev.get(k)!r}"
                    )
            if expect_schema is not self._SCHEMA_UNCHECKED and (
                prev.get("schema_id") != expect_schema
            ):
                # a concurrent writer/evolver moved the schema pointer
                # after this writer derived its schema from it —
                # committing would clobber that evolution (Iceberg's
                # metadata-version CAS failure). The already-written
                # schema file / data files are orphans; retry re-derives.
                raise ConcurrentWriteConflict(
                    f"schema evolved since base: expected schema_id="
                    f"{expect_schema}, found {prev.get('schema_id')}"
                )
            if update is not None or remove is not None:
                latest = dict(prev.get("parts", {}))
                if base_versions is not None:
                    changed = {
                        p: latest.get(p)
                        for p in (*(update or {}), *(remove or ()))
                        if latest.get(p) != base_versions.get(p)
                    }
                    if changed:
                        raise ConcurrentWriteConflict(
                            f"partitions rewritten since base snapshot: "
                            f"{sorted(changed)}"
                        )
                parts = {**latest, **(update or {})}
                for p in remove or ():
                    parts.pop(p, None)
            if expect_row_state is not None:
                # serializable row-state validation (Iceberg's
                # validateNoConflicting{Deletes,AppendedData}): a MOR
                # merge's equality deletes assume the partition's row
                # set it read; another add/delete landing in between
                # would be silently clobbered for shared keys
                for p, (eadds, edels) in expect_row_state.items():
                    if (
                        prev.get("adds", {}).get(p, []) != eadds
                        or (prev.get("deletes") or {}).get(p, []) != edels
                    ):
                        raise ConcurrentWriteConflict(
                            f"row state of partition {p!r} changed since "
                            f"base snapshot (concurrent merge/delete)"
                        )
            n = self._next_snapshot_id()
            carried = {k: prev[k] for k in self.CARRIED_EXTRA_KEYS if k in prev}
            # merge-on-read delete files and appended data files
            # survive a commit only while their partition's BASE data
            # version is unchanged: every rewrite path (CoW
            # merge/delete, compaction, refresh) reads with deletes and
            # adds APPLIED, so the new version has them materialized
            # and the descriptors must drop with it
            prev_parts = prev.get("parts", {})
            kept_dels = {
                p: list(ds)
                for p, ds in (prev.get("deletes") or {}).items()
                if p in parts and parts[p] == prev_parts.get(p)
            }
            for p, descs in (add_deletes or {}).items():
                kept_dels[p] = kept_dels.get(p, []) + list(descs)
            kept_adds = {
                p: list(vs)
                for p, vs in (prev.get("adds") or {}).items()
                if p in parts and parts[p] == prev_parts.get(p)
            }
            for p, vs in (add_adds or {}).items():
                kept_adds[p] = kept_adds.get(p, []) + list(vs)
            new = {
                "snapshot_id": n,
                "parts": parts,
                # persist the clustering contract so any fresh handle
                # (CLI maintenance, a reader in another process)
                # resolves the same sort/stat/zorder columns
                "sort_order": (
                    list(self._sort_order)
                    if self._sort_order
                    else prev.get("sort_order", list(self.DEFAULT_SORT_ORDER))
                ),
                "committed_at": time.time(),
                # parent pointer: the commit lineage publish_branch
                # walks to prove a branch head fast-forwards main
                "parent": prev.get("snapshot_id"),
                **({"branch": self.branch} if self.branch != "main" else {}),
                **carried,
                **({"deletes": kept_dels} if kept_dels else {}),
                **({"adds": kept_adds} if kept_adds else {}),
                **extra,
            }
            name = f"snapshot-{n}.json"
            _atomic_write_json(os.path.join(self.meta_dir, name), new)
            _atomic_write_json(self._ref_path(), {"snapshot": name})
            return new

    # -------------------------------------------------------------- schema
    # integer widening chain + float→double, the Iceberg-allowed
    # promotions (a wider read type can always represent narrower
    # written values exactly)
    _WIDEN_RANK = {
        "tinyint": ("tinyint", 1), "smallint": ("tinyint", 2),
        "int": ("tinyint", 3), "bigint": ("tinyint", 4),
        "float": ("float", 1), "double": ("float", 2),
    }

    @classmethod
    def _can_widen(cls, narrow: str, wide: str) -> bool:
        a, b = cls._WIDEN_RANK.get(narrow), cls._WIDEN_RANK.get(wide)
        return a is not None and b is not None and a[0] == b[0] and a[1] <= b[1]

    def schema(self, schema_id: int | None = None) -> dict | None:
        """The table schema (``{"schema_id", "fields", "last_field_id"}``)
        — current snapshot's by default, or any historical id. ``None``
        for pre-evolution tables that never registered one."""
        if schema_id is None:
            snap = self.current_snapshot()
            schema_id = snap.get("schema_id") if snap else None
            if schema_id is None:
                return None
        s = _read_json(os.path.join(self.meta_dir, f"schema-{schema_id}.json"))
        if s is not None:
            s["schema_id"] = schema_id
        return s

    def _claim_schema(self, fields: list[dict], last_field_id: int) -> int:
        """Register an immutable schema file under a unique id
        (O_EXCL — concurrent claimers land distinct ids; an id whose
        commit loses the CAS race is just an orphan metadata file)."""
        ids = [
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("schema-") and f.endswith(".json")
        ]
        n = max(ids, default=-1) + 1
        body = {"fields": fields, "last_field_id": last_field_id}
        while True:
            path = os.path.join(self.meta_dir, f"schema-{n}.json")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                n += 1
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(body, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            return n

    def _ensure_write_schema(self, df: DataFrame, part_col: str):
        """Resolve the schema this write lands under. Returns
        ``(schema_id, expect_schema)`` for :meth:`_commit` —
        ``expect_schema`` is the base schema id to CAS-validate when
        this write minted a new schema, or the unchecked sentinel when
        it reuses the current one (reuse is always safe: manifests
        record the written id, so field-id mapping stays correct even
        if the current pointer moves concurrently)."""
        snap = self.current_snapshot()
        cur_sid = snap.get("schema_id") if snap else None
        cur = self.schema(cur_sid) if cur_sid is not None else None
        data_fields = [
            (c, t) for c, t in df.dtypes if c not in (part_col, "snapv")
        ]
        if cur is None:
            # first schema for this table, derived from the write
            fields = [
                {"id": i + 1, "name": c, "type": t}
                for i, (c, t) in enumerate(data_fields)
            ]
            return self._claim_schema(fields, len(fields)), cur_sid
        by_name = {f["name"]: f for f in cur["fields"]}
        out = [dict(f) for f in cur["fields"]]
        last = cur["last_field_id"]
        evolved = False
        for c, t in data_fields:
            f = by_name.get(c)
            if f is None:
                # auto-merge: a genuinely new column gets a fresh id
                last += 1
                out.append({"id": last, "name": c, "type": t})
                evolved = True
            elif f["type"] != t:
                if self._can_widen(f["type"], t):
                    # data wider than table → widen the table type
                    next(x for x in out if x["id"] == f["id"])["type"] = t
                    evolved = True
                elif self._can_widen(t, f["type"]):
                    pass  # data narrower — read-time cast widens it
                else:
                    raise TypeError(
                        f"incompatible write for column {c!r}: table type "
                        f"{f['type']}, data type {t} (only "
                        f"tinyint→smallint→int→bigint and float→double "
                        f"promotions are allowed)"
                    )
        if not evolved:
            return cur["schema_id"], self._SCHEMA_UNCHECKED
        return self._claim_schema(out, last), cur_sid

    def _evolve(self, mutate, desc: str) -> dict:
        """Apply a metadata-only schema change: derive the new field
        list from the current schema, register it, and commit a
        snapshot with the same partition versions — CAS-validated
        against the base schema id."""
        cur = self.schema()
        if cur is None:
            raise FileNotFoundError(
                "table has no schema yet — write data first (the first "
                "write registers schema 0 from the written columns)"
            )
        fields, last = mutate([dict(f) for f in cur["fields"]], cur["last_field_id"])
        sid = self._claim_schema(fields, last)
        snap = self.current_snapshot() or {}
        return self._commit(
            dict(snap.get("parts", {})),
            {
                "input_snapshot": f"schema-evolution:{desc}",
                "new_parts": [],
                "part_col": snap.get("part_col", "part"),
                "schema_id": sid,
            },
            expect_schema=cur["schema_id"],
        )

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only rename: no data file is touched; old files
        keep serving under the new name via field-id mapping."""
        def mutate(fields, last):
            if any(f["name"] == new for f in fields):
                raise ValueError(f"column {new!r} already exists")
            tgt = [f for f in fields if f["name"] == old]
            if not tgt:
                raise KeyError(f"no column {old!r} in current schema")
            tgt[0]["name"] = new
            return fields, last
        return self._evolve(mutate, f"rename {old}->{new}")

    def add_column(self, name: str, dtype: str) -> dict:
        """Add a column (fresh field id): pre-existing files read as
        NULL for it. Re-adding a previously dropped name never
        resurrects old data — the id is new."""
        def mutate(fields, last):
            if any(f["name"] == name for f in fields):
                raise ValueError(f"column {name!r} already exists")
            fields.append({"id": last + 1, "name": name, "type": dtype})
            return fields, last + 1
        return self._evolve(mutate, f"add {name}:{dtype}")

    def drop_column(self, name: str) -> dict:
        """Drop a column from the schema — data files untouched,
        reads project it away."""
        def mutate(fields, last):
            kept = [f for f in fields if f["name"] != name]
            if len(kept) == len(fields):
                raise KeyError(f"no column {name!r} in current schema")
            return kept, last
        return self._evolve(mutate, f"drop {name}")

    def widen_column(self, name: str, dtype: str) -> dict:
        """Promote a column's type (int chain / float→double); written
        files keep their narrow physical type and are cast at read."""
        def mutate(fields, last):
            tgt = [f for f in fields if f["name"] == name]
            if not tgt:
                raise KeyError(f"no column {name!r} in current schema")
            if not self._can_widen(tgt[0]["type"], dtype):
                raise TypeError(
                    f"cannot widen {name}: {tgt[0]['type']} -> {dtype}"
                )
            tgt[0]["type"] = dtype
            return fields, last
        return self._evolve(mutate, f"widen {name}:{dtype}")

    # ------------------------------------------------- partition spec
    # Iceberg's partition-spec evolution, adapted to this layout's
    # single-level time partitioning: the table carries a current
    # `part-spec-<n>.json` ({bucket_col, part_seconds}); `with_part`
    # derives the partition value from it, so writers pick up a new
    # granularity without code changes. Unlike Iceberg (where old
    # files keep their old spec forever), the refresh machinery's
    # part math (incremental.py) requires ONE spec across all live
    # partitions — so evolving a non-empty table REWRITES it into the
    # new spec in one atomic commit (rewrite=True), and the metadata-
    # only form is allowed only while the table is empty. Time travel
    # to pre-evolution snapshots still sees the old layout.

    def part_spec(self, spec_id: int | None = None) -> dict:
        """Current (or requested) partition spec. Spec 0 is the
        implicit default (weekly buckets of ``bucket_s``) for tables
        created before specs existed."""
        if spec_id is None:
            snap = self.current_snapshot() or {}
            spec_id = snap.get("part_spec_id", 0)
        if spec_id == 0:
            return {
                "spec_id": 0,
                "bucket_col": "bucket_s",
                "part_seconds": DEFAULT_PART_SECONDS,
            }
        s = _read_json(os.path.join(self.meta_dir, f"part-spec-{spec_id}.json"))
        if s is None:
            raise FileNotFoundError(f"no part-spec-{spec_id}.json in {self.meta_dir}")
        return s

    def _claim_part_spec(self, spec: dict) -> int:
        existing = [
            int(f.rsplit("-", 1)[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("part-spec-") and f.endswith(".json")
        ]
        n = max(existing, default=0) + 1
        _atomic_write_json(
            os.path.join(self.meta_dir, f"part-spec-{n}.json"),
            {**spec, "spec_id": n},
        )
        return n

    def with_part(self, df: DataFrame) -> DataFrame:
        """Derive the partition column from the table's CURRENT spec —
        the spec-aware form of the module-level :func:`with_part`."""
        spec = self.part_spec()
        return with_part(
            df, bucket_col=spec["bucket_col"], part_seconds=spec["part_seconds"]
        )

    def evolve_partitioning(
        self,
        part_seconds: int,
        bucket_col: str = "bucket_s",
        spark: SparkSession | None = None,
        rewrite: bool = False,
    ) -> dict:
        """Change the partition granularity for this table.

        Empty table: metadata-only commit of the new spec. Non-empty:
        requires ``rewrite=True`` (and ``spark``) — the committed rows
        are re-bucketed under the new spec and land as one atomic
        replace-all commit (old partitions leave the parts map; MVCC
        readers on prior snapshots are unaffected, and time travel
        still serves the old layout). The single-spec invariant keeps
        every partition-math consumer (incremental refresh, retention,
        chunk recompression) correct without per-part spec lookups.
        """
        cur = self.part_spec()
        snap = self.current_snapshot()
        if (
            cur["part_seconds"] == part_seconds
            and cur["bucket_col"] == bucket_col
        ):
            return snap or {}
        base_spec_id = (snap or {}).get("part_spec_id")
        part_col = (snap or {}).get("part_col", "part")
        sid = self._claim_part_spec(
            {
                "bucket_col": bucket_col,
                "part_seconds": int(part_seconds),
                "parent_spec_id": cur["spec_id"],
            }
        )
        old_parts = dict((snap or {}).get("parts", {}))
        if not old_parts:
            return self._commit(
                {},
                {
                    "input_snapshot": f"partition-evolution:{part_seconds}s",
                    "new_parts": [],
                    "part_col": part_col,
                    "part_spec_id": sid,
                },
                update={},
                base_versions={},
                expect_extra={"part_spec_id": base_spec_id},
            )
        if not rewrite:
            raise ValueError(
                "table has committed partitions — pass rewrite=True "
                "(and spark=) to re-bucket them under the new spec; "
                "mixed-width partitions would break refresh/retention "
                "part math"
            )
        if spark is None:
            raise ValueError("rewrite=True needs spark=")
        rows = self.read_tier(spark).drop(part_col)
        df = with_part(rows, bucket_col=bucket_col, part_seconds=part_seconds)
        new_parts = sorted(
            {str(r[0]) for r in df.select(part_col).distinct().collect()}
        )
        schema_id, expect_schema = self._ensure_write_schema(df, part_col)
        version = self._claim_version()
        self._write_parts(
            df, new_parts, version, part_col,
            f"partition-evolution:{part_seconds}s", schema_id,
        )
        return self._commit(
            {},
            {
                "input_snapshot": f"partition-evolution:{part_seconds}s",
                "new_parts": new_parts,
                "part_col": part_col,
                "part_spec_id": sid,
                "schema_id": schema_id,
            },
            update={p: version for p in new_parts},
            base_versions=old_parts,
            remove=set(old_parts) - set(new_parts),
            expect_schema=expect_schema,
            expect_extra={"part_spec_id": base_spec_id},
        )

    def _normalize_to_schema(
        self, df: DataFrame, written: dict | None, target: dict, part_col: str
    ) -> DataFrame:
        """Project ``df`` (read with its written column names/types)
        onto ``target``: rename by field id, cast widened types, NULL-
        fill fields the written schema lacks, drop fields the target
        dropped. Pure projection — stays in whole-stage codegen."""
        cols = [
            F.col(c)
            for c in (part_col, "snapv", "_file", "_pos")
            if c in df.columns
        ]
        wrote_by_id = (
            {f["id"]: f for f in written["fields"]} if written else None
        )
        for f in target["fields"]:
            if wrote_by_id is not None:
                wf = wrote_by_id.get(f["id"])
                src = wf["name"] if wf else None
            else:
                src = f["name"]
            if src is not None and src in df.columns:
                cols.append(F.col(src).cast(f["type"]).alias(f["name"]))
            else:
                cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
        return df.select(*cols)

    # ----------------------------------------------------------------- IO
    def write_tier(
        self,
        df: DataFrame,
        part_col: str = "part",
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> dict:
        """Write all not-yet-committed partitions of ``df``; resumable.

        ``df`` must carry ``part_col`` (string-able partition value).
        Returns the committed snapshot dict.
        """
        versions = self.part_versions()
        all_parts = {
            str(r[0]) for r in df.select(part_col).distinct().collect()
        }
        missing = sorted(all_parts - set(versions))
        schema_id, expect_schema = self._ensure_write_schema(df, part_col)
        version = self._claim_version()
        self._write_parts(df, missing, version, part_col, input_snapshot, schema_id)
        return self._commit(
            {},
            {
                "input_snapshot": input_snapshot,
                "new_parts": missing,
                "part_col": part_col,
                "schema_id": schema_id,
                **(extra or {}),
            },
            update={p: version for p in missing},
            base_versions=versions,
            expect_schema=expect_schema,
        )

    def overwrite_parts(
        self,
        df: DataFrame,
        parts: list[str],
        part_col: str = "part",
        input_snapshot: str = "",
        extra: dict | None = None,
        base_snapshot: dict | None = None,
        cluster: bool | None = None,
        expect_extra: dict | None = None,
    ) -> dict:
        """Force-rewrite the given partitions (committed or not) —
        the incremental-refresh primitive. MVCC: the rewrite lands in
        a fresh ``snapv`` directory, so readers holding the previous
        snapshot keep a consistent view; only the new snapshot points
        at the new version.

        ``base_snapshot``: the snapshot the caller's ``df`` was READ
        from. When given, commit validation pins the rewritten parts'
        versions AND row state (MOR add/delete files) to that
        snapshot, so a concurrent commit landing in the read→commit
        window raises :class:`ConcurrentWriteConflict` instead of
        being silently overwritten — the copy-on-write DML paths all
        pass it. When None (the incremental-refresh force-rewrite
        form), versions are validated only against commit-time state:
        last-writer-wins by design, the caller orchestrates."""
        parts = sorted({str(p) for p in parts})
        if base_snapshot is not None:
            base = {
                p: base_snapshot.get("parts", {}).get(p) for p in parts
            }
            row_state = {
                p: (
                    base_snapshot.get("adds", {}).get(p, []),
                    (base_snapshot.get("deletes") or {}).get(p, []),
                )
                for p in parts
            }
        else:
            base = self.part_versions()
            row_state = None
        schema_id, expect_schema = self._ensure_write_schema(df, part_col)
        version = self._claim_version()
        self._write_parts(
            df, parts, version, part_col, input_snapshot, schema_id,
            cluster=cluster,
        )
        return self._commit(
            {},
            {
                "input_snapshot": input_snapshot,
                "new_parts": parts,
                "part_col": part_col,
                "schema_id": schema_id,
                **(extra or {}),
            },
            update={p: version for p in parts},
            base_versions=base,
            expect_schema=expect_schema,
            expect_row_state=row_state,
            expect_extra=expect_extra,
        )

    def commit_metadata(
        self,
        input_snapshot: str = "",
        extra: dict | None = None,
        expect_extra: dict | None = None,
    ) -> dict:
        """Metadata-only commit: same partition versions, new snapshot
        carrying updated application state (e.g. clearing a pending
        refresh marker after downstream tables committed).

        The parts map is taken from the LATEST snapshot under the
        commit lock (``update={}``), so a data commit landing between
        this caller's read and its commit is never rolled back.
        ``expect_extra`` CASes application-state keys the caller
        derived its update from (e.g. the pending marker it is
        clearing) — a concurrent mover raises ConcurrentWriteConflict
        instead of being clobbered."""
        snap = self.current_snapshot() or {}
        return self._commit(
            {},
            {
                "input_snapshot": input_snapshot,
                "new_parts": [],
                "part_col": snap.get("part_col", "part"),
                **(extra or {}),
            },
            update={},
            expect_extra=expect_extra,
        )

    def _write_parts(
        self,
        df: DataFrame,
        missing: list[str],
        version: int,
        part_col: str,
        input_snapshot: str,
        schema_id: int | None = None,
        cluster: bool | None = None,
    ) -> None:
        spark = df.sparkSession
        if not missing:
            return
        t0 = time.time()
        pending = df.where(F.col(part_col).cast("string").isin(missing)).withColumn(
            "snapv", F.lit(version)
        )
        # cluster the write: REBALANCE co-locates each partition's rows
        # (AQE splits a skewed part across tasks instead of one-task-
        # per-part), then an in-task sort clusters row groups on the
        # table sort order — content is unchanged (lineage hashes are
        # order-insensitive bit_xor)
        if self.cluster_writes if cluster is None else cluster:
            pending = pending.hint("rebalance", part_col)
            sort_cols = [c for c in self.sort_order if c in pending.columns]
            if sort_cols:
                pending = pending.sortWithinPartitions(part_col, *sort_cols)
        # dynamic overwrite touches only (part, snapv=version) dirs —
        # never any committed version: version ids are CLAIMED
        # exclusively (_claim_version), so no two writers ever share a
        # snapv dir; a crashed attempt's files become unreferenced
        # orphans (remove_orphans GCs them) and the retry lands in a
        # fresh version -> still idempotent end-state
        (
            pending.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col, "snapv")
            .parquet(self.data_dir)
        )
        wall = time.time() - t0
        # per-partition lineage metrics from what was actually written
        written = self._read_versions(
            spark, {p: version for p in missing}, part_col
        )
        # maps/structs are not hashable by xxhash64 → stable JSON
        # form; combine with bit_xor (order-insensitive, no overflow)
        hashable = [
            F.to_json(F.col(c)) if t.startswith(("map", "struct", "array")) else F.col(c)
            for c, t in written.dtypes
            if c not in (part_col, "snapv")
        ]
        # Iceberg-manifest column stats: per-FILE min/max of the sort-
        # order columns, gathered in the SAME aggregation pass as the
        # lineage hash (group by file instead of part; part totals are
        # derived driver-side — sums and xors are associative). The
        # stats feed plan_files() scan pruning: a per-url or time-range
        # read skips whole files before Spark ever lists them, which at
        # 10^12 rows is the difference between touching ~1 file per
        # (part, url-range) and scanning every file of every part.
        simple = {c: t for c, t in written.dtypes}
        stat_cols = [
            c for c in self.sort_order
            if c in simple and not simple[c].startswith(("map", "struct", "array", "binary"))
        ]
        stat_aggs = []
        for c in stat_cols:
            col = F.col(c)
            if simple[c] not in ("int", "bigint", "smallint", "tinyint", "double", "float"):
                col = col.cast("string")  # JSON-safe; ISO timestamps sort lexically
            stat_aggs += [F.min(col).alias(f"_min_{c}"), F.max(col).alias(f"_max_{c}")]
        per_file = (
            written.select(
                F.col(part_col).cast("string").alias("p"),
                F.input_file_name().alias("f"),
                F.xxhash64(*hashable).alias("_h"),
                *[F.col(c) for c in stat_cols],
            )
            .groupBy("p", "f")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.expr("bit_xor(_h)").alias("value_hash"),
                *stat_aggs,
            )
            .collect()
        )
        by_part: dict[str, list] = {}
        for r in per_file:
            by_part.setdefault(str(r["p"]), []).append(r)
        prefix = "file://" + os.path.abspath(self.data_dir) + "/"
        for p in missing:
            frs = by_part.get(p, [])
            vh = 0
            for r in frs:
                vh ^= int(r["value_hash"])
            files = [
                {
                    "path": (r["f"][len(prefix):] if r["f"].startswith(prefix)
                             else r["f"].split("/data/", 1)[-1]),
                    "rows": int(r["rows"]),
                    "stats": {
                        c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in stat_cols
                    },
                }
                for r in sorted(frs, key=lambda r: r["f"])
            ]
            _atomic_write_json(
                os.path.join(self.meta_dir, f"manifest-{p}-v{version}.json"),
                {
                    "part": p,
                    "version": version,
                    "schema_id": schema_id,
                    "rows": sum(int(r["rows"]) for r in frs),
                    "value_hash": vh,
                    "files": files,
                    "wall_time_share_s": wall / len(missing),
                    "input_snapshot": input_snapshot,
                    "written_at": time.time(),
                },
            )

    def _version_dir(self, part: str, version: int, part_col: str = "part") -> str:
        base = os.path.join(self.data_dir, f"{part_col}={part}")
        return base if version == -1 else os.path.join(base, f"snapv={version}")

    # file identity for position deletes: everything after the LAST
    # "/data/" — stable across "file://" vs bare paths and across a
    # relocated table root (the same normalization the manifest writer
    # uses for lineage file paths)
    @staticmethod
    def _rel_file_expr():
        return F.substring_index(F.col("_metadata.file_path"), "/data/", -1)

    def _delete_descs(self, snap: dict | None, parts) -> list[dict]:
        """Flatten the snapshot's merge-on-read delete descriptors for
        the given partitions (empty list when none exist)."""
        if not snap:
            return []
        dels = snap.get("deletes") or {}
        want = {str(p) for p in parts}
        return [d for p, ds in dels.items() if p in want for d in ds]

    @staticmethod
    def _version_pairs(snap: dict, parts=None) -> list[tuple[str, int]]:
        """All (part, version) data-file sets of a snapshot: the base
        version plus any merge-on-read appended versions (``adds``)."""
        ps = snap.get("parts", {})
        adds = snap.get("adds", {})
        sel = list(ps) if parts is None else [str(p) for p in parts]
        out = []
        for p in sel:
            if p in ps:
                out.append((p, ps[p]))
            out += [(p, v) for v in adds.get(p, [])]
        return out

    def _with_pos(self, df: DataFrame) -> DataFrame:
        """Project the hidden parquet ``_metadata`` columns into the
        stable (_file, _pos) row identity. Must run directly on a file
        source (the metadata struct does not survive a select)."""
        return df.withColumn("_file", self._rel_file_expr()).withColumn(
            "_pos", F.col("_metadata.row_index")
        )

    def _apply_deletes(
        self, spark: SparkSession, df: DataFrame, descs: list[dict]
    ) -> DataFrame:
        """Anti-join out the rows named by the delete files — the read
        half of merge-on-read. The delete side is O(deleted rows);
        Spark's planner broadcasts it when small (the common case: a
        GDPR-sized delete against a petabyte partition).

        Position deletes (kind=pos) remove exact ``(_file, _pos)``
        rows. Equality deletes (kind=eq, written by MOR merge) remove
        rows whose key matches AND whose data version (``snapv``)
        predates the delete's sequence number — so a merge's own
        appended rows survive its delete, and a later merge's delete
        supersedes an earlier merge's rows (last-writer-wins by
        sequence, Iceberg v2 semantics)."""

        def _live(ds):
            out = []
            for d in ds:
                p = os.path.join(self.root, d["path"])
                if os.path.exists(p):
                    out.append((p, d))
            return out

        pos = _live([d for d in descs if d.get("kind", "pos") == "pos"])
        eqs = _live([d for d in descs if d.get("kind") == "eq"])
        # explicit read schemas: delete sets on a stacked-DML table are
        # MANY small files (hundreds per merge wave); footer inference
        # over them dominated plan-build time. Columns absent from a
        # file read as null, extras are ignored, so naming only the
        # columns the anti-join consumes is robust across versions.
        dtypes = dict(df.dtypes)
        if pos:
            dd = (
                spark.read.schema("_file string, _pos bigint")
                .parquet(*[p for p, _ in pos])
                .select("_file", "_pos")
                .distinct()
            )
            df = df.join(dd, ["_file", "_pos"], "left_anti")
        if eqs:
            # one anti-join per distinct key set; within it, delete
            # files group by their commit SEQUENCE — all of one
            # commit's per-partition delete files share a seq, so they
            # read as ONE multi-path scan with a literal seq column.
            # (Reading per-FILE planned O(partitions x stacked merges)
            # separate scans: a stacked-DML table paid seconds of plan
            # build before the first task; grouped, it's O(merges)
            # scans — 3 stacked merges = 3 scans however many
            # partitions each touched.)
            by_keys: dict[tuple, dict[int, list[str]]] = {}
            for p, d in eqs:
                by_keys.setdefault(tuple(d["keys"]), {}).setdefault(
                    int(d["seq"]), []
                ).append(p)
            for keys, by_seq in by_keys.items():
                # key types come from the data side being filtered —
                # always current-schema (monotone widening ⇒ an older,
                # narrower delete file upcasts at scan)
                ddl = ", ".join(f"`{k}` {dtypes[k]}" for k in keys)
                dd = None
                for seq, paths in sorted(by_seq.items()):
                    one = spark.read.schema(ddl).parquet(*paths).select(
                        *[F.col(k).alias(f"__dk_{k}") for k in keys],
                        F.lit(seq).alias("__dseq"),
                    )
                    dd = one if dd is None else dd.unionByName(one)
                cond = F.col("snapv") < F.col("__dseq")
                for k in keys:
                    cond = cond & (F.col(k) == F.col(f"__dk_{k}"))
                df = df.join(dd, cond, "left_anti")
        return df

    def _read_versions(
        self,
        spark: SparkSession,
        versions: dict[str, int] | list[tuple[str, int]],
        part_col: str = "part",
        target_schema: dict | None = None,
        deletes: list[dict] | None = None,
        with_pos: bool = False,
    ) -> DataFrame:
        # pre-MVCC parts (version -1) live as loose files directly
        # under part=<p>; once a later MVCC rewrite adds snapv=<v>
        # subdirs there, reading the bare directory would pick up BOTH
        # — so legacy versions enumerate only the direct files.
        # With ``target_schema`` set, versions are grouped by the
        # schema their manifests say they were WRITTEN under (one scan
        # per distinct written schema — a handful at most) and each
        # group is field-id-normalized to the target before the union;
        # without it, raw physical columns come back unchanged.
        dir_groups: dict[object, list[str]] = {}
        legacy_groups: dict[object, list[str]] = {}
        pairs = sorted(versions.items()) if isinstance(versions, dict) else sorted(versions)
        for p, v in pairs:
            d = self._version_dir(p, v, part_col)
            if not os.path.exists(d):
                continue
            key = None
            if target_schema is not None:
                key = (self._manifest(p, v) or {}).get("schema_id")
            if v == -1:
                legacy_groups.setdefault(key, []).extend(
                    sorted(
                        os.path.join(d, f)
                        for f in os.listdir(d)
                        if f.endswith(".parquet")
                        and os.path.isfile(os.path.join(d, f))
                    )
                )
            else:
                dir_groups.setdefault(key, []).append(d)

        def _norm(df: DataFrame, key) -> DataFrame:
            if target_schema is None:
                return df
            written = self.schema(key) if key is not None else self.schema(0)
            return self._normalize_to_schema(df, written, target_schema, part_col)

        need_pos = with_pos or any(
            d.get("kind", "pos") == "pos" for d in (deletes or [])
        )

        def _reader(key):
            r = spark.read.option("basePath", self.data_dir)
            if target_schema is not None:
                ddl = self._schema_ddl(
                    self.schema(key) if key is not None else self.schema(0)
                )
                if ddl:
                    r = r.schema(ddl)
            return r

        dfs = []
        for key, paths in sorted(
            dir_groups.items(), key=lambda kv: (kv[0] is None, kv[0])
        ):
            df = _reader(key).parquet(*paths)
            if need_pos:
                df = self._with_pos(df)
            dfs.append(_norm(df, key))
        for key, files in sorted(
            legacy_groups.items(), key=lambda kv: (kv[0] is None, kv[0])
        ):
            if not files:
                continue
            df = _reader(key).parquet(*files).withColumn("snapv", F.lit(-1))
            if need_pos:
                df = self._with_pos(df)
            dfs.append(_norm(df, key))
        if not dfs:
            out = _norm(spark.read.parquet(self.data_dir).limit(0), None)
            if need_pos:
                out = out.withColumn("_file", F.lit(None).cast("string")).withColumn(
                    "_pos", F.lit(None).cast("bigint")
                )
        else:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
        if deletes:
            out = self._apply_deletes(spark, out, deletes)
        if need_pos and not with_pos:
            out = out.drop("_file", "_pos")
        return out

    @staticmethod
    def _schema_ddl(schema: dict | None) -> str | None:
        """Spark DDL string for a registered schema (field types are
        stored as ``df.dtypes`` simple strings, which ARE DDL). Passing
        it to ``spark.read.schema`` skips parquet footer inference —
        the metadata-not-footers contract real Iceberg has: plan
        building stops scaling with file count (a 52-file benchmark
        table spent ~1.3 s/read inferring; explicit schema is ~5x
        faster, and the gap grows with partitions). Partition-dir
        columns (part/snapv) are appended by Spark's discovery exactly
        as under inference, and files written NARROWER than their
        registered schema (the allowed int→bigint / float→double
        promotions) upcast at scan (verified on Spark 4)."""
        if not schema:
            return None
        return ", ".join(f"`{f['name']}` {f['type']}" for f in schema["fields"])

    def _manifest(self, p: str, v: int) -> dict | None:
        m = _read_json(os.path.join(self.meta_dir, f"manifest-{p}-v{v}.json"))
        if m is None:  # pre-MVCC manifest name
            m = _read_json(os.path.join(self.meta_dir, f"manifest-{p}.json"))
        return m

    @staticmethod
    def _normalize_prune(prune: dict) -> dict[str, tuple]:
        out = {}
        for c, rng in prune.items():
            if isinstance(rng, (tuple, list)):
                out[c] = (rng[0], rng[1])
            else:
                out[c] = (rng, rng)
        return out

    @staticmethod
    def _lt(a, b) -> bool | None:
        """a < b with type reconciliation: manifest stats for
        non-numeric dtypes are stored as strings, so numeric prune
        bounds against (say) timestamp-column stats hit str-vs-int.
        Coerce both sides to float when directly incomparable; if that
        fails too, return None = "unknown" (caller must keep the
        file — pruning stays sound, never crashes a read)."""
        try:
            return a < b
        except TypeError:
            try:
                return float(a) < float(b)
            except (TypeError, ValueError):
                return None

    @staticmethod
    def _overlaps(stats: dict, prune: dict[str, tuple]) -> bool:
        for c, (lo, hi) in prune.items():
            if c not in stats:
                continue  # no stats for this column → cannot skip
            mn, mx = stats[c]
            if mn is None or mx is None:
                continue
            if lo is not None and IcebergLayoutTable._lt(mx, lo):
                return False
            if hi is not None and IcebergLayoutTable._lt(hi, mn):
                return False
        return True

    def plan_files(
        self,
        snapshot_id: int | None = None,
        prune: dict | None = None,
    ) -> dict:
        """Iceberg scan planning over manifest column stats: resolve
        the snapshot's (part, version) set, skip every data file whose
        per-file min/max ranges (recorded at write time for the table
        sort-order columns) cannot overlap ``prune``, and return the
        surviving absolute file paths — metadata-only, no Spark job.

        ``prune``: ``{col: (lo, hi)}`` inclusive ranges (``None`` bound
        = open) or ``{col: value}`` for equality. Unknown columns and
        stat-less legacy manifests are kept (never unsound).

        Planning cost is O(committed parts) small-JSON reads on the
        driver — the same shape as Iceberg's driver-side planning over
        manifest files. Weekly parts put 10^12 rows at ~10^3–10^4
        manifests (years of data), well under a second; a part-value
        prune short-circuits before the manifest read, so time-ranged
        plans touch only the overlapping weeks' manifests.

        Returns ``{"files", "legacy_dirs", "total_files",
        "skipped_files", "skipped_parts", "part_col"}``.
        """
        snap = (
            self.current_snapshot() if snapshot_id is None
            else self.snapshot(snapshot_id)
        )
        if snap is None:
            raise FileNotFoundError(
                f"no snapshot {'CURRENT' if snapshot_id is None else snapshot_id} "
                f"in {self.meta_dir}"
            )
        part_col = snap.get("part_col", "part")
        rng = self._normalize_prune(prune or {})
        tsid = snap.get("schema_id")
        target = self.schema(tsid) if tsid is not None else None
        name_maps: dict[int, dict[str, str]] = {}
        files: list[str] = []
        files_by_schema: dict[object, list[str]] = {}
        legacy_dirs: dict[str, int] = {}
        total = skipped = skipped_parts = 0
        for p, v in sorted(self._version_pairs(snap)):
            part_prune = dict(rng)
            if part_col in part_prune:
                # short-circuits BEFORE the manifest read: time-ranged
                # plans only open the overlapping weeks' manifests
                lo, hi = part_prune.pop(part_col)
                bound = lo if lo is not None else hi
                try:  # compare in the bound's type (parts are strings)
                    pv = type(bound)(p) if bound is not None else p
                except (TypeError, ValueError):
                    pv = None  # incomparable → keep the part
                if pv is not None and (
                    (lo is not None and pv < lo) or (hi is not None and pv > hi)
                ):
                    skipped_parts += 1
                    continue
            m = self._manifest(p, v) or {}
            frs = m.get("files")
            if frs is None:  # legacy manifest without file stats
                legacy_dirs[p] = v
                continue
            wsid = m.get("schema_id")
            if target is not None and wsid is not None and wsid != tsid:
                # stats are keyed by WRITTEN column names; after a
                # rename the caller prunes with the current name — map
                # it back via field ids so old files still skip
                nm = name_maps.get(wsid)
                if nm is None:
                    ws = self.schema(wsid) or {"fields": []}
                    by_id = {f["id"]: f["name"] for f in ws["fields"]}
                    nm = {
                        f["name"]: by_id.get(f["id"], f["name"])
                        for f in target["fields"]
                    }
                    name_maps[wsid] = nm
                part_prune = {nm.get(c, c): b for c, b in part_prune.items()}
            # frs == [] means a committed-empty part: nothing to read
            total += len(frs)
            kept = [
                fr for fr in frs if self._overlaps(fr.get("stats", {}), part_prune)
            ]
            skipped += len(frs) - len(kept)
            if not kept:
                skipped_parts += 1
            paths = [os.path.join(self.data_dir, fr["path"]) for fr in kept]
            files += paths
            if paths:
                files_by_schema.setdefault(wsid, []).extend(paths)
        return {
            "files": files,
            "files_by_schema": files_by_schema,
            "legacy_dirs": legacy_dirs,
            "total_files": total,
            "skipped_files": skipped,
            "skipped_parts": skipped_parts,
            "part_col": part_col,
        }

    def read_parts(
        self,
        spark: SparkSession,
        parts,
        snapshot_id: int | None = None,
    ) -> DataFrame | None:
        """Public pruned-partition read: exactly the requested
        partitions at their committed snapshot versions (MVCC — a
        stale rewritten version is never double-read), None if none of
        the requested partitions exist. The partition-restricted
        sibling of :meth:`read_tier` — consumers (incremental refresh,
        the persisted ANN index) use this instead of reaching into the
        private version plumbing."""
        want = {str(p) for p in parts}
        versions = {
            p: v
            for p, v in self.part_versions(snapshot_id).items()
            if p in want
        }
        if not versions:
            return None
        return self._read_versions(spark, versions).drop("snapv")

    def read_tier(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        prune: dict | None = None,
        with_pos: bool = False,
        as_of: float | None = None,
    ) -> DataFrame:
        """Snapshot-isolated view: exactly the partition versions the
        (current or time-travel) snapshot committed, read as explicit
        directories — partition pruning by construction, and immune to
        concurrent rewrites of newer versions. Time travel by id
        (``snapshot_id``) or commit timestamp (``as_of`` epoch
        seconds, resolved on this ref's parent chain).

        ``prune`` ({col: (lo, hi)} or {col: value}) additionally skips
        data files via manifest column stats (:meth:`plan_files`) and
        applies the same range as a residual WHERE — exact results,
        with IO proportional to the files that can match."""
        if as_of is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id OR as_of, not both")
            snapshot_id = self.snapshot_as_of(as_of)["snapshot_id"]
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        if snap is None:
            raise FileNotFoundError(
                f"no snapshot {'CURRENT' if snapshot_id is None else snapshot_id} "
                f"in {self.meta_dir}"
            )
        part_col = snap.get("part_col", "part")
        tsid = snap.get("schema_id")
        # normalize to the schema OF THE SNAPSHOT BEING READ — time
        # travel to a pre-rename snapshot sees the old column names
        target = self.schema(tsid) if tsid is not None else None
        descs = self._delete_descs(snap, snap["parts"])
        if not prune:
            out = self._read_versions(
                spark, self._version_pairs(snap), part_col, target_schema=target,
                deletes=descs, with_pos=with_pos,
            ).drop("snapv")
            return out
        plan = self.plan_files(snapshot_id, prune)
        need_pos = with_pos or any(
            d.get("kind", "pos") == "pos" for d in descs
        )
        dfs = []
        for wsid, fpaths in sorted(
            plan["files_by_schema"].items(), key=lambda kv: (kv[0] is None, kv[0])
        ):
            rdr = spark.read.option("basePath", self.data_dir)
            if target is not None:
                ddl = self._schema_ddl(
                    self.schema(wsid) if wsid is not None else self.schema(0)
                )
                if ddl:
                    rdr = rdr.schema(ddl)
            df = rdr.parquet(*fpaths)
            if need_pos:
                df = self._with_pos(df)
            if target is not None:
                written = self.schema(wsid) if wsid is not None else self.schema(0)
                df = self._normalize_to_schema(df, written, target, part_col)
            dfs.append(df)
        if plan["legacy_dirs"]:
            dfs.append(
                self._read_versions(
                    spark, plan["legacy_dirs"], part_col, target_schema=target,
                    with_pos=need_pos,
                )
            )
        if not dfs:
            out = self._read_versions(
                spark, self._version_pairs(snap), part_col, target_schema=target,
                with_pos=need_pos,
            ).limit(0)
        else:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
        if descs:
            out = self._apply_deletes(spark, out, descs)
        if need_pos and not with_pos:
            out = out.drop("_file", "_pos")
        out = out.drop("snapv") if "snapv" in out.columns else out
        # residual predicate: stats pruning is IO-elision only; the
        # range itself is enforced on the surviving rows (Iceberg's
        # residual evaluation), so results are exact even where stats
        # are missing or coarse
        for c, (lo, hi) in self._normalize_prune(prune).items():
            if c not in out.columns:
                continue
            if lo is not None:
                out = out.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                out = out.where(F.col(c) <= F.lit(hi))
        return out

    # ----------------------------------------------------------- changes
    def changed_parts(self, from_snapshot: int, to_snapshot: int | None = None) -> dict:
        """Metadata-only diff of two snapshots: which partitions were
        added / rewritten / removed between them (Iceberg incremental-
        scan planning). No Spark job."""
        a = self.snapshot(from_snapshot)
        b = (
            self.current_snapshot() if to_snapshot is None
            else self.snapshot(to_snapshot)
        )
        if a is None or b is None:
            raise FileNotFoundError(
                f"snapshot missing: {from_snapshot} or {to_snapshot} in {self.meta_dir}"
            )
        pa, pb = a["parts"], b["parts"]
        da, db = a.get("deletes") or {}, b.get("deletes") or {}
        aa, ab = a.get("adds") or {}, b.get("adds") or {}
        return {
            "added": sorted(p for p in pb if p not in pa),
            # merge-on-read commits change a partition's ROWS without
            # changing its base data version — the delete-descriptor
            # and appended-version sets are part of the partition's
            # identity for change detection
            "rewritten": sorted(
                p for p in pb
                if p in pa and (
                    pb[p] != pa[p]
                    or da.get(p) != db.get(p)
                    or aa.get(p) != ab.get(p)
                )
            ),
            "removed": sorted(p for p in pa if p not in pb),
            "from_parts": pa,
            "to_parts": pb,
            "from_snapshot_obj": a,
            "to_snapshot_obj": b,
            "from_deletes": da,
            "to_deletes": db,
            "part_col": b.get("part_col", a.get("part_col", "part")),
        }

    def read_changes(
        self,
        spark: SparkSession,
        from_snapshot: int,
        to_snapshot: int | None = None,
        change_col: str = "_change",
    ) -> DataFrame:
        """Row-level changes between two snapshots as a DataFrame with
        ``_change`` ∈ {insert, delete} (an update = delete + insert).

        IO and shuffle are bounded by the CHANGED partitions only —
        unchanged partitions (same version in both snapshots) are never
        read, so a delta that touched 3 of 50,000 weekly parts diffs 3.
        Within a rewritten partition the row diff is two ``exceptAll``
        passes (new∖old = inserts, old∖new = deletes), which is exact
        under duplicate rows. This is the no-jar analog of Iceberg's
        ``incremental read`` / changelog scan."""
        ch = self.changed_parts(from_snapshot, to_snapshot)
        part_col = ch["part_col"]
        ins_parts = self._version_pairs(
            ch["to_snapshot_obj"], ch["added"] + ch["rewritten"]
        )
        del_parts = self._version_pairs(
            ch["from_snapshot_obj"], ch["removed"] + ch["rewritten"]
        )
        # both sides normalized to the TO-snapshot's schema so the row
        # diff compares like with like across a schema evolution (a
        # metadata-only rename yields zero row changes, as it should)
        to_snap = (
            self.current_snapshot() if to_snapshot is None
            else self.snapshot(to_snapshot)
        )
        tsid = to_snap.get("schema_id") if to_snap else None
        target = self.schema(tsid) if tsid is not None else None
        # each side applies ITS snapshot's merge-on-read deletes and
        # adds, so a MOR-only commit diffs as exactly its row changes
        new = self._read_versions(
            spark, ins_parts, part_col, target_schema=target,
            deletes=self._delete_descs(
                ch["to_snapshot_obj"], ch["added"] + ch["rewritten"]
            ),
        ).drop("snapv")
        old = self._read_versions(
            spark, del_parts, part_col, target_schema=target,
            deletes=self._delete_descs(
                ch["from_snapshot_obj"], ch["removed"] + ch["rewritten"]
            ),
        ).drop("snapv")
        # map columns are not comparable in set ops → diff on sorted
        # entry arrays (deterministic), restore the map type after
        map_cols = [c for c, t in new.dtypes if t.startswith("map<")]
        for c in map_cols:
            srt = F.sort_array(F.map_entries(F.col(c)))
            new = new.withColumn(c, srt)
            old = old.withColumn(c, srt)
        inserts = new.exceptAll(old).withColumn(change_col, F.lit("insert"))
        deletes = old.exceptAll(new).withColumn(change_col, F.lit("delete"))
        out = inserts.unionByName(deletes)
        for c in map_cols:
            out = out.withColumn(c, F.map_from_entries(F.col(c)))
        return out

    # ------------------------------------------------------ row-level ops
    def merge_rows(
        self,
        delta: DataFrame,
        keys: list[str],
        part_col: str | None = None,
        mode: str = "copy-on-write",
        idempotency_tag: str | None = None,
    ) -> dict:
        """Keyed upsert — ``MERGE INTO t USING delta ON keys WHEN
        MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *`` with
        whole-row replacement: every delta row replaces the base rows
        sharing its key; unseen keys insert. Two physical strategies
        with identical logical results:

        - ``copy-on-write`` (default): only parts present in ``delta``
          are read and rewritten (explicit version dirs, no scan of
          the rest of the table), so merging a day's corrections into
          years of history costs one bounded key-join — Spark's AQE
          broadcasts the key side when the delta is small — plus the
          rebalance write of the touched parts.
        - ``merge-on-read``: the delta's rows APPEND as new data files
          and its keys land as per-partition equality-delete files
          (Iceberg v2 MOR upsert) — write cost is O(delta), no base
          file is read or rewritten. Readers drop base rows whose key
          matches a delete with a later sequence number, so stacked
          merges are last-writer-wins; :meth:`compact_parts`
          materializes. A concurrent merge/delete on the same
          partition fails commit validation (serializable row state).

        MVCC as usual: readers on the prior snapshot are unaffected.
        Keys must be unique within ``delta`` per intended output row
        (duplicate-key delta rows all land — same as Iceberg merge
        with multiple matches on the source side being an error left
        to the caller).

        PRECONDITION — keys must functionally determine the partition:
        only partitions present in ``delta`` are read and rewritten
        (that bounded read IS the O(delta) design), so if a key can
        have base rows in a partition the delta doesn't touch, those
        rows survive as silent duplicates. ``keys`` must therefore
        contain ``part_col`` or a column it is derived from (the tier
        tables satisfy this: ``part`` is a function of ``bucket_s``
        and every caller merges on ``(url, bucket_s)``). Merging on a
        key that can move between partitions (e.g. ``url`` alone on a
        time-partitioned table) is out of contract — same as Iceberg,
        where a MERGE touching rows outside the pruned partition set
        must read them.

        ``idempotency_tag`` makes replays exactly-once for a
        single-writer feed (the streaming-upsert sink): a tag already
        in the snapshot's ``applied_upserts`` ledger returns the
        current snapshot without touching anything. (MOR merge replays
        are convergent even WITHOUT the tag — the replay's higher
        sequence supersedes the original rows — but the ledger makes
        them free and keeps the CDC changelog clean.)"""
        snap = self.current_snapshot()
        if idempotency_tag is not None and snap is not None:
            if idempotency_tag in snap.get("applied_upserts", []):
                return snap
        ledger = (
            {}
            if idempotency_tag is None
            else {"applied_upserts": (
                list((snap or {}).get("applied_upserts", []))
                + [idempotency_tag]
            )[-100:]}
        )
        # CAS the ledger this writer extended: a concurrent tagged
        # merge moving applied_upserts in the read->commit window
        # would otherwise have its entry silently dropped (lost
        # update), breaking exactly-once on ITS next replay
        ledger_cas = (
            None
            if idempotency_tag is None
            else {"applied_upserts": (snap or {}).get("applied_upserts")}
        )
        part_col = part_col or (snap.get("part_col", "part") if snap else "part")
        if part_col not in delta.columns:
            raise ValueError(f"delta must carry the partition column {part_col!r}")
        affected = sorted(
            str(r[0]) for r in delta.select(part_col).distinct().collect()
        )
        if snap is None:
            return self.write_tier(
                delta, part_col=part_col, input_snapshot="merge", extra=ledger
            )
        if mode == "merge-on-read":
            return self._merge_rows_mor(
                delta, keys, snap, part_col, affected, extra=ledger,
                expect_extra=ledger_cas,
            )
        pairs = self._version_pairs(snap, affected)
        tsid = snap.get("schema_id")
        target = self.schema(tsid) if tsid is not None else None
        base = self._read_versions(
            delta.sparkSession, pairs, part_col, target_schema=target,
            deletes=self._delete_descs(snap, affected),
        ).drop("snapv")
        kept = base.join(delta.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(delta, allowMissingColumns=True)
        return self.overwrite_parts(
            merged, affected, part_col=part_col, input_snapshot="merge",
            extra={"merge_keys": list(keys), **ledger},
            base_snapshot=snap,
            expect_extra=ledger_cas,
        )

    def _merge_rows_mor(
        self, delta: DataFrame, keys: list[str], snap: dict,
        part_col: str, affected: list[str], extra: dict | None = None,
        expect_extra: dict | None = None,
    ) -> dict:
        """Merge-on-read half of :meth:`merge_rows`: append the delta
        as new data files (``adds``) and its key tuples as
        equality-delete files with this write's sequence number. The
        delta's own rows are exempt from its delete (their data version
        equals the sequence); earlier rows with matching keys — base
        or prior adds — are dropped at read. Equality-delete key
        columns are pinned to the CURRENT schema names; compact before
        renaming merge-key columns."""
        spark = delta.sparkSession
        schema_id, expect_schema = self._ensure_write_schema(delta, part_col)
        v = self._claim_version()
        # 1. append the delta rows (new snapv=v dirs; manifests + file
        #    stats written like any other data, so scan pruning sees them)
        self._write_parts(delta, affected, v, part_col, "merge-mor", schema_id)
        # 2. equality-delete files: one key tuple per intended upsert,
        #    only for partitions that HAVE base rows to supersede
        existing = [p for p in affected if p in snap["parts"]]
        add_dels: dict[str, list[dict]] = {}
        if existing:
            out_dir = os.path.join(self.root, "deletes", f"delv={v}")
            (
                delta.where(F.col(part_col).cast("string").isin(existing))
                .select(part_col, *keys)
                .distinct()
                .write.partitionBy(part_col)
                .parquet(out_dir)
            )
            written = sorted(
                d.split("=", 1)[1]
                for d in os.listdir(out_dir)
                if d.startswith(f"{part_col}=")
            )
            add_dels = {
                p: [{
                    "path": f"deletes/delv={v}/{part_col}={p}",
                    "kind": "eq",
                    "keys": list(keys),
                    "seq": v,
                }]
                for p in written
            }
        new_parts = [p for p in affected if p not in snap["parts"]]
        base_vers = {p: snap["parts"].get(p) for p in affected}
        return self._commit(
            {},
            {
                "input_snapshot": "merge-mor",
                "new_parts": new_parts,
                "add_parts": existing,
                "part_col": part_col,
                "schema_id": schema_id,
                "merge_keys": list(keys),
                **(extra or {}),
            },
            # brand-new partitions: the appended files ARE the base
            update={
                **{p: snap["parts"][p] for p in existing},
                **{p: v for p in new_parts},
            },
            base_versions=base_vers,
            expect_schema=expect_schema,
            add_deletes=add_dels,
            add_adds={p: [v] for p in existing},
            expect_extra=expect_extra,
            expect_row_state={
                p: (
                    snap.get("adds", {}).get(p, []),
                    (snap.get("deletes") or {}).get(p, []),
                )
                for p in existing
            },
        )

    def delete_where(
        self,
        spark: SparkSession,
        predicate: str,
        prune: dict | None = None,
        mode: str = "copy-on-write",
    ) -> dict:
        """Row-level delete, keeping rows where the predicate is false
        **or NULL** (SQL DELETE three-valued semantics). Two physical
        strategies with identical logical results:

        - ``copy-on-write`` (default): one manifest-stat-pruned scan
          (pass ``prune`` to skip files by sort-order ranges) finds the
          partitions containing matches; ONLY those rewrite. Best when
          deletes are dense — reads of the new snapshot pay nothing.
        - ``merge-on-read``: write only the matched ``(_file, _pos)``
          positions as per-partition delete files (Iceberg v2 position
          deletes / deletion vectors); NO data file is rewritten —
          write cost is O(matched rows), so deleting a few rows from a
          petabyte partition costs kilobytes. Readers anti-join the
          positions out; :meth:`compact_parts` materializes and drops
          them. Best for sparse deletes (GDPR erasure, late
          corrections) and stacked small deletes.
        """
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.meta_dir}")
        part_col = snap.get("part_col", "part")
        if mode == "merge-on-read":
            return self._delete_where_mor(spark, snap, predicate, prune, part_col)
        cand = self.read_tier(spark, prune=prune)
        matching = sorted(
            str(r[0])
            for r in cand.where(F.expr(predicate))
            .select(part_col).distinct().collect()
        )
        if not matching:
            return snap  # nothing to delete — no new snapshot
        tsid = snap.get("schema_id")
        target = self.schema(tsid) if tsid is not None else None
        base = self._read_versions(
            spark, self._version_pairs(snap, matching), part_col,
            target_schema=target,
            deletes=self._delete_descs(snap, matching),
        ).drop("snapv")
        kept = base.where(~F.coalesce(F.expr(predicate), F.lit(False)))
        return self.overwrite_parts(
            kept, matching, part_col=part_col,
            input_snapshot=f"delete:{predicate}",
            base_snapshot=snap,
        )

    def update_where(
        self,
        spark: SparkSession,
        predicate: str,
        set: dict[str, str],
        prune: dict | None = None,
        mode: str = "copy-on-write",
    ) -> dict:
        """Row-level UPDATE — ``UPDATE t SET col = expr WHERE pred`` —
        completing the DML triad with :meth:`merge_rows` and
        :meth:`delete_where`. Rows where the predicate is false or
        NULL are untouched (SQL three-valued semantics); ``set`` maps
        column names to SQL expressions evaluated against the row.

        - ``copy-on-write``: rewrite only the partitions containing
          matches, applying ``CASE WHEN pred THEN expr ELSE col END``
          projections — one stat-pruned scan plus the bounded rewrite.
        - ``merge-on-read``: an update is a position-delete of the
          matched rows plus an APPEND of their updated images — both
          O(matched rows), zero base rewrite (Iceberg v2 MOR update).
          Readers see the new images; compaction materializes.
        """
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.meta_dir}")
        part_col = snap.get("part_col", "part")
        unknown = [c for c in set if c == part_col]
        if unknown:
            raise ValueError(f"cannot SET the partition column {part_col!r}")
        if mode == "merge-on-read":
            return self._update_where_mor(spark, snap, predicate, set, prune, part_col)
        cand = self.read_tier(spark, prune=prune)
        matching = sorted(
            str(r[0])
            for r in cand.where(F.expr(predicate))
            .select(part_col).distinct().collect()
        )
        if not matching:
            return snap
        base = self._read_versions(
            spark, self._version_pairs(snap, matching), part_col,
            target_schema=self.schema(snap.get("schema_id"))
            if snap.get("schema_id") is not None else None,
            deletes=self._delete_descs(snap, matching),
        ).drop("snapv")
        hit = F.coalesce(F.expr(predicate), F.lit(False))
        types = dict(base.dtypes)  # UPDATE never changes a column's type
        updated = base.select(*[
            (F.when(hit, F.expr(set[c]).cast(types[c]))
             .otherwise(F.col(c)).alias(c)
             if c in set else F.col(c))
            for c in base.columns
        ])
        return self.overwrite_parts(
            updated, matching, part_col=part_col,
            input_snapshot=f"update:{predicate}",
            base_snapshot=snap,
        )

    def _update_where_mor(
        self, spark, snap, predicate: str, set: dict[str, str],
        prune: dict | None, part_col: str,
    ) -> dict:
        """Merge-on-read UPDATE: one scan finds the matched rows; their
        positions become a position-delete file and their updated
        images append as new data files — the same commit carries both,
        so readers atomically flip from old to new images."""
        scan = self.read_tier(spark, prune=prune, with_pos=True)
        hit = F.coalesce(F.expr(predicate), F.lit(False))
        matched = scan.where(hit)
        affected = sorted(
            str(r[0]) for r in matched.select(part_col).distinct().collect()
        )
        if not affected:
            return snap
        v = self._claim_version()
        # position-delete files for the old images
        out_dir = os.path.join(self.root, "deletes", f"delv={v}")
        matched.select(part_col, "_file", "_pos").write.partitionBy(
            part_col
        ).parquet(out_dir)
        # updated images append (written through the normal path:
        # manifests, file stats, schema handling); set-expressions
        # cast to the column's existing type — UPDATE never retypes
        body = matched.drop("_file", "_pos")
        types = dict(body.dtypes)
        images = body.select(*[
            (F.expr(set[c]).cast(types[c]).alias(c) if c in set else F.col(c))
            for c in body.columns
        ])
        schema_id, expect_schema = self._ensure_write_schema(images, part_col)
        self._write_parts(
            images, affected, v, part_col, f"update-mor:{predicate}", schema_id
        )
        counts = {
            str(r[0]): int(r[1])
            for r in spark.read.parquet(out_dir).groupBy(part_col).count().collect()
        }
        add_dels = {
            p: [{
                "path": f"deletes/delv={v}/{part_col}={p}",
                "kind": "pos",
                "rows": counts.get(p, 0),
                "seq": v,
            }]
            for p in affected
        }
        base_vers = {p: snap["parts"][p] for p in affected}
        return self._commit(
            {},
            {
                "input_snapshot": f"update:{predicate}",
                "new_parts": [],
                "add_parts": affected,
                "delete_parts": affected,
                "part_col": part_col,
                "schema_id": schema_id,
            },
            update=base_vers,
            base_versions=base_vers,
            expect_schema=expect_schema,
            add_deletes=add_dels,
            add_adds={p: [v] for p in affected},
            expect_row_state={
                p: (
                    snap.get("adds", {}).get(p, []),
                    (snap.get("deletes") or {}).get(p, []),
                )
                for p in affected
            },
        )

    def _delete_where_mor(
        self, spark, snap, predicate: str, prune: dict | None, part_col: str
    ) -> dict:
        """Merge-on-read half of :meth:`delete_where`: one scan emits
        the matched row positions, partitioned by the table partition;
        the commit appends a position-delete descriptor per touched
        partition — data versions UNCHANGED. Already-deleted rows are
        excluded by the scan (read_tier applies existing deletes), so
        stacked deletes never duplicate positions. A concurrent rewrite
        of a touched partition raises ConcurrentWriteConflict (the
        positions would reference dead files)."""
        scan = self.read_tier(spark, prune=prune, with_pos=True)
        matched = scan.where(F.expr(predicate)).select(part_col, "_file", "_pos")
        v = self._claim_version()
        out_dir = os.path.join(self.root, "deletes", f"delv={v}")
        matched.write.partitionBy(part_col).parquet(out_dir)
        written = sorted(
            d.split("=", 1)[1]
            for d in os.listdir(out_dir)
            if d.startswith(f"{part_col}=")
        )
        if not written:  # no matches — leave no trace
            shutil.rmtree(out_dir, ignore_errors=True)
            return snap
        counts = {
            str(r[0]): int(r[1])
            for r in spark.read.parquet(out_dir).groupBy(part_col).count().collect()
        }
        add = {
            p: [{
                "path": f"deletes/delv={v}/{part_col}={p}",
                "kind": "pos",
                "rows": counts.get(p, 0),
                "seq": v,
            }]
            for p in written
        }
        base_vers = {p: snap["parts"][p] for p in written}
        return self._commit(
            {},
            {
                "input_snapshot": f"delete:{predicate}",
                "new_parts": [],
                "delete_parts": written,
                "part_col": part_col,
            },
            update=base_vers,
            base_versions=base_vers,
            add_deletes=add,
        )

    # -------------------------------------------------------- maintenance
    def compact_parts(
        self,
        spark: SparkSession,
        parts: list[str] | None = None,
        target_files: int = 1,
        order: str = "linear",
    ) -> dict:
        """Rewrite partitions into ``target_files`` files each
        (Iceberg's rewrite_data_files): reads the committed version,
        coalesces, lands as a NEW version via :meth:`overwrite_parts` —
        so readers on the old snapshot are untouched and the rewrite
        is crash-safe. Row content is byte-identical (verified by the
        lineage value_hash carrying over). Files written under older
        schemas are normalized to the CURRENT schema on the way through
        — compaction doubles as schema materialization, like Iceberg's
        rewrite_data_files.

        ``order="zorder"`` (with ``target_files > 1``) rewrites each
        partition into files covering narrow RECTANGLES of the sort-
        order key space instead of hash-salted slices: rows range-
        partition on (part, interleaved-bit z-value) and sort by z
        in-task, so the per-file min/max manifest stats become
        selective on EVERY sort dimension at once (Iceberg
        zorder / Delta OPTIMIZE ZORDER BY). Linear keeps leading-
        column locality; zorder trades a little of it for pruning on
        the trailing dimensions — pick per table read pattern."""
        if order not in ("linear", "zorder"):
            raise ValueError(f"unknown compaction order {order!r}")
        if order == "zorder" and target_files <= 1:
            raise ValueError(
                "zorder compaction needs target_files > 1 — with one "
                "file per part there are no file boundaries to cluster"
            )
        snap = self.current_snapshot()
        versions = dict((snap or {}).get("parts", {}))
        todo = sorted(versions) if parts is None else sorted(
            {str(p) for p in parts} & set(versions)
        )
        part_col = snap.get("part_col", "part") if snap else "part"
        tsid = snap.get("schema_id") if snap else None
        target = self.schema(tsid) if tsid is not None else None
        df = self._read_versions(
            spark, self._version_pairs(snap, todo), part_col, target_schema=target,
            deletes=self._delete_descs(snap, todo),
        ).drop("snapv")
        # the overwrite commit drops the materialized parts' delete
        # descriptors (version changed ⇒ deletes no longer apply) —
        # compaction doubles as Iceberg's rewrite_position_delete_files
        if target_files <= 1:
            if not self.cluster_writes:
                # no rebalance on the write path (cluster_writes=False
                # is the streaming/foreign-writer regime) — put each
                # partition wholly into one task so exactly one file
                # lands per part (hash-partitioning by part_col never
                # splits a part across tasks)
                df = df.repartition(max(1, len(todo)), F.col(part_col))
                sort_cols = [c for c in self.sort_order if c in df.columns]
                if sort_cols:
                    df = df.sortWithinPartitions(part_col, *sort_cols)
            # with cluster_writes=True the write's REBALANCE + in-task
            # sort already lands one file per partition
            return self.overwrite_parts(
                df, todo, part_col=part_col, input_snapshot="compaction",
                base_snapshot=snap,
            )
        if order == "zorder":
            from lambdo_spark.rollup.zorder import zvalue_expr

            zcols = [c for c in self.sort_order if c in df.columns]
            if not zcols:
                raise ValueError(
                    "zorder compaction needs sort-order columns in the frame"
                )
            zv, _ = zvalue_expr(df, zcols)
            ranged = df.withColumn("_zv", zv).repartitionByRange(
                max(1, len(todo)) * target_files, F.col(part_col), F.col("_zv")
            )
            # in-task z sort clusters row groups; the projection after
            # the sort (drop _zv) preserves in-partition order
            ranged = ranged.sortWithinPartitions(part_col, "_zv").drop("_zv")
            return self.overwrite_parts(
                ranged, todo, part_col=part_col, input_snapshot="compaction",
                base_snapshot=snap, cluster=False,
            )
        if order != "linear":
            raise ValueError(f"unknown compaction order {order!r}")
        # target_files > 1: a deterministic in-partition salt splits
        # each part across exactly ≤ target_files tasks; the write
        # must NOT re-cluster (the rebalance hint would re-shuffle and
        # pick its own file count), so cluster=False for this write.
        salt_src = [c for c in self.sort_order if c in df.columns] or df.columns
        salted = df.repartition(
            max(1, len(todo)) * target_files,
            F.col(part_col),
            F.pmod(F.xxhash64(*salt_src), F.lit(target_files)),
        )
        sort_cols = [c for c in self.sort_order if c in df.columns]
        if sort_cols:
            salted = salted.sortWithinPartitions(part_col, *sort_cols)
        return self.overwrite_parts(
            salted, todo, part_col=part_col, input_snapshot="compaction",
            base_snapshot=snap, cluster=False,
        )

    def _sweep_delete_files(
        self, live_paths: set[str], older_than_s: float = 0.0
    ) -> list[str]:
        """Remove merge-on-read delete-file part-directories whose
        descriptor path no live snapshot references (crashed delete
        attempts, expired snapshots' deletes, post-compaction leftovers).
        Empty ``delv=`` dirs are dropped with them."""
        removed: list[str] = []
        ddir = os.path.join(self.root, "deletes")
        if not os.path.isdir(ddir):
            return removed
        now = time.time()
        for vdir in sorted(os.listdir(ddir)):
            vpath = os.path.join(ddir, vdir)
            if not (vdir.startswith("delv=") and os.path.isdir(vpath)):
                continue
            for pdir in sorted(os.listdir(vpath)):
                full = os.path.join(vpath, pdir)
                rel = f"deletes/{vdir}/{pdir}"
                if "=" not in pdir or rel in live_paths or not os.path.isdir(full):
                    continue
                newest = max(
                    (os.path.getmtime(os.path.join(full, f))
                     for f in os.listdir(full)),
                    default=0,
                )
                if older_than_s and now - newest <= older_than_s:
                    continue
                shutil.rmtree(full)
                removed.append(full)
            if not any(
                os.path.isdir(os.path.join(vpath, x)) for x in os.listdir(vpath)
            ):
                shutil.rmtree(vpath)
        return removed

    @staticmethod
    def _live_delete_paths(snaps: list[dict]) -> set[str]:
        return {
            d["path"]
            for s in snaps
            for ds in (s.get("deletes") or {}).values()
            for d in ds
        }

    def rewrite_deletes(
        self, spark: SparkSession, min_files: int = 1, target_files: int = 1
    ) -> dict:
        """Targeted merge-on-read maintenance (Iceberg's
        rewrite_position_delete_files as a policy): compact ONLY the
        partitions whose MOR read tax — delete files plus appended
        file sets — has reached ``min_files``. Partitions below the
        threshold keep their cheap O(delta) state; partitions above it
        fold everything back into clean base files in one bounded
        rewrite. Run periodically next to a streaming upsert sink so
        the anti-join side stays broadcast-sized. Returns the commit
        snapshot, or the current one when nothing qualifies."""
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.meta_dir}")
        tax: dict[str, int] = {}
        for p, ds in (snap.get("deletes") or {}).items():
            tax[p] = tax.get(p, 0) + len(ds)
        for p, vs in (snap.get("adds") or {}).items():
            tax[p] = tax.get(p, 0) + len(vs)
        todo = sorted(p for p, n in tax.items() if n >= min_files)
        if not todo:
            return snap
        return self.compact_parts(spark, parts=todo, target_files=target_files)

    def remove_orphans(self, older_than_s: float = 3600.0) -> list[str]:
        """Delete (part, snapv) data directories referenced by NO
        existing snapshot — leftovers of crashed attempts and lost
        optimistic-concurrency races (Iceberg's remove_orphan_files).
        ``older_than_s`` protects in-flight writers: a directory is
        only an orphan candidate once its newest file is older than
        the grace period. Also drops version-claim markers strictly
        below the next snapshot id — ids no future writer can claim
        (claims always start at the next id and go up)."""
        live: set[tuple[str, int]] = set()
        snap_ids = [
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        all_snaps = []
        for n in snap_ids:
            s = self.snapshot(n)
            all_snaps.append(s)
            live |= set(self._version_pairs(s))
        deleted = self._sweep_delete_files(
            self._live_delete_paths(all_snaps), older_than_s
        )
        now = time.time()
        if not os.path.isdir(self.data_dir):
            return deleted
        for pdir in os.listdir(self.data_dir):
            if "=" not in pdir:
                continue
            p = pdir.split("=", 1)[1]
            base = os.path.join(self.data_dir, pdir)
            for vdir in os.listdir(base):
                if not vdir.startswith("snapv="):
                    continue
                v = int(vdir.split("=", 1)[1])
                if (p, v) in live:
                    continue
                d = os.path.join(base, vdir)
                newest = max(
                    (os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)),
                    default=0,
                )
                if now - newest > older_than_s:
                    shutil.rmtree(d)
                    deleted.append(d)
        # claim markers below the next snapshot id are unreachable by
        # any future _claim_version scan — safe to drop (tiny files,
        # but unbounded growth under heavy contention otherwise)
        floor = self._next_snapshot_id()
        for f in os.listdir(self.meta_dir):
            if f.startswith("version-") and f.endswith(".claim"):
                try:
                    n = int(f[len("version-") : -len(".claim")])
                except ValueError:
                    continue
                if n < floor:
                    with contextlib.suppress(OSError):
                        os.remove(os.path.join(self.meta_dir, f))
        return deleted

    # ------------------------------------------------------------ expire
    def drop_parts_older_than(self, cutoff: int) -> dict:
        """Age-based data retention as a METADATA-ONLY commit (the
        drop_chunks / ALTER TABLE DROP PARTITION idiom): partitions
        whose time-bucket value is < ``cutoff`` leave the new
        snapshot's parts map — zero data files are read, rewritten, or
        deleted, so retention on a 100 TB table costs one JSON write.
        Older snapshots still time-travel to the dropped data;
        :meth:`expire_snapshots` later reclaims the bytes. Commit
        validation rejects a concurrent rewrite of a partition being
        dropped (the rewrite would otherwise resurrect under GC)."""
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.meta_dir}")
        part_col = snap.get("part_col", "part")
        try:
            doomed = sorted(p for p in snap["parts"] if int(p) < cutoff)
        except ValueError as e:
            raise ValueError(
                f"drop_parts_older_than needs numeric {part_col!r} "
                f"partition values (time buckets)"
            ) from e
        if not doomed:
            return snap
        return self._commit(
            {},
            {
                "input_snapshot": f"drop:{part_col}<{cutoff}",
                "new_parts": [],
                "dropped_parts": doomed,
                "part_col": part_col,
            },
            base_versions={p: snap["parts"][p] for p in doomed},
            remove=set(doomed),
        )

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Garbage-collect partition versions referenced only by
        snapshots older than the ``keep_last`` most recent. Returns the
        deleted data directories. CURRENT and the kept snapshots stay
        fully readable (Iceberg's expire_snapshots)."""
        snaps = sorted(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("snapshot-") and f.endswith(".json")
        )
        # every ref head (main + branches) stays readable regardless of
        # age — an unpublished audit branch must survive maintenance —
        # and so must each head's ancestry down to the protected
        # region, or publish_branch's fast-forward walk would break
        refs = self.list_branches()
        heads = set(refs.values())
        keep_set = set(snaps[-keep_last:]) | (heads & set(snaps))
        branch_heads = {v for b, v in refs.items() if b != "main"}
        for h in sorted(branch_heads & set(snaps)):
            # protect the branch's own commit chain (branch-tagged
            # snapshots) so publish_branch's ancestry walk stays
            # intact; the walk stops at the fork into main history
            node = self.snapshot(h)
            while node is not None and (
                node.get("branch") or node["snapshot_id"] in heads
            ):
                keep_set.add(node["snapshot_id"])
                parent = node.get("parent")
                node = self.snapshot(parent) if parent is not None else None
        keep = sorted(keep_set & set(snaps))
        drop = [n for n in snaps if n not in keep_set]
        live: set[tuple[str, int]] = set()
        part_col = "part"
        kept_snaps = []
        for n in keep:
            s = self.snapshot(n)
            kept_snaps.append(s)
            part_col = s.get("part_col", part_col)
            live |= set(self._version_pairs(s))
        # delete files referenced only by expired snapshots go with them
        deleted = self._sweep_delete_files(self._live_delete_paths(kept_snaps))
        for n in drop:
            s = self.snapshot(n)
            for p, v in self._version_pairs(s):
                if (p, v) in live:
                    continue
                d = self._version_dir(p, v, s.get("part_col", part_col))
                if os.path.exists(d):
                    if v == -1:
                        # pre-MVCC version: the bare part=<p> directory
                        # may ALSO hold live snapv=<v> subdirs from a
                        # later rewrite — delete only the loose files,
                        # never the versioned subdirectories
                        removed = False
                        for f in os.listdir(d):
                            fp = os.path.join(d, f)
                            if os.path.isfile(fp):
                                os.remove(fp)
                                removed = True
                        if removed:
                            deleted.append(d)
                        if not os.listdir(d):
                            os.rmdir(d)
                    else:
                        shutil.rmtree(d)
                        deleted.append(d)
                for m in (
                    os.path.join(self.meta_dir, f"manifest-{p}-v{v}.json"),
                    *( [os.path.join(self.meta_dir, f"manifest-{p}.json")]
                       if v == -1 else [] ),
                ):
                    if os.path.exists(m):
                        os.remove(m)
                live.add((p, v))  # only delete once
            os.remove(os.path.join(self.meta_dir, f"snapshot-{n}.json"))
        return deleted


def with_part(
    df: DataFrame,
    bucket_col: str = "bucket_s",
    part_seconds: int = DEFAULT_PART_SECONDS,
) -> DataFrame:
    """Derive the partition value (weekly by default) from the bucket."""
    return df.withColumn(
        "part",
        (F.floor(F.col(bucket_col) / F.lit(part_seconds)) * F.lit(part_seconds)).cast(
            "long"
        ),
    )
