"""Split catalog + checkpoints — the metastore analog.

The reference keeps a split catalog (SplitMetadata rows with state
Staged→Published→MarkedForDeletion, time range, tags, demux ops —
quickwit-metastore/src/split_metadata.rs:56-136) and a per-source checkpoint
map partition_id→position with atomic, overlap-rejecting delta application
(quickwit-metastore/src/checkpoint.rs:299-353).

The catalog's STATE MACHINE (this module) is backend-independent; the
persistence + transaction layer is pluggable (metastore.py), mirroring the
reference's Metastore trait with its two shipped implementations:

* json (local default) — the whole state as one JSON object PUT through
  the storage abstraction (file-backed metastore analog); mutations are
  locked read-modify-writes under an exclusive flock on
  `<index>/.catalog.lock` on local filesystems.
* cas (object-store default) — a generation-numbered commit log advanced
  by conditional PUT (S3 If-None-Match class), giving lock-free
  multi-writer safety on object stores (metastore.CasObjectBackend).
* sqlite — normalized split rows + BEGIN IMMEDIATE transactions (the
  PostgreSQL-metastore analog; see metastore.SqliteBackend).

Data files live under the index dir partitioned by split_id; readers only
look at split dirs the catalog lists as Published, which is what makes
publish atomic and staged data invisible (same trick as the reference's
stage/publish split lifecycle).  Both backends pass the same contract
suite (tests/test_metastore_contract.py, the quickwit-metastore
src/tests.rs analog), including multi-process writer races.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field
from typing import Callable, Iterable

from ..storage import storage_for
from .metastore import resolve_backend


def _now() -> float:
    import time

    return time.time()

STAGED = "Staged"
PUBLISHED = "Published"
MARKED_FOR_DELETION = "MarkedForDeletion"

# Serialized-metadata versioning (split_metadata_version.rs + the
# backward_compatibility_tests/ fixture suite analog).  The catalog state
# carries "version"; rounds 1-2 wrote none (= version 0) and every state
# they persisted still loads — tests/golden/compat_r2_index pins a frozen
# round-2 index end-to-end.  Opening a FUTURE version fails loudly: newer
# engines may rely on invariants this one cannot check.  Mutating an old
# catalog upgrades it on write (the reference's upgrade-on-deserialize).
CATALOG_VERSION = 3
# version stamped on each split's metadata row at stage time; 0 = row
# written before versioning existed (fully readable)
SPLIT_FORMAT_VERSION = 1


class CatalogFromFutureError(Exception):
    """Catalog written by a newer engine version than this one."""


class IncompatibleCheckpointDelta(Exception):
    """Overlapping / regressing checkpoint delta (reference checkpoint.rs:299-353)."""


class SplitsNotStagedError(Exception):
    """publish_splits on a split not in Staged state — the reference's
    MetastoreError::SplitsNotStaged (tests.rs:420-456: publishing a
    MarkedForDeletion or already-Published split must fail)."""


class SplitsNotDeletableError(Exception):
    """delete_splits on a Published split — the reference only deletes
    Staged / MarkedForDeletion splits (MetastoreError::SplitsNotDeletable)."""


@dataclass
class SplitMetadata:
    split_id: str
    state: str = STAGED
    num_docs: int = 0
    ts_min: int | None = None
    ts_max: int | None = None
    tags: list[str] = field(default_factory=list)
    num_merge_ops: int = 0
    # metadata-row format version (SPLIT_FORMAT_VERSION at stage time;
    # 0 = pre-versioning row)
    format_version: int = 0
    # demux lineage (reference SplitMetadata.demux_num_ops): a demuxed
    # split is MATURE for merge no matter how small — re-merging it would
    # undo the tenant clustering (merge_policy.rs:247-249)
    demux_num_ops: int = 0
    create_seq: int = 0
    # wall-clock of the last state transition (reference
    # SplitMetadata.update_timestamp): drives the gc grace period for
    # stale Staged splits.  0.0 = legacy row (treated as infinitely old)
    update_ts: float = 0.0
    # per-split [min, max] of each extra fast field (i64/date as int,
    # f64 as float) — split-pruning stats for numeric range filters, the
    # generalization of ts_min/ts_max.  {} on legacy rows (no pruning,
    # filters still exact via the leaf mask)
    field_ranges: dict[str, list] = field(default_factory=dict)
    # per-field sum of BM25 field lengths (exact, not the reference's lossy
    # 1-byte fieldnorms) — global avg_len = Σ len_sum / Σ num_docs
    field_len_sums: dict[str, int] = field(default_factory=dict)
    # lineage + metrics per north rule: docs/postings/bytes per partition
    metrics: dict = field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "SplitMetadata":
        return SplitMetadata(**d)


def _fresh_state() -> dict:
    return {
        "version": CATALOG_VERSION,
        "config": None,
        "splits": {},  # split_id -> SplitMetadata dict
        "checkpoint": {},  # partition_id -> position (lexicographic order = natural)
        "next_seq": 0,
        # global term-stats LSM: delta files (paths relative to the
        # index dir) whose summed (field, term) doc_freq equals the
        # whole published index's — maintained by publish (insert) and
        # merge rounds (compaction); merges/demux never change it (they
        # rewrite the same docs).  `complete` turns False forever if
        # anything publishes docs without a delta — readers then fall
        # back to scanning per-split postings for doc_freq.
        "termstats": {"deltas": [], "complete": True},
    }


def _check_version(state: dict, index_dir: str) -> None:
    v = state.get("version", 0)
    if isinstance(v, int) and v > CATALOG_VERSION:
        raise CatalogFromFutureError(
            f"catalog at {index_dir} is version {v}, written by a newer "
            f"engine (this one reads <= {CATALOG_VERSION}); upgrade before "
            "opening it"
        )


class Catalog:
    def __init__(self, index_dir: str, metastore: str | None = None):
        self.index_dir = index_dir
        self.storage = storage_for(index_dir)
        self.backend = resolve_backend(index_dir, self.storage, metastore)
        self.path = self.backend.path
        self._state = self._load() or _fresh_state()

    def _load(self) -> dict | None:
        state = self.backend.load()
        if state is not None:
            _check_version(state, self.index_dir)
            # catalogs written before termstats existed: mark incomplete
            state.setdefault("termstats", {"deltas": [], "complete": False})
        return state

    def update(self, fn: Callable[[dict], None]) -> None:
        """Apply ``fn`` to the CURRENT persisted state inside the backend's
        write transaction and commit — the one mutation primitive.  fn sees
        fresh state (another process may have published/merged since we
        loaded), so concurrent writers serialize instead of losing
        updates."""

        def norm_fn(state):
            _check_version(state, self.index_dir)
            # catalogs written before termstats existed: mark incomplete
            state.setdefault("termstats", {"deltas": [], "complete": False})
            # upgrade-on-write: any mutation stamps the current version
            state["version"] = CATALOG_VERSION
            fn(state)

        self._state = self.backend.rmw(norm_fn, self._state)

    def _save(self) -> None:
        """Commit the in-memory state as-is (no reload).  Only for
        single-writer flows that built self._state from scratch; racing
        writers should use update()."""
        self.backend.put(self._state)

    def reload(self) -> "Catalog":
        return Catalog(self.index_dir)

    @staticmethod
    def exists(index_dir: str) -> bool:
        """Is there an index (any metastore backend) at ``index_dir``?"""
        st = storage_for(index_dir)
        return resolve_backend(index_dir, st).exists()

    @staticmethod
    def state_token(index_dir: str) -> tuple | None:
        """Cheap catalog-change token for driver caches (None = no index):
        file (mtime, size) for json, the revision counter for sqlite."""
        st = storage_for(index_dir)
        return resolve_backend(index_dir, st).state_token()

    # -- basic ----------------------------------------------------------
    @staticmethod
    def create(
        index_dir: str, config_dict: dict, metastore: str | None = None
    ) -> "Catalog":
        st = storage_for(index_dir)
        if st.is_local:
            os.makedirs(st.fs_path(index_dir), exist_ok=True)
        cat = Catalog(index_dir, metastore=metastore)
        if cat._state["config"] is None:

            def init(state):
                if state["config"] is None:
                    state["config"] = config_dict

            cat.update(init)
        return cat

    @property
    def config_dict(self) -> dict:
        return self._state["config"]

    # -- splits ----------------------------------------------------------
    def splits(self, states: Iterable[str] = (PUBLISHED,)) -> list[SplitMetadata]:
        states = set(states)
        return sorted(
            (
                SplitMetadata.from_dict(s)
                for s in self._state["splits"].values()
                if s["state"] in states
            ),
            key=lambda s: (s.create_seq, s.split_id),
        )

    def stage_split(self, meta: SplitMetadata) -> None:
        self.stage_splits([meta])

    def stage_splits(self, metas: list["SplitMetadata"]) -> None:
        """Stage a batch in ONE read-modify-write transaction.  At the
        reference's 10M-doc split target a 100-TB build publishes ~10^4
        splits; one catalog transaction per split would cost O(splits x
        catalog-size) driver time on the JSON backend — a wave stages all
        its splits in a single commit instead."""
        now = _now()
        for meta in metas:
            meta.state = STAGED
            meta.update_ts = now
            meta.format_version = SPLIT_FORMAT_VERSION

        def apply(state):
            for meta in metas:
                meta.create_seq = state["next_seq"]
                state["next_seq"] += 1
                state["splits"][meta.split_id] = asdict(meta)

        self.update(apply)

    def publish_splits(
        self,
        split_ids: list[str],
        checkpoint_delta: dict[str, tuple[str | None, str]],
        termstats_delta: str | None = None,
    ) -> None:
        """Atomically publish staged splits and apply the checkpoint delta.

        checkpoint_delta maps partition_id -> (from_position, to_position);
        application fails (and publishes nothing) if from_position does not
        equal the current position — the exactly-once guard of the reference
        (checkpoint.rs:299-353, docs/design/indexing.md:46).

        ``termstats_delta`` is the batch's global-df delta file (relative
        path), committed in the same atomic catalog write; publishing docs
        WITHOUT one permanently marks the term-stats LSM incomplete.
        """

        def apply(state):
            cp = state["checkpoint"]
            for pid, (frm, to) in checkpoint_delta.items():
                cur = cp.get(pid)
                if cur != frm:
                    raise IncompatibleCheckpointDelta(
                        f"partition {pid}: delta from {frm!r} but checkpoint is at {cur!r}"
                    )
                if frm is not None and to <= frm:
                    raise IncompatibleCheckpointDelta(
                        f"partition {pid}: regressing {frm!r}→{to!r}"
                    )
            for sid in split_ids:
                if sid not in state["splits"]:
                    raise KeyError(f"unknown split {sid}")
                if state["splits"][sid]["state"] != STAGED:
                    raise SplitsNotStagedError(
                        f"split {sid} is {state['splits'][sid]['state']}, not Staged"
                    )
            now = _now()
            for sid in split_ids:
                state["splits"][sid]["state"] = PUBLISHED
                state["splits"][sid]["update_ts"] = now
            for pid, (_frm, to) in checkpoint_delta.items():
                cp[pid] = to
            ts = state["termstats"]
            if termstats_delta is not None:
                ts["deltas"].append(termstats_delta)
            elif any(state["splits"][sid]["num_docs"] > 0 for sid in split_ids):
                ts["complete"] = False

        self.update(apply)

    def replace_splits(self, new_split_ids: list[str], replaced_split_ids: list[str]) -> None:
        """Merge/compaction transaction (reference publisher.rs:109-127).

        Validated inside the same read-modify-write transaction, like
        publish_splits: every new split must be STAGED and every replaced
        split PUBLISHED.  Without the latter check, two concurrent merge
        rounds planned from the same catalog snapshot would BOTH replace
        the same inputs — the loser re-marking already-dead splits and
        publishing a second copy of the same documents (the reference's
        metastore rejects this class too, SplitsNotStaged/NotPublished)."""

        def apply(state):
            for sid in new_split_ids:
                s = state["splits"].get(sid)
                if s is None or s["state"] != STAGED:
                    raise ValueError(
                        f"replace_splits: new split {sid!r} is not staged"
                    )
            for sid in replaced_split_ids:
                s = state["splits"].get(sid)
                if s is None or s["state"] != PUBLISHED:
                    raise ValueError(
                        f"replace_splits: replaced split {sid!r} is not "
                        "published (lost a concurrent merge race?)"
                    )
            now = _now()
            for sid in new_split_ids:
                state["splits"][sid]["state"] = PUBLISHED
                state["splits"][sid]["update_ts"] = now
            for sid in replaced_split_ids:
                state["splits"][sid]["state"] = MARKED_FOR_DELETION
                state["splits"][sid]["update_ts"] = now

        self.update(apply)

    def mark_for_deletion(self, split_ids: list[str]) -> None:
        """Unconditional state flip for index deletion / GC administration —
        NOT the merge transaction (replace_splits validates states)."""

        def apply(state):
            now = _now()
            for sid in split_ids:
                if sid in state["splits"]:
                    state["splits"][sid]["state"] = MARKED_FOR_DELETION
                    state["splits"][sid]["update_ts"] = now

        self.update(apply)

    def checkpoint(self) -> dict[str, str]:
        return dict(self._state["checkpoint"])

    # -- sources (per-index source configs, quickwit-cli/src/source.rs) ----
    def sources(self) -> dict[str, dict]:
        return dict(self._state.setdefault("sources", {}))

    def add_source(self, source_id: str, source_type: str, params: dict) -> None:
        def apply(state):
            if "/" in source_id or "~" in source_id:
                # '~' is reserved: source-scoped checkpoint keys (= split
                # ids) are '{source_id}~~...' and the delete prefix must be
                # exact; '/' would nest the split_id=<sid> partition dirs
                raise ValueError(
                    f"source id may not contain '/' or '~': {source_id!r}"
                )
            srcs = state.setdefault("sources", {})
            if source_id in srcs:
                raise ValueError(f"source {source_id!r} already exists")
            srcs[source_id] = {"source_type": source_type, "params": params}

        self.update(apply)

    def delete_source(self, source_id: str) -> None:
        """Remove the source and ITS checkpoint entries (the reference
        deletes a source's checkpoint with it; ingest build ids are
        prefixed '{source_id}~~', a separator no source id can contain —
        a raw '-' prefix also matched sibling sources like 'app-errors'
        when deleting 'app', destroying their exactly-once state)."""

        def apply(state):
            srcs = state.setdefault("sources", {})
            if source_id not in srcs:
                raise KeyError(f"no source {source_id!r}")
            del srcs[source_id]
            cp = state["checkpoint"]
            for k in [k for k in cp if k.startswith(f"{source_id}~~")]:
                del cp[k]

        self.update(apply)

    # -- term-stats LSM ----------------------------------------------------
    def termstats_files(self) -> list[str] | None:
        """Logical paths of the committed term-stats delta files (each a
        parquet file or a directory of parts), or None if the LSM is
        incomplete and readers must fall back to scanning split postings."""
        ts = self._state["termstats"]
        if not ts["complete"]:
            return None
        return [os.path.join(self.index_dir, d) for d in ts["deltas"]]

    def compact_termstats(self, new_delta: str, replaced: list[str]) -> None:
        """Swap ``replaced`` delta entries for the single compacted one
        (atomic; the merge-round compaction commit).

        Validated inside the transaction like replace_splits: every replaced
        delta must still be committed.  Without the check, two compactions
        planned from the same catalog snapshot would BOTH append a full-sum
        compacted delta — doubling every term's global doc_freq (silently
        wrong BM25 idf) instead of failing the losing round."""
        gone = set(replaced)

        def apply(state):
            ts = state["termstats"]
            missing = gone - set(ts["deltas"])
            if missing:
                raise ValueError(
                    "compact_termstats: replaced delta(s) no longer "
                    f"committed (lost a concurrent compaction race?): "
                    f"{sorted(missing)}"
                )
            ts["deltas"] = [d for d in ts["deltas"] if d not in gone] + [new_delta]

        self.update(apply)

    def delete_splits(self, split_ids: list[str]) -> None:
        def apply(state):
            for sid in split_ids:
                row = state["splits"].get(sid)
                if row is not None and row["state"] == PUBLISHED:
                    raise SplitsNotDeletableError(
                        f"split {sid} is Published; mark it for deletion first"
                    )
            for sid in split_ids:
                state["splits"].pop(sid, None)

        self.update(apply)

    # -- derived global stats (query-time BM25 inputs) --------------------
    def global_stats(self) -> dict:
        pub = self.splits([PUBLISHED])
        n = sum(s.num_docs for s in pub)
        len_sums: dict[str, int] = {}
        for s in pub:
            for f_, v in s.field_len_sums.items():
                len_sums[f_] = len_sums.get(f_, 0) + v
        return {
            "num_docs": n,
            "avg_len": {f_: (v / n if n else 0.0) for f_, v in len_sums.items()},
        }
