"""Split catalog + checkpoints — the metastore analog.

The reference keeps a split catalog (SplitMetadata rows with state
Staged→Published→MarkedForDeletion, time range, tags, demux ops —
quickwit-metastore/src/split_metadata.rs:56-136) and a per-source checkpoint
map partition_id→position with atomic, overlap-rejecting delta application
(quickwit-metastore/src/checkpoint.rs:299-353).

Here the catalog is a single JSON file updated by atomic write-then-rename
(the analog of the reference's file-backed metastore; an Iceberg/Delta table
commit would replace this on a real deployment — the read path only needs
"list splits with state/ts_range/tags").  Data files live under the index
dir partitioned by split_id; readers only look at split dirs the catalog
lists as Published, which is what makes publish atomic and staged data
invisible (same trick as the reference's stage/publish split lifecycle).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Iterable

STAGED = "Staged"
PUBLISHED = "Published"
MARKED_FOR_DELETION = "MarkedForDeletion"


class IncompatibleCheckpointDelta(Exception):
    """Overlapping / regressing checkpoint delta (reference checkpoint.rs:299-353)."""


@dataclass
class SplitMetadata:
    split_id: str
    state: str = STAGED
    num_docs: int = 0
    ts_min: int | None = None
    ts_max: int | None = None
    tags: list[str] = field(default_factory=list)
    num_merge_ops: int = 0
    create_seq: int = 0
    # per-field sum of BM25 field lengths (exact, not the reference's lossy
    # 1-byte fieldnorms) — global avg_len = Σ len_sum / Σ num_docs
    field_len_sums: dict[str, int] = field(default_factory=dict)
    # lineage + metrics per north rule: docs/postings/bytes per partition
    metrics: dict = field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "SplitMetadata":
        return SplitMetadata(**d)


class Catalog:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "catalog.json")
        self._state = {
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
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._state = json.load(f)
            # catalogs written before termstats existed: mark incomplete
            self._state.setdefault("termstats", {"deltas": [], "complete": False})

    # -- basic ----------------------------------------------------------
    @staticmethod
    def create(index_dir: str, config_dict: dict) -> "Catalog":
        os.makedirs(index_dir, exist_ok=True)
        cat = Catalog(index_dir)
        if cat._state["config"] is None:
            cat._state["config"] = config_dict
            cat._save()
        return cat

    def _save(self) -> None:
        tmp = self.path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.path)  # atomic publish

    def reload(self) -> "Catalog":
        return Catalog(self.index_dir)

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
        meta.state = STAGED
        meta.create_seq = self._state["next_seq"]
        self._state["next_seq"] += 1
        self._state["splits"][meta.split_id] = asdict(meta)
        self._save()

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
        cp = self._state["checkpoint"]
        for pid, (frm, to) in checkpoint_delta.items():
            cur = cp.get(pid)
            if cur != frm:
                raise IncompatibleCheckpointDelta(
                    f"partition {pid}: delta from {frm!r} but checkpoint is at {cur!r}"
                )
            if frm is not None and to <= frm:
                raise IncompatibleCheckpointDelta(f"partition {pid}: regressing {frm!r}→{to!r}")
        for sid in split_ids:
            if sid not in self._state["splits"]:
                raise KeyError(f"unknown split {sid}")
            self._state["splits"][sid]["state"] = PUBLISHED
        for pid, (_frm, to) in checkpoint_delta.items():
            cp[pid] = to
        ts = self._state["termstats"]
        if termstats_delta is not None:
            ts["deltas"].append(termstats_delta)
        elif any(self._state["splits"][sid]["num_docs"] > 0 for sid in split_ids):
            ts["complete"] = False
        self._save()

    def replace_splits(self, new_split_ids: list[str], replaced_split_ids: list[str]) -> None:
        """Merge/compaction transaction (reference publisher.rs:109-127)."""
        for sid in new_split_ids:
            self._state["splits"][sid]["state"] = PUBLISHED
        for sid in replaced_split_ids:
            self._state["splits"][sid]["state"] = MARKED_FOR_DELETION
        self._save()

    def checkpoint(self) -> dict[str, str]:
        return dict(self._state["checkpoint"])

    # -- sources (per-index source configs, quickwit-cli/src/source.rs) ----
    def sources(self) -> dict[str, dict]:
        return dict(self._state.setdefault("sources", {}))

    def add_source(self, source_id: str, source_type: str, params: dict) -> None:
        srcs = self._state.setdefault("sources", {})
        if source_id in srcs:
            raise ValueError(f"source {source_id!r} already exists")
        srcs[source_id] = {"source_type": source_type, "params": params}
        self._save()

    def delete_source(self, source_id: str) -> None:
        """Remove the source and ITS checkpoint entries (the reference
        deletes a source's checkpoint with it; ingest build ids are
        prefixed '{source_id}-', so its positions are the prefixed keys)."""
        srcs = self._state.setdefault("sources", {})
        if source_id not in srcs:
            raise KeyError(f"no source {source_id!r}")
        del srcs[source_id]
        cp = self._state["checkpoint"]
        for k in [k for k in cp if k.startswith(f"{source_id}-")]:
            del cp[k]
        self._save()

    # -- term-stats LSM ----------------------------------------------------
    def termstats_files(self) -> list[str] | None:
        """Absolute paths of the committed term-stats delta files (each a
        parquet file or a directory of parts), or None if the LSM is
        incomplete and readers must fall back to scanning split postings."""
        ts = self._state["termstats"]
        if not ts["complete"]:
            return None
        return [os.path.join(self.index_dir, d) for d in ts["deltas"]]

    def compact_termstats(self, new_delta: str, replaced: list[str]) -> None:
        """Swap ``replaced`` delta entries for the single compacted one
        (atomic; the merge-round compaction commit)."""
        ts = self._state["termstats"]
        gone = set(replaced)
        ts["deltas"] = [d for d in ts["deltas"] if d not in gone] + [new_delta]
        self._save()

    def delete_splits(self, split_ids: list[str]) -> None:
        for sid in split_ids:
            self._state["splits"].pop(sid, None)
        self._save()

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
