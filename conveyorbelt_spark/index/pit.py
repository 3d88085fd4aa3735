"""ES point-in-time (PIT) search.

``open_pit`` snapshots an index's visibility state — stats.json (the
committed-run and tombstone-run ledgers, BM25 statistics) plus the
docstore run list — and returns an opaque id; request bodies sent with
``{"pit": {"id": ...}}`` execute against that frozen state: index_batch
deltas, deletes, and updates committed AFTER the open are invisible, and
an updated doc serves its snapshot-time ``_source``. That is the ES PIT
contract (consistent deep pagination while the index moves underneath,
Elasticsearch's point-in-time API; the reference manages its ES indexes
precisely so clients can use such handles, ElasticsearchClient.cs:31-135).

Like ES, a PIT does not survive segment REMOVAL: compaction deletes the
folded run files it folded (ES pins segment files with refcounts until
the PIT closes — a filesystem index cannot), so pair long-lived PITs with
the compaction cadence. ``keep_alive`` is accepted for API compatibility
and not enforced (no background reaper in a library).

The registry is in-process (one driver = one "node"); ids are opaque
uuid4 hex strings, matching ES's opaque tokens.
"""

from __future__ import annotations

import os
import uuid

from .build import load_stats

_REGISTRY: dict[str, dict] = {}


def _docstore_runs(out_dir: str) -> list[str] | None:
    """The docstore run partitions present right now (the snapshot's
    stored-version visibility set). None when the index has no docstore."""
    store = os.path.join(out_dir, "docstore")
    if not os.path.isdir(store):
        return None
    runs: set[str] = set()
    for bucket in os.listdir(store):
        bdir = os.path.join(store, bucket)
        if not bucket.startswith("bucket=") or not os.path.isdir(bdir):
            continue
        for run in os.listdir(bdir):
            if run.startswith("run="):
                runs.add(run[len("run="):])
    return sorted(runs)


def open_pit(out_dir: str, keep_alive: str | None = None) -> str:
    """Snapshot ``out_dir``'s current visibility state; returns the PIT
    id to send as ``{"pit": {"id": ...}}`` (no index argument then, like
    ES's index-less PIT search)."""
    pid = uuid.uuid4().hex
    _REGISTRY[pid] = {
        "out_dir": out_dir,
        "stats": load_stats(out_dir),
        "docstore_runs": _docstore_runs(out_dir),
        "keep_alive": keep_alive,
    }
    return pid


def close_pit(pit_id: str) -> bool:
    """Release a PIT; returns whether it existed (the ES response's
    ``succeeded``)."""
    return _REGISTRY.pop(pit_id, None) is not None


def resolve_pit(pit_id: str) -> dict:
    snap = _REGISTRY.get(pit_id)
    if snap is None:
        raise ValueError(f"unknown or closed PIT id {pit_id!r}")
    return snap
