"""Index snapshot / restore — the ES `_snapshot` repository analogue for
directory-backed indexes (reference parity: the C# conveyor leans on ES
snapshots for index lifecycle; here an index IS a directory tree, so a
snapshot is an atomically-committed copy).

Contract:
- `snapshot_index(out_dir, repo, name)` copies the committed index tree
  into `<repo>/<name>/` and writes a `SNAPSHOT.json` marker LAST (the
  commit point — a crash mid-copy leaves no marker, and `list_snapshots`
  / `restore_index` ignore marker-less directories).
- `restore_index(repo, name, dest)` copies a committed snapshot to a
  fresh directory (refusing to clobber an existing one) and re-verifies
  the marker's file inventory (names + sizes) before declaring success.
- Snapshots are independent of the source afterwards: deletes/updates on
  the live index never touch a snapshot (pinned by test).

Scale note: at real scale this is an object-store server-side copy per
file (the layout is flat parquet/json under stable relative paths); the
inventory in the marker is exactly the manifest a distributed copy needs
— no re-listing, no tree walk on restore."""

from __future__ import annotations

import json
import os
import shutil
import time

SNAPSHOT_MARKER = "SNAPSHOT.json"


def _inventory(root: str) -> list[dict]:
    inv = []
    for base, _dirs, files in os.walk(root):
        for fn in sorted(files):
            p = os.path.join(base, fn)
            rel = os.path.relpath(p, root)
            if rel == SNAPSHOT_MARKER:
                continue
            inv.append({"path": rel, "bytes": os.path.getsize(p)})
    inv.sort(key=lambda e: e["path"])
    return inv


def snapshot_index(out_dir: str, repo: str, name: str) -> dict:
    """Copy the index tree into ``<repo>/<name>`` and commit it with a
    marker file written LAST. Refuses to overwrite an existing committed
    snapshot (ES: snapshot names are unique per repository)."""
    if not os.path.exists(os.path.join(out_dir, "stats.json")):
        raise ValueError(f"{out_dir!r} is not an index (no stats.json)")
    dest = os.path.join(repo, name)
    if os.path.exists(os.path.join(dest, SNAPSHOT_MARKER)):
        raise ValueError(f"snapshot {name!r} already exists in {repo!r}")
    if os.path.exists(dest):
        shutil.rmtree(dest)  # an uncommitted (crashed) copy — replace it
    os.makedirs(repo, exist_ok=True)
    shutil.copytree(out_dir, dest)
    inv = _inventory(dest)
    marker = {
        "snapshot": name,
        "source": os.path.abspath(out_dir),
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_files": len(inv),
        "total_bytes": sum(e["bytes"] for e in inv),
        "files": inv,
    }
    tmp = os.path.join(dest, SNAPSHOT_MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, os.path.join(dest, SNAPSHOT_MARKER))
    return {"snapshot": name, "n_files": len(inv),
            "total_bytes": marker["total_bytes"], "state": "SUCCESS"}


def list_snapshots(repo: str) -> list[dict]:
    """Committed snapshots in a repository (marker-less dirs ignored —
    they are crashed copies)."""
    out = []
    if not os.path.isdir(repo):
        return out
    for name in sorted(os.listdir(repo)):
        p = os.path.join(repo, name, SNAPSHOT_MARKER)
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            out.append({
                "snapshot": name, "n_files": m["n_files"],
                "total_bytes": m["total_bytes"],
                "committed_at": m["committed_at"],
            })
    return out


def restore_index(repo: str, name: str, dest: str) -> dict:
    """Copy a committed snapshot to ``dest`` (must not exist) and verify
    the restored tree against the marker's inventory (names + sizes)."""
    src = os.path.join(repo, name)
    marker_path = os.path.join(src, SNAPSHOT_MARKER)
    if not os.path.exists(marker_path):
        raise ValueError(f"snapshot {name!r} is not committed in {repo!r}")
    if os.path.exists(dest):
        raise ValueError(f"restore target {dest!r} already exists")
    with open(marker_path) as f:
        marker = json.load(f)
    shutil.copytree(src, dest)
    os.remove(os.path.join(dest, SNAPSHOT_MARKER))
    got = _inventory(dest)
    want = marker["files"]
    if got != want:
        raise RuntimeError(
            f"restore verification failed: {len(got)} files restored vs "
            f"{len(want)} in the snapshot inventory"
        )
    return {"snapshot": name, "restored_to": dest,
            "n_files": len(got), "state": "SUCCESS"}
