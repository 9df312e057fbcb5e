"""Index snapshot / restore + alias management — the delegated-ES
``_snapshot`` and ``_aliases`` lifecycle APIs, re-expressed over the
on-disk index layout.

The reference delegates index lifecycle to Elasticsearch, where
operators snapshot indices into a registered repository and flip
aliases for zero-downtime reindex (the classic ``products_v1`` →
``products_v2`` swap).  Both re-express naturally here because every
index file is immutable once written (``segments.py``'s atomic
temp-file + ``os.replace`` discipline — mutations like
``_delete_by_query`` write NEW overlay files and bump a manifest rev,
they never modify bytes in place):

- **snapshot** = hard-link (fallback: copy) every index file into
  ``<repo>/<name>/<index>/…`` and write ``SNAPSHOT.json`` LAST, so a
  crashed snapshot is detectable (no manifest ⇒ partial, ignored by
  ``list_snapshots``).  Hard links make a snapshot O(#files) metadata
  ops, not O(bytes) — the same reason ES segment snapshots are
  incremental.  At 100 TB the repo would be object storage and the
  per-shard blob copies would fan out as Ray tasks (one task per
  shard directory, resumable per-file); the manifest/commit protocol
  here is exactly that shape with the copy inlined.
- **restore** = link/copy the snapshot back into a temp dir under the
  index root and ``os.rename`` it to the target name — the same
  all-or-nothing guarantee as a build (an aborted restore never leaves
  a half-index; ES likewise restores into an index that only becomes
  searchable when complete).
- **aliases** = one atomically-replaced ``aliases.json`` at the index
  root mapping alias → [concrete indices].  ``update_aliases`` applies
  a batch of add/remove actions all-or-nothing (the ES ``_aliases``
  POST contract: a swap is one atomic call, readers never observe the
  intermediate state).  An alias naming several indices is searchable
  (fanned out via ``MultiIndexEngine`` with combined stats) but not
  writable, matching ES's write-alias rule.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import time

from excelastic_ray.index.segments import atomic_write_json

SNAPSHOT_MANIFEST = "SNAPSHOT.json"
ALIASES_FILE = "aliases.json"

#: process-wide guard for aliases.json read-modify-write and snapshot
#: directory creation: two concurrent HTTP alias batches (the server is
#: threaded) must not lose updates, and two same-name snapshots must
#: not interleave their copies. Cross-PROCESS races (CLI vs server)
#: remain the operator's responsibility, as with ES's single master.
_LIFECYCLE_LOCK = threading.Lock()


def _walk_files(root: str) -> list[str]:
    """Relative paths of every regular file under root, skipping
    in-flight temp files (``*.tmp`` from atomic writers)."""
    out: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".tmp"):
                continue
            out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(out)


def _link_or_copy(src: str, dst: str) -> int:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:  # cross-device / FS without hard links
        shutil.copy2(src, dst)
    return os.path.getsize(dst)


def create_snapshot(repo_dir: str, name: str,
                    index_dirs: dict[str, str]) -> dict:
    """Snapshot the given {index name: index dir} set into
    ``<repo_dir>/<name>``.  Every index must have a complete manifest
    (ES refuses to snapshot a red index); the snapshot manifest is
    written last as the commit marker."""
    from excelastic_ray.index.segments import load_global_manifest

    snap_dir = os.path.join(repo_dir, name)
    with _LIFECYCLE_LOCK:
        if os.path.exists(os.path.join(snap_dir, SNAPSHOT_MANIFEST)):
            raise ValueError(f"snapshot {name!r} already exists")
    # stage into a private dot-dir (hidden from list_snapshots), commit
    # by one rename — a crash never leaves a visible partial snapshot
    # and a concurrent same-name attempt can never interleave files
    os.makedirs(repo_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=repo_dir, prefix=f".snap-{name}-")
    os.chmod(tmp, 0o755)
    try:
        indices: dict[str, dict] = {}
        for index, src in sorted(index_dirs.items()):
            m = load_global_manifest(src)  # FileNotFoundError if no index
            if m.get("status") != "complete":
                raise RuntimeError(
                    f"index {index!r} is not complete "
                    f"(status={m.get('status')!r}); refusing to snapshot"
                )
            files = _walk_files(src)
            total = 0
            for rel in files:
                total += _link_or_copy(
                    os.path.join(src, rel),
                    os.path.join(tmp, index, rel),
                )
            indices[index] = {
                "n_files": len(files),
                "bytes": total,
                "n_docs": m.get("n_docs"),
            }
        payload = {
            "snapshot": name,
            "state": "SUCCESS",
            "indices": indices,
            "ts": time.time(),
        }
        atomic_write_json(os.path.join(tmp, SNAPSHOT_MANIFEST), payload)
        with _LIFECYCLE_LOCK:
            if os.path.exists(os.path.join(snap_dir, SNAPSHOT_MANIFEST)):
                raise ValueError(f"snapshot {name!r} already exists")
            if os.path.isdir(snap_dir):
                shutil.rmtree(snap_dir)  # crashed pre-commit leftover
            os.rename(tmp, snap_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return payload


def list_snapshots(repo_dir: str) -> list[dict]:
    """Committed snapshots in the repo (partial = no manifest = hidden,
    like an in-progress/aborted ES snapshot)."""
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for nm in sorted(os.listdir(repo_dir)):
        if nm.startswith("."):  # in-flight .snap-* staging dirs
            continue
        p = os.path.join(repo_dir, nm, SNAPSHOT_MANIFEST)
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def delete_snapshot(repo_dir: str, name: str) -> None:
    snap_dir = os.path.join(repo_dir, name)
    if not os.path.exists(os.path.join(snap_dir, SNAPSHOT_MANIFEST)):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    # drop the commit marker first: a crash mid-delete leaves a partial
    # dir that list_snapshots already ignores
    os.unlink(os.path.join(snap_dir, SNAPSHOT_MANIFEST))
    shutil.rmtree(snap_dir)


def restore_snapshot(repo_dir: str, name: str, index: str,
                     index_root: str, rename_to: str | None = None) -> dict:
    """Restore one index from a snapshot into ``index_root`` (optionally
    under a new name — ES's ``rename_pattern``).  Fails if the target
    already exists: delete or alias-swap first, exactly ES's
    cannot-restore-into-open-index rule."""
    snap_dir = os.path.join(repo_dir, name)
    mpath = os.path.join(snap_dir, SNAPSHOT_MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    with open(mpath) as f:
        manifest = json.load(f)
    if index not in manifest["indices"]:
        raise KeyError(f"snapshot {name!r} has no index {index!r}")
    target = rename_to or index
    dest = os.path.join(index_root, target)
    if os.path.exists(dest):
        raise FileExistsError(
            f"index {target!r} already exists; delete it or restore "
            f"with rename"
        )
    if target in load_aliases(index_root):
        # ES refuses to create an index whose name an alias holds: the
        # alias would shadow the restored directory (searches and
        # writes on the name keep hitting the alias targets)
        raise ValueError(
            f"{target!r} is an existing alias; restore under another "
            f"name or remove the alias first"
        )
    src = os.path.join(snap_dir, index)
    os.makedirs(index_root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=index_root, prefix=f".restore-{target}-")
    # mkdtemp dirs are 0700; a restored index must be as readable as a
    # built one (e.g. restored by an operator, served by a service user)
    os.chmod(tmp, 0o755)
    try:
        files = _walk_files(src)
        for rel in files:
            _link_or_copy(os.path.join(src, rel), os.path.join(tmp, rel))
        os.rename(tmp, dest)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {"snapshot": name, "index": index, "restored_as": target,
            "n_files": len(files)}


# -- aliases -------------------------------------------------------------


def load_aliases(index_root: str) -> dict[str, dict]:
    """→ {alias: {"indices": [...], "filter": {...} | None}}. Files
    written by pre-filter versions hold a bare target LIST per alias —
    normalized on read, so old stores keep working unchanged."""
    p = os.path.join(index_root, ALIASES_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        raw = json.load(f)
    return {
        a: (v if isinstance(v, dict) else {"indices": v, "filter": None})
        for a, v in raw.items()
    }


def update_aliases(index_root: str, actions: list[dict]) -> dict:
    """Apply a batch of ``{"add": {"index": i, "alias": a}}`` /
    ``{"remove": {...}}`` actions atomically (validate everything, then
    one ``os.replace`` of aliases.json).  Matches ES ``POST /_aliases``:
    a v1→v2 swap in one call is never observable half-done.

    An ``add`` body may carry ``"filter": {attr: value | [values]}`` —
    the ES filtered-alias analog (ES takes query DSL; this engine's
    filter context is attribute filters, the same shape ``search``'s
    ``filters`` takes). The filter is a property of the ALIAS (ES
    semantics: the last add wins), applied automatically to every
    search/count through it. Because one update_aliases call is
    atomic, a remove-then-add retarget WITHIN one call keeps the
    alias's filter (the alias never observably ceased to exist) —
    an add carrying an explicit ``"filter"`` key still wins; only
    removing the alias in ONE call and re-adding it in a LATER call
    starts clean."""
    with _LIFECYCLE_LOCK:
        aliases = load_aliases(index_root)
        dropped_filters: dict[str, dict | None] = {}
        for act in actions:
            if len(act) != 1 or next(iter(act)) not in ("add", "remove"):
                raise ValueError(f"bad alias action {act!r}")
            op, body = next(iter(act.items()))
            alias, index = body["alias"], body["index"]
            if op == "add":
                if os.path.isdir(os.path.join(index_root, alias)):
                    raise ValueError(
                        f"alias {alias!r} collides with a concrete index"
                    )
                if not os.path.exists(
                    os.path.join(index_root, index, "manifest.json")
                ):
                    raise FileNotFoundError(
                        f"alias target index {index!r} does not exist"
                    )
                flt = body.get("filter")
                if flt is not None and not (
                    isinstance(flt, dict) and flt
                    and all(isinstance(k, str) for k in flt)
                ):
                    raise ValueError(
                        f"alias filter must be a non-empty "
                        f"{{attr: value}} dict, got {flt!r}"
                    )
                ent = aliases.setdefault(
                    alias,
                    {"indices": [],
                     "filter": dropped_filters.pop(alias, None)},
                )
                if index not in ent["indices"]:
                    ent["indices"].append(index)
                if "filter" in body:
                    ent["filter"] = flt
            else:
                ent = aliases.get(alias)
                if ent is None or index not in ent["indices"]:
                    raise KeyError(
                        f"alias {alias!r} does not point at {index!r}"
                    )
                ent["indices"].remove(index)
                if not ent["indices"]:
                    # an atomic retarget later in THIS batch restores it
                    dropped_filters[alias] = ent.get("filter")
                    del aliases[alias]
        atomic_write_json(os.path.join(index_root, ALIASES_FILE), aliases)
        return aliases


def resolve_alias(index_root: str, name: str) -> list[str]:
    """Concrete indices behind a name: alias targets, else the name
    itself (a concrete index is its own resolution)."""
    ent = load_aliases(index_root).get(name)
    return [name] if ent is None else list(ent["indices"])


def alias_filter(index_root: str, name: str) -> dict | None:
    """The filter attached to alias ``name`` (None for a concrete
    index, an unfiltered alias, or an unknown name)."""
    ent = load_aliases(index_root).get(name)
    return None if ent is None else ent.get("filter")
