"""ES ``_bulk`` analog: ordered multi-action writes with per-item
results (the reference's users feed ES through _bulk constantly; its
own ElasticWriter batches doc actions the same way,
``ElasticWriter.java:158-171``).

Actions (library form; the HTTP surface parses NDJSON into these):

    {"op": "index",  "doc": {conv_id, turn_idx, ...}, "overwrite": bool}
    {"op": "delete", "conv_id": ..., "turn_idx": ...}
    {"op": "update", "conv_id": ..., "turn_idx": ..., "attrs": {...}}

Application is ORDERED (a later action sees earlier effects), with one
structural optimization: a consecutive RUN of ``index`` actions whose
conversations are all NEW batches into a single :func:`append_index`
call — the bulk-ingest fast path (one chunk build + one shard merge
wave for the whole run instead of per-doc writes). Everything else
applies through the single-doc primitives. ``bulk_apply`` NEVER raises
on item problems: failures produce ``status="error"`` results and the
batch continues, exactly ES's item-level error semantics.

Batch-failure policy: when the batched append fails with the index
still COMPLETE (a validation problem — e.g. one malformed doc in the
run), small runs (≤ ``RETRY_RUN_CAP``) retry per-doc so errors stay
item-scoped and the good docs land; large runs report the batch error
on every item instead of degrading into thousands of per-doc chunk
builds. When the append died mid-flight (status ``appending``), every
item reports the batch error — a per-doc retry could only repeat
"index is not complete".

At 100 TB the guidance is unchanged from ``index_doc``'s docstring:
steady-state ingest belongs in ``build_index``/``append_index`` over
parquet; ``bulk_apply`` is the operational write surface (backfills,
corrections, interactive tooling).
"""

from __future__ import annotations

from typing import Any

#: max run size that retries per-doc after a batch validation failure
RETRY_RUN_CAP = 64


def _flush_new_conv_run(index_dir: str, run: list[dict],
                        results: list[dict], parallelism) -> None:
    """One append_index for a run of new-conversation index actions.
    NEVER raises: every failure mode lands in per-item results (the
    bulk contract)."""
    if not run:
        return
    import ray.data as rd

    from excelastic_ray.index import segments as seg
    from excelastic_ray.index.build import (
        append_index,
        index_doc,
        rows_to_transcript_table,
    )

    def one_by_one() -> None:
        for a in run:
            try:
                docid = index_doc(index_dir, a["doc"],
                                  overwrite=bool(a.get("overwrite")),
                                  parallelism=parallelism)
                results[a["__i"]] = {
                    "op": "index", "status": "ok", "docid": int(docid),
                }
            except Exception as e:  # noqa: BLE001 — item-scoped errors
                results[a["__i"]] = {
                    "op": "index", "status": "error", "error": str(e),
                }

    def fail_all(err: str) -> None:
        for a in run:
            results[a["__i"]] = {
                "op": "index", "status": "error", "error": err,
            }

    if len(run) == 1:
        one_by_one()
        return
    try:
        table = rows_to_transcript_table([a["doc"] for a in run])
    except Exception:  # noqa: BLE001 — a bad doc: let items self-report
        one_by_one()
        return
    try:
        append_index(rd.from_arrow(table), index_dir,
                     parallelism=parallelism)
    except Exception as e:  # noqa: BLE001
        try:
            status = seg.load_global_manifest(index_dir).get("status")
        except Exception:  # noqa: BLE001
            status = None
        if status == "complete" and len(run) <= RETRY_RUN_CAP:
            one_by_one()  # validation failure: item-scope it
        else:
            fail_all(str(e))  # mid-append crash or giant run: retryable
        return
    try:
        from excelastic_ray.config import IndexConfig
        from excelastic_ray.index.build import _conv_ranks_table

        cfg = IndexConfig.from_dict(
            seg.load_global_manifest(index_dir)["config"]
        )
        ranks, ids = _conv_ranks_table(index_dir)
        pos = {c: int(r) for r, c in zip(ranks, ids)}
        for a in run:
            d = a["doc"]
            docid = cfg.docid(pos[str(d["conv_id"])], int(d["turn_idx"]))
            results[a["__i"]] = {
                "op": "index", "status": "ok", "docid": int(docid),
            }
    except Exception as e:  # noqa: BLE001 — docs landed; ids didn't
        fail_all(f"indexed but docid lookup failed: {e}")


def bulk_apply(index_dir: str, actions: list[dict],
               parallelism: int | None = None) -> list[dict[str, Any]]:
    """Apply ``actions`` in order → one result dict per action
    ({op, status, docid?/error?}), never raising on item errors."""
    from excelastic_ray.index.build import (
        ValidationError,
        _conv_ranks_table,
        delete_doc,
        index_doc,
        update_doc,
    )

    _, known_ids = _conv_ranks_table(index_dir)
    known: set = set(known_ids.tolist())
    results: list[dict] = [None] * len(actions)  # type: ignore[list-item]
    run: list[dict] = []
    run_keys: set = set()

    def flush() -> None:
        nonlocal run, run_keys
        _flush_new_conv_run(index_dir, run, results, parallelism)
        known.update(str(a["doc"]["conv_id"]) for a in run)
        run, run_keys = [], set()

    for i, a in enumerate(actions):
        op = a.get("op")
        try:
            if op == "index":
                doc = a["doc"]
                if doc.get("conv_id") is None or doc.get("turn_idx") is None:
                    raise ValidationError(
                        "index action requires conv_id and turn_idx"
                    )
                conv = str(doc["conv_id"])
                key = (conv, int(doc["turn_idx"]))
                if conv not in known and key not in run_keys:
                    run.append({**a, "__i": i})
                    run_keys.add(key)
                    continue
                flush()  # order: earlier batched docs land first
                docid = index_doc(index_dir, doc,
                                  overwrite=bool(a.get("overwrite")),
                                  parallelism=parallelism)
                results[i] = {"op": "index", "status": "ok",
                              "docid": int(docid)}
            elif op == "delete":
                flush()
                n = delete_doc(index_dir, str(a["conv_id"]),
                               int(a["turn_idx"]))
                results[i] = {"op": "delete", "status": "ok",
                              "deleted": int(n)}
            elif op == "update":
                flush()
                update_doc(index_dir, str(a["conv_id"]),
                           int(a["turn_idx"]), a["attrs"])
                results[i] = {"op": "update", "status": "ok"}
            else:
                results[i] = {"op": str(op), "status": "error",
                              "error": f"unknown op {op!r}"}
        except Exception as e:  # noqa: BLE001 — item-scoped errors
            results[i] = {"op": str(op), "status": "error",
                          "error": str(e)}
    flush()
    return results


def parse_ndjson(body: str) -> list[dict]:
    """ES _bulk NDJSON → action list. ``index``/``update`` action lines
    are followed by a doc/attrs line; ``delete`` stands alone. The
    action metadata's conv_id/turn_idx (ES's ``_id``) are AUTHORITATIVE
    over same-named doc-body fields, like ES."""
    import json

    lines = [ln for ln in body.splitlines() if ln.strip()]
    actions: list[dict] = []
    i = 0
    while i < len(lines):
        meta = json.loads(lines[i])
        if len(meta) != 1:
            raise ValueError(f"bad action line: {lines[i][:80]}")
        (op, params), = meta.items()
        if op == "delete":
            actions.append({"op": "delete",
                            "conv_id": params["conv_id"],
                            "turn_idx": int(params["turn_idx"])})
            i += 1
        elif op in ("index", "create"):
            if i + 1 >= len(lines):
                raise ValueError("index action missing its doc line")
            doc = json.loads(lines[i + 1])
            # the action line's id wins (ES: the metadata _id is
            # authoritative; a doc body replaying a dump may embed
            # stale ids of its own)
            if params.get("conv_id") is not None:
                doc["conv_id"] = params["conv_id"]
            if params.get("turn_idx") is not None:
                doc["turn_idx"] = params["turn_idx"]
            actions.append({"op": "index", "doc": doc,
                            # ES: op_type=index overwrites, create refuses
                            "overwrite": op == "index"})
            i += 2
        elif op == "update":
            if i + 1 >= len(lines):
                raise ValueError("update action missing its attrs line")
            attrs = json.loads(lines[i + 1])
            actions.append({"op": "update",
                            "conv_id": params["conv_id"],
                            "turn_idx": int(params["turn_idx"]),
                            "attrs": attrs.get("doc", attrs)})
            i += 2
        else:
            raise ValueError(f"unknown bulk op {op!r}")
    return actions
