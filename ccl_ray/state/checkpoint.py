"""Per-iteration shard checkpoints with an atomic manifest (resume support).

The reference keeps every intermediate slice in process RAM and has no
resume story (ccl_marker_stack.py:732-733, §2.7 T2); here, iterative state
(labels / scores) is written per-partition to Parquet each ``checkpoint_every``
iterations. The manifest is written LAST via tmp+rename — a directory without
a manifest is an aborted write and is ignored, so a killed run resumes from
the newest *complete* iteration. Partition layout is stable (splitmix64 hash,
fixed P), so resumed shards align with rebuilt vid shards exactly.

Layout:
    {root}/iter=00007/part-000.parquet ...
    {root}/iter=00007/manifest.json     # commit marker: rows, fingerprint, metrics
    {root}/metrics.jsonl                # appended per checkpointed iteration
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ccl_ray.functions.hashing import stable_hash64_np


def _bits64(x: np.ndarray) -> np.ndarray:
    """uint64 bit view, widening narrow int dtypes (int32 dense vids) first."""
    x = np.ascontiguousarray(x)
    if x.dtype.itemsize == 8:
        return x.view(np.uint64)
    return x.astype(np.int64).view(np.uint64)


def _vid_fp_np(vids: np.ndarray) -> int:
    """Order-insensitive fingerprint of one shard's vid set."""
    if not len(vids):
        return 0
    return int(np.bitwise_xor.reduce(stable_hash64_np(_bits64(vids))))


def _combine_fps(fps: list[int]) -> int:
    """Position-SENSITIVE combine across shards: catches both content drift
    and shard-order/partition-count misalignment."""
    out = 0
    for p, f in enumerate(fps):
        out ^= int(stable_hash64_np(np.array([f ^ p], dtype=np.uint64))[0])
    return out


@ray.remote
def _vid_fp_remote(vids: np.ndarray) -> int:
    return _vid_fp_np(vids)


def vid_fingerprint(vid_refs: list) -> int:
    """Fingerprint of a partitioned vid-shard layout (P shards, in order).

    Saved in each manifest and re-derived from the rebuilt shards on resume —
    a checkpoint written under a different partition count, hash scheme or
    input graph will not match and is refused (silently-wrong labels from
    positionally-misaligned value arrays are the failure this prevents).
    """
    return _combine_fps(ray.get([_vid_fp_remote.remote(v) for v in vid_refs]))


@ray.remote
def _write_shard(path: str, vids: np.ndarray, vals: np.ndarray, col: str):
    t = pa.table({"vid": pa.array(vids), col: pa.array(vals)})
    pq.write_table(t, path)
    fp = int(
        np.bitwise_xor.reduce(
            stable_hash64_np(_bits64(vids) * np.uint64(31))
            ^ stable_hash64_np(_bits64(np.asarray(vals)))
        )
        if len(vids)
        else 0
    )
    return len(vids), fp, _vid_fp_np(vids)


@ray.remote
def _read_shard(path: str, col: str):
    t = pq.read_table(path)
    return t.column(col).to_numpy(zero_copy_only=False)


class ShardCheckpoint:
    def __init__(self, root: str, col: str = "label"):
        self.root = root
        self.col = col
        os.makedirs(root, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.root, f"iter={it:05d}")

    def save_shards(self, it: int, vid_refs: list, val_refs: list, extra: dict | None = None):
        d = self._iter_dir(it)
        os.makedirs(d, exist_ok=True)
        outs = [
            _write_shard.remote(os.path.join(d, f"part-{p:03d}.parquet"), vid_refs[p], val_refs[p], self.col)
            for p in range(len(vid_refs))
        ]
        results = ray.get(outs)
        rows = sum(r[0] for r in results)
        fp = 0
        for _, f, _vf in results:
            fp ^= f
        manifest = {
            "iter": it,
            "parts": len(vid_refs),
            "rows": rows,
            "fingerprint": fp,
            "vid_fp": _combine_fps([r[2] for r in results]),
            "extra": extra or {},
        }
        tmp = os.path.join(d, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"iter": it, **(extra or {})}) + "\n")

    def latest_shards(self, *, expected_parts: int | None = None, expected_vid_fp: int | None = None):
        """(iter, [value-array refs]) of the newest complete checkpoint, or None.

        When ``expected_parts`` / ``expected_vid_fp`` are given (the current
        run's partition count and rebuilt vid-shard fingerprint), a manifest
        that does not match is REFUSED (returns None → fresh start) — a
        stale/foreign checkpoint dir or a --partitions change must never
        yield positionally-misaligned value arrays.
        """
        import warnings

        best = None
        if not os.path.isdir(self.root):
            return None
        for name in os.listdir(self.root):
            if not name.startswith("iter="):
                continue
            d = os.path.join(self.root, name)
            if not os.path.exists(os.path.join(d, "manifest.json")):
                continue  # aborted write — no commit marker
            it = int(name.split("=")[1])
            if best is None or it > best:
                best = it
        if best is None:
            return None
        d = self._iter_dir(best)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        if expected_parts is not None and manifest["parts"] != expected_parts:
            warnings.warn(
                f"checkpoint {d}: parts={manifest['parts']} != current "
                f"num_partitions={expected_parts}; ignoring checkpoint"
            )
            return None
        if expected_vid_fp is not None:
            # A manifest WITHOUT a vid_fp (written before fingerprinting, or
            # under the pre-dense int64 domain) cannot prove alignment with
            # the rebuilt vid shards — refuse it rather than risk loading
            # positionally-misaligned value arrays against dense int32 vids.
            if manifest.get("vid_fp") is None:
                warnings.warn(
                    f"checkpoint {d}: manifest has no vid-shard fingerprint "
                    "(pre-fingerprint format); refusing to resume from it"
                )
                return None
            if manifest["vid_fp"] != expected_vid_fp:
                warnings.warn(
                    f"checkpoint {d}: vid-shard fingerprint mismatch "
                    "(different input graph / hash layout); ignoring checkpoint"
                )
                return None
        refs = [
            _read_shard.remote(os.path.join(d, f"part-{p:03d}.parquet"), self.col)
            for p in range(manifest["parts"])
        ]
        return best, refs


# ------------------------------------------------- multi-column variant

@ray.remote
def _write_state_shard(path: str, vids: np.ndarray, state: dict, cols: list):
    t = pa.table({"vid": pa.array(vids), **{c: pa.array(state[c]) for c in cols}})
    pq.write_table(t, path)
    fp = 0
    if len(vids):
        acc = stable_hash64_np(_bits64(vids) * np.uint64(31))
        for c in cols:
            acc = acc ^ stable_hash64_np(_bits64(np.asarray(state[c])))
        fp = int(np.bitwise_xor.reduce(acc))
    return len(vids), fp, _vid_fp_np(vids)


@ray.remote
def _read_state_shard(path: str, cols: list) -> dict:
    t = pq.read_table(path)
    return {c: t.column(c).to_numpy(zero_copy_only=False) for c in cols}


class StateCheckpoint:
    """Per-round MULTI-COLUMN shard checkpoints — same manifest/commit
    contract as ShardCheckpoint (tmp+rename manifest LAST, partition count
    + vid fingerprint validated on resume), for BSP stages whose per-shard
    state is several aligned arrays (SCC: label/active/indeg/outdeg)
    rather than one value column."""

    def __init__(self, root: str, cols: list[str]):
        self.root = root
        self.cols = list(cols)
        os.makedirs(root, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.root, f"round={it:05d}")

    def save(self, it: int, vid_refs: list, state_refs: list, extra: dict | None = None):
        """``state_refs``: per-shard refs of dicts holding self.cols arrays
        aligned with vid_refs[p] (extra keys in the dict are ignored)."""
        d = self._iter_dir(it)
        os.makedirs(d, exist_ok=True)
        outs = [
            _write_state_shard.remote(
                os.path.join(d, f"part-{p:03d}.parquet"), vid_refs[p], state_refs[p], self.cols
            )
            for p in range(len(vid_refs))
        ]
        results = ray.get(outs)
        fp = 0
        for _, f, _vf in results:
            fp ^= f
        manifest = {
            "round": it,
            "parts": len(vid_refs),
            "rows": sum(r[0] for r in results),
            "cols": self.cols,
            "fingerprint": fp,
            "vid_fp": _combine_fps([r[2] for r in results]),
            "extra": extra or {},
        }
        tmp = os.path.join(d, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"round": it, **(extra or {})}) + "\n")

    def latest(self, *, expected_parts: int, expected_vid_fp: int):
        """(round, [per-shard state-dict refs], extra) of the newest complete
        checkpoint, or None. Mismatched partition count, vid fingerprint or
        column set is REFUSED (fresh start) — never positionally-misaligned
        or schema-drifted state."""
        import warnings

        best = None
        if not os.path.isdir(self.root):
            return None
        for name in os.listdir(self.root):
            d = os.path.join(self.root, name)
            if name.startswith("round=") and os.path.exists(os.path.join(d, "manifest.json")):
                it = int(name.split("=")[1])
                best = it if best is None else max(best, it)
        if best is None:
            return None
        d = self._iter_dir(best)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["parts"] != expected_parts:
            warnings.warn(f"state checkpoint {d}: parts mismatch; ignoring")
            return None
        if manifest.get("vid_fp") != expected_vid_fp:
            warnings.warn(f"state checkpoint {d}: vid fingerprint mismatch; ignoring")
            return None
        if manifest.get("cols") != self.cols:
            warnings.warn(f"state checkpoint {d}: column-set mismatch; ignoring")
            return None
        refs = [
            _read_state_shard.remote(os.path.join(d, f"part-{p:03d}.parquet"), self.cols)
            for p in range(manifest["parts"])
        ]
        return best, refs, manifest.get("extra", {})
