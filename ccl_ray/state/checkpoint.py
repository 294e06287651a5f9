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


@ray.remote
def _write_shard(path: str, vids: np.ndarray, vals: np.ndarray, col: str):
    t = pa.table({"vid": pa.array(vids), col: pa.array(vals)})
    pq.write_table(t, path)
    fp = int(
        np.bitwise_xor.reduce(
            stable_hash64_np(vids.view(np.uint64) * np.uint64(31))
            ^ stable_hash64_np(np.asarray(vals).view(np.uint64))
        )
        if len(vids)
        else 0
    )
    return len(vids), fp


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
        for _, f in results:
            fp ^= f
        manifest = {
            "iter": it,
            "parts": len(vid_refs),
            "rows": rows,
            "fingerprint": fp,
            "extra": extra or {},
        }
        tmp = os.path.join(d, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"iter": it, **(extra or {})}) + "\n")

    def latest_shards(self):
        """(iter, [value-array refs]) of the newest complete checkpoint, or None."""
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
        refs = [
            _read_shard.remote(os.path.join(d, f"part-{p:03d}.parquet"), self.col)
            for p in range(manifest["parts"])
        ]
        return best, refs
