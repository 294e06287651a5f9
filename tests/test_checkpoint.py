import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.cc_bsp import connected_components_bsp
from ccl_ray.stages.pagerank_bsp import pagerank_bsp
from ccl_ray.state.checkpoint import ShardCheckpoint


def _edges(tmp_path=None):
    rng = np.random.RandomState(3)
    n, m = 400, 700
    t = pa.table(
        {
            "src": pa.array(rng.randint(0, n, m), pa.int64()),
            "dst": pa.array(rng.randint(0, n, m), pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _labels_sorted(res):
    df = res.labels.to_pandas().sort_values("vid").reset_index(drop=True)
    return list(map(tuple, df.values))


def test_cc_kill_and_resume_identical(tmp_path):
    cfg = EngineConfig(num_partitions=4, checkpoint_every=1)
    # uninterrupted run
    full = connected_components_bsp(_edges(), cfg=cfg)
    want = _labels_sorted(full)

    # "killed" run: stop after 2 iterations by capping max_iters
    ck_dir = str(tmp_path / "cc_ck")
    cfg_short = EngineConfig(num_partitions=4, checkpoint_every=1, cc_max_iters=2)
    partial = connected_components_bsp(_edges(), cfg=cfg_short, checkpoint=ShardCheckpoint(ck_dir))
    assert partial.iterations == 2

    # resume from checkpoint → byte-identical final labels
    resumed = connected_components_bsp(
        _edges(), cfg=EngineConfig(num_partitions=4, checkpoint_every=1),
        checkpoint=ShardCheckpoint(ck_dir),
    )
    assert _labels_sorted(resumed) == want
    # metrics + manifests exist (lineage evidence)
    assert os.path.exists(os.path.join(ck_dir, "metrics.jsonl"))
    iters = [d for d in os.listdir(ck_dir) if d.startswith("iter=")]
    assert len(iters) >= 2
    with open(os.path.join(ck_dir, sorted(iters)[-1], "manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] > 0 and m["parts"] == 4


def test_cc_ignores_aborted_checkpoint(tmp_path):
    ck_dir = str(tmp_path / "cc_ab")
    cfg = EngineConfig(num_partitions=2, checkpoint_every=1, cc_max_iters=2)
    connected_components_bsp(_edges(), cfg=cfg, checkpoint=ShardCheckpoint(ck_dir))
    # simulate a crash mid-write: a newer iter dir WITHOUT manifest
    os.makedirs(os.path.join(ck_dir, "iter=00099"))
    ck = ShardCheckpoint(ck_dir)
    it, _ = ck.latest_shards()
    assert it == 2  # aborted dir skipped


def test_resume_refuses_mismatched_checkpoint(tmp_path):
    """A stale/foreign checkpoint (different P or different graph) must be
    ignored — resuming it would yield positionally-misaligned labels."""
    import pytest

    ck_dir = str(tmp_path / "cc_mismatch")
    cfg = EngineConfig(num_partitions=4, checkpoint_every=1, cc_max_iters=2)
    connected_components_bsp(_edges(), cfg=cfg, checkpoint=ShardCheckpoint(ck_dir))

    ck = ShardCheckpoint(ck_dir)
    # different partition count → refused
    with pytest.warns(UserWarning, match="num_partitions"):
        assert ck.latest_shards(expected_parts=8) is None
    # different vid layout (wrong fingerprint) → refused
    with pytest.warns(UserWarning, match="fingerprint"):
        assert ck.latest_shards(expected_parts=4, expected_vid_fp=12345) is None
    # matching layout → accepted (resume path)
    assert ck.latest_shards(expected_parts=4) is not None

    # a pre-fingerprint manifest (no 'vid_fp' key) cannot prove alignment:
    # refused whenever the caller expects a fingerprint
    import json

    mpath = os.path.join(ck._iter_dir(2), "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    vid_fp = manifest.pop("vid_fp")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.warns(UserWarning, match="no vid-shard fingerprint"):
        assert ck.latest_shards(expected_parts=4, expected_vid_fp=vid_fp) is None
    manifest["vid_fp"] = vid_fp
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    # end-to-end: resuming under a different P starts fresh and is still exact
    want = _labels_sorted(connected_components_bsp(_edges(), cfg=EngineConfig(num_partitions=3)))
    got = _labels_sorted(
        connected_components_bsp(
            _edges(),
            cfg=EngineConfig(num_partitions=3, checkpoint_every=1),
            checkpoint=ShardCheckpoint(ck_dir),
        )
    )
    assert got == want


def test_pagerank_resume_identical(tmp_path):
    ck_dir = str(tmp_path / "pr_ck")
    full = pagerank_bsp(_edges(), cfg=EngineConfig(num_partitions=4))
    want = full.scores.to_pandas().sort_values("vid").reset_index(drop=True)

    cfg_short = EngineConfig(num_partitions=4, checkpoint_every=1, pr_max_iters=3)
    pagerank_bsp(_edges(), cfg=cfg_short, checkpoint=ShardCheckpoint(ck_dir, col="score"))
    resumed = pagerank_bsp(
        _edges(), cfg=EngineConfig(num_partitions=4, checkpoint_every=1),
        checkpoint=ShardCheckpoint(ck_dir, col="score"),
    )
    got = resumed.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    # resumed continuation is numerically identical (deterministic sums)
    assert (got["vid"].values == want["vid"].values).all()
    assert np.array_equal(got["score"].values, want["score"].values)
