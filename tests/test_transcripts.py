import numpy as np
import pyarrow.parquet as pq

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.oracle.unionfind import cc_oracle
from ccl_ray.sources.transcripts import (
    adjacency_edges,
    build_transcript_edges,
    derive_vids,
    generate_transcripts,
    read_transcripts,
    transcript_vertices,
)
from ccl_ray.stages.cc_bsp import connected_components_bsp


def _gen(tmp_path, n_convs=40, seed=7):
    return generate_transcripts(str(tmp_path / f"tr{n_convs}_{seed}"), n_convs=n_convs, seed=seed)


def test_generator_deterministic(tmp_path):
    p1 = generate_transcripts(str(tmp_path / "a"), n_convs=20, seed=3)
    p2 = generate_transcripts(str(tmp_path / "b"), n_convs=20, seed=3)
    t1 = pq.read_table(p1 + "/part-0000.parquet")
    t2 = pq.read_table(p2 + "/part-0000.parquet")
    assert t1.equals(t2)
    # schema is the input_hint contract
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t1.schema.field("ts").type) == "timestamp[us]"
    assert str(t1.schema.field("turn_idx").type) == "int32"


def test_text_invariant_under_vid_mapping(tmp_path):
    """per-turn text equality under stable (conv_id, turn_idx) order: the
    vid derivation is injective and order-preserving within a conversation."""
    path = _gen(tmp_path)
    ds = read_transcripts(path)
    verts = transcript_vertices(ds).to_pandas()
    # injective
    assert verts["vid"].is_unique
    # order-preserving within conversation
    for _, g in verts.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert (np.diff(g["vid"].values) > 0).all()
    # round-trip: vid -> (conv_id, turn_idx) -> same text as source order
    src = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    vr = verts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (src["conv_id"].values == vr["conv_id"].values).all()
    assert (src["turn_idx"].values == vr["turn_idx"].values).all()


def test_adjacency_is_chain_per_conversation(tmp_path):
    path = _gen(tmp_path, n_convs=10)
    ds = read_transcripts(path)
    edges = adjacency_edges(ds).to_pandas()
    src = ds.to_pandas()
    n_turns = len(src)
    n_convs = src["conv_id"].nunique()
    assert len(edges) == n_turns - n_convs  # chain edges per conversation
    assert (edges["dst"].values - edges["src"].values == 1).all()


def test_salt_invariance_of_components(tmp_path):
    """CC structure must not depend on the salt count used for hub splitting."""
    path = _gen(tmp_path, n_convs=30)
    ds = read_transcripts(path)
    verts = transcript_vertices(ds)
    results = []
    for n_salts in (1, 4, 16):
        cfg = EngineConfig(num_partitions=4, extra={"tool_salts": n_salts})
        edges = build_transcript_edges(ds, cfg)
        res = connected_components_bsp(edges, vertices=verts.select_columns(["vid"]), cfg=cfg)
        df = res.labels.to_pandas()
        results.append(dict(zip(df["vid"].astype(int), df["label"].astype(int))))
    assert results[0] == results[1] == results[2]


def test_cc_matches_oracle_on_transcript_graph(tmp_path):
    path = _gen(tmp_path, n_convs=25, seed=11)
    ds = read_transcripts(path)
    cfg = EngineConfig(num_partitions=4)
    edges = build_transcript_edges(ds, cfg)
    ep = edges.to_pandas()
    verts = transcript_vertices(ds)
    res = connected_components_bsp(edges, vertices=verts.select_columns(["vid"]), cfg=cfg)
    df = res.labels.to_pandas()
    got = dict(zip(df["vid"].astype(int), df["label"].astype(int)))
    vv = verts.to_pandas()["vid"].values
    want = cc_oracle(ep["src"].values, ep["dst"].values, vv)
    assert got == want


def test_derive_vids_fallback_hash():
    vids = derive_vids(["conv-x", "conv-y", "conv-x"], np.array([0, 0, 1]))
    assert vids[0] != vids[1] and vids[0] != vids[2]
    # stable across calls
    again = derive_vids(["conv-x", "conv-y", "conv-x"], np.array([0, 0, 1]))
    assert (vids == again).all()


def test_hash_fallback_adjacency_and_block_independence(tmp_path):
    """Arbitrary conv ids: per-row vid scheme; adjacency must route through
    derive_vids (vid(conv,t-1) != vid(conv,t)-1 under the hash fallback),
    and the mapping must not depend on which rows share a block."""
    import pyarrow as pa

    rows = []
    for conv in ["weird-x", "c000007", "another!id"]:
        for t in range(4):
            rows.append((conv, t))
    t_tbl = pa.table(
        {
            "conv_id": pa.array([c for c, _ in rows]),
            "turn_idx": pa.array([t for _, t in rows], pa.int32()),
        }
    )
    for blocks in (1, 5):
        ds = rd.from_arrow(t_tbl).repartition(blocks)
        edges = adjacency_edges(ds).to_pandas()
        verts = transcript_vertices(ds).to_pandas()
        vid_of = {(c, t): v for c, t, v in zip(verts["conv_id"], verts["turn_idx"], verts["vid"])}
        assert verts["vid"].is_unique
        # every adjacency edge connects consecutive turns of one conv
        expected = set()
        for conv in ["weird-x", "c000007", "another!id"]:
            for t in range(1, 4):
                a, b = vid_of[(conv, t - 1)], vid_of[(conv, t)]
                expected.add((min(a, b), max(a, b)))
        got = set(zip(edges["src"].astype(int), edges["dst"].astype(int)))
        assert got == expected
        if blocks == 1:
            base_vids = vid_of
        else:
            assert vid_of == base_vids  # block-independent mapping
