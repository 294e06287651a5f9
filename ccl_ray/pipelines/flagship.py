"""Flagship pipeline: events → edge table → connected components + PageRank
→ one labeled/scored vertex table. The driver smoke-checks this via
__ray_entry__.entry()."""

from __future__ import annotations

from ccl_ray.config import EngineConfig
from ccl_ray.sources.events_graph import build_event_edges, event_vertices
from ccl_ray.stages.cc_bsp import connected_components_bsp
from ccl_ray.stages.exchange import hash_join
from ccl_ray.stages.pagerank_bsp import pagerank_bsp


def flagship(sf_dir: str, num_partitions: int = 8):
    """Returns Dataset (event_id, label, score)."""
    from ccl_ray.state.shards import build_graph_shards

    cfg = EngineConfig(num_partitions=num_partitions)
    edges = build_event_edges(sf_dir)
    verts = event_vertices(sf_dir)
    # one shard bundle drives both algorithms
    shards = build_graph_shards(edges, num_partitions, vertices_ds=verts, symmetrize=True)
    cc = connected_components_bsp(edges, cfg=cfg, shards=shards)
    pr = pagerank_bsp(edges, cfg=cfg, symmetrize=True, shards=shards)
    labels = cc.labels.rename_columns({"vid": "event_id"})
    scores = pr.scores.rename_columns({"vid": "svid"})
    out = hash_join(labels, scores, left_on="event_id", right_on="svid", num_partitions=num_partitions)
    return out
