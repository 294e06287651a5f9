"""bowtie_regions (Broder bow-tie decomposition) vs a serial closure oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.dag import bowtie_regions
from ccl_ray.stages.scc import strongly_connected_components


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _vds(vids):
    return rd.from_arrow(pa.table({"vid": pa.array(sorted(vids), pa.int64())}))


def _oracle(src, dst, vids):
    """Serial bow-tie via full boolean reachability closure (small n)."""
    vids = sorted(int(v) for v in vids)
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    r = np.eye(n, dtype=bool)
    for a, b in zip(src, dst):
        r[idx[int(a)], idx[int(b)]] = True
    for _ in range(n):
        nxt = r | (r @ r)
        if (nxt == r).all():
            break
        r = nxt
    # SCC label = min vid mutually reachable
    lab = np.array(
        [min(vids[j] for j in range(n) if r[i, j] and r[j, i]) for i in range(n)]
    )
    labs, counts = np.unique(lab, return_counts=True)
    order = np.lexsort((labs, -counts))
    core_label = labs[order[0]]
    core = lab == core_label
    fwd = r[core].any(axis=0)  # reached from core (incl core)
    bwd = r[:, core].any(axis=1)  # reaches core
    inv = bwd & ~core
    outv = fwd & ~core
    rin = r[inv].any(axis=0) | inv if inv.any() else inv.copy()
    rout = (r[:, outv].any(axis=1) | outv) if outv.any() else outv.copy()
    out = {}
    for i, v in enumerate(vids):
        if core[i]:
            out[v] = "core"
        elif inv[i]:
            out[v] = "in"
        elif outv[i]:
            out[v] = "out"
        elif rin[i] and rout[i]:
            out[v] = "tube"
        elif rin[i]:
            out[v] = "tendril_in"
        elif rout[i]:
            out[v] = "tendril_out"
        else:
            out[v] = "disc"
    return out


def _run(src, dst, vids, P):
    edges = _ds(src, dst)
    verts = _vds(vids)
    cfg = EngineConfig(num_partitions=P)
    res = strongly_connected_components(edges, vertices=verts, cfg=cfg)
    got = (
        bowtie_regions(edges, res.labels, vertices=verts, cfg=cfg, num_partitions=P)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    return dict(zip(got["vid"], got["region"]))


def test_bowtie_textbook_shape():
    # core cycle {10,11,12}; IN 1->10, 0->1; OUT 12->20->21;
    # tube 1->30->20 (bypasses core); tendril_in 1->40; tendril_out 41->20;
    # disconnected pair 50->51
    src = [10, 11, 12, 1, 0, 12, 20, 1, 30, 1, 41, 50]
    dst = [11, 12, 10, 10, 1, 20, 21, 30, 20, 40, 20, 51]
    vids = [0, 1, 10, 11, 12, 20, 21, 30, 40, 41, 50, 51]
    exp = {
        0: "in", 1: "in", 10: "core", 11: "core", 12: "core",
        20: "out", 21: "out", 30: "tube", 40: "tendril_in",
        41: "tendril_out", 50: "disc", 51: "disc",
    }
    assert _oracle(src, dst, vids) == exp  # oracle sanity on the textbook graph
    for P in (1, 4):
        assert _run(src, dst, vids, P) == exp


def test_bowtie_random_graphs_match_oracle_all_partitionings():
    rng = np.random.default_rng(11)
    for n, m in ((24, 40), (60, 150)):
        src = rng.integers(0, n, m).tolist()
        dst = rng.integers(0, n, m).tolist()
        keep = [(a, b) for a, b in zip(src, dst) if a != b]
        src = [a for a, _ in keep]
        dst = [b for _, b in keep]
        vids = list(range(n))
        exp = _oracle(src, dst, vids)
        for P in (1, 3, 8):
            assert _run(src, dst, vids, P) == exp


def test_bowtie_acyclic_singleton_core():
    # pure chain: every SCC is a singleton; core = min vid (size ties), the
    # chain head; everything downstream is OUT
    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 4]
    vids = [0, 1, 2, 3, 4]
    exp = _oracle(src, dst, vids)
    assert exp[0] == "core" and all(exp[v] == "out" for v in (1, 2, 3, 4))
    assert _run(src, dst, vids, 4) == exp
