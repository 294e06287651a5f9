"""Reference-parity tests: the golden fixtures from the reference's unit
tests, replayed as edge-table CC problems.

Golden data (as DATA, cited for parity checking — not code):
- single-slice 5x6: ccl2d.py:224-246 (2 components incl. pole merge +
  diagonal connectivity)
- 7-slice 'diagonals' stack + expected ages: ccl_marker_stack.py:1242-1409
  (resolved labels 1293-1337, ages 1366-1403)

Labels are compared as PARTITIONS (pixel sets per component) because the
reference's numerals are order-dependent (marker_base counter) while ours
are canonical min-vids (SURVEY.md §4).
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.sources.grid import labels_to_slices, partition_signature, stack_to_graph
from ccl_ray.stages.aggregates import component_ages
from ccl_ray.stages.cc_bsp import connected_components_bsp
from ccl_ray.stages.exchange import hash_join
from ccl_ray.stages.relabel import eol_labels


def _run_cc(stack, thresh_lo=1, P=4):
    verts, edges = stack_to_graph(stack, thresh_lo)
    res = connected_components_bsp(
        rd.from_arrow(edges),
        vertices=rd.from_arrow(verts.select(["vid"])),
        cfg=EngineConfig(num_partitions=P),
    )
    return res.labels.to_pandas(), verts


def _signature_of_golden(golden_slices):
    return partition_signature([np.asarray(g) for g in golden_slices])


def test_ccl2d_single_slice_golden():
    # fixture: ccl2d.py:226-237; golden: ccl2d.py:239-244
    d0 = np.zeros((5, 6))
    for i, j in [(0, 0), (0, 2), (1, 2), (2, 2), (0, 4), (2, 4), (3, 5), (4, 0), (4, 3), (4, 4), (4, 5)]:
        d0[i, j] = 2
    golden = [np.array(
        [[1, 0, 1, 0, 1, 0],
         [0, 0, 1, 0, 0, 0],
         [0, 0, 1, 0, 2, 0],
         [0, 0, 0, 0, 0, 2],
         [2, 0, 0, 2, 2, 2]])]
    labels, verts = _run_cc([d0])
    ours = labels_to_slices(labels, verts, 1, 5, 6)
    assert partition_signature(ours) == _signature_of_golden(golden)


def _diagonals_stack():
    # fixture: ccl_marker_stack.py:1243-1290
    d = []
    d.append(np.zeros((5, 6)))
    for i, j in [(1, 1), (2, 1), (3, 1), (4, 1), (0, 3), (2, 3), (1, 5), (3, 5)]:
        d[0][i, j] = 2
    d.append(np.zeros((5, 6)))
    for i, j in [(1, 1), (3, 1), (4, 1), (0, 3), (2, 3), (3, 3), (1, 5), (2, 5), (3, 5)]:
        d[1][i, j] = 2
    d.append(np.zeros((5, 6)))
    for i, j in [(1, 1), (4, 1), (0, 3), (1, 3), (2, 3), (3, 3), (1, 5), (3, 5)]:
        d[2][i, j] = 2
    d.append(np.zeros((5, 6)))
    d.append(np.zeros((5, 6)))
    d[4][2, 3] = 2
    d.append(np.zeros((5, 6)))
    d.append(np.zeros((5, 6)))
    for i, j in [(0, 0), (0, 4), (1, 1), (2, 0), (3, 5), (4, 2), (4, 4)]:
        d[6][i, j] = 2
    return d


def _diagonals_golden():
    # golden resolved labels: ccl_marker_stack.py:1293-1337
    return [
        np.array([[0, 0, 0, 11, 0, 0], [0, 10, 0, 0, 0, 12], [0, 10, 0, 11, 0, 0],
                  [0, 10, 0, 0, 0, 12], [0, 10, 0, 0, 0, 0]]),
        np.array([[0, 0, 0, 11, 0, 0], [0, 10, 0, 0, 0, 12], [0, 0, 0, 11, 0, 12],
                  [0, 10, 0, 11, 0, 12], [0, 10, 0, 0, 0, 0]]),
        np.array([[0, 0, 0, 11, 0, 0], [0, 10, 0, 11, 0, 12], [0, 0, 0, 11, 0, 0],
                  [0, 0, 0, 11, 0, 12], [0, 10, 0, 0, 0, 0]]),
        np.zeros((5, 6), dtype=int),
        np.array([[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 13, 0, 0],
                  [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]]),
        np.zeros((5, 6), dtype=int),
        np.array([[14, 0, 0, 0, 14, 0], [0, 14, 0, 0, 0, 0], [14, 0, 0, 0, 0, 0],
                  [0, 0, 0, 0, 0, 14], [0, 0, 14, 0, 14, 0]]),
    ]


def _diagonals_expected_ages():
    # ages golden: ccl_marker_stack.py:1366-1403 — age of each component at
    # full resolution (slice-count of the component), painted per pixel
    return [
        np.array([[0, 0, 0, 3, 0, 0], [0, 3, 0, 0, 0, 3], [0, 3, 0, 3, 0, 0],
                  [0, 3, 0, 0, 0, 3], [0, 3, 0, 0, 0, 0]]),
        np.array([[0, 0, 0, 3, 0, 0], [0, 3, 0, 0, 0, 3], [0, 0, 0, 3, 0, 3],
                  [0, 3, 0, 3, 0, 3], [0, 3, 0, 0, 0, 0]]),
        np.array([[0, 0, 0, 3, 0, 0], [0, 3, 0, 3, 0, 3], [0, 0, 0, 3, 0, 0],
                  [0, 0, 0, 3, 0, 3], [0, 3, 0, 0, 0, 0]]),
        np.zeros((5, 6)),
        np.array([[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0],
                  [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]]),
        np.zeros((5, 6)),
        np.array([[1, 0, 0, 0, 1, 0], [0, 1, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0],
                  [0, 0, 0, 0, 0, 1], [0, 0, 1, 0, 1, 0]]),
    ]


def test_diagonals_stack_golden_labels():
    labels, verts = _run_cc(_diagonals_stack())
    ours = labels_to_slices(labels, verts, 7, 5, 6)
    assert partition_signature(ours) == _signature_of_golden(_diagonals_golden())


def test_diagonals_ages_golden():
    labels, verts = _run_cc(_diagonals_stack())
    lab = rd.from_arrow(
        pa.table(
            {
                "lvid": pa.array(labels["vid"].values.astype(np.int64)),
                "label": pa.array(labels["label"].values.astype(np.int64)),
            }
        )
    )
    vt = rd.from_arrow(verts.select(["vid", "t"]))
    joined = hash_join(vt, lab, left_on="vid", right_on="lvid", num_partitions=4)

    def to_lt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": batch.column("label"),
                "t": batch.column("t").cast(pa.int64()),
            }
        )

    ages = component_ages(joined.map_batches(to_lt, batch_format="pyarrow")).to_pandas()
    age_of = dict(zip(ages["label"].astype(int), ages["age"].astype(int)))
    lab_of = dict(zip(labels["vid"].astype(int), labels["label"].astype(int)))

    expected = _diagonals_expected_ages()
    tt = verts.column("t").to_numpy(zero_copy_only=False)
    ii = verts.column("i").to_numpy(zero_copy_only=False)
    jj = verts.column("j").to_numpy(zero_copy_only=False)
    vv = verts.column("vid").to_numpy(zero_copy_only=False)
    painted = [np.zeros((5, 6)) for _ in range(7)]
    for t, i, j, v in zip(tt, ii, jj, vv):
        painted[t][i, j] = age_of[lab_of[v]]
    for t in range(7):
        assert np.array_equal(painted[t], expected[t]), f"slice {t}"


def test_diagonals_eol():
    # component deaths: slice2 -> slice3 kills components 10,11,12 (golden
    # labels vanish at t=3); the reborn 13 dies after t=4; 14 survives to the
    # end (also reported: no successor slice). Reference C7 semantics,
    # ccl_marker_stack.py:664-667.
    labels, verts = _run_cc(_diagonals_stack())
    lab = dict(zip(labels["vid"].astype(int), labels["label"].astype(int)))
    rows = {"label": [], "t": []}
    tt = verts.column("t").to_numpy(zero_copy_only=False)
    vv = verts.column("vid").to_numpy(zero_copy_only=False)
    for t, v in zip(tt, vv):
        rows["label"].append(lab[v])
        rows["t"].append(int(t))
    present = rd.from_arrow(
        pa.table({"label": pa.array(rows["label"], pa.int64()), "t": pa.array(rows["t"], pa.int64())})
    )
    eol = eol_labels(present).to_pandas()
    deaths_by_t = eol.groupby("t")["label"].nunique().to_dict()
    assert deaths_by_t.get(2) == 3   # components 10,11,12 die after slice 2
    assert deaths_by_t.get(4) == 1   # reborn component dies after slice 4
    assert deaths_by_t.get(6) == 1   # final-slice component (end of stack)


def test_distributed_equals_serial_partitions():
    # test_segmented_ccl analog (ccl_marker_stack.py:1411-1686): same
    # partition from any partition count
    stack = _diagonals_stack()
    base = None
    for P in (1, 2, 8):
        labels, verts = _run_cc(stack, P=P)
        sig = partition_signature(labels_to_slices(labels, verts, 7, 5, 6))
        if base is None:
            base = sig
        else:
            assert sig == base


def test_thresh_inverse_selects_complement():
    """cv2.THRESH_BINARY_INV parity (ccl2d.py:58-62): set iff value <= trigger."""
    from ccl_ray.sources.grid import slice_mask

    s = np.array([[5, 1, 5], [1, 5, 1], [5, 1, 5]], dtype=np.float64)
    m = slice_mask(s, 2)
    mi = slice_mask(s, 2, thresh_inverse=True)
    assert (m == (s > 2)).all()
    assert (mi == (s <= 2)).all()
    assert (m ^ mi).all()  # exact complements

    # end-to-end: inverse threshold picks the 4 corner-adjacent low pixels,
    # which 8-connectivity joins into ONE component through the center? no —
    # the low pixels are the edge-midpoints (0,1),(1,0),(1,2),(2,1): each
    # pair is diagonal-adjacent, so all four form one 8-connected component
    verts, edges = stack_to_graph([s], 2, global_latlon_grid=False, thresh_inverse=True)
    assert verts.num_rows == 4
    res = connected_components_bsp(
        rd.from_arrow(edges),
        vertices=rd.from_arrow(verts.select(["vid"])),
        cfg=EngineConfig(num_partitions=2),
    )
    labs = res.labels.to_pandas()
    assert labs["label"].nunique() == 1


def test_norm_data_uint8_quantization_parity():
    """norm_data=True must reproduce the reference's uint8 rescale incl.
    truncation (ccl2d.py:33-44): values that collapse into the same uint8
    bucket as the trigger become background."""
    from ccl_ray.sources.grid import slice_mask

    # mx=10 -> scale 25.5/unit; trigger thresh_lo=4 -> int(255*4/10)=102
    # value 4.05 -> int(255*.405)=103 > 102 set; 4.0 -> 102 not set
    s = np.array([[4.0, 4.05], [10.0, 0.0]])
    m = slice_mask(s, 4, norm_data=True)
    assert m.tolist() == [[False, True], [True, False]]
    # raw (un-normalized) semantics differ at exactly the boundary value
    m_raw = slice_mask(s, 4)
    assert m_raw.tolist() == [[False, True], [True, False]]
    # a case where quantization CHANGES the outcome vs raw floats:
    # 4.003 raw-> set (4.003 > 4), norm-> int(255*0.4003)=102 == trigger -> not set
    s2 = np.array([[4.003, 10.0]])
    assert slice_mask(s2, 4).tolist() == [[True, True]]
    assert slice_mask(s2, 4, norm_data=True).tolist() == [[False, True]]


def test_perform_threshold_false_uses_nonzero_mask():
    from ccl_ray.sources.grid import slice_mask

    s = np.array([[0, 2], [3, 0]])
    assert slice_mask(s, 99, perform_threshold=False).tolist() == [[False, True], [True, False]]
