"""Grid-stack → edge-table adapter: the reference's implicit graph, explicit.

Reproduces the exact connectivity semantics of ccl2d/ccl_relabel2 so the
reference's golden tests replay as edge-table CC problems (SURVEY.md §1.1):

- vertex: above-threshold pixel; set iff value > thresh_lo (cv2.THRESH_BINARY
  semantics, ccl2d.py:56-62; the reference's uint8 normalization
  (ccl2d.py:33-44) is monotone for these fixtures so > thresh_lo matches)
- in-plane 8-connectivity (diagonals connect) — ccl2d.py:80-83
- pole rows: all set pixels in row 0 mutually connected; likewise row n0-1
  (ccl2d.py:117-126), when global_latlon_grid. INTENTIONAL DIVERGENCE: if
  an entire pole row is above threshold (no background pixel in the row),
  the reference leaves bot_unique[0]'s component unmerged (arguably a bug
  in its row-scan); this adapter chains ALL set pixels of the row, so a
  golden fixture with a fully-set pole row will differ from the reference
  by that one merge
- dateline wrap: col 0 ~ col n1-1 within ±1 row (ccl2d.py:133-147)
- inter-slice: face adjacency at the same (i,j) between slice t and t+1
  (ccl_relabel2 overlap labeling, ccl_marker_stack.py:300-343) — NOT
  26-connectivity

vid = t*(n0*n1) + i*n1 + j. The reference's resolved stack labeling (after
translation composition + backward sweep, ccl_marker_stack.py:986-1010) is
connected components of exactly this graph; its per-slice 'ages' are the
per-component distinct-t counts. Golden comparisons are partition-equality
(reference numerals are order-dependent, SURVEY.md §4 Determinism).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grid_vids(t: np.ndarray, i: np.ndarray, j: np.ndarray, n0: int, n1: int) -> np.ndarray:
    return t.astype(np.int64) * (n0 * n1) + i.astype(np.int64) * n1 + j.astype(np.int64)


def slice_mask(
    a: np.ndarray,
    thresh_lo: float,
    *,
    norm_data: bool = False,
    thresh_inverse: bool = False,
    perform_threshold: bool = True,
) -> np.ndarray:
    """Set-pixel mask with the reference's full threshold knob set.

    - ``norm_data`` (ccl2d.py:33-44): rescale to uint8 via 255*(x/nanmax)
      with C truncation (the reference assigns the float product into a
      uint8 array), and truncate the trigger the same way — reproduces the
      reference's quantization exactly, including its non-monotone edge
      cases near bucket boundaries.
    - ``thresh_inverse`` (ccl2d.py:58-62): cv2.THRESH_BINARY_INV semantics —
      set iff value <= trigger (vs BINARY's value > trigger).
    - ``perform_threshold=False``: the input is already a mask; set iff != 0.
    """
    a = np.asarray(a)
    if norm_data:
        mx = np.nanmax(a)
        if mx == 0:
            mx = 1
        data = (255 * (a / mx)).astype(np.uint8)
        trigger = int(255 * thresh_lo / mx)
    else:
        data, trigger = a, thresh_lo
    if not perform_threshold:
        return data != 0
    return (data <= trigger) if thresh_inverse else (data > trigger)


def stack_to_graph(
    stack: list[np.ndarray],
    thresh_lo: float,
    *,
    global_latlon_grid: bool = True,
    norm_data: bool = False,
    thresh_inverse: bool = False,
    perform_threshold: bool = True,
) -> tuple[pa.Table, pa.Table]:
    """Returns (vertices(vid, t, i, j), edges(src, dst)) for the whole stack.

    Threshold knobs mirror the reference's ccl2d signature (see slice_mask);
    defaults keep the raw ``> thresh_lo`` semantics the golden fixtures pin
    (the reference's norm_data=True default is monotone for those fixtures).
    """
    n0, n1 = stack[0].shape
    vids_all, ts_all, is_all, js_all = [], [], [], []
    srcs, dsts = [], []

    def add(a: np.ndarray, b: np.ndarray):
        if len(a):
            srcs.append(a)
            dsts.append(b)

    masks = [
        slice_mask(
            s,
            thresh_lo,
            norm_data=norm_data,
            thresh_inverse=thresh_inverse,
            perform_threshold=perform_threshold,
        )
        for s in stack
    ]
    for t, mask in enumerate(masks):
        ii, jj = np.nonzero(mask)
        v = grid_vids(np.full(len(ii), t), ii, jj, n0, n1)
        vids_all.append(v)
        ts_all.append(np.full(len(ii), t, dtype=np.int32))
        is_all.append(ii.astype(np.int32))
        js_all.append(jj.astype(np.int32))

        # in-plane 8-connectivity: 4 forward offsets (E, SE, S, SW)
        for di, dj in ((0, 1), (1, 1), (1, 0), (1, -1)):
            i2, j2 = ii + di, jj + dj
            ok = (i2 >= 0) & (i2 < n0) & (j2 >= 0) & (j2 < n1)
            ok[ok] &= mask[i2[ok], j2[ok]]
            add(
                grid_vids(np.full(ok.sum(), t), ii[ok], jj[ok], n0, n1),
                grid_vids(np.full(ok.sum(), t), i2[ok], j2[ok], n0, n1),
            )

        if global_latlon_grid:
            # pole rows: chain set pixels of row 0 (and row n0-1) together
            for row in (0, n0 - 1):
                cols = np.nonzero(mask[row])[0]
                if len(cols) > 1:
                    a = grid_vids(np.full(len(cols) - 1, t), np.full(len(cols) - 1, row), cols[:-1], n0, n1)
                    b = grid_vids(np.full(len(cols) - 1, t), np.full(len(cols) - 1, row), cols[1:], n0, n1)
                    add(a, b)
            # dateline: (i, 0) ~ (i', n1-1) for |i-i'| <= 1
            left = np.nonzero(mask[:, 0])[0]
            right = np.nonzero(mask[:, n1 - 1])[0]
            if len(left) and len(right):
                li = np.repeat(left, len(right))
                ri = np.tile(right, len(left))
                ok = np.abs(li - ri) <= 1
                add(
                    grid_vids(np.full(ok.sum(), t), li[ok], np.zeros(ok.sum(), int), n0, n1),
                    grid_vids(np.full(ok.sum(), t), ri[ok], np.full(ok.sum(), n1 - 1), n0, n1),
                )

        # inter-slice face adjacency
        if t + 1 < len(masks):
            both = mask & masks[t + 1]
            bi, bj = np.nonzero(both)
            add(
                grid_vids(np.full(len(bi), t), bi, bj, n0, n1),
                grid_vids(np.full(len(bi), t + 1), bi, bj, n0, n1),
            )

    vertices = pa.table(
        {
            "vid": pa.array(np.concatenate(vids_all) if vids_all else np.empty(0, np.int64)),
            "t": pa.array(np.concatenate(ts_all) if ts_all else np.empty(0, np.int32)),
            "i": pa.array(np.concatenate(is_all) if is_all else np.empty(0, np.int32)),
            "j": pa.array(np.concatenate(js_all) if js_all else np.empty(0, np.int32)),
        }
    )
    edges = pa.table(
        {
            "src": pa.array(np.concatenate(srcs) if srcs else np.empty(0, np.int64)),
            "dst": pa.array(np.concatenate(dsts) if dsts else np.empty(0, np.int64)),
        }
    )
    return vertices, edges


def labels_to_slices(
    labels_df, vertices: pa.Table, n_slices: int, n0: int, n1: int
) -> list[np.ndarray]:
    """Paint (vid,label) back onto dense slices (0 = background) for golden
    comparison; label values are canonical min-vids."""
    lab = dict(zip(labels_df["vid"].astype(np.int64), labels_df["label"].astype(np.int64)))
    out = [np.zeros((n0, n1), dtype=np.int64) for _ in range(n_slices)]
    t = vertices.column("t").to_numpy(zero_copy_only=False)
    i = vertices.column("i").to_numpy(zero_copy_only=False)
    j = vertices.column("j").to_numpy(zero_copy_only=False)
    v = vertices.column("vid").to_numpy(zero_copy_only=False)
    for tt, ii, jj, vv in zip(t, i, j, v):
        out[tt][ii, jj] = lab[vv] + 1  # +1 so a vid of 0 is distinguishable from background
    return out


def partition_signature(slices: list[np.ndarray]) -> dict:
    """Map each nonzero label to its frozenset of (t,i,j) pixels — the
    label-numbering-free representation used for golden comparisons."""
    groups: dict = {}
    for t, s in enumerate(slices):
        ii, jj = np.nonzero(s)
        for i, j in zip(ii, jj):
            groups.setdefault(int(s[i, j]), set()).add((t, int(i), int(j)))
    return {min_key(v): frozenset(v) for v in groups.values()}


def min_key(pixels: set) -> tuple:
    return min(pixels)
