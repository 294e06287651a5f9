"""bpe_merges (distributed BPE trainer) vs the sequential pure-Python twin."""
import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.bpe import _merge_pass, bpe_merges, bpe_oracle


def _run(texts, n_merges, P, min_count=1):
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    got = bpe_merges(
        rd.from_arrow(tbl).repartition(3), n_merges=n_merges,
        min_count=min_count, num_partitions=P,
    ).to_pandas()
    return [
        (int(a), str(b), str(c), int(d))
        for a, b, c, d in zip(got["rank"], got["left"], got["right"], got["count"])
    ]


def test_bpe_classic_corpus():
    # the Sennrich paper's toy shape: 'low' family forces 'lo'+'w' merges
    texts = ["low low low low low", "lower lower", "newest newest newest",
             "widest widest", "low lower newest"]
    want = bpe_oracle(texts, n_merges=6)
    assert len(want) == 6
    for P in (1, 4):
        assert _run(texts, 6, P) == want, P


def test_bpe_overlap_greedy():
    # 'aaaa' with pair (a,a): greedy left-to-right -> two merges per word,
    # then ('aa','aa') wins round 2
    texts = ["aaaa aaaa aaaa"]
    want = bpe_oracle(texts, n_merges=2)
    assert want[0][1:3] == ("a", "a") and want[1][1:3] == ("aa", "aa")
    assert _run(texts, 2, 2) == want


def test_bpe_ties_and_mincount():
    texts = ["ab cd ab cd", "ab cd", "zz"]
    # ('a','b') and ('c','d') tie at 3 -> lexicographic left wins
    want = bpe_oracle(texts, n_merges=3, min_count=2)
    assert want[0][1:3] == ("a", "b") and want[1][1:3] == ("c", "d")
    assert _run(texts, 3, 2, min_count=2) == want


def test_bpe_random_vs_oracle():
    rng = np.random.RandomState(11)
    alpha = list("abcde")
    texts = [
        " ".join(
            "".join(rng.choice(alpha, rng.randint(1, 8)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(30)
    ]
    want = bpe_oracle(texts, n_merges=10)
    for P in (1, 4):
        assert _run(texts, 10, P) == want, P


def test_merge_pass_run_parity():
    flat = np.array(list("aaaaa"), object)
    wid = np.zeros(5, np.int64)
    nf, nw = _merge_pass(flat, wid, "a", "a")
    assert list(nf) == ["aa", "aa", "a"] and len(nw) == 3
    # word boundary blocks the pair
    flat = np.array(["a", "a", "a", "a"], object)
    wid = np.array([0, 0, 1, 1], np.int64)
    nf, _ = _merge_pass(flat, wid, "a", "a")
    assert list(nf) == ["aa", "aa"]
