"""Property-based tests (hypothesis) for the pure kernels — no Ray needed."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ccl_ray.functions.hashing import (
    hash_strings_np,
    minhash_signature,
    rolling_hash_shingles,
    stable_hash64_np,
)
from ccl_ray.stages.relabel import compose_translations


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_stable_hash_deterministic_and_seed_sensitive(xs):
    a = np.array(xs, dtype=np.int64)
    h1 = stable_hash64_np(a.view(np.uint64))
    h2 = stable_hash64_np(a.view(np.uint64))
    assert (h1 == h2).all()
    h3 = stable_hash64_np(a.view(np.uint64), seed=1)
    # different seed decorrelates (not a strict guarantee per element, but
    # identical full vectors would mean the seed is dead)
    if len(set(xs)) > 3:
        assert not (h1 == h3).all()


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_rolling_shingles_deterministic_and_unique(text):
    s1 = rolling_hash_shingles(text)
    s2 = rolling_hash_shingles(text)
    assert (s1 == s2).all()
    assert len(np.unique(s1)) == len(s1)


@given(st.text(min_size=20, max_size=100), st.integers(0, 10))
@settings(max_examples=30, deadline=None)
def test_minhash_identical_docs_identical_sigs(text, pad):
    a = rolling_hash_shingles(text)
    assert (minhash_signature(a, 32) == minhash_signature(a.copy(), 32)).all()


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    words = [f"w{i}" for i in range(50)]
    base = " ".join(rng.choice(words, 200))
    variant = base[: len(base) // 2] + " ".join(rng.choice(words, 100))
    sa = rolling_hash_shingles(base)
    sb = rolling_hash_shingles(variant)
    true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    est = (minhash_signature(sa, 256) == minhash_signature(sb, 256)).mean()
    assert abs(est - true_j) < 0.12


@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=15),
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=15),
)
@settings(max_examples=50, deadline=None)
def test_compose_translations_function_property(p0, p1):
    # many-to-one maps: dedupe olds
    x0 = pd.DataFrame(dict(zip(("old", "new"), zip(*p0))) if p0 else {"old": [], "new": []}).drop_duplicates("old")
    x1 = pd.DataFrame(dict(zip(("old", "new"), zip(*p1))) if p1 else {"old": [], "new": []}).drop_duplicates("old")
    x01 = compose_translations(x0, x1)
    # composition semantics: apply(x01, v) == apply(x1, apply(x0, v))
    m0 = dict(zip(x0["old"], x0["new"]))
    m1 = dict(zip(x1["old"], x1["new"]))
    m01 = dict(zip(x01["old"], x01["new"]))
    for v in range(21):
        step = m1.get(m0.get(v, v), m0.get(v, v))
        assert m01.get(v, v) == step, (v, m01.get(v, v), step)
