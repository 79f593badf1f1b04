"""Native seeding kernels vs their numpy oracles.

The native sketch (native/sketch.cpp) and the bounded window-range
search (native/seedsearch.cpp window_ranges_bounded) are drop-in
replacements for the numpy formulations in ops/minimizer.py; these
tests pin them bit-exactly (role of the reference's minimap sketch.c
behaviour, exercised indirectly by ref test/test_semi_global_alignment
through seeding)."""

import numpy as np
import pytest

import unicycler_tpu.ops.minimizer as mz
from unicycler_tpu.native import (native_sketch,
                                  native_window_ranges,
                                  native_window_ranges_bounded)


def _oracle_sketch(codes, k, w):
    kmers, valid = mz._kmer_codes(codes, k)
    mask = (1 << (2 * k)) - 1
    fwd = mz._hash64(kmers, mask)
    rev = mz._hash64(mz._revcomp_kmers(kmers, k), mask)
    strand = (rev < fwd).astype(np.int8)
    canon = np.where(strand == 1, rev, fwd)
    ok = valid & (fwd != rev)
    canon = np.where(ok, canon, np.uint64(np.iinfo(np.uint64).max))
    n = len(canon)
    if n <= w:
        sel = np.array([np.argmin(canon)]) if ok.any() \
            else np.zeros(0, np.int64)
        sel = sel[ok[sel]] if len(sel) else sel
    else:
        sel = np.unique(mz._sliding_argmin(canon, w))
        sel = sel[ok[sel]]
    return canon[sel], sel.astype(np.int32), strand[sel]


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_native_sketch_matches_numpy_oracle(seed):
    if native_sketch(np.zeros(20, np.int8), 15, 5) is None:
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(seed)
    for trial in range(120):
        n = int(rng.integers(1, 500))
        codes = rng.integers(0, 4, n).astype(np.int8)
        if trial % 3 == 0 and n > 3:
            bad = rng.integers(0, n, max(1, n // 15))
            codes[bad] = 4
        for k, w in ((15, 5), (10, 10), (3, 2)):
            if n < k:
                continue
            oh, op, os_ = _oracle_sketch(codes, k, w)
            nh, np_, ns = native_sketch(codes, k, w)
            assert np.array_equal(op, np_), (n, k, w)
            assert np.array_equal(oh, nh)
            assert np.array_equal(os_, ns)


def test_bounded_window_ranges_match_full_search():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 5000).astype(np.int8)
    query = rng.integers(0, 4, 300).astype(np.int8)
    k = 10
    ck = mz.get_fine_index(ref, k)
    qk, _ = mz._kmer_codes(query, k)
    qck = qk << np.uint64(32)
    if native_window_ranges(ck, qck, 0, 1) is None:
        pytest.skip('native library unavailable')
    lo0, hi0 = native_window_ranges(ck, qck, 0, 0xFFFFFFFF)
    for w0, w1 in ((0, 5000), (100, 900), (2500, 2600), (4990, 5000)):
        full = native_window_ranges(ck, qck, max(w0, 0),
                                    max(w1 - k + 1, 0))
        bounded = native_window_ranges_bounded(ck, lo0, hi0, qck,
                                               max(w0, 0),
                                               max(w1 - k + 1, 0))
        assert np.array_equal(full[0], bounded[0]), (w0, w1)
        assert np.array_equal(full[1], bounded[1]), (w0, w1)
