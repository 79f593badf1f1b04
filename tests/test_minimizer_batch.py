"""lookup_many must equal per-read lookup exactly (ops/minimizer.py)."""

import numpy as np

from unicycler_tpu.ops.encode import revcomp_codes
from unicycler_tpu.ops.minimizer import MinimizerIndex


def _cluster_key(c):
    return (c.ref_id, c.rev_comp, c.read_start, c.read_end, c.ref_start,
            c.ref_end, c.n_hits, c.anchors_read.tolist(),
            c.anchors_ref.tolist())


def test_lookup_many_matches_per_read():
    rng = np.random.RandomState(7)
    refs = [rng.randint(0, 4, n).astype(np.int8) for n in (20000, 6000)]
    index = MinimizerIndex(refs, k=15, w=10)
    reads = []
    for i in range(600):
        rid = rng.randint(0, 2)
        start = rng.randint(0, len(refs[rid]) - 150)
        r = refs[rid][start:start + 120].copy()
        e = rng.rand(len(r)) < 0.02
        r[e] = (r[e] + rng.randint(1, 4, e.sum())) % 4
        if i % 2:
            r = revcomp_codes(r)
        if i % 31 == 0:
            r[7] = 4                     # interior N
        if i % 97 == 0:
            r = r[:20]                   # shorter than one window
        reads.append(r)
    per = [index.lookup(r, min_hits=2) for r in reads]
    many = index.lookup_many(reads, min_hits=2)
    assert len(per) == len(many)
    for a, b in zip(per, many):
        assert [_cluster_key(c) for c in a] == [_cluster_key(c) for c in b]


def test_lookup_many_empty_and_single():
    rng = np.random.RandomState(8)
    refs = [rng.randint(0, 4, 5000).astype(np.int8)]
    index = MinimizerIndex(refs, k=15, w=10)
    assert index.lookup_many([]) == []
    read = refs[0][100:220].copy()
    a = index.lookup(read, min_hits=2)
    b = index.lookup_many([read], min_hits=2)[0]
    assert [_cluster_key(c) for c in a] == [_cluster_key(c) for c in b]
