"""Unit tests for the k-mer-spectrum read corrector (asm/correct.py)."""

import numpy as np

from unicycler_tpu.asm.correct import (KmerSpectrum, correct_read,
                                       correct_reads, count_spectrum,
                                       pack_kmers)


def _reads_with_errors(n_reads=400, read_len=100, err_every=7, seed=0):
    rng = np.random.RandomState(seed)
    genome = rng.randint(0, 4, 5000).astype(np.int8)
    reads, truths = [], []
    for i in range(n_reads):
        start = rng.randint(0, len(genome) - read_len)
        r = genome[start:start + read_len].copy()
        truths.append(r.copy())
        if i % err_every == 0:
            p = rng.randint(5, read_len - 5)
            r[p] = (r[p] + rng.randint(1, 4)) % 4
        reads.append(r)
    return reads, truths


def test_count_spectrum_equals_per_read_counting():
    reads, _ = _reads_with_errors()
    k = 21
    kmers, counts = count_spectrum(reads, k)
    # per-read reference counting
    chunks = []
    from unicycler_tpu.asm.correct import canonical_packed
    for codes in reads:
        km, valid = pack_kmers(codes, k)
        if len(km):
            chunks.append(canonical_packed(km[valid], k))
    ref_k, ref_c = np.unique(np.concatenate(chunks), return_counts=True)
    assert np.array_equal(kmers, ref_k)
    assert np.array_equal(counts, ref_c)


def test_batched_screen_equals_per_read_correction():
    reads, truths = _reads_with_errors()
    out, stats = correct_reads(reads)
    # reference: per-read correction over every read (no screen)
    spectrum = KmerSpectrum(reads, 21, None)
    for got, codes in zip(out, reads):
        ref, _ = correct_read(codes, spectrum)
        assert np.array_equal(got, ref)
    assert stats['reads_corrected'] > 0


def test_corrections_restore_planted_errors():
    reads, truths = _reads_with_errors()
    out, stats = correct_reads(reads)
    fixed = sum(1 for got, truth in zip(out, truths)
                if np.array_equal(got, truth))
    before = sum(1 for r, truth in zip(reads, truths)
                 if np.array_equal(r, truth))
    assert fixed > before                     # corrections net-help
    assert stats['substitutions'] >= stats['reads_corrected']
