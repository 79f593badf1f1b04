"""Polish consensus regression tests.

The polisher replaces the reference's Racon loop (ref
miniasm_assembly.py:288-419); these tests pin the vote-consensus
semantics on crafted assemblies where the correct fix is known exactly.
"""

import numpy as np

from unicycler_tpu.align.scoring import AlignmentScoringScheme
from unicycler_tpu.asm.polish import polish_round
from unicycler_tpu.io.fastx import Read, encode_sequence
from unicycler_tpu.misc import reverse_complement


class _Seg(object):
    def __init__(self, seq):
        self.forward_sequence = seq
        self.reverse_sequence = reverse_complement(seq)
        self._codes = None

    def get_length(self):
        return len(self.forward_sequence)

    @property
    def codes(self):
        if self._codes is None:
            self._codes = encode_sequence(self.forward_sequence)
        return self._codes


class _Graph(object):
    def __init__(self, seq):
        self.segments = {'u1': _Seg(seq)}


def _rand_seq(rng, n):
    return ''.join('ACGT'[c] for c in rng.integers(0, 4, n))


def _tiled_reads(genome, read_len=800, step=100):
    reads = []
    for i, s in enumerate(range(0, len(genome) - read_len + 1, step)):
        seq = genome[s:s + read_len]
        if i % 2:
            seq = reverse_complement(seq)
        reads.append(Read('r%d' % i, seq, None))
    return reads


SCORING = AlignmentScoringScheme('3,-6,-5,-2').to_ops()


def test_spurious_insertion_removed():
    """An assembly insertion gets ONLY deletion votes (no read aligns
    through it); it must be removed in one round. Regression for the
    coverage test that treated gap-only columns as uncovered and kept
    them verbatim."""
    rng = np.random.default_rng(42)
    genome = _rand_seq(rng, 4000)
    assembly = genome[:1500] + 'ACGTA' + genome[1500:]   # 5 bp junk
    reads = _tiled_reads(genome)
    polished, _, _ = polish_round(_Graph(assembly), reads, SCORING)
    assert polished['u1'] == genome


def test_insertion_inside_duplication_removed():
    """A spurious copy of adjacent sequence: equivalent alignments can
    place the deletion on either copy, splitting gap votes — the
    left-alignment normalisation (ops/votes.left_align_indels) makes
    every read vote the same columns."""
    rng = np.random.default_rng(43)
    genome = _rand_seq(rng, 4000)
    dup = genome[2000:2006]
    assembly = genome[:2006] + dup + genome[2006:]   # 6 bp duplicated
    reads = _tiled_reads(genome)
    polished, _, _ = polish_round(_Graph(assembly), reads, SCORING)
    assert polished['u1'] == genome


def test_deletion_and_substitution_fixed():
    rng = np.random.default_rng(44)
    genome = _rand_seq(rng, 4000)
    assembly = genome[:800] + genome[803:]           # 3 bp missing
    assembly = assembly[:2500] + 'A' + assembly[2501:]  # 1 substitution
    if assembly[2500] == genome[2503]:               # pick a real change
        assembly = assembly[:2500] + 'C' + assembly[2501:]
    reads = _tiled_reads(genome)
    polished, _, _ = polish_round(_Graph(assembly), reads, SCORING)
    assert polished['u1'] == genome


def test_clean_assembly_unchanged():
    rng = np.random.default_rng(45)
    genome = _rand_seq(rng, 4000)
    reads = _tiled_reads(genome)
    polished, _, _ = polish_round(_Graph(genome), reads, SCORING)
    assert polished['u1'] == genome
