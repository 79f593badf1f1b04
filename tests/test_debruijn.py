"""de Bruijn assembler tests on synthetic genomes (the role of the
reference's random_sequence_assembly_test.py oracle for the short-read
stage: assembled sequence must match a rotation/flip of the truth)."""

import random

import numpy as np

from unicycler_tpu.asm import debruijn
from unicycler_tpu.io.fastx import encode_sequence
from unicycler_tpu.misc import reverse_complement
from unicycler_tpu.pipeline.fake_reads import make_fake_short_reads


def rand_genome(n, seed):
    rng = random.Random(seed)
    return ''.join(rng.choice('ACGT') for _ in range(n))


def sequence_matches_any_rotation(seq_1, seq_2):
    if len(seq_1) != len(seq_2):
        return False
    doubled = seq_2 + seq_2
    return seq_1 in doubled or reverse_complement(seq_1) in doubled


class TestKmerRange:
    def test_kmer_range_shape(self):
        ks = debruijn.get_kmer_range([100] * 50)
        assert all(k % 2 == 1 for k in ks)
        assert ks == sorted(ks)
        assert ks[0] >= 11 and ks[-1] <= 127


class TestSimpleAssembly:
    def test_circular_genome_reconstructed(self):
        genome = rand_genome(5000, 0)
        pairs_1, pairs_2 = make_fake_short_reads(genome)
        reads = [encode_sequence(seq) for _, seq, _ in pairs_1 + pairs_2]
        unitigs, links = debruijn.assemble_short_reads(reads, 63)
        assert len(unitigs) == 1
        seq = unitigs[0][0]
        # a circular genome's unitig is genome-length + overlap
        core = seq[:len(seq) - 62]
        assert sequence_matches_any_rotation(core, genome) or \
            sequence_matches_any_rotation(seq[:5000], genome)

    def test_repeat_genome_structure(self):
        # one 500 bp repeat at two loci -> expect 3+ unitigs at small k
        rng = random.Random(1)
        repeat = rand_genome(500, 2)
        a = rand_genome(2000, 3)
        b = rand_genome(2000, 4)
        genome = a + repeat + b + repeat
        pairs_1, pairs_2 = make_fake_short_reads(genome)
        reads = [encode_sequence(seq) for _, seq, _ in pairs_1 + pairs_2]
        unitigs, links = debruijn.assemble_short_reads(reads, 63)
        total = sum(len(s) for s, _ in unitigs)
        # all genome sequence is present (repeat collapsed once)
        assert total >= len(genome) - 500
        assert len(unitigs) >= 3
        assert links   # repeat joins the unitigs

    def test_score_prefers_complete_graph(self):
        genome = rand_genome(4000, 5)
        pairs_1, pairs_2 = make_fake_short_reads(genome)
        reads = [encode_sequence(seq) for _, seq, _ in pairs_1 + pairs_2]
        u_big, l_big = debruijn.assemble_short_reads(reads, 63)
        u_small, l_small = debruijn.assemble_short_reads(reads, 21)
        score_big = debruijn.score_graph(u_big, l_big, 63)
        score_small = debruijn.score_graph(u_small, l_small, 21)
        assert score_big >= score_small


class TestPairedEndResolution:
    def test_insert_scored_paths_cross_repeat(self):
        """exSPAnder-style resolution: a repeat shorter than the pair inner gap
        size must be crossed by a resolved path whose junction choice is
        driven by insert-consistent pairs from the flanking anchors
        (role of SPAdes' contigs.paths, consumed by
        ref bridge_spades_contig.py:122-205)."""
        repeat = rand_genome(80, 11)
        a = rand_genome(2500, 12)
        b = rand_genome(1800, 13)
        genome = a + repeat + b + repeat
        pairs_1, pairs_2 = make_fake_short_reads(genome)
        p1 = [encode_sequence(seq) for _, seq, _ in pairs_1]
        p2 = [encode_sequence(seq) for _, seq, _ in pairs_2]
        reads = p1 + p2
        k = 63
        unitigs, links = debruijn.assemble_short_reads(reads, k)
        insert_mean, insert_dev = debruijn.estimate_insert_size(
            p1, p2, unitigs, k)
        assert 250 <= insert_mean <= 350, insert_mean
        paths = debruijn.resolve_paths_with_pairs(
            unitigs, links, p1, p2, k, insert_mean, insert_dev)
        assert paths
        # the repeat unitig is the short one; a resolved path must pass
        # THROUGH it (anchor -> repeat -> anchor)
        rep_idx = min(range(len(unitigs)),
                      key=lambda i: abs(len(unitigs[i][0]) - (80 + k - 1)))
        rep_num = rep_idx + 1
        through = [p for p in paths
                   if any(abs(x) == rep_num for x in p[1:-1])]
        assert through, (paths, rep_num,
                         [len(s) for s, _ in unitigs])


class TestRepeatSplitting:
    def _assemble(self, genome, k=63):
        pairs_1, pairs_2 = make_fake_short_reads(genome)
        p1 = [encode_sequence(seq) for _, seq, _ in pairs_1]
        p2 = [encode_sequence(seq) for _, seq, _ in pairs_2]
        unitigs, links = debruijn.assemble_short_reads(p1 + p2, k)
        mean, dev = debruijn.estimate_insert_size(p1, p2, unitigs, k)
        return unitigs, links, p1, p2, mean, dev

    def test_two_copy_repeat_splits(self):
        """A 100 bp repeat with two distinct (in, out) contexts on a
        linear genome must split into two copies wired per the
        insert-consistent pairing, leaving a branchless graph."""
        repeat = rand_genome(100, 21)
        a = rand_genome(2500, 22)
        b = rand_genome(1800, 23)
        c = rand_genome(2100, 24)
        # linear: a R b R c (contexts: a->R->b and b->R->c)
        genome = a + repeat + b + repeat + c
        k = 63
        pairs_1, pairs_2 = make_fake_short_reads(genome, circular=False) \
            if 'circular' in make_fake_short_reads.__code__.co_varnames \
            else make_fake_short_reads(genome)
        p1 = [encode_sequence(seq) for _, seq, _ in pairs_1]
        p2 = [encode_sequence(seq) for _, seq, _ in pairs_2]
        unitigs, links = debruijn.assemble_short_reads(p1 + p2, k)
        mean, dev = debruijn.estimate_insert_size(p1, p2, unitigs, k)
        n_before = len(unitigs)
        unitigs2, links2, n_split = debruijn.split_repeats_with_pairs(
            unitigs, links, p1, p2, k, mean, dev)
        assert n_split >= 1, (n_before, len(unitigs2))
        # after splitting, every junction is linear: each oriented
        # unitig end has at most one continuation
        from collections import defaultdict
        fwd = defaultdict(list)
        for x, y in links2:
            fwd[x].append(y)
        assert all(len(v) == 1 for v in fwd.values()), dict(fwd)

    def test_unsupported_repeat_stays(self):
        """With only one context (no ambiguity) nothing splits, and a
        repeat longer than the insert reach collects no votes."""
        repeat = rand_genome(700, 31)         # longer than insert ~300
        a = rand_genome(2500, 32)
        b = rand_genome(1800, 33)
        genome = a + repeat + b + repeat
        unitigs, links, p1, p2, mean, dev = self._assemble(genome)
        _, _, n_split = debruijn.split_repeats_with_pairs(
            unitigs, links, p1, p2, 63, mean, dev)
        assert n_split == 0
