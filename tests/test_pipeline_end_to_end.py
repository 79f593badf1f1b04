"""End-to-end pipeline property tests on synthetic genomes.

The role of reference test/random_sequence_assembly_test.py:106-214: run
the whole pipeline and assert the assembled sequence matches some
rotation/flip of the truth.
"""

import os
import random

import pytest

from unicycler_tpu.io.fastx import load_fasta
from unicycler_tpu.misc import reverse_complement
from unicycler_tpu.pipeline.fake_reads import (make_fake_long_reads,
                                               make_fake_short_reads,
                                               write_fastq)


def rand_genome(n, seed):
    rng = random.Random(seed)
    return ''.join(rng.choice('ACGT') for _ in range(n))


def sequence_matches_any_rotation(seq_1, seq_2):
    """(semantics of ref random_sequence_assembly_test.py:106-115)"""
    if len(seq_1) != len(seq_2):
        return False
    doubled = seq_2 + seq_2
    return seq_1 in doubled or reverse_complement(seq_1) in doubled


def test_short_read_only_assembly(tmp_path):
    """A simple circular genome from perfect short reads alone should
    assemble into one circular contig matching the truth."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(8000, 42)
    pairs_1, pairs_2 = make_fake_short_reads(genome)
    r1 = str(tmp_path / 'reads_1.fastq')
    r2 = str(tmp_path / 'reads_2.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    out = str(tmp_path / 'out')
    graph = main(['-1', r1, '-2', r2, '-o', out, '--verbosity', '0',
                  '--keep', '0', '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    assert len(fasta) == 1
    name, seq = fasta[0]
    assert sequence_matches_any_rotation(seq, genome), \
        'assembled %d bp vs truth %d bp' % (len(seq), len(genome))


def test_long_read_only_assembly(tmp_path):
    """Long reads alone: OLC assembly + polish should produce a single
    unitig covering the genome (the reference's long-only mode,
    unicycler.py:177-178)."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(12000, 77)
    long_reads = make_fake_long_reads(genome, read_length=5000, step=300)
    rl = str(tmp_path / 'long.fastq')
    write_fastq(rl, long_reads)
    out = str(tmp_path / 'out')
    main(['-l', rl, '-o', out, '--verbosity', '0', '--keep', '0'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    assert fasta
    longest = max((seq for _, seq in fasta), key=len)
    # the longest unitig must cover nearly the whole genome at high identity
    assert len(longest) >= len(genome) * 0.9
    from unicycler_tpu.io.fastx import Read, Reference
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.align.semi_global import align_reads_to_refs
    read = Read('contig', longest, None)
    align_reads_to_refs([read], [Reference('truth', genome + genome)],
                        AlignmentScoringScheme('3,-6,-5,-2'),
                        low_score_threshold=70.9)
    assert read.alignments
    assert max(a.percent_identity for a in read.alignments) > 99.0


def test_cli_surface(tmp_path, capsys):
    """CLI basics (the role of reference test_help_text / test_options)."""
    import pytest as _pytest
    from unicycler_tpu.pipeline.main import get_arguments
    args = get_arguments(['-o', str(tmp_path), '--mode', 'conservative'])
    assert args.mode == 0
    assert args.min_bridge_qual == 25.0
    args = get_arguments(['-o', str(tmp_path), '--mode', 'bold'])
    assert args.mode == 2
    assert args.min_bridge_qual == 1.0
    with _pytest.raises(SystemExit):
        get_arguments(['--version'])
    with _pytest.raises(SystemExit):
        get_arguments([])          # missing required -o


def test_verbosity_monotonic_stdout(tmp_path, capfd):
    """stdout grows (weakly) with verbosity — the property the
    reference's random_sequence_assembly_test.py:193-214 asserts."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(4000, 7)
    pairs_1, pairs_2 = make_fake_short_reads(genome)
    r1 = str(tmp_path / 'r1.fastq')
    r2 = str(tmp_path / 'r2.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    sizes = []
    for v in (0, 1, 2):
        out = str(tmp_path / ('out%d' % v))
        main(['-1', r1, '-2', r2, '-o', out, '--verbosity', str(v),
              '--keep', '0', '--kmers', '21,41'])
        sizes.append(len(capfd.readouterr().out))
    assert sizes[0] <= sizes[1] <= sizes[2], sizes
    assert sizes[2] > sizes[0]


def test_depth_filter_resume(tmp_path, capfd):
    """A rerun over an output directory with --keep >= 1 must resume
    from the 002_depth_filter checkpoint instead of re-assembling
    (the reference's own resume point, ref unicycler.py:71-74; round 3
    fixed a numbering mismatch that kept this from ever firing), and
    must produce the identical assembly."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(6000, 9)
    pairs_1, pairs_2 = make_fake_short_reads(genome)
    r1 = str(tmp_path / 'r1.fastq')
    r2 = str(tmp_path / 'r2.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    out = str(tmp_path / 'out')
    args = ['-1', r1, '-2', r2, '-o', out, '--verbosity', '1',
            '--keep', '1', '--kmers', '21,41']
    main(args)
    assert os.path.exists(os.path.join(out, '002_depth_filter.gfa'))
    first = open(os.path.join(out, 'assembly.fasta')).read()
    capfd.readouterr()
    main(args)
    assert 'Resuming from existing graph' in capfd.readouterr().out
    assert open(os.path.join(out, 'assembly.fasta')).read() == first


def test_spades_gfa_interop(tmp_path):
    """External-SPAdes interop: the reference's real SPAdes-derived GFA
    fixture (segments, links, P-line paths) drives the whole pipeline
    via --short_read_graph with no reads at all."""
    from unicycler_tpu.pipeline.main import main
    out = str(tmp_path / 'out')
    main(['--short_read_graph',
          '/root/reference/test/test_assembly_graph.gfa',
          '-o', out, '--verbosity', '0'])
    contigs = load_fasta(os.path.join(out, 'assembly.fasta'))
    assert len(contigs) > 50
    total = sum(len(seq) for _, seq in contigs)
    assert total > 150000
    assert os.path.exists(os.path.join(out, 'assembly.gfa'))


def test_hybrid_assembly_with_repeat(tmp_path):
    """A genome with a 500 bp repeat: short reads alone cannot resolve it
    (3 contigs), long reads bridge it back to one circular contig."""
    from unicycler_tpu.pipeline.main import main
    rng = random.Random(7)
    repeat = rand_genome(500, 8)
    part_a = rand_genome(5000, 9)
    part_b = rand_genome(3000, 10)
    genome = part_a + repeat + part_b + repeat
    pairs_1, pairs_2 = make_fake_short_reads(genome)
    long_reads = make_fake_long_reads(genome, read_length=4000, step=400)
    r1 = str(tmp_path / 'reads_1.fastq')
    r2 = str(tmp_path / 'reads_2.fastq')
    rl = str(tmp_path / 'long.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    write_fastq(rl, long_reads)
    out = str(tmp_path / 'out')
    graph = main(['-1', r1, '-2', r2, '-l', rl, '-o', out,
                  '--verbosity', '0', '--keep', '0',
                  '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    total = sum(len(seq) for _, seq in fasta)
    # the assembly must contain the whole genome (repeat twice)
    assert total >= len(genome) - 100, \
        'assembled %d bp vs truth %d bp' % (total, len(genome))
    longest = max((seq for _, seq in fasta), key=len)
    if len(fasta) == 1:
        assert sequence_matches_any_rotation(longest, genome)
    else:
        # partial success: the largest contig must cover most of the genome
        assert len(longest) >= len(part_a)


def test_short_read_assembly_with_errors(tmp_path):
    """The same circular-genome property at a 1% read error rate: the
    k-mer-spectrum corrector (asm/correct.py) plus graph cleaning must
    absorb the noise (the role of SPAdes' read correction, which the
    reference runs by default — ref spades_func.py:220-252)."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(8000, 4242)
    pairs_1, pairs_2 = make_fake_short_reads(genome, error_rate=0.01,
                                             seed=11)
    r1 = str(tmp_path / 'reads_1.fastq')
    r2 = str(tmp_path / 'reads_2.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    out = str(tmp_path / 'out')
    main(['-1', r1, '-2', r2, '-o', out, '--verbosity', '0',
          '--keep', '0', '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    assert len(fasta) == 1, [len(s) for _, s in fasta]
    _, seq = fasta[0]
    assert sequence_matches_any_rotation(seq, genome), \
        'assembled %d bp vs truth %d bp' % (len(seq), len(genome))


def test_short_read_assembly_high_error_indels(tmp_path):
    """2% error with a 30% indel fraction — harder than the 1%
    substitution-dominated case: the spectrum corrector only fixes
    substitutions, so the graph-cleaning rules (tips, erroneous
    connections, bubbles) must absorb the indel k-mers."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(8000, 555)
    pairs_1, pairs_2 = make_fake_short_reads(genome, error_rate=0.02,
                                             seed=21, indel_frac=0.3)
    r1 = str(tmp_path / 'r1.fastq')
    r2 = str(tmp_path / 'r2.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    out = str(tmp_path / 'out')
    main(['-1', r1, '-2', r2, '-o', out, '--verbosity', '0',
          '--keep', '0', '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    assert len(fasta) == 1, [len(s) for _, s in fasta]
    _, seq = fasta[0]
    assert sequence_matches_any_rotation(seq, genome), \
        'assembled %d bp vs truth %d bp' % (len(seq), len(genome))


def test_short_read_assembly_uneven_coverage(tmp_path):
    """Coverage variation (GC-bias stand-in): one genome half at full
    tiling depth, the other subsampled to ~30%. Cleaning thresholds
    keyed to the MEDIAN depth must not delete the thin half."""
    from unicycler_tpu.pipeline.main import main
    genome = rand_genome(9000, 777)
    pairs_1, pairs_2 = make_fake_short_reads(genome, error_rate=0.01,
                                             seed=31)
    rng = random.Random(99)
    half = len(genome) // 2
    keep_1, keep_2 = [], []
    for k, (p1, p2) in enumerate(zip(pairs_1, pairs_2)):
        # fake reads are tiled: pair k's fragment starts at position k
        if k < half or rng.random() < 0.3:
            keep_1.append(p1)
            keep_2.append(p2)
    r1 = str(tmp_path / 'r1.fastq')
    r2 = str(tmp_path / 'r2.fastq')
    write_fastq(r1, keep_1)
    write_fastq(r2, keep_2)
    out = str(tmp_path / 'out')
    main(['-1', r1, '-2', r2, '-o', out, '--verbosity', '0',
          '--keep', '0', '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    total = sum(len(s) for _, s in fasta)
    longest = max((s for _, s in fasta), key=len)
    # the thin half must survive: near-complete reconstruction either
    # as one circle or as a small number of long pieces
    assert total >= 0.98 * len(genome), (total, len(genome))
    assert len(fasta) <= 3, [len(s) for _, s in fasta]
    assert len(longest) >= 0.45 * len(genome)


def test_hybrid_assembly_with_errors(tmp_path):
    """Hybrid repeat resolution at 1% short-read and 5% long-read error:
    errorful long reads must still bridge the repeat."""
    from unicycler_tpu.pipeline.main import main
    repeat = rand_genome(500, 80)
    part_a = rand_genome(5000, 90)
    part_b = rand_genome(3000, 100)
    genome = part_a + repeat + part_b + repeat
    pairs_1, pairs_2 = make_fake_short_reads(genome, error_rate=0.01,
                                             seed=13)
    long_reads = make_fake_long_reads(genome, read_length=4000, step=400,
                                      error_rate=0.05, seed=14)
    r1 = str(tmp_path / 'reads_1.fastq')
    r2 = str(tmp_path / 'reads_2.fastq')
    rl = str(tmp_path / 'long.fastq')
    write_fastq(r1, pairs_1)
    write_fastq(r2, pairs_2)
    write_fastq(rl, long_reads)
    out = str(tmp_path / 'out')
    main(['-1', r1, '-2', r2, '-l', rl, '-o', out,
          '--verbosity', '0', '--keep', '0', '--min_fasta_length', '100'])
    fasta = load_fasta(os.path.join(out, 'assembly.fasta'))
    total = sum(len(seq) for _, seq in fasta)
    assert total >= len(genome) - 200, \
        'assembled %d bp vs truth %d bp' % (total, len(genome))
    longest = max((seq for _, seq in fasta), key=len)
    # the assembly may keep small indel scars from read errors, so the
    # contig must cover the genome at high identity rather than exactly
    from unicycler_tpu.io.fastx import Read, Reference
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.align.semi_global import align_reads_to_refs
    read = Read('contig', longest, None)
    align_reads_to_refs([read], [Reference('truth', genome + genome)],
                        AlignmentScoringScheme('3,-6,-5,-2'),
                        low_score_threshold=70.9)
    assert read.alignments
    best = max(read.alignments, key=lambda a: a.scaled_score)
    assert best.percent_identity > 99.0
    assert len(longest) >= len(part_a) + len(repeat)
