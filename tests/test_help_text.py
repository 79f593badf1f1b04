"""Two-tier CLI help (the assertions of the reference's
test_help_text.py, run against `python -m unicycler_tpu`): --help shows
the basic surface only; --help_all reveals every option."""

import subprocess
import sys

BASIC = ['--help', '--help_all', '--version', '--short1', '--short2',
         '--unpaired', '--long', '--out', '--verbosity',
         '--min_fasta_length', '--keep', '--threads', '--mode',
         '--linear_seqs']
EXTENDED = ['--spades_path', '--min_kmer_frac', '--max_kmer_frac',
            '--kmer_count', '--no_rotate', '--start_genes',
            '--start_gene_id', '--start_gene_cov', '--makeblastdb_path',
            '--tblastn_path', '--min_component_size',
            '--min_dead_end_size', '--contamination', '--scores',
            '--low_score']
TITLE = 'Unicycler: an assembly pipeline for bacterial genomes'


def _run(option):
    p = subprocess.run([sys.executable, '-m', 'unicycler_tpu', option],
                       capture_output=True, text=True, timeout=120)
    return p.stdout, p.stderr, p.returncode


def test_basic_help():
    stdout, stderr, code = _run('--help')
    assert code == 0
    assert stdout and not stderr
    assert TITLE in stdout
    for opt in BASIC:
        assert opt in stdout, opt
    for opt in EXTENDED:
        assert opt not in stdout, opt


def test_extended_help():
    stdout, stderr, code = _run('--help_all')
    assert code == 0
    assert stdout and not stderr
    assert TITLE in stdout
    for opt in BASIC + EXTENDED:
        assert opt in stdout, opt


def test_reference_defaults_preset():
    """--reference_defaults restores reference-equivalent behaviour
    (currently: single-round bridging; README 'Defaults that differ')."""
    from unicycler_tpu.pipeline.main import get_arguments
    base = ['-1', 'r1.fq', '-2', 'r2.fq', '-o', 'out']
    assert get_arguments(base).bridge_rounds == 3
    assert get_arguments(base + ['--reference_defaults']).bridge_rounds == 1
