"""Semi-global aligner end-to-end tests on the reference's own fixtures.

Mirrors reference test/test_semi_global_alignment.py (TestPerfectMatch
Alignments :22-228): exact raw/scaled scores, CIGARs and coordinates.
"""

import os

import pytest

from tests.conftest import reference_fixture
from unicycler_tpu.align.alignment import Alignment
from unicycler_tpu.align.scoring import AlignmentScoringScheme
from unicycler_tpu.align.semi_global import semi_global_align_long_reads
from unicycler_tpu.io.fastx import load_long_reads, load_references


@pytest.fixture(scope='module')
def aligned_reads():
    ref_fasta = reference_fixture('test_semi_global_alignment.fasta')
    read_fastq = reference_fixture('test_semi_global_alignment.fastq')
    refs = load_references(ref_fasta, section_header=None, show_progress=False)
    read_dict, read_names, _ = load_long_reads(read_fastq, silent=True)
    scoring_scheme = AlignmentScoringScheme('3,-6,-5,-2')
    return semi_global_align_long_reads(
        refs, ref_fasta, read_dict, read_names, read_fastq, 1, scoring_scheme,
        [None], False, 10, None, None, 0, 0, None, 0)


def check(aligned_reads, read_name, raw_score, match_count, read_start,
          read_end, read_end_gap, ref_start, ref_end, cigar_parts):
    read = aligned_reads[read_name]
    assert len(read.alignments) == 1
    a = read.alignments[0]
    assert a.read.name == read_name
    assert a.raw_score == raw_score
    assert a.scaled_score == 100.0
    assert a.percent_identity == 100.0
    assert a.match_count == match_count
    assert a.mismatch_count == 0
    assert a.insertion_count == 0
    assert a.deletion_count == 0
    assert a.read_start_pos == read_start
    assert a.read_end_pos == read_end
    assert a.read_end_gap == read_end_gap
    assert a.ref_start_pos == ref_start
    assert a.ref_end_pos == ref_end
    assert a.cigar_parts == cigar_parts


def test_read_contained_1(aligned_reads):
    check(aligned_reads, '0', 300, 100, 0, 100, 0, 60, 160, ['100M'])


def test_read_contained_2(aligned_reads):
    check(aligned_reads, '1', 600, 200, 0, 200, 0, 100, 300, ['200M'])


def test_read_contained_3(aligned_reads):
    check(aligned_reads, '2', 450, 150, 0, 150, 0, 0, 150, ['150M'])


def test_ref_contained_1(aligned_reads):
    check(aligned_reads, '3', 300, 100, 62, 162, 138, 0, 100,
          ['62S', '100M', '138S'])


def test_ref_contained_2(aligned_reads):
    check(aligned_reads, '4', 360, 120, 0, 120, 180, 0, 120,
          ['120M', '180S'])


def test_ref_contained_3(aligned_reads):
    check(aligned_reads, '5', 540, 180, 120, 300, 0, 0, 180,
          ['120S', '180M'])


def test_read_start_overlap(aligned_reads):
    check(aligned_reads, '6', 330, 110, 190, 300, 0, 0, 110,
          ['190S', '110M'])


def test_read_end_overlap(aligned_reads):
    check(aligned_reads, '7', 390, 130, 0, 130, 170, 170, 300,
          ['130M', '170S'])


def test_end_to_end(aligned_reads):
    check(aligned_reads, '8', 900, 300, 0, 300, 0, 0, 300, ['300M'])
