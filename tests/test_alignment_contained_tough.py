"""Real-read alignment tests on the reference's contained/tough fixtures.

Mirrors reference test/test_semi_global_alignment.py TestContainedRead
Alignments (:230-326) and TestToughAlignments (:328-660): same score
thresholds and position margins.
"""

import pytest

from tests.conftest import reference_fixture
from unicycler_tpu.align.scoring import AlignmentScoringScheme
from unicycler_tpu.align.semi_global import align_reads_to_refs
from unicycler_tpu.io.fastx import load_long_reads, load_references

MARGIN = 10


def run_alignment(fixture_base, name, sensitivity_level):
    refs = load_references(reference_fixture(fixture_base + '.fasta'),
                           section_header=None, show_progress=False)
    reads, _, _ = load_long_reads(reference_fixture(fixture_base + '.fastq'),
                                  silent=True)
    ref = [x for x in refs if x.name == name][0]
    read = [x for x in reads.values() if x.name == name][0]
    scoring = AlignmentScoringScheme('3,-6,-5,-2')
    align_reads_to_refs([read], [ref], scoring,
                        sensitivity_level=sensitivity_level,
                        low_score_threshold=61.656918 + 7 * 1.314624,
                        min_align_length=10, allowed_overlap=0)
    return read


def check(read, min_raw, min_scaled, read_start=None, read_end=None,
          ref_start=None, ref_end=None, exact_read_start=None,
          exact_read_end=None, exact_ref_start=None, exact_ref_end=None):
    assert len(read.alignments) == 1, \
        'expected 1 alignment, got %d' % len(read.alignments)
    a = read.alignments[0]
    assert a.raw_score >= min_raw, (a.raw_score, min_raw)
    assert a.scaled_score > min_scaled, (a.scaled_score, min_scaled)
    rs, re = a.read_start_end_positive_strand()
    if exact_read_start is not None:
        assert rs == exact_read_start, (rs, exact_read_start)
    elif read_start is not None:
        assert abs(rs - read_start) < MARGIN, (rs, read_start)
    if exact_read_end is not None:
        assert re == exact_read_end, (re, exact_read_end)
    elif read_end is not None:
        assert abs(re - read_end) < MARGIN, (re, read_end)
    if exact_ref_start is not None:
        assert a.ref_start_pos == exact_ref_start
    elif ref_start is not None:
        assert abs(a.ref_start_pos - ref_start) < MARGIN
    if exact_ref_end is not None:
        assert a.ref_end_pos == exact_ref_end
    elif ref_end is not None:
        assert abs(a.ref_end_pos - ref_end) < MARGIN


CONTAINED = 'test_semi_global_alignment_contained_reads'
TOUGH = 'test_semi_global_alignment_tough'


class TestContainedReadAlignments:
    def test_short_contained_read(self):
        read = run_alignment(CONTAINED, '0', 0)
        check(read, 1418, 90.78, exact_read_start=0, exact_read_end=608,
              ref_start=31040, ref_end=31679)

    def test_medium_contained_read(self):
        read = run_alignment(CONTAINED, '1', 0)
        check(read, 16608, 90.12, exact_read_start=0, exact_read_end=7360,
              ref_start=68597, ref_end=76202)

    def test_long_contained_read(self):
        read = run_alignment(CONTAINED, '2', 0)
        check(read, 122681, 91.19, exact_read_start=0, exact_read_end=52096,
              ref_start=2986, ref_end=57064)


class TestToughAlignments:
    def test_tough_0(self):
        # Reference scores 126074 at sensitivity 0. With the wide
        # REFINE_BAND survivor refinement our level-0 result reaches
        # 126525, beating the reference's own test floor (the reference's
        # test_semi_global_alignment.py asserts >= 126074; the full suite
        # runs via tests/test_reference_parity_semi_global.py).
        read = run_alignment(TOUGH, '0', 0)
        check(read, 126074, 91.07, exact_read_end=72402,
              exact_ref_start=0, ref_end=55814)

    def test_tough_0_level_1_beats_reference(self):
        read = run_alignment(TOUGH, '0', 1)
        check(read, 126074, 91.07, exact_read_end=72402,
              exact_ref_start=0, ref_end=55814)

    def test_tough_1(self):
        read = run_alignment(TOUGH, '1', 0)
        check(read, 20740, 91.02, read_start=10785, read_end=19629,
              exact_ref_start=0, exact_ref_end=9241)

    def test_tough_2(self):
        read = run_alignment(TOUGH, '2', 0)
        check(read, 34439, 90.35, read_start=22493, exact_read_end=37581,
              exact_ref_start=0, ref_end=15673)

    def test_tough_3(self):
        read = run_alignment(TOUGH, '3', 0)
        check(read, 786, 75.19, exact_read_start=0, exact_read_end=872,
              ref_start=41783, ref_end=42680)

    def test_tough_4(self):
        read = run_alignment(TOUGH, '4', 0)
        check(read, 58531, 86.47, read_start=9582, exact_read_end=39544,
              exact_ref_start=0, ref_end=31277)

    def test_tough_5(self):
        read = run_alignment(TOUGH, '5', 0)
        check(read, 2792, 89.37, read_start=5121, exact_read_end=6396,
              exact_ref_start=0, ref_end=1323)

    def test_tough_6(self):
        read = run_alignment(TOUGH, '6', 0)
        check(read, 10883, 88.50, exact_read_start=0, read_end=5077,
              ref_start=253445, exact_ref_end=258801)

    def test_tough_7(self):
        read = run_alignment(TOUGH, '7', 0)
        check(read, 125555, 88.92, exact_read_start=0, read_end=57721,
              ref_start=35024, exact_ref_end=95758)

    def test_tough_8(self):
        read = run_alignment(TOUGH, '8', 0)
        check(read, 2812, 76.36, read_start=681, exact_read_end=3808,
              ref_start=19594, exact_ref_end=21983)

    def test_tough_10(self):
        read = run_alignment(TOUGH, '10', 0)
        check(read, 4978, 71.07, exact_read_start=0, exact_read_end=10923,
              ref_start=2001, ref_end=12186)

    def test_tough_11(self):
        read = run_alignment(TOUGH, '11', 0)
        check(read, 6996, 92.95, exact_read_start=0, read_end=2863,
              exact_ref_start=0, ref_end=2818)

    def test_tough_12(self):
        read = run_alignment(TOUGH, '12', 0)
        check(read, 3805, 92.83, read_start=3037, exact_read_end=4611,
              exact_ref_start=0, ref_end=1538)

    def test_tough_13(self):
        read = run_alignment(TOUGH, '13', 1)
        check(read, 101608, 88.49, exact_read_start=0, exact_read_end=46710,
              ref_start=109308, ref_end=159675)

    def test_tough_14(self):
        read = run_alignment(TOUGH, '14', 1)
        check(read, 204, 93.0)

    def test_tough_15(self):
        read = run_alignment(TOUGH, '15', 0)
        assert len(read.alignments) == 2
        scores = sorted(a.raw_score for a in read.alignments)
        assert scores[0] >= 1846
        assert scores[1] >= 3137
