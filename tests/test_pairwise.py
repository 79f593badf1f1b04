"""Tests for the pairwise DP engine against reference scoring semantics.

Mirrors the expectations of reference test/test_cpp_wrappers.py (exact raw
scores of fully-global alignments for known mutations) and the perfect-match
cases of test/test_semi_global_alignment.py.
"""

import random

import numpy as np
import pytest

from unicycler_tpu.io.fastx import encode_sequence
from unicycler_tpu.ops import pairwise as pw


def al(s1, s2, config, scoring=pw.DEFAULT_SCORING, need_cigar=True):
    return pw.align_pairs([encode_sequence(s1)], [encode_sequence(s2)],
                          scoring=scoring, config=config,
                          need_cigar=need_cigar)[0]


def rand_seq(n, seed=None):
    rng = random.Random(seed)
    return ''.join(rng.choice('ACGT') for _ in range(n))


class TestFullyGlobal:
    """Raw-score parity with ref test/test_cpp_wrappers.py:37-100."""

    def test_perfect(self):
        s = rand_seq(100, 0)
        r = al(s, s, pw.FULLY_GLOBAL)
        assert r.score == 300
        assert r.cigar == [(100, 'M')]

    def test_one_mismatch(self):
        s = rand_seq(100, 1)
        s2 = s[:50] + ('A' if s[50] != 'A' else 'C') + s[51:]
        r = al(s, s2, pw.FULLY_GLOBAL)
        assert r.score == 99 * 3 - 6

    def test_one_insertion(self):
        # One extra base in s1 relative to s2 -> an I op, cost = gap_open.
        s = rand_seq(100, 2)
        s1 = s[:50] + 'A' + s[50:]
        r = al(s1, s, pw.FULLY_GLOBAL)
        assert r.score == 100 * 3 - 5

    def test_one_deletion(self):
        s = rand_seq(100, 3)
        s1 = s[:50] + s[51:]
        r = al(s1, s, pw.FULLY_GLOBAL)
        assert r.score == 99 * 3 - 5

    def test_multi_base_gap(self):
        s = rand_seq(100, 4)
        s1 = s[:50] + s[55:]  # 5-base deletion
        r = al(s1, s, pw.FULLY_GLOBAL)
        assert r.score == 95 * 3 - 5 - 4 * 2
        assert sum(c for c, op in r.cigar if op == 'D') == 5

    def test_gap_vs_mismatch_preference(self):
        # Two isolated changes: each should score as its own event.
        s = rand_seq(200, 5)
        s1 = s[:30] + s[32:100] + ('T' if s[100] != 'T' else 'G') + s[101:]
        r = al(s1, s, pw.FULLY_GLOBAL)
        assert r.score == (197 * 3) + (-5 - 2) + (-6)


class TestSemiGlobal:
    """Free-end semantics of ref src/semi_global_align.cpp via AlignConfig."""

    def test_read_contained_in_ref(self):
        ref = rand_seq(300, 10)
        read = ref[60:160]
        r = al(read, ref, pw.SEMI_GLOBAL)
        assert (r.score, r.s1_start, r.s1_end) == (300, 0, 100)
        assert (r.s2_start, r.s2_end) == (60, 160)
        assert r.cigar_str_with_clips() == '100M'

    def test_ref_contained_in_read(self):
        read = rand_seq(300, 11)
        ref = read[62:162]
        r = al(read, ref, pw.SEMI_GLOBAL)
        assert (r.score, r.s1_start, r.s1_end) == (300, 62, 162)
        assert (r.s2_start, r.s2_end) == (0, 100)
        assert r.cigar_str_with_clips() == '62S100M138S'

    def test_read_start_overlaps_ref_end(self):
        ref = rand_seq(300, 12)
        read = ref[-130:] + rand_seq(170, 13)
        r = al(read, ref, pw.SEMI_GLOBAL)
        assert r.score == 390
        assert (r.s1_start, r.s1_end) == (0, 130)
        assert (r.s2_start, r.s2_end) == (170, 300)

    def test_read_end_overlaps_ref_start(self):
        ref = rand_seq(300, 14)
        read = rand_seq(190, 15) + ref[:110]
        r = al(read, ref, pw.SEMI_GLOBAL)
        assert r.score == 330
        assert (r.s1_start, r.s1_end) == (190, 300)
        assert (r.s2_start, r.s2_end) == (0, 110)

    def test_end_to_end(self):
        ref = rand_seq(300, 16)
        r = al(ref, ref, pw.SEMI_GLOBAL)
        assert r.score == 900
        assert r.cigar_str_with_clips() == '300M'

    def test_noisy_contained(self):
        rng = random.Random(17)
        ref = rand_seq(2000, 18)
        read = list(ref[500:1500])
        # ~5% errors
        for _ in range(30):
            i = rng.randrange(len(read))
            read[i] = rng.choice('ACGT')
        read = ''.join(read)
        r = al(read, ref, pw.SEMI_GLOBAL)
        assert r.s2_start == 500 and r.s2_end == 1500
        n_mm = sum(1 for a, b in zip(read, ref[500:1500]) if a != b)
        assert r.score == (1000 - n_mm) * 3 - n_mm * 6


class TestOtherConfigs:
    def test_path_free_s2_tail(self):
        s1 = rand_seq(80, 20)
        s2 = s1 + rand_seq(60, 21)
        r = al(s1, s2, pw.PATH_CONFIG)
        assert r.score == 240 and r.s2_end == 80

    def test_overlap_s1_end_to_s2_start(self):
        # end of s1 overlaps start of s2 (ref overlap_align.cpp:40-41)
        core = rand_seq(50, 22)
        s1 = rand_seq(100, 23) + core
        s2 = core + rand_seq(100, 24)
        r = al(s1, s2, pw.OVERLAP_CONFIG)
        assert r.score == 150
        assert r.s1_start == 100 and r.s1_end == 150
        assert r.s2_start == 0 and r.s2_end == 50

    def test_end_config_finds_s1_at_s2_end(self):
        s2 = rand_seq(200, 25)
        s1 = s2[-60:]
        r = al(s1, s2, pw.END_CONFIG)
        assert r.score == 180
        assert r.s2_start == 140 and r.s2_end == 200

    def test_start_config_finds_s1_at_s2_start(self):
        s2 = rand_seq(200, 26)
        s1 = s2[:60]
        r = al(s1, s2, pw.START_CONFIG)
        assert r.score == 180
        assert r.s2_start == 0 and r.s2_end == 60


class TestBatching:
    def test_mixed_lengths(self):
        rng = random.Random(30)
        refs = [rand_seq(rng.randrange(100, 400), 100 + i) for i in range(8)]
        qs, expected = [], []
        for i, ref in enumerate(refs):
            a = rng.randrange(0, len(ref) // 2)
            b = rng.randrange(a + 20, len(ref))
            qs.append(ref[a:b])
            expected.append((3 * (b - a), a, b))
        res = pw.align_pairs([encode_sequence(q) for q in qs],
                             [encode_sequence(r) for r in refs],
                             config=pw.SEMI_GLOBAL)
        for r, (score, a, b) in zip(res, expected):
            assert r.score == score
            assert (r.s2_start, r.s2_end) == (a, b)

    def test_score_only_mode(self):
        s = rand_seq(100, 40)
        r = al(s, s, pw.FULLY_GLOBAL, need_cigar=False)
        assert r.score == 300 and r.cigar == []
