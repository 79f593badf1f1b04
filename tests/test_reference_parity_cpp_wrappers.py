"""Per-case parity: the reference's ctypes-layer tests against our
device-kernel compat surface (exact raw scores for known mutations,
banded-alignment semantics, MSA consensus recovery).

Each reference test is an individually named pytest case (VERDICT r4 #6):
the reference file's suite runs once per session; every case asserts its
own recorded outcome, so a regression names the exact reference test."""

import pytest

from tests.reference_shim import (add_shim_module, case_outcome,
                                  discover_reference_test_ids)

REF_FILE = 'test_cpp_wrappers.py'


def _install_shims():
    from unicycler_tpu.align import compat
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.io import fastx
    add_shim_module('cpp_wrappers',
                    fully_global_alignment=compat.fully_global_alignment,
                    path_alignment=compat.path_alignment,
                    consensus_alignment=compat.consensus_alignment,
                    semi_global_alignment_exhaustive=
                    compat.semi_global_alignment_exhaustive,
                    overlap_alignment=compat.overlap_alignment,
                    start_alignment=compat.start_alignment,
                    end_alignment=compat.end_alignment)
    add_shim_module('read_ref',
                    load_long_reads=fastx.load_long_reads,
                    load_references=fastx.load_references,
                    Read=fastx.Read, Reference=fastx.Reference)
    add_shim_module('alignment',
                    AlignmentScoringScheme=AlignmentScoringScheme)


_install_shims()
CASES = discover_reference_test_ids(REF_FILE)


def test_cpp_wrappers_cases_discovered():
    assert len(CASES) >= 20, CASES


@pytest.mark.parametrize('case_id', CASES)
def test_cpp_wrappers(case_id):
    case_outcome(REF_FILE, case_id)
