"""Per-case parity: reference start-gene rotation tests (which normally
need BLAST+ binaries) against our translated-search implementation.

Each reference test is an individually named pytest case (VERDICT r4 #6):
the reference file's suite runs once per session; every case asserts its
own recorded outcome, so a regression names the exact reference test."""

import pytest

from tests.reference_shim import (add_shim_module, case_outcome,
                                  discover_reference_test_ids)

REF_FILE = 'test_blast_func.py'


def _install_shims():
    from unicycler_tpu.pipeline import rotation
    add_shim_module('blast_func',
                    find_start_gene=rotation.find_start_gene,
                    CannotFindStart=rotation.CannotFindStart,
                    BlastHit=rotation.BlastHit)


_install_shims()
CASES = discover_reference_test_ids(REF_FILE)


def test_rotation_cases_discovered():
    assert len(CASES) >= 3, CASES


@pytest.mark.parametrize('case_id', CASES)
def test_rotation(case_id):
    case_outcome(REF_FILE, case_id)
