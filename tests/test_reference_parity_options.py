"""Per-case parity: the reference's test_options.py (CLI surface: path
absolutisation, two-tier help defaults, bridging modes) against our
get_arguments through the shim.

Each reference test is an individually named pytest case (VERDICT r4 #6):
the reference file's suite runs once per session; every case asserts its
own recorded outcome, so a regression names the exact reference test."""

import pytest

from tests.reference_shim import (add_shim_module, case_outcome,
                                  discover_reference_test_ids)

REF_FILE = 'test_options.py'


def _install_shims():
    import unicycler_tpu.pipeline.main as main_mod
    add_shim_module('unicycler', get_arguments=main_mod.get_arguments)


_install_shims()
CASES = discover_reference_test_ids(REF_FILE)


def test_options_cases_discovered():
    assert len(CASES) >= 4, CASES


@pytest.mark.parametrize('case_id', CASES)
def test_options(case_id):
    case_outcome(REF_FILE, case_id)
