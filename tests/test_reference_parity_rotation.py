"""Parity harness: reference start-gene rotation tests (which normally need
BLAST+ binaries) against our translated-search implementation."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_blast_func_suite():
    from unicycler_tpu.pipeline import rotation
    add_shim_module('blast_func',
                    find_start_gene=rotation.find_start_gene,
                    CannotFindStart=rotation.CannotFindStart,
                    BlastHit=rotation.BlastHit)
    result, unexpected = run_reference_tests('test_blast_func.py')
    assert result.testsRun >= 3
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
