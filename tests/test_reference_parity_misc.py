"""Parity harness: the reference's misc-helper test suite against our
misc implementation."""

from tests.reference_shim import run_reference_tests


def test_reference_misc_suite():
    result, unexpected = run_reference_tests('test_misc.py')
    assert result.testsRun >= 30
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
