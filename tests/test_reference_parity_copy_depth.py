"""Parity harness: reference copy-depth tests against our implementation."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_copy_depth_suite():
    from unicycler_tpu.graph import copy_depth
    add_shim_module('assembly_graph_copy_depth',
                    determine_copy_depth=copy_depth.determine_copy_depth)
    result, unexpected = run_reference_tests(
        'test_assembly_graph_copy_depth.py')
    assert result.testsRun >= 3
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
