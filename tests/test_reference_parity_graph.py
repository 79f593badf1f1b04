"""Parity harness: the reference's own assembly-graph unit tests run
against unicycler_tpu's graph implementation via the module shim."""

from tests.reference_shim import run_reference_tests


def test_reference_assembly_graph_suite():
    result, unexpected = run_reference_tests('test_assembly_graph.py')
    assert result.testsRun > 80
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
