"""Run the reference's test_options.py (CLI surface: path
absolutisation, two-tier help defaults, bridging modes) against our
get_arguments through the shim."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_options_suite():
    import unicycler_tpu.pipeline.main as main_mod
    add_shim_module('unicycler', get_arguments=main_mod.get_arguments)
    result, unexpected = run_reference_tests('test_options.py')
    assert result.testsRun >= 4, result.testsRun
    assert not unexpected, unexpected
