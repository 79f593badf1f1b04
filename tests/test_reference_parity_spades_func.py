"""Run the reference's test_spades_func.py (FASTQ counters + external
SPAdes command builder) against asm/spades_compat through the shim."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_spades_func_suite():
    import unicycler_tpu.asm.spades_compat as sc
    add_shim_module('spades_func',
                    get_read_lengths=sc.get_read_lengths,
                    get_read_count=sc.get_read_count,
                    BadFastq=sc.BadFastq,
                    build_spades_command=sc.build_spades_command)
    result, unexpected = run_reference_tests('test_spades_func.py')
    assert result.testsRun >= 13, result.testsRun
    assert not unexpected, unexpected
