"""Run the reference's OWN semi-global alignment test suite
(/root/reference/test/test_semi_global_alignment.py, 28 tests: contained
reads, ref-contained reads, partial overlaps, both strands, multi-ref)
against the TPU aligner through the module shim."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_semi_global_suite():
    import unicycler_tpu.align.alignment as al_mod
    import unicycler_tpu.align.scoring as sc_mod
    import unicycler_tpu.align.semi_global as sg_mod
    import unicycler_tpu.io.fastx as fastx_mod

    add_shim_module('read_ref',
                    load_references=fastx_mod.load_references,
                    load_long_reads=fastx_mod.load_long_reads)
    add_shim_module('alignment',
                    AlignmentScoringScheme=sc_mod.AlignmentScoringScheme,
                    Alignment=al_mod.Alignment)
    add_shim_module('unicycler_align',
                    semi_global_align_long_reads=
                    sg_mod.semi_global_align_long_reads)
    result, unexpected = run_reference_tests(
        'test_semi_global_alignment.py')
    assert result.testsRun >= 28, result.testsRun
    assert not unexpected, unexpected
