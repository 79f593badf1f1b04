"""Parity harness: the reference's ctypes-layer tests against our
device-kernel compat surface (exact raw scores for known mutations,
banded-alignment semantics, MSA consensus recovery)."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_cpp_wrappers_suite():
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
    result, unexpected = run_reference_tests('test_cpp_wrappers.py')
    assert result.testsRun >= 20
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
