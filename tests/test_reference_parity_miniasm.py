"""Parity harness: reference contig-placement tests against our asm/hybrid
implementation."""

from tests.reference_shim import add_shim_module, run_reference_tests


def test_reference_contig_placement_suite():
    from unicycler_tpu.asm import hybrid
    from unicycler_tpu.graph import string_graph as sg
    from unicycler_tpu.align.scoring import AlignmentScoringScheme

    def place_contigs_compat(miniasm_dir, assembly_graph, unitig_graph,
                             threads, scoring_scheme, seg_nums_to_bridge):
        return hybrid.place_contigs(assembly_graph, unitig_graph,
                                    scoring_scheme, seg_nums_to_bridge)

    add_shim_module('miniasm_assembly', place_contigs=place_contigs_compat)
    add_shim_module(
        'string_graph', StringGraph=sg.StringGraph,
        StringGraphSegment=sg.StringGraphSegment,
        StringGraphLink=sg.StringGraphLink,
        merge_string_graph_segments_into_unitig_graph=
        sg.merge_string_graph_segments_into_unitig_graph)
    add_shim_module('alignment',
                    AlignmentScoringScheme=AlignmentScoringScheme)
    result, unexpected = run_reference_tests('test_miniasm_assembly.py')
    assert result.testsRun >= 4
    assert not unexpected, 'unexpected failures: %r' % sorted(unexpected)
