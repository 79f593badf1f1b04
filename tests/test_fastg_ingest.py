"""FASTG ingestion: loading the reference's SPAdes FASTG fixture (plus its
sibling .paths file) must produce the same graph as the GFA fixture that
was converted from the same assembly (ref test/test_assembly_graph.py:20-70
pins the GFA numbers; header grammar ref assembly_graph.py:2374-2463)."""

import os

from unicycler_tpu.graph.assembly_graph import AssemblyGraph

REF_TEST = '/root/reference/test'
FASTG = os.path.join(REF_TEST, 'test_assembly_graph.fastg')
GFA = os.path.join(REF_TEST, 'test_assembly_graph.gfa')


def load_both():
    return (AssemblyGraph(FASTG, 25, insert_size_mean=401,
                          insert_size_deviation=60),
            AssemblyGraph(GFA, 25, insert_size_mean=401,
                          insert_size_deviation=60))


def test_fastg_segments_match_gfa():
    fg, gg = load_both()
    assert len(fg.segments) == len(gg.segments) == 336
    for num, seg in gg.segments.items():
        assert fg.segments[num].forward_sequence == seg.forward_sequence
        assert fg.segments[num].reverse_sequence == seg.reverse_sequence
        assert abs(fg.segments[num].depth - seg.depth) < 1e-3


def test_fastg_links_match_gfa():
    fg, gg = load_both()
    assert sum(len(x) for x in fg.forward_links.values()) == 904
    for start, ends in gg.forward_links.items():
        assert sorted(fg.forward_links.get(start, [])) == sorted(ends)
    for seg, fwd in fg.forward_links.items():
        assert sorted(fwd) == sorted(-x for x in fg.reverse_links[-seg])


def test_fastg_paths_loaded():
    fg, gg = load_both()
    assert len(fg.paths) == len(gg.paths) == 53
    gfa_paths = sorted(map(tuple, gg.paths.values()))
    fastg_paths = sorted(map(tuple, fg.paths.values()))
    assert fastg_paths == gfa_paths


def test_fastg_overlap_inferred():
    fg = AssemblyGraph(FASTG, None)
    assert fg.overlap == 25


def test_fastg_median_depth():
    fg, _ = load_both()
    assert abs(fg.get_median_read_depth() - 40.2) < 0.1
