"""Tracing subsystem: spans nest, counters accumulate, report renders,
and the instrumented aligner produces spans when enabled."""

import numpy as np

from unicycler_tpu.utils import trace


def test_spans_and_counters():
    trace.reset()
    trace.enable()
    try:
        with trace.span('outer'):
            with trace.span('inner'):
                trace.add('things', 3)
            with trace.span('inner'):
                trace.add('things', 2)
        d = trace.as_dict()
        assert d['spans']['outer']['calls'] == 1
        assert d['spans']['outer/inner']['calls'] == 2
        assert d['counters']['things'] == 5
        text = trace.report()
        assert 'outer' in text and 'inner' in text and 'things' in text
    finally:
        trace.disable()
        trace.reset()


def test_disabled_is_noop():
    trace.reset()
    with trace.span('x'):
        trace.add('y')
    assert trace.as_dict() == {'spans': {}, 'counters': {}}


def test_aligner_emits_spans():
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.align.semi_global import align_reads_to_refs
    from unicycler_tpu.io.fastx import Read, Reference

    rng = np.random.default_rng(0)
    seq = ''.join('ACGT'[i] for i in rng.integers(0, 4, 3000))
    ref = Reference('r', seq)
    read = Read('q', seq[500:1500], 'I' * 1000)
    trace.reset()
    trace.enable()
    try:
        align_reads_to_refs([read], [ref], AlignmentScoringScheme('3,-6,-5,-2'))
        d = trace.as_dict()
        assert any('seed_and_tasks' in p for p in d['spans'])
        assert any('traceback_pass' in p for p in d['spans'])
        assert len(read.alignments) == 1
    finally:
        trace.disable()
        trace.reset()
