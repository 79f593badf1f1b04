"""Audit the refine pass on the bench workload: run the aligner once
with refinement disabled (REFINE_MARGIN=0) and once enabled, and diff
per-alignment scores. Shows which alignments refine actually improves
and what pass-1 band margins they had — evidence for tuning
settings.REFINE_MARGIN rather than guessing."""

import sys

sys.path.insert(0, '/root/repo')


def run(workload, scoring, collect_margins=False):
    from unicycler_tpu.align import semi_global as sg
    from unicycler_tpu.ops import banded as banded_ops
    from unicycler_tpu import settings
    out = {}
    for refs, reads in workload:
        for r in reads:
            r.alignments = []
        sg.align_reads_to_refs(reads, refs, scoring, sensitivity_level=0,
                               low_score_threshold=70.86,
                               min_align_length=10)
        pass_W = banded_ops.band_width(settings.BAND_SIZES[0])
        for read in reads:
            for a in read.alignments:
                pa = getattr(a, '_pair', None)
                task = getattr(a, '_task', None)
                key = (read.name, a.ref.name, a.read_start_pos)
                margin = None
                if pa is not None and task is not None and pa.cigar \
                        and collect_margins:
                    margin = banded_ops.path_band_margin(pa, task.banded,
                                                         pass_W)
                out[key] = (a.raw_score, margin)
    return out


def main():
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu import settings
    import importlib
    bench = importlib.import_module('bench')

    scoring = AlignmentScoringScheme('3,-6,-5,-2')
    workload = bench.load_workload()

    saved = settings.REFINE_MARGIN
    settings.REFINE_MARGIN = 0          # refine never fires
    base = run(workload, scoring, collect_margins=True)
    settings.REFINE_MARGIN = saved      # normal behaviour
    refined = run(workload, scoring)

    improved = 0
    for key in sorted(base):
        b_score, margin = base[key]
        r_score = refined.get(key, (None, None))[0]
        if r_score != b_score:
            improved += 1
            print('%-40s margin=%s score %s -> %s'
                  % (key, margin, b_score, r_score))
    n_low = sum(1 for v in base.values()
                if v[1] is not None and v[1] < saved)
    print('alignments: %d; pass-1 margins < %d: %d; refine-changed: %d'
          % (len(base), saved, n_low, improved))
    margins = sorted(v[1] for v in base.values() if v[1] is not None)
    print('lowest margins:', margins[:10])


if __name__ == '__main__':
    main()
