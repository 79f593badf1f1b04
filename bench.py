"""Benchmark: long-read semi-global alignment throughput per chip.

Workload: the reference's own real-read fixture sets (tough: 16 reads up to
72 kb; contained: 3 reads) aligned to their references at sensitivity 0 —
the same workload used to measure the reference C++ aligner's throughput.

Baseline: the reference SeqAn/minimap aligner (unicycler/src compiled with
-O3, driven by unicycler_align.semi_global_align_long_reads with 8 threads,
its default cap) measured on this machine:
    tough:     3.95 s for 16 reads  -> 4.05 reads/s
    contained: 0.69 s for  3 reads  -> 4.38 reads/s
    combined:  19 reads / 4.64 s    -> 4.09 reads/s
Prints one JSON line with reads/s and vs_baseline against that combined
number.
"""

import json
import sys
import time


REFERENCE_COMBINED_READS_PER_SEC = 4.09

FIXTURES = ['test_semi_global_alignment_tough',
            'test_semi_global_alignment_contained_reads']
FIXTURE_DIR = '/root/reference/test/'

# Hardware parity gate (VERDICT r3 ask #5): per-read floors for the
# level-0 batched run, asserted on the warm-up iteration BEFORE any
# timing. Raw scores are re-tallied from the CIGAR against the real
# sequences (align/alignment.py _tally_up), so a floor violation
# catches traceback corruption as well as scoring regressions. Floors
# are the reference's own fixture minima
# (ref test/test_semi_global_alignment.py:230-660) where defined, else
# the pinned batched result measured on the real chip (2026-08-20).
# Format: read name -> (n_alignments, min best raw score).
PARITY = {
    'test_semi_global_alignment_tough': {
        '0': (1, 126074), '1': (2, 34449), '2': (2, 34439),
        '3': (1, 786), '4': (1, 58531), '5': (1, 10883),
        '6': (1, 10883), '7': (1, 125555), '8': (1, 2812),
        '9': (1, 10005), '10': (1, 4978), '11': (1, 6996),
        '12': (1, 6996), '13': (1, 101608), '14': (1, 204),
        '15': (2, 3137),
    },
    'test_semi_global_alignment_contained_reads': {
        '0': (1, 1418), '1': (1, 16608), '2': (1, 122681),
    },
}


def load_workload():
    from unicycler_tpu.io.fastx import load_long_reads, load_references
    workload = []
    for fixture in FIXTURES:
        refs = load_references(FIXTURE_DIR + fixture + '.fasta',
                               section_header=None, show_progress=False)
        reads, names, _ = load_long_reads(FIXTURE_DIR + fixture + '.fastq',
                                          silent=True)
        workload.append((fixture, refs, [reads[n] for n in names]))
    return workload


def run_once(workload, scoring):
    # Both fixture sets go through align_jobs in one submission: the
    # contained set's host seeding overlaps the tough set's device
    # compute, and the record + refine fetches are merged across both
    # (3 device sync points per iteration instead of 6).
    from unicycler_tpu.align.semi_global import AlignJob, align_jobs
    jobs = [AlignJob(reads, refs, scoring, sensitivity_level=0,
                     low_score_threshold=70.86, min_align_length=10)
            for _, refs, reads in workload]
    align_jobs(jobs)
    return sum(len(reads) for _, _, reads in workload)


def check_parity(workload):
    """Assert the warm-up run's per-read alignment counts and raw-score
    floors. Any failure prints the violations and exits non-zero, so a
    kernel regression makes the BENCH artifact rc != 0."""
    failures = []
    for fixture, _, reads in workload:
        expected = PARITY[fixture]
        for read in reads:
            want_n, want_score = expected[read.name]
            n = len(read.alignments)
            best = max((a.raw_score for a in read.alignments), default=0)
            if n != want_n or best < want_score:
                failures.append('%s read %s: got %d alignments best %d, '
                                'want %d alignments best >= %d'
                                % (fixture, read.name, n, best,
                                   want_n, want_score))
    if failures:
        print('PARITY FAIL (%d):\n  %s'
              % (len(failures), '\n  '.join(failures)))
        sys.exit(1)
    n_reads = sum(len(v) for v in PARITY.values())
    print('parity: %d/%d fixture reads pass score+CIGAR floors' %
          (n_reads, n_reads))


def main():
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    scoring = AlignmentScoringScheme('3,-6,-5,-2')
    workload = load_workload()

    run_once(workload, scoring)          # warm-up: compile kernels
    check_parity(workload)               # hardware parity gate (untimed)
    # 5 steady-state iterations. The HEADLINE value is the MEDIAN (an
    # honest steady-state estimate, robust to one bad-network
    # iteration); the max is reported alongside because through the
    # axon tunnel the per-run fetch/dispatch cost varies +-15% run to
    # run (server-side executable reloads, network weather) and the
    # fastest iteration is the closest proxy for the chip itself.
    iters = 5
    rates = []
    for _ in range(iters):
        t0 = time.time()
        n = run_once(workload, scoring)
        rates.append(n / (time.time() - t0))
    rates.sort()
    reads_per_sec = rates[len(rates) // 2]
    print(json.dumps({
        'metric': 'long-read alignments/sec/chip (semi-global DP)',
        'value': round(reads_per_sec, 2),
        'unit': 'reads/s',
        'vs_baseline': round(reads_per_sec / REFERENCE_COMBINED_READS_PER_SEC,
                             2),
        'median_of': iters,
        'max': round(max(rates), 2),
        'min': round(min(rates), 2),
    }))


if __name__ == '__main__':
    main()
