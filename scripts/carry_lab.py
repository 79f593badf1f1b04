"""Iterative-k carry experiments on sample_data (diagnosis harness).

Runs ONLY the short-read assembly stage (correction cached on disk)
for a chosen carry strategy and prints the per-k contig/dead-end table,
so a carry change can be evaluated in minutes instead of a full
pipeline run.

Usage: JAX_PLATFORMS=cpu python scripts/carry_lab.py S1 [--kmers 25,...]
"""
import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE = '/tmp/carry_lab_reads.pkl'
SAMPLE = '/root/reference/sample_data'


def load_corrected():
    import numpy as np
    if os.path.exists(CACHE):
        with open(CACHE, 'rb') as f:
            return pickle.load(f)
    from unicycler_tpu.io.fastx import load_long_reads
    from unicycler_tpu.asm.correct import correct_reads
    arrays = []
    n1 = 0
    for fn in ('short_reads_1.fastq.gz', 'short_reads_2.fastq.gz'):
        d, names, _ = load_long_reads(os.path.join(SAMPLE, fn),
                                      silent=True)
        arr = [d[n].codes for n in names]
        if not n1:
            n1 = len(arr)
        arrays += arr
    arrays, _stats = correct_reads(arrays)
    data = (arrays, n1)
    with open(CACHE, 'wb') as f:
        pickle.dump(data, f)
    return data


def eval_k(unitigs, links, k, depth_filter=0.25):
    """Score a k's graph the way the pipeline does (clean first)."""
    import tempfile
    from unicycler_tpu.asm.debruijn import save_graph_gfa, pop_graph_bubbles
    from unicycler_tpu.graph.assembly_graph import AssemblyGraph
    with tempfile.NamedTemporaryFile('w', suffix='.gfa',
                                     delete=False) as tf:
        path = tf.name
    save_graph_gfa(unitigs, links, k, path)
    graph = AssemblyGraph(path, k - 1)
    os.remove(path)
    pop_graph_bubbles(graph)
    graph.clean(depth_filter, False)
    dead = graph.total_dead_end_count()
    segs = len(graph.segments)
    score = 1.0 / (segs * (dead + 2)) if segs else 0.0
    n50 = graph.get_n_segment_length(50) if segs else 0
    return segs, dead, score, n50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('strategy')
    ap.add_argument('--kmers', default=None)
    args = ap.parse_args()

    from unicycler_tpu.asm import debruijn as db

    arrays, _n1 = load_corrected()
    lens = [len(a) for a in arrays]
    kmer_range = [int(x) for x in args.kmers.split(',')] if args.kmers \
        else db.get_kmer_range(lens, 8, 0.2, 0.95)
    print('strategy %s, k range %s' % (args.strategy, kmer_range))

    carried = None
    for ki, k in enumerate(kmer_range):
        t0 = time.time()
        unitigs, links = db.assemble_short_reads(arrays, k, carried=carried)
        if ki + 1 < len(kmer_range):
            k_next = kmer_range[ki + 1]
            carried = db.make_carry(args.strategy, unitigs, links, k,
                                    k_next)
        segs, dead, score, n50 = eval_k(unitigs, links, k)
        print('  k=%3d: raw %4d unitigs %5d links | cleaned %4d segs '
              '%3d dead  score %.2e  N50 %6d  (%.0fs)'
              % (k, len(unitigs), len(links), segs, dead, score, n50,
                 time.time() - t0), flush=True)


if __name__ == '__main__':
    main()
