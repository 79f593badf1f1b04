"""SAM write/read round-trip: alignments written by the driver must
reconstruct identically through load_sam_alignments (the reference's SAM
reuse path, unicycler.py:824-832)."""

import os
import random

from unicycler_tpu.align.scoring import AlignmentScoringScheme
from unicycler_tpu.align.semi_global import (load_sam_alignments,
                                             semi_global_align_long_reads)
from unicycler_tpu.io.fastx import Read, Reference


def rand_seq(n, seed):
    rng = random.Random(seed)
    return ''.join(rng.choice('ACGT') for _ in range(n))


def test_sam_round_trip(tmp_path):
    genome = rand_seq(3000, 1)
    refs = [Reference('1', genome)]
    reads = {}
    names = []
    rng = random.Random(2)
    for i in range(5):
        start = rng.randrange(0, 2000)
        seq = genome[start:start + 800]
        if i % 2:
            from unicycler_tpu.misc import reverse_complement
            seq = reverse_complement(seq)
        name = 'r%d' % i
        reads[name] = Read(name, seq, None)
        names.append(name)
    scoring = AlignmentScoringScheme('3,-6,-5,-2')
    sam_path = str(tmp_path / 'out.sam')
    semi_global_align_long_reads(refs, None, reads, names, None, 1, scoring,
                                 [None], False, 50, sam_path, None, 0, 0,
                                 None, 0)
    originals = {(a.read.name, a.ref_start_pos, a.ref_end_pos, a.rev_comp,
                  a.raw_score, tuple(a.cigar_parts))
                 for r in reads.values() for a in r.alignments}
    assert originals

    # fresh Read objects so loaded alignments attach cleanly
    reads2 = {n: Read(n, reads[n].sequence, reads[n].qualities)
              for n in names}
    loaded = load_sam_alignments(sam_path, reads2, {'1': refs[0]}, scoring)
    reloaded = {(a.read.name, a.ref_start_pos, a.ref_end_pos, a.rev_comp,
                 a.raw_score, tuple(a.cigar_parts)) for a in loaded}
    assert reloaded == originals
