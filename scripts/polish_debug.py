"""Diagnose plasmid-A errors that survive final_short_read_polish.

VERDICT r5 ask #3: locate every mismatch/indel of the assembled plasmid A
vs truth, map it to its final-assembly segment + column, re-run one
instrumented polish round (collect_votes=True) and report what the
column voting saw there — coverage, base votes, gap votes, agreement —
so the surviving-error mechanism is measured rather than guessed.

Usage: python scripts/polish_debug.py <oracle_out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SAMPLE = '/root/reference/sample_data'
BASES = 'ACGT'


def contig_errors(out_dir):
    """[(contig_name, contig_pos, kind, contig_base, truth_base)] for
    plasmid A errors (contig-space positions; insertions report the
    inserted contig base, deletions report pos of the flanking base)."""
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.align.semi_global import align_reads_to_refs
    from unicycler_tpu.io.fastx import Read, Reference, load_fasta
    from unicycler_tpu.misc import reverse_complement

    truth = load_fasta(SAMPLE + '/reference.fasta')
    by_len = {len(seq): seq for _, seq in truth}
    assembled = load_fasta(os.path.join(out_dir, 'assembly.fasta'))
    reads = [Read(name.split()[0], seq, None) for name, seq in assembled]
    refs = [Reference(nm, by_len[ln] + by_len[ln])
            for nm, ln in (('A', 215774), ('B', 5153), ('E', 8953))]
    align_reads_to_refs(reads, refs, AlignmentScoringScheme('3,-6,-5,-2'),
                        low_score_threshold=70.9)
    errors = []
    for read in reads:
        if not read.alignments:
            continue
        best = max(read.alignments, key=lambda a: a.raw_score)
        if best.ref.name != 'A':
            continue
        clen = len(read.sequence)
        read_seq = read.sequence
        if best.rev_comp:
            read_seq = reverse_complement(read_seq)

        comp = str.maketrans('ACGT-', 'TGCA-')

        def cpos(read_pos):
            return clen - 1 - read_pos if best.rev_comp else read_pos

        def cbase(b):
            # votes are counted on the contig's FORWARD strand
            return b.translate(comp)[::-1] if best.rev_comp else b

        ref_seq = best.ref.sequence
        rp, fp = 0, best.ref_start_pos
        for part in best.cigar_parts or []:
            n, op = int(part[:-1]), part[-1]
            if op == 'S':
                rp += n
            elif op == 'M':
                for j in range(n):
                    if read_seq[rp + j] != ref_seq[fp + j]:
                        errors.append((read.name, cpos(rp + j), 'X',
                                       cbase(read_seq[rp + j]),
                                       cbase(ref_seq[fp + j])))
                rp += n
                fp += n
            elif op == 'I':
                for j in range(n):
                    errors.append((read.name, cpos(rp + j), 'I',
                                   cbase(read_seq[rp + j]), '-'))
                rp += n
            elif op == 'D':
                errors.append((read.name, cpos(max(0, rp - 1)), 'D', '-',
                               cbase(ref_seq[fp:fp + n])))
                fp += n
    return errors


def main():
    out_dir = sys.argv[1]
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.asm.polish import polish_round
    from unicycler_tpu.graph.assembly_graph import AssemblyGraph
    from unicycler_tpu.io.fastx import load_long_reads

    errors = contig_errors(out_dir)
    print('%d plasmid-A errors located (contig space)' % len(errors))

    graph = AssemblyGraph(os.path.join(out_dir, 'assembly.gfa'), None)
    reads = []
    for path in (SAMPLE + '/short_reads_1.fastq.gz',
                 SAMPLE + '/short_reads_2.fastq.gz'):
        d, names, _ = load_long_reads(path, silent=True)
        reads.extend(d[n] for n in names)
    scoring = AlignmentScoringScheme('3,-6,-5,-2').to_ops()
    polished, quality, _, votes = polish_round(
        graph, reads, scoring, multi_place=True, min_agreement=0.9,
        collect_votes=True)

    print('%-6s %-8s %-4s %-3s %-3s  %-6s %-5s %-22s %-9s %s' %
          ('seg', 'pos', 'kind', 'asm', 'tru', 'cover', 'gap',
           'votes A/C/G/T', 'agreement', 'verdict'))
    for name, pos, kind, asm_base, truth_base in sorted(errors):
        seg_num = int(name)
        v = votes.get(seg_num)
        if v is None or not (0 <= pos < v.n):
            print('%-6s %-8d %-4s %-3s %-3s  [no votes object/column]'
                  % (name, pos, kind, asm_base, truth_base))
            continue
        cover = int(v.cover[pos])
        gap = int(v.gap[pos])
        counts = v.base[pos]
        span = max(1, cover + gap)
        best_c = int(np.argmax(counts))
        best_n = int(counts[best_c])
        agree = best_n / span
        truth_code = BASES.find(truth_base[:1])
        truth_votes = int(counts[truth_code]) if truth_code >= 0 else -1
        if cover + gap == 0:
            verdict = 'UNCOVERED'
        elif kind == 'X' and agree < 0.9:
            verdict = 'agreement<0.9 (truth votes %d)' % truth_votes
        elif kind == 'X' and BASES[best_c] == asm_base:
            verdict = 'majority backs ASSEMBLY base?!'
        elif kind == 'X':
            verdict = 'majority backs %s but unchanged?' % BASES[best_c]
        elif kind == 'I':
            verdict = 'insertion: gap=%d best=%d (needs gap>best)' \
                % (gap, best_n)
        else:
            verdict = 'deletion: ins-votes %d' % len(v.ins.get(pos + 1, []))
        print('%-6s %-8d %-4s %-3s %-3s  %-6d %-5d %-22s %-9.2f %s' %
              (name, pos, kind, asm_base, truth_base[:3], cover, gap,
               '/'.join(str(int(c)) for c in counts), agree, verdict))


if __name__ == '__main__':
    main()
