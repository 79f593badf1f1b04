"""Start-gene search and replicon rotation.

Replaces the reference's makeblastdb/tblastn subprocesses
(ref unicycler/blast_func.py:27-134 and the rotation driver
unicycler.py:753-806) with an in-framework translated search: the replicon
is translated in all six frames and the protein start-gene queries
(dnaA/repA) are aligned against the translations with the device DP —
no external binaries at all (SURVEY.md §7.9).

Identity-based protein scoring stands in for BLOSUM: start-gene hits must
clear high identity/coverage thresholds (defaults 90%/95%), where identity
scoring and BLOSUM agree.
"""

from typing import NamedTuple

import numpy as np

from .. import log
from ..io.fastx import load_fasta
from ..misc import reverse_complement
from ..ops import dispatch
from ..ops import pairwise as pw


class CannotFindStart(Exception):
    pass


class BlastHit(NamedTuple):
    """Hit-surface parity with ref blast_func.py:101-134."""
    qseqid: str
    start_pos: int
    flip: bool
    pident: float
    query_cov: float


_CODON_TABLE = {}
_BASES = 'TCAG'
_AMINO = ('FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRR'
          'VVVVAAAADDEEGGGG')
for _i, _b1 in enumerate(_BASES):
    for _j, _b2 in enumerate(_BASES):
        for _k, _b3 in enumerate(_BASES):
            _CODON_TABLE[_b1 + _b2 + _b3] = _AMINO[16 * _i + 4 * _j + _k]

# Protein letters get codes offset by 10 so the kernels' padding codes
# (5, 6) can never match a residue.
_AA_CODE = {aa: 10 + i for i, aa in enumerate('ACDEFGHIKLMNPQRSTVWY*X')}


def translate(seq: str) -> str:
    """DNA -> protein, frame 0, unknown codons as X."""
    out = []
    for i in range(0, len(seq) - 2, 3):
        out.append(_CODON_TABLE.get(seq[i:i + 3], 'X'))
    return ''.join(out)


def encode_protein(seq: str) -> np.ndarray:
    return np.array([_AA_CODE.get(c, _AA_CODE['X']) for c in seq],
                    dtype=np.int8)


# Protein identity scoring: strong match reward, affine gaps.
_PROTEIN_SCORING = pw.Scoring(3, -6, -5, -2)


def find_start_gene(sequence, start_genes_fasta, identity_threshold,
                    coverage_threshold, blast_dir=None, makeblastdb_path=None,
                    tblastn_path=None):
    """Find the best start-gene hit in a circular sequence
    (semantics of ref blast_func.py:27-98: the sequence start is
    duplicated to handle genes spanning the origin; the winning hit must
    begin at the gene's first residue)."""
    # Duplicate the sequence start to handle wrap-around genes.
    seq_len = len(sequence)
    dup_length = min(seq_len, 10000)
    queryable = sequence + sequence[:dup_length]

    genes = load_fasta(start_genes_fasta)
    if not genes:
        raise CannotFindStart

    frames = []   # (frame_offset, is_reverse, protein string)
    rc = reverse_complement(queryable)
    for offset in range(3):
        frames.append((offset, False, translate(queryable[offset:])))
        frames.append((offset, True, translate(rc[offset:])))

    gene_codes = [(name, encode_protein(seq)) for name, seq in genes]
    frame_codes = [encode_protein(p) for _, _, p in frames]

    q_list, r_list, meta = [], [], []
    for gene_name, g_codes in gene_codes:
        for f_idx, f_codes in enumerate(frame_codes):
            if len(f_codes) == 0 or len(g_codes) == 0:
                continue
            q_list.append(g_codes)
            r_list.append(f_codes)
            meta.append((gene_name, f_idx))

    results = dispatch.batch_align(q_list, r_list, _PROTEIN_SCORING,
                                   pw.SEMI_GLOBAL, band=100,
                                   need_cigar=True)

    best = None
    for (gene_name, f_idx), pa in zip(meta, results):
        if pa is None or not pa.cigar:
            continue
        gene_len = pa.s1_len
        # the hit must start at the first residue of the gene
        # (ref blast_func.py:93-98: qstart == 0)
        if pa.s1_start != 0:
            continue
        gene_seq = dict(genes)[gene_name]
        frame_prot = frames[f_idx][2]
        gi, fi = pa.s1_start, pa.s2_start
        matches = 0
        align_len = sum(count for count, _ in pa.cigar)
        for count, op in pa.cigar:
            if op == 'M':
                for k in range(count):
                    if gi + k < len(gene_seq) and fi + k < len(frame_prot) \
                            and gene_seq[gi + k] == frame_prot[fi + k]:
                        matches += 1
                gi += count
                fi += count
            elif op == 'I':
                gi += count
            else:
                fi += count
        if align_len == 0:
            continue
        pident = 100.0 * matches / align_len
        query_cov = 100.0 * (pa.s1_end - pa.s1_start) / gene_len
        if pident < identity_threshold or query_cov < coverage_threshold:
            continue
        score = matches
        if best is None or score > best[0]:
            best = (score, gene_name, f_idx, pa, pident, query_cov)

    if best is None:
        raise CannotFindStart

    _, gene_name, f_idx, pa, pident, query_cov = best
    frame_offset, is_reverse, _ = frames[f_idx]
    protein_start = pa.s2_start
    nuc_pos = frame_offset + 3 * protein_start   # position in queryable/rc
    if not is_reverse:
        start_pos = nuc_pos % seq_len
        flip = False
    else:
        # position on the forward strand of the (duplicated) sequence
        forward_pos = len(queryable) - nuc_pos
        start_pos = forward_pos % seq_len
        flip = True
    return BlastHit(qseqid=gene_name, start_pos=start_pos, flip=flip,
                    pident=pident, query_cov=query_cov)


def rotate_completed_replicons(graph, args, counter):
    """Rotate circular replicons to start at a start gene
    (ref unicycler.py:753-806)."""
    completed_replicons = graph.completed_circular_replicons()
    if not completed_replicons:
        return
    log.log_section_header('Rotating completed replicons')
    if not args.start_genes:
        log.log('No start-gene database given (--start_genes); skipping '
                'rotation search.')
        return
    completed_replicons = sorted(
        completed_replicons, reverse=True,
        key=lambda x: graph.segments[x].get_length())
    for replicon in completed_replicons:
        segment = graph.segments[replicon]
        sequence = segment.forward_sequence
        try:
            seg_name = str(segment.number)
        except AttributeError:
            seg_name = segment.full_name
        try:
            hit = find_start_gene(sequence, args.start_genes,
                                  args.start_gene_id, args.start_gene_cov)
        except CannotFindStart:
            log.log('  segment %s: no start gene found' % seg_name, 2)
            continue
        log.log('  segment %s: %s at %d (%s)' %
                (seg_name, hit.qseqid, hit.start_pos,
                 'reverse' if hit.flip else 'forward'), 2)
        segment.rotate_sequence(hit.start_pos, hit.flip)
