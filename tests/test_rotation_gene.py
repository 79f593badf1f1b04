"""End-to-end gene rotation on a synthetic plasmid.

The reference rotates completed replicons to start at a start gene
(dnaA/repA) found by tblastn (ref unicycler.py:753-806,
blast_func.py:27-98). The reference's own test_blast_func suite passes
through the shim (tests/test_reference_parity_rotation.py); this file
additionally pins the FULL rotation path — find_start_gene through
AssemblyGraph.rotate_completed_replicons — with a synthetic rep-style
gene, covering what that suite does not: reverse-strand genes,
origin-spanning genes, and the graph-level driver (the scenario the
bundled database is too small to exercise with real plasmids;
see gene_data/README.md)."""

import types

import numpy as np
import pytest

from unicycler_tpu.misc import reverse_complement
from unicycler_tpu.pipeline.rotation import (find_start_gene,
                                             rotate_completed_replicons,
                                             CannotFindStart)

# One representative codon per amino acid (E. coli-common choices).
_CODON = {'A': 'GCG', 'C': 'TGC', 'D': 'GAT', 'E': 'GAA', 'F': 'TTT',
          'G': 'GGC', 'H': 'CAT', 'I': 'ATT', 'K': 'AAA', 'L': 'CTG',
          'M': 'ATG', 'N': 'AAC', 'P': 'CCG', 'Q': 'CAG', 'R': 'CGT',
          'S': 'AGC', 'T': 'ACC', 'V': 'GTG', 'W': 'TGG', 'Y': 'TAT'}

# A synthetic 62-residue replication-initiator-like protein (not a real
# database entry: the point is the machinery, not the biology).
REP_PROTEIN = ('MSKELVVFSNELNTVSYRAIKQGLDFTKAYQHLSPQEQALFWLIYQKVNTGEP'
               'FLEGDWRK')


def _cds(protein):
    return ''.join(_CODON[aa] for aa in protein)


def _random_dna(rng, n):
    return ''.join('ACGT'[c] for c in rng.integers(0, 4, n))


def _plasmid_with_gene(rng, length, gene_dna, pos, reverse=False):
    """Circular plasmid of `length` bp with `gene_dna` planted so its
    first base (gene orientation) sits at plasmid position `pos`
    (wrapping allowed). With reverse=True the gene runs on the reverse
    strand: the revcomp is planted so that reading the reverse strand
    from `pos` gives the gene."""
    backbone = _random_dna(rng, length)
    if not reverse:
        ins, start_f = gene_dna, pos
    else:
        # gene start at `pos` on the reverse strand: the revcomp insert
        # ENDS at forward position pos + 1
        ins = reverse_complement(gene_dna)
        start_f = (pos + 1 - len(ins)) % length
    doubled = backbone + backbone
    doubled = doubled[:start_f] + ins + doubled[start_f + len(ins):]
    seq = doubled[:length]
    if start_f + len(ins) > length:              # wraps across the origin
        tail = doubled[length:start_f + len(ins)]
        seq = tail + seq[len(tail):]
    return seq


@pytest.fixture(scope='module')
def gene_db(tmp_path_factory):
    path = tmp_path_factory.mktemp('genes') / 'rep_genes.fasta'
    path.write_text('>repX synthetic replication initiator\n%s\n'
                    % REP_PROTEIN)
    return str(path)


def test_forward_gene_rotates_to_start(gene_db):
    rng = np.random.default_rng(7)
    gene = _cds(REP_PROTEIN)
    seq = _plasmid_with_gene(rng, 4000, gene, 1500)
    hit = find_start_gene(seq, gene_db, 90.0, 95.0)
    assert hit.qseqid.startswith('repX')
    assert hit.start_pos == 1500 and not hit.flip
    rotated = seq[hit.start_pos:] + seq[:hit.start_pos]
    assert rotated.startswith(gene)


def test_reverse_strand_gene_rotates_and_flips(gene_db):
    rng = np.random.default_rng(8)
    gene = _cds(REP_PROTEIN)
    seq = _plasmid_with_gene(rng, 4000, gene, 2200, reverse=True)
    hit = find_start_gene(seq, gene_db, 90.0, 95.0)
    assert hit.flip
    rotated = seq[hit.start_pos:] + seq[:hit.start_pos]
    assert reverse_complement(rotated).startswith(gene)


def test_origin_spanning_gene(gene_db):
    rng = np.random.default_rng(9)
    gene = _cds(REP_PROTEIN)
    pos = 4000 - 60                      # gene wraps across the origin
    seq = _plasmid_with_gene(rng, 4000, gene, pos)
    assert (seq[pos:] + seq[:pos]).startswith(gene)
    hit = find_start_gene(seq, gene_db, 90.0, 95.0)
    assert hit.start_pos == pos and not hit.flip


def test_no_hit_raises(gene_db):
    rng = np.random.default_rng(10)
    seq = _random_dna(rng, 3000)
    with pytest.raises(CannotFindStart):
        find_start_gene(seq, gene_db, 90.0, 95.0)


def test_driver_gene_rotation_on_graph(tmp_path, gene_db):
    """rotate_completed_replicons: a circular replicon with an embedded
    gene GENE-rotates (starts at the gene), not canonical-rotates."""
    from unicycler_tpu.graph.assembly_graph import AssemblyGraph
    rng = np.random.default_rng(11)
    gene = _cds(REP_PROTEIN)
    seq = _plasmid_with_gene(rng, 3000, gene, 777)
    gfa = tmp_path / 'one_replicon.gfa'
    gfa.write_text('S\t1\t%s\tLN:i:%d\tdp:f:1.0\nL\t1\t+\t1\t+\t0M\n'
                   % (seq, len(seq)))
    graph = AssemblyGraph(str(gfa), 0)
    args = types.SimpleNamespace(start_genes=gene_db, start_gene_id=90.0,
                                 start_gene_cov=95.0)
    rotate_completed_replicons(graph, args, counter=[0])
    rotated = graph.segments[1].forward_sequence
    assert rotated.startswith(gene)
    assert sorted(rotated) == sorted(seq)        # same bases, new start


def test_driver_canonical_fallback_without_hit(tmp_path, gene_db):
    from unicycler_tpu.graph.assembly_graph import AssemblyGraph
    from unicycler_tpu.pipeline.rotation import canonical_rotation
    rng = np.random.default_rng(12)
    seq = _random_dna(rng, 2500)
    gfa = tmp_path / 'no_gene.gfa'
    gfa.write_text('S\t1\t%s\tLN:i:%d\tdp:f:1.0\nL\t1\t+\t1\t+\t0M\n'
                   % (seq, len(seq)))
    graph = AssemblyGraph(str(gfa), 0)
    args = types.SimpleNamespace(start_genes=gene_db, start_gene_id=90.0,
                                 start_gene_cov=95.0)
    rotate_completed_replicons(graph, args, counter=[0])
    start, flip = canonical_rotation(seq)
    want = reverse_complement(seq[start:] + seq[:start]) if flip \
        else seq[start:] + seq[:start]
    assert graph.segments[1].forward_sequence == want
