"""Deterministic synthetic read generation for end-to-end testing.

The role of reference test/fake_reads.py:26-90: a 'perfect fake
sequencer' producing 100 bp reads at 300 bp inserts, tiled at every
position on both strands of a (circular) genome — the substrate for the
random-sequence assembly property test.
"""

from ..misc import reverse_complement


def make_fake_short_reads(genome, read_length=100, insert_size=300,
                          circular=True):
    """Returns (pairs_1, pairs_2): lists of (name, seq, qual) tuples with
    every genome position covered on both strands."""
    pairs_1, pairs_2 = [], []
    qual = 'I' * read_length
    extended = genome + genome[:insert_size] if circular else genome
    limit = len(genome) if circular else len(genome) - insert_size + 1
    read_num = 0
    for i in range(limit):
        fragment = extended[i:i + insert_size]
        if len(fragment) < insert_size:
            continue
        read_1 = fragment[:read_length]
        read_2 = reverse_complement(fragment[-read_length:])
        read_num += 1
        pairs_1.append(('fake_%d/1' % read_num, read_1, qual))
        pairs_2.append(('fake_%d/2' % read_num, read_2, qual))
    return pairs_1, pairs_2


def make_fake_long_reads(genome, read_length=10000, step=500,
                         circular=True):
    """Perfect long reads tiled across the genome on both strands."""
    reads = []
    extended = genome + genome[:read_length] if circular else genome
    limit = len(genome) if circular else max(1, len(genome) - read_length)
    read_num = 0
    for i in range(0, limit, step):
        seq = extended[i:i + read_length]
        if len(seq) < min(read_length, len(genome)):
            continue
        read_num += 1
        if read_num % 2 == 0:
            seq = reverse_complement(seq)
        reads.append(('fake_long_%d' % read_num, seq))
    return reads


def write_fastq(filename, reads):
    with open(filename, 'w') as f:
        for item in reads:
            if len(item) == 3:
                name, seq, qual = item
            else:
                name, seq = item
                qual = 'I' * len(seq)
            f.write('@%s\n%s\n+\n%s\n' % (name, seq, qual))
