"""Pairwise affine-gap alignment as a JAX row-scan DP (Gotoh).

This one parameterised kernel family replaces the reference's six SeqAn
aligner variants (ref unicycler/src/{global,path,overlap,start_end,
semi_global_align_exhaustive}.cpp — see SURVEY.md §2.2): the free-end-gap
flags of SeqAn's ``AlignConfig<TOP,LEFT,RIGHT,BOTTOM>`` become an
:class:`AlignConfig` of four booleans.

Design notes (TPU-first):
  * s1 (query/read) runs along the scan axis, s2 (reference) along the
    vectorised lane axis, so every row update is pure VPU work.
  * The horizontal gap state E has a serial in-row dependency in the naive
    Gotoh recurrence. Because a gap of length L costs open + (L-1)*extend
    with |open| >= |extend|, closing and immediately reopening a gap is
    never better than extending, so E is exactly a shifted prefix cummax of
    (G[k] + open - (k+1)*ext) plus j*ext - an associative scan, fully
    vectorisable.
  * Traceback is packed into 4 bits/cell (H-source 2b, E-extend 1b,
    F-extend 1b), written as a (n, m+1) uint8 array, and decoded to CIGARs
    on the host (or skipped entirely for score-only calls such as path
    scoring, ref path_finding.py:71).

Scoring convention (matches SeqAn Score<int,Simple>(match, mismatch, ext,
open) used throughout the reference): a gap of length L costs
open + (L-1)*ext, with scores as (possibly negative) integers.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2 ** 30)
NEG_BAND = 2 ** 28          # 'unbanded' diagonal bound sentinel

# H-source codes in the traceback byte (bits 0-1).
DIAG, E_SRC, F_SRC = 0, 1, 2
E_EXT_BIT = 4
F_EXT_BIT = 8


class AlignConfig(NamedTuple):
    """Free-end-gap flags.

    free_start_s1: s1's prefix may be skipped for free (clip in s1)
    free_start_s2: s2's prefix may be skipped for free
    free_end_s1:   s1's suffix may be skipped for free
    free_end_s2:   s2's suffix may be skipped for free

    SeqAn mapping (s1 horizontal, s2 vertical): TOP=free_start_s1,
    LEFT=free_start_s2, BOTTOM=free_end_s1, RIGHT=free_end_s2.
    """
    free_start_s1: bool
    free_start_s2: bool
    free_end_s1: bool
    free_end_s2: bool


# The reference's aligner variants as configs:
SEMI_GLOBAL = AlignConfig(True, True, True, True)     # AlignConfig<t,t,t,t>
FULLY_GLOBAL = AlignConfig(False, False, False, False)  # <f,f,f,f>
PATH_CONFIG = AlignConfig(False, False, False, True)  # <f,f,t,f>: free s2 tail
OVERLAP_CONFIG = AlignConfig(True, False, False, True)  # <t,f,t,f>
START_CONFIG = AlignConfig(False, False, False, True)  # find s1 at start of s2
END_CONFIG = AlignConfig(False, True, False, False)   # find s1 at end of s2


class Scoring(NamedTuple):
    match: int
    mismatch: int
    gap_open: int
    gap_extend: int


DEFAULT_SCORING = Scoring(3, -6, -5, -2)


def _gap_cost(length, scoring):
    return jnp.where(length > 0,
                     scoring.gap_open + (length - 1) * scoring.gap_extend, 0)


def _align_single(q, r, n_act, m_act, lower_diag, upper_diag, scoring,
                  config, need_moves):
    """DP over one padded pair. q:(n,) int8, r:(m,) int8. Cells outside
    the diagonal band lower_diag <= (i - j) <= upper_diag are masked out
    (SeqAn banded-globalAlignment semantics, ref global_align.cpp:56-75;
    pass +/-2^30 for unbanded). Returns (score, end_i, end_j, moves)."""
    n_pad = q.shape[0]
    m_pad = r.shape[0]
    m1 = m_pad + 1
    match, mismatch, open_, ext = (int(scoring.match), int(scoring.mismatch),
                                   int(scoring.gap_open), int(scoring.gap_extend))
    assert open_ <= ext, 'prefix-scan Gotoh requires gap_open <= gap_extend'

    js = jnp.arange(m1, dtype=jnp.int32)          # 0..m_pad

    # Row 0 boundary.
    if config.free_start_s2:
        h0 = jnp.zeros(m1, jnp.int32)
    else:
        h0 = jnp.where(js > 0, open_ + (js - 1) * ext, 0).astype(jnp.int32)
    h0 = jnp.where((-js >= lower_diag) & (-js <= upper_diag), h0, NEG)
    f0 = jnp.full(m1, NEG, jnp.int32)

    def col0_bound(i):
        if config.free_start_s1:
            return jnp.int32(0)
        return jnp.int32(open_) + (i - 1) * jnp.int32(ext)

    def row_step(carry, xi):
        h_prev, f_prev, h_at_n = carry
        i, qi = xi           # i: 1-based row index; qi: q[i-1]

        # Vertical gap state F (gap in s2 / insertion in read).
        f_open = h_prev + open_
        f_ext = f_prev + ext
        f = jnp.maximum(f_open, f_ext)
        f_ext_bit = (f == f_ext) & (f_prev > NEG // 2)

        # Diagonal candidates for j>=1.
        sub = jnp.where(qi == r, match, mismatch).astype(jnp.int32)  # (m_pad,)
        diag = h_prev[:-1] + sub                                     # j=1..m_pad

        hb = col0_bound(i)
        g = jnp.concatenate([hb[None], jnp.maximum(diag, f[1:])])

        # Horizontal gap state E via prefix cummax.
        c = g + open_ - (js + 1) * ext
        cmax = jax.lax.cummax(c, axis=0)
        cmax_shift = jnp.concatenate([jnp.array([NEG], jnp.int32), cmax[:-1]])
        e = cmax_shift + js * ext
        e = e.at[0].set(NEG)

        h = jnp.maximum(g, e)
        h = h.at[0].set(hb)
        # band mask: diagonal d = i - j must lie within [lower, upper]
        d = i - js
        in_band = (d >= lower_diag) & (d <= upper_diag)
        h = jnp.where(in_band, h, NEG)
        e = jnp.where(in_band, e, NEG)
        f = jnp.where(in_band, f, NEG)

        e_prev_col = jnp.concatenate([jnp.array([NEG], jnp.int32), e[:-1]])
        e_ext_bit = (e == e_prev_col + ext) & (e_prev_col > NEG // 2)

        if need_moves:
            hsrc = jnp.where(h == diag_full(diag, hb), DIAG,
                             jnp.where(h == e, E_SRC, F_SRC)).astype(jnp.uint8)
            moves = (hsrc
                     | jnp.where(e_ext_bit, E_EXT_BIT, 0).astype(jnp.uint8)
                     | jnp.where(f_ext_bit, F_EXT_BIT, 0).astype(jnp.uint8))
        else:
            moves = jnp.zeros((), jnp.uint8)

        h_at_n = jnp.where(i == n_act, h, h_at_n)
        lastcol = h[m_act]
        return (h, f, h_at_n), (moves, lastcol)

    def diag_full(diag, hb):
        return jnp.concatenate([hb[None], diag])

    rows_i = jnp.arange(1, n_pad + 1, dtype=jnp.int32)
    init = (h0, f0, jnp.where(n_act == 0, h0, jnp.full(m1, NEG, jnp.int32)))
    (h_last, _, h_at_n), (moves, lastcol) = jax.lax.scan(
        row_step, init, (rows_i, q))

    # --- End-cell selection ---------------------------------------------
    corner = h_at_n[m_act]
    best_score = corner
    end_i, end_j = n_act, m_act

    if config.free_end_s2:
        row_vals = jnp.where(js <= m_act, h_at_n, NEG)
        j_best = jnp.argmax(row_vals).astype(jnp.int32)
        s = row_vals[j_best]
        better = s > best_score
        end_j = jnp.where(better, j_best, end_j)
        end_i = jnp.where(better, n_act, end_i)
        best_score = jnp.maximum(best_score, s)

    if config.free_end_s1:
        is_ = jnp.arange(1, n_pad + 1, dtype=jnp.int32)
        col_vals = jnp.where(is_ <= n_act, lastcol, NEG)
        col_vals = jnp.concatenate([h0[m_act][None], col_vals])  # i=0 row
        i_best = jnp.argmax(col_vals).astype(jnp.int32)
        s = col_vals[i_best]
        better = s > best_score
        end_i = jnp.where(better, i_best, end_i)
        end_j = jnp.where(better, m_act, end_j)
        best_score = jnp.maximum(best_score, s)

    return best_score, end_i, end_j, moves


@functools.partial(jax.jit, static_argnames=('scoring', 'config', 'need_moves'))
def align_batch_device(q_batch, q_lens, r_batch, r_lens,
                       scoring: Scoring, config: AlignConfig,
                       need_moves: bool, lower_diags=None, upper_diags=None):
    """vmapped batched DP. q_batch:(B,n) int8, r_batch:(B,m) int8."""
    if lower_diags is None:
        lower_diags = jnp.full(q_batch.shape[0], -NEG_BAND, jnp.int32)
    if upper_diags is None:
        upper_diags = jnp.full(q_batch.shape[0], NEG_BAND, jnp.int32)
    fn = functools.partial(_align_single, scoring=scoring, config=config,
                           need_moves=need_moves)
    return jax.vmap(fn)(q_batch, r_batch, q_lens, r_lens, lower_diags,
                        upper_diags)


# ---------------------------------------------------------------------------
# Host-side traceback decode
# ---------------------------------------------------------------------------

_OP_CHARS = np.array(['M', 'I', 'D'])


class RunCigar(object):
    """A CIGAR held as numpy run arrays, duck-compatible with the
    [(count, op)] tuple-list representation used across the package.
    Avoids materialising tens of thousands of Python tuples per
    alignment on the hot decode path; consumers that iterate see
    identical (int, str) pairs, and numpy-aware consumers read
    .counts / .op_codes directly (0=M, 1=I, 2=D)."""
    __slots__ = ('counts', 'op_codes', '_tuples')

    def __init__(self, counts, op_codes):
        self.counts = np.asarray(counts, np.int64)
        self.op_codes = np.asarray(op_codes, np.int8)
        self._tuples = None

    def _as_tuples(self):
        if self._tuples is None:
            ops = _OP_CHARS[self.op_codes]
            self._tuples = list(zip(self.counts.tolist(), ops.tolist()))
        return self._tuples

    def __len__(self):
        return len(self.counts)

    def __bool__(self):
        return len(self.counts) > 0

    def __iter__(self):
        return iter(self._as_tuples())

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return self._as_tuples()[idx]
        return (int(self.counts[idx]), str(_OP_CHARS[self.op_codes[idx]]))

    def __eq__(self, other):
        if isinstance(other, RunCigar):
            return (np.array_equal(self.counts, other.counts)
                    and np.array_equal(self.op_codes, other.op_codes))
        return self._as_tuples() == other

    def __repr__(self):
        return 'RunCigar(%r)' % (self._as_tuples(),)


class PairAlignment(NamedTuple):
    """Result of one pairwise alignment in local (s1, s2) coordinates."""
    score: int
    s1_start: int
    s1_end: int
    s2_start: int
    s2_end: int
    cigar: list            # [(count, op)] with op in 'MID', excl. clips
    s1_len: int
    s2_len: int

    def cigar_str_with_clips(self):
        """CIGAR with S-clips for unaligned s1 ends (read-style SAM CIGAR)."""
        parts = []
        if self.s1_start > 0:
            parts.append(str(self.s1_start) + 'S')
        parts.extend(str(c) + op for c, op in self.cigar)
        end_clip = self.s1_len - self.s1_end
        if end_clip > 0:
            parts.append(str(end_clip) + 'S')
        return ''.join(parts)


def decode_traceback(moves: np.ndarray, end_i: int, end_j: int,
                     config: AlignConfig):
    """Walk the packed move matrix from (end_i, end_j) back to a start cell.

    Returns (cigar_ops_reversed_fixed, start_i, start_j) where cigar is a
    list of (count, op) in forward order, ops M/I/D (I consumes s1,
    D consumes s2 — read/ref convention of ref alignment.py:176-206).
    Uses the native decoder when available.
    """
    from ..native import native_decode_full
    result = native_decode_full(moves, end_i, end_j,
                                config.free_start_s1, config.free_start_s2)
    if result is not None:
        return result
    i, j = int(end_i), int(end_j)
    ops = []           # appended in reverse order

    def emit(op, count=1):
        if ops and ops[-1][1] == op:
            ops[-1][0] += count
        else:
            ops.append([count, op])

    state = 'H'
    while True:
        if state == 'H':
            if i == 0 and j == 0:
                break
            if i == 0:
                if config.free_start_s2:
                    break
                emit('D', j)
                j = 0
                break
            if j == 0:
                if config.free_start_s1:
                    break
                emit('I', i)
                i = 0
                break
            b = int(moves[i - 1, j])
            src = b & 3
            if src == DIAG:
                emit('M')
                i -= 1
                j -= 1
            elif src == E_SRC:
                state = 'E'
            else:
                state = 'F'
        elif state == 'E':
            b = int(moves[i - 1, j])
            emit('D')
            j -= 1
            if not (b & E_EXT_BIT):
                state = 'H'
            if j == 0:
                state = 'H'
        else:  # state == 'F'
            b = int(moves[i - 1, j])
            emit('I')
            i -= 1
            if not (b & F_EXT_BIT):
                state = 'H'
            if i == 0:
                state = 'H'
    cigar = [(c, op) for c, op in reversed(ops)]
    return cigar, i, j


def align_pairs(q_list, r_list, scoring=DEFAULT_SCORING, config=SEMI_GLOBAL,
                need_cigar=True, band=None):
    """Convenience host API: align code-array pairs, return PairAlignments.

    All pairs are padded into one rectangular batch (callers should bucket
    by length for efficiency). When `band` is given, the DP is restricted
    to the SeqAn-style diagonal band expanded by the length difference
    (ref global_align.cpp:56-75): lower = -band - max(0, m-n),
    upper = band + max(0, n-m).
    """
    from .encode import pack_pairs
    if not q_list:
        return []
    q_batch, q_lens, r_batch, r_lens = pack_pairs(q_list, r_list)
    if band is not None:
        diffs = r_lens.astype(np.int64) - q_lens.astype(np.int64)
        lower = (-band - np.maximum(0, diffs)).astype(np.int32)
        upper = (band + np.maximum(0, -diffs)).astype(np.int32)
    else:
        lower = upper = None
    score, end_i, end_j, moves = align_batch_device(
        q_batch, q_lens, r_batch, r_lens, scoring, config, need_cigar,
        lower, upper)
    score = np.asarray(score)
    end_i = np.asarray(end_i)
    end_j = np.asarray(end_j)
    results = []
    if need_cigar:
        moves = np.asarray(moves)
    for b in range(len(q_list)):
        if need_cigar:
            cigar, si, sj = decode_traceback(moves[b], end_i[b], end_j[b],
                                             config)
        else:
            cigar, si, sj = [], 0, 0
        results.append(PairAlignment(
            score=int(score[b]), s1_start=si, s1_end=int(end_i[b]),
            s2_start=sj, s2_end=int(end_j[b]), cigar=cigar,
            s1_len=int(q_lens[b]), s2_len=int(r_lens[b])))
    return results
