"""On-device traceback over the packed move planes.

Host-side traceback requires shipping the full move matrix (128 B per
alignment row at W=256) over the device->host link — the dominant cost of
the aligner on tunnelled setups (PERF.md). This kernel walks the
traceback ON DEVICE, chained after the forward DP inside one jit, and
emits one int32 PATH RECORD PER ROW:

    record = (d_count << 3) | move_bits
      move_bits: 1 = an M step entered this row, 2 = an I step entered
      d_count:   number of D (horizontal) moves taken on this row

plus the walk's final (i, j, stop_code). The host reconstructs the exact
CIGAR from 4 bytes/row (32x less transfer) with a vectorised numpy pass.

Mosaic-shaped design:
  * grid (B, n_chunks) with chunks iterated in REVERSE row order via the
    index map; walk state (i, j, dp-state, done) lives in SMEM scratch
    and flows across grid steps.
  * cell reads: dynamic-sublane row load of the (T, W/8) moves block +
    masked-sum word extract (dynamic lane indexing is not allowed).
  * per-row records store at a dynamic sublane of a (T, 1) output block.

Stop codes: 0 = walked to row 0 (host applies the row-0 boundary rules),
1 = stopped at column 0 in H state, 2 = band escape (corrupt path — the
caller falls back to the moves-fetch path for that task).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import AlignConfig

# dp-state encoding inside the kernel
_H, _E, _F = 0, 1, 2


def _make_traceback_kernel(T, W, n_chunks):
    w8 = W // 8

    def kernel(moves_ref, crow_ref, endi_ref, endj_ref,
               rec_ref, fin_ref, st_scr):
        chunk_rev = pl.program_id(1)
        chunk = n_chunks - 1 - chunk_rev
        chunk_lo = chunk * T

        b = pl.program_id(0)

        @pl.when(chunk_rev == 0)
        def _init():
            st_scr[0] = endi_ref[b]           # i
            st_scr[1] = endj_ref[b]           # j
            st_scr[2] = _H                    # dp state
            st_scr[3] = -1                    # done code (-1 = walking)

        rec_ref[0, :, :] = jnp.zeros((T, 1), jnp.int32)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, w8), 1)

        def read_cell(i, j):
            """(cell_bits, lane) of DP cell (i, j); row i is in chunk."""
            t = i - 1 - chunk_lo
            row = moves_ref[0, pl.ds(t, 1), :]            # (1, w8)
            c_i = crow_ref[0, pl.ds(t, 1), :][0, 0]
            lane = j - c_i
            word_idx = jnp.remainder(lane, w8)
            word = jnp.sum(jnp.where(lane_iota == word_idx, row, 0))
            nibble = jnp.clip(lane // w8, 0, 7)
            return (word >> (4 * nibble)) & 0xF, lane

        def add_rec(i, value):
            t = i - 1 - chunk_lo
            old = rec_ref[0, pl.ds(t, 1), :]
            rec_ref[0, pl.ds(t, 1), :] = old + value

        def cond(state):
            i, j, s, done = state
            return (done == -1) & (i > chunk_lo)

        def body(state):
            i, j, s, done = state
            # H-state terminal: column 0 (row-0 terminal is the loop
            # exit with i == 0, handled by the host).
            col0_stop = (s == _H) & (j == 0)

            cell, lane = read_cell(i, j)
            band_escape = (lane < 0) | (lane >= W)

            hsrc = cell & 3
            # action for this iteration: 0 = M, 1 = D, 2 = I
            act = jnp.where(s == _E, 1,
                            jnp.where(s == _F, 2, hsrc))

            is_m = act == 0
            is_d = act == 1
            is_i = act == 2

            # per-row record update
            add_rec(i, jnp.where(is_m, 1,
                                 jnp.where(is_i, 2, 8)).astype(jnp.int32))

            new_i = jnp.where(is_m | is_i, i - 1, i)
            new_j = jnp.where(is_m | is_d, j - 1, j)
            e_ext = ((cell >> 2) & 1) == 1
            f_ext = ((cell >> 3) & 1) == 1
            new_s = jnp.where(is_d & e_ext & (new_j > 0), _E,
                              jnp.where(is_i & f_ext & (new_i > 0), _F,
                                        _H))
            new_done = jnp.where(col0_stop, 1,
                                 jnp.where(band_escape, 2, -1))
            # on a stop, keep the pre-move position
            new_i = jnp.where(new_done == -1, new_i, i)
            new_j = jnp.where(new_done == -1, new_j, j)
            new_s = jnp.where(new_done == -1, new_s, s)
            return (new_i, new_j, new_s, new_done)

        i1, j1, s1, d1 = jax.lax.while_loop(
            cond, body, (st_scr[0], st_scr[1], st_scr[2], st_scr[3]))
        st_scr[0] = i1
        st_scr[1] = j1
        st_scr[2] = s1
        st_scr[3] = d1

        # publish final state every chunk (the last write wins; once done
        # is set the while_loop no longer mutates it)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        final_done = jnp.where(d1 == -1, 0, d1)   # -1 -> walked to row 0
        fin = jnp.where(lane128 == 0, i1,
                        jnp.where(lane128 == 1, j1,
                                  jnp.where(lane128 == 2, final_done, 0)))
        fin_ref[0, :, :] = fin

    return kernel


@functools.partial(jax.jit, static_argnames=('W',))
def traceback_device(moves, crow, end_i, end_j, W):
    """Run the traceback kernel. moves: (B, n_pad, W/8) int32 (device).
    crow: (B, n_pad) int32 band offsets per DP row (c[1:]).
    Returns (records (B, n_pad) int32, final (B, 3) int32 = i, j, code)."""
    B, n_pad, w8 = moves.shape
    T = min(n_pad, 512)
    n_chunks = n_pad // T
    kernel = _make_traceback_kernel(T, W, n_chunks)
    rec, fin = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, T, w8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # endi: full (B,) array
            pl.BlockSpec(memory_space=pltpu.SMEM),   # endj: full (B,) array
        ],
        out_specs=[
            pl.BlockSpec((1, T, 1),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, ch: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
    )(moves, crow[:, :, None], end_i.astype(jnp.int32),
      end_j.astype(jnp.int32))
    return rec[:, :, 0], fin[:, 0, :3]


def records_to_cigar(records, end_i, final_i, final_j, stop_code,
                     config: AlignConfig):
    """Rebuild (cigar, start_i, start_j) from per-row path records —
    vectorised numpy, no per-cell work.

    Forward order: [terminal prefix ops] then, for each visited row
    ascending, the M/I step that entered the row followed by its D run.
    """
    end_i = int(end_i)
    final_i = int(final_i)
    final_j = int(final_j)
    stop_code = int(stop_code)
    if stop_code == 2:
        return None                       # band escape: caller falls back

    prefix_counts = []
    prefix_types = []
    if stop_code == 0 and final_i == 0:
        # walked to row 0
        if config.free_start_s2 or final_j == 0:
            start_i, start_j = 0, final_j
        else:
            prefix_counts.append(final_j)
            prefix_types.append(2)
            start_i, start_j = 0, 0
    elif stop_code == 1:
        # stopped at column 0 in H state
        if config.free_start_s1:
            start_i, start_j = final_i, 0
        else:
            prefix_counts.append(final_i)
            prefix_types.append(1)
            start_i, start_j = 0, 0
    else:
        start_i, start_j = final_i, final_j
    # D moves taken on the stop row itself (its record has no move bits)
    if final_i >= 1:
        d_stop = int(records[final_i - 1]) >> 3
        if d_stop:
            prefix_counts.append(d_stop)
            prefix_types.append(2)

    first_row = final_i + 1               # rows visited: first_row..end_i
    if first_row > end_i:
        rows = np.zeros(0, np.int32)
    else:
        rows = records[first_row - 1:end_i]

    moves = rows & 7
    d_counts = rows >> 3
    # interleave per row: move op then D run
    n = len(rows)
    op_types = np.empty(2 * n + len(prefix_types), np.int8)  # 0 M, 1 I, 2 D
    op_counts = np.empty(2 * n + len(prefix_types), np.int64)
    np_ = len(prefix_types)
    op_types[:np_] = prefix_types
    op_counts[:np_] = prefix_counts
    op_types[np_::2] = np.where(moves == 1, 0, 1)
    op_counts[np_::2] = 1
    op_types[np_ + 1::2] = 2
    op_counts[np_ + 1::2] = d_counts
    keep = op_counts > 0
    # drop move slots for rows with no move bits (shouldn't happen on a
    # valid path, but row records of value 0 would otherwise emit junk)
    keep[np_::2] &= moves != 0
    op_types = op_types[keep]
    op_counts = op_counts[keep]
    if len(op_types):
        boundaries = np.nonzero(np.concatenate(
            [[True], op_types[1:] != op_types[:-1]]))[0]
        merged_counts = np.add.reduceat(op_counts, boundaries)
        merged_types = op_types[boundaries]
    else:
        merged_counts = np.zeros(0, np.int64)
        merged_types = np.zeros(0, np.int8)
    from .pairwise import RunCigar
    return RunCigar(merged_counts, merged_types), start_i, start_j
