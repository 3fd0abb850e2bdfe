"""Pallas TPU kernel: fused window-fetch + banded glocal DP extension.

The XLA path materializes candidate windows with a big elementwise gather
(slow on TPU) and then scans the DP.  This kernel instead:

  1. DMAs, per candidate, an aligned 2048-byte text segment HBM->VMEM
     (1-D HBM slices must be 1024-aligned in both offset and shape);
  2. rotates each row so its window starts at lane 0 using a binary
     decomposition of the in-segment offset — 10 static lane-rolls with
     per-row arithmetic selects (Mosaic has no per-row dynamic slicing);
  3. precomputes the per-step match matrix with static band shifts;
  4. runs the packed-cell banded DP entirely in VMEM.

Packed-cell scheme and recurrence are identical to
pantax_tpu.align.aligner._banded_extend (score|matches|start in one int32;
max = lexicographic compare), which is also the correctness oracle in tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.aligner import packed_layout

NEG = -(10**6)
_SH_MATCH = 5
FETCH = 2048  # aligned bytes DMA'd per candidate (window + max offset 1024)


def _roll_rows_left(x, off_col, max_bits: int):
    """x[j, i] <- x[j, i + off[j]] via binary-decomposed static rolls."""
    cur = x.astype(jnp.int32)  # Mosaic rolls support only i16/i32 vectors
    size = x.shape[1]
    for t in range(max_bits):
        # left-rotate by 2^t == np.roll by (size - 2^t); pltpu.roll requires
        # a non-negative shift
        rolled = pltpu.roll(cur, size - (1 << t), axis=1)
        bit = (off_col >> t) & 1  # [NB, 1] int32
        cur = rolled * bit + cur * (1 - bit)
    return cur.astype(jnp.int8)


def _dp_kernel(
    # scalar prefetch
    base_ref,          # int32 [N] 1024-aligned fetch start per candidate
    # inputs
    text_ref,          # int8 [T] (ANY/HBM)
    off_ref,           # int32 [NB, 1] block: w0 - base, in [0, 1024)
    read_ref,          # int8 [NB, Lr] block in VMEM
    len_ref,           # int32 [NB, 1] block in VMEM
    # outputs
    cell_ref,          # int32 [NB] best packed cell
    bband_ref,         # int32 [NB] first-max band index
    # scratch
    win_ref,           # int8 [NB, FETCH] VMEM
    ok_ref,            # int8 [Lr, Wb, NB] VMEM per-step match matrix
    sems,              # DMA semaphores [SLOTS]
    *,
    NB: int,
    W: int,
    Lr: int,
    pad: int,
    match: int,
    mismatch: int,
    gap: int,
    sh_score: int,
    bias: int,
):
    blk = pl.program_id(0)
    Wb = 2 * pad  # band rows [-pad, pad-1], matching aligner._banded_extend
    SLOTS = 8

    def get_dma(j):
        start = pl.multiple_of(base_ref[blk * NB + j], 1024)
        # 1-D destination: row slices of a 2-D int8 scratch are not
        # tile-aligned, but flat offsets at FETCH granularity are
        return pltpu.make_async_copy(
            text_ref.at[pl.ds(start, FETCH)],
            win_ref.at[pl.ds(j * FETCH, FETCH)],
            sems.at[j % SLOTS],
        )

    def dma_start(j, _):
        @pl.when(j >= SLOTS)
        def _():
            get_dma(j - SLOTS).wait()
        get_dma(j).start()
        return 0

    jax.lax.fori_loop(0, NB, dma_start, 0)

    def dma_drain(j, _):
        get_dma(j).wait()
        return 0

    jax.lax.fori_loop(max(NB - SLOTS, 0), NB, dma_drain, 0)

    shifted = _roll_rows_left(
        win_ref[:].reshape(NB, FETCH), off_ref[:], max_bits=10
    )

    # Precompute the match matrix with STATIC band shifts: Mosaic cannot
    # dynamically slice the sublane dimension, but ok_ref's leading (untiled)
    # dimension indexes freely inside the DP loop.
    winT = shifted[:, :W].T    # [W, NB]
    readT = read_ref[:].T      # [Lr, NB]
    read_ok = (readT < 4).astype(jnp.int8)
    for b in range(Wb):
        row = winT[b : b + Lr]  # static slice
        ok_ref[:, b, :] = (
            (row == readT).astype(jnp.int8) * read_ok * (row < 4).astype(jnp.int8)
        )
    rlen = len_ref[:, 0][None, :]  # [1, NB]

    d_score = jnp.int32(1 << sh_score)
    gap_p = jnp.int32(gap) * d_score
    band = jax.lax.broadcasted_iota(jnp.int32, (Wb, NB), 0)
    decay = band * gap_p
    neg = jnp.int32(NEG)

    # arithmetic form (no i1 vectors — Mosaic relayout of 17-sublane bool
    # vectors is unsupported): mismatch*d + ok * ((match-mismatch)*d + 1<<5)
    ok_gain = jnp.int32((match - mismatch) * (1 << sh_score) + (1 << _SH_MATCH))
    mis_base = jnp.int32(mismatch) * d_score

    def sub_packed(i):
        ok = ok_ref[i].astype(jnp.int32)  # [Wb, NB] 0/1
        return mis_base + ok * ok_gain

    init_cell = (jnp.int32(bias) << sh_score) + band
    state0 = init_cell + sub_packed(0)
    out0 = jnp.where(rlen == 1, state0, neg)

    def step(i, carry):
        state, out = carry
        up = jnp.concatenate(
            [state[1:], jnp.full((1, NB), neg, jnp.int32)], axis=0
        )
        v = jnp.maximum(state + sub_packed(i), up + gap_p)
        u = v - decay
        for sh in (1, 2, 4, 8, 16):
            if sh >= Wb:
                break
            sh_arr = jnp.concatenate(
                [jnp.full((sh, NB), neg, jnp.int32), u[:-sh]], axis=0
            )
            u = jnp.maximum(u, sh_arr)
        v = u + decay
        live = i < rlen
        state = jnp.where(live, v, state)
        out = jnp.where(i == rlen - 1, state, out)
        return state, out

    _, out = jax.lax.fori_loop(1, Lr, step, (state0, out0))
    best = jnp.max(out, axis=0)
    cell_ref[:] = best
    # first band index achieving the max (int argmax unsupported in Mosaic)
    bband_ref[:] = jnp.min(
        jnp.where(out == best[None, :], band, jnp.int32(Wb)), axis=0
    )


@partial(
    jax.jit,
    static_argnames=("pad", "match", "mismatch", "gap", "block", "interpret"),
)
def banded_extend_pallas(
    text, w0, reads, read_len,
    pad: int, match: int, mismatch: int, gap: int,
    block: int = 512, interpret: bool = False,
):
    """Fused gather+DP: returns (score, start_off, end_off, matches) like
    aligner._banded_extend, with window = text[w0[i] : w0[i] + Lr + 2*pad].

    N (= len(w0)) must be a multiple of `block`; the text must carry >= FETCH
    trailing sentinel bytes (build_align_index pads them).
    """
    N, Lr = reads.shape
    W = Lr + 2 * pad
    assert W <= 1024, "window exceeds the aligned DMA fetch"
    w0 = w0.astype(jnp.int32)
    base = w0 & jnp.int32(~1023)
    off = w0 - base
    grid = N // block
    sh_score, bias = packed_layout(Lr)
    kernel = partial(
        _dp_kernel, NB=block, W=W, Lr=Lr, pad=pad,
        match=match, mismatch=mismatch, gap=gap,
        sh_score=sh_score, bias=bias,
    )
    cell, bband = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # text stays in HBM
                pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, Lr), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block,), lambda b, *_: (b,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block,), lambda b, *_: (b,),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((block * FETCH,), jnp.int8),
                pltpu.VMEM((Lr, 2 * pad, block), jnp.int8),
                pltpu.SemaphoreType.DMA((8,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ],
        interpret=interpret,
    )(base, text, off[:, None], reads, read_len.astype(jnp.int32)[:, None])

    score = (cell >> sh_score) - bias
    matches = (cell >> _SH_MATCH) & ((1 << (sh_score - _SH_MATCH)) - 1)
    start_off = cell & ((1 << _SH_MATCH) - 1)
    end_off = (read_len - 1) + bband + 1
    return score, start_off, end_off, matches


# ---------------------------------------------------------------------------
# DP-only variant: windows are an input (XLA row-gather extraction feeds it)
# ---------------------------------------------------------------------------
def _dp_only_kernel(
    win_ref,           # int8 [NB, W] block in VMEM
    read_ref,          # int8 [NB, Lr] block in VMEM
    len_ref,           # int32 [NB, 1] block in VMEM
    cell_ref,          # int32 [NB]
    bband_ref,         # int32 [NB]
    ok_ref,            # int8 [Lr, Wb, NB] scratch
    *,
    NB: int,
    W: int,
    Lr: int,
    pad: int,
    match: int,
    mismatch: int,
    gap: int,
    sh_score: int,
    bias: int,
):
    Wb = 2 * pad  # band rows [-pad, pad-1], matching aligner._banded_extend
    # int32 comparisons: v5e Mosaic rejects int8 vector compares here
    winT = win_ref[:].astype(jnp.int32).T    # [W, NB]
    readT = read_ref[:].astype(jnp.int32).T  # [Lr, NB]
    read_ok = (readT < 4).astype(jnp.int32)
    for b in range(Wb):
        row = winT[b : b + Lr]
        ok_ref[:, b, :] = (
            (row == readT).astype(jnp.int32) * read_ok * (row < 4).astype(jnp.int32)
        ).astype(jnp.int8)
    rlen = len_ref[:, 0][None, :]

    d_score = jnp.int32(1 << sh_score)
    gap_p = jnp.int32(gap) * d_score
    band = jax.lax.broadcasted_iota(jnp.int32, (Wb, NB), 0)
    decay = band * gap_p
    neg = jnp.int32(NEG)
    ok_gain = jnp.int32((match - mismatch) * (1 << sh_score) + (1 << _SH_MATCH))
    mis_base = jnp.int32(mismatch) * d_score

    def sub_packed(i):
        ok = ok_ref[i].astype(jnp.int32)
        return mis_base + ok * ok_gain

    init_cell = (jnp.int32(bias) << sh_score) + band
    state0 = init_cell + sub_packed(0)
    out0 = jnp.where(rlen == 1, state0, neg)

    def step(i, carry):
        state, out = carry
        up = jnp.concatenate(
            [state[1:], jnp.full((1, NB), neg, jnp.int32)], axis=0
        )
        v = jnp.maximum(state + sub_packed(i), up + gap_p)
        u = v - decay
        for sh in (1, 2, 4, 8, 16):
            if sh >= Wb:
                break
            sh_arr = jnp.concatenate(
                [jnp.full((sh, NB), neg, jnp.int32), u[:-sh]], axis=0
            )
            u = jnp.maximum(u, sh_arr)
        v = u + decay
        live = i < rlen
        state = jnp.where(live, v, state)
        out = jnp.where(i == rlen - 1, state, out)
        return state, out

    _, out = jax.lax.fori_loop(1, Lr, step, (state0, out0))
    best = jnp.max(out, axis=0)
    cell_ref[:] = best
    bband_ref[:] = jnp.min(
        jnp.where(out == best[None, :], band, jnp.int32(Wb)), axis=0
    )


@partial(
    jax.jit,
    static_argnames=("pad", "match", "mismatch", "gap", "block", "interpret"),
)
def banded_extend_pallas_dponly(
    windows, reads, read_len,
    pad: int, match: int, mismatch: int, gap: int,
    block: int = 1024, interpret: bool = False,
):
    """Pallas DP over pre-extracted windows [N, W]; same outputs as
    aligner._banded_extend."""
    N, Lr = reads.shape
    W = windows.shape[1]
    grid = N // block
    sh_score, bias = packed_layout(Lr)
    kernel = partial(
        _dp_only_kernel, NB=block, W=W, Lr=Lr, pad=pad,
        match=match, mismatch=mismatch, gap=gap,
        sh_score=sh_score, bias=bias,
    )
    cell, bband = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Lr), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block,), lambda b: (b,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lr, 2 * pad, block), jnp.int8),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(windows, reads, read_len.astype(jnp.int32)[:, None])

    score = (cell >> sh_score) - bias
    matches = (cell >> _SH_MATCH) & ((1 << (sh_score - _SH_MATCH)) - 1)
    start_off = cell & ((1 << _SH_MATCH) - 1)
    end_off = (read_len - 1) + bband + 1
    return score, start_off, end_off, matches
