"""Fused NTM addressing + memory-update Pallas TPU kernel.

One `pallas_call` computes, entirely in VMEM, everything the NTM cell does
after the head-parameter matmul (ntm_cell.py:133-215):

    k-tanh -> cosine similarity -> softplus(beta) softmax
    -> interpolation gate -> circular shift (reference's asymmetric Py2
    offsets) -> pow(softplus(gamma)+1) sharpening with the +1e-3 normalizer
    -> erase/add memory update -> read (before or after the write)

MEASURED (v5e, 65-step scan): this single-step kernel is SLOWER than the
XLA-fused jnp path (B=1: 2.21ms vs 1.69ms; B=256: 5.19ms vs 3.23ms) — XLA
already fuses the elementwise chain well, and the kernel pays boundary
transposes plus batch-grid serialization. It therefore stays OFF by default
(NTMConfig.use_pallas=False). The full-sequence kernel
(ops/pallas/scan_cell.py) implements the same addressing math in its own
[B,H,N]-vectorized layout (the code is NOT shared — the two layouts are
each pinned to the jnp oracle by tests and the hardware check, so a
contract change must be made in ops/memory.py, models/ntm_cell.py AND both
kernels); keeping weights and state VMEM-resident across all 65 steps is
where the fused win actually is.

Layout strategy (TPU tiles the LAST TWO dims; lanes = last dim wants 128):
  * mem_size N=128 lives on the lane axis everywhere.
  * memory is processed as [B, D, N] (mem_dim on sublanes) — the caller
    passes M_prev already transposed; reductions over D become short
    unrolled loops (D=20) of VPU FMAs, so no 4D temporaries and no
    20->128 lane padding ever materializes.
  * per-head scalars (beta/g/gamma) ride in as [B, H].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntm_tracker_tpu.ops.memory import circular_convolution_shifts


def _kernel(
    k_ref,      # [B, H, D]   raw (pre-tanh) keys
    beta_ref,   # [B, H]      raw beta
    g_ref,      # [B, H]      raw gate
    sw_ref,     # [B, H, S]   raw shift weights
    gamma_ref,  # [B, H]      raw gamma
    erase_ref,  # [B, W, D]   raw erase
    add_ref,    # [B, W, D]   raw add
    Mt_ref,     # [B, D, N]   previous memory, mem_dim-major
    w_ref,      # [B, H, N]   previous weights
    Mt_out,     # [B, D, N]
    w_out,      # [B, H, N]
    read_out,   # [B, R, D]
    *,
    read_heads: int,
    write_first: bool,
    shifts: Tuple[int, ...],
    slotwise: bool,
):
    B, H, D = k_ref.shape
    N = Mt_ref.shape[2]
    W = erase_ref.shape[1]
    R = read_heads
    f32 = jnp.float32

    Mt = Mt_ref[:]                                   # [B,D,N]
    k = jnp.tanh(k_ref[:])                           # [B,H,D]

    # --- similarity (TF l2_normalize, 1e-12 floor) ----------------------
    # slotwise=False reproduces the reference quirk: each mem_dim row of the
    # memory is normalized ACROSS slots (ops.py:147-150)
    k_inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, axis=2), 1e-12))  # [B,H]
    if slotwise:
        m_sq = jnp.sum(Mt * Mt, axis=1)              # [B,N]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_sq, 1e-12))
        Mtn = Mt * m_inv[:, None, :]
    else:
        m_sq = jnp.sum(Mt * Mt, axis=2)              # [B,D]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_sq, 1e-12))
        Mtn = Mt * m_inv[:, :, None]
    sim = jnp.zeros((B, H, N), f32)
    for d in range(D):
        sim = sim + k[:, :, d][:, :, None] * Mtn[:, d, :][:, None, :]
    sim = sim * k_inv[:, :, None]

    # --- content focus + interpolation + shift + sharpen ----------------
    beta = jax.nn.softplus(beta_ref[:])[..., None]
    w_c = jax.nn.softmax(sim * beta, axis=-1)
    g = jax.nn.sigmoid(g_ref[:])[..., None]
    w_g = w_c * g + w_ref[:] * (1.0 - g)

    sw = jax.nn.softmax(sw_ref[:], axis=-1)          # [B,H,S]
    w_conv = jnp.zeros_like(w_g)
    for j, s in enumerate(shifts):
        # pltpu.roll requires a non-negative shift; (-s) % N is equivalent
        w_conv = w_conv + sw[..., j : j + 1] * pltpu.roll(w_g, (-s) % N, axis=2)

    gamma = (jax.nn.softplus(gamma_ref[:]) + 1.0)[..., None]
    powed = jnp.power(w_conv, gamma)
    w = powed / (jnp.sum(powed, axis=2, keepdims=True) + 1e-3)
    w_out[:] = w

    # --- erase/add update -------------------------------------------------
    erase = jax.nn.sigmoid(erase_ref[:])             # [B,W,D]
    add = jnp.tanh(add_ref[:])                       # [B,W,D]
    w_write = w[:, R:, :]                            # [B,W,N]

    # new Mt[b,d,:] = Mt[b,d,:] * prod_w(1 - w_write[b,w,:] e[b,w,d])
    #                + sum_w w_write[b,w,:] a[b,w,d]
    new_rows = []
    for d in range(D):
        er = jnp.ones((B, N), f32)
        ad = jnp.zeros((B, N), f32)
        for wh in range(W):
            ww = w_write[:, wh, :]                   # [B,N]
            er = er * (1.0 - ww * erase[:, wh, d][:, None])
            ad = ad + ww * add[:, wh, d][:, None]
        new_rows.append(Mt[:, d, :] * er + ad)
    M_new = jnp.stack(new_rows, axis=1)              # [B,D,N]
    Mt_out[:] = M_new

    # --- read --------------------------------------------------------------
    src = M_new if write_first else Mt               # [B,D,N]
    w_read = w[:, :R, :]                             # [B,R,N]
    # read[b,r,d] = sum_n w_read[b,r,n] * src[b,d,n]
    cols = []
    for d in range(D):
        cols.append(jnp.sum(w_read * src[:, d, :][:, None, :], axis=2))  # [B,R]
    read_out[:] = jnp.stack(cols, axis=2)            # [B,R,D]


def _jnp_addressing(
    k_raw, beta, g, sw, gamma, erase, add, M_prev, w_prev,
    *, read_heads, write_first, slotwise,
):
    """The reference jnp math (ntm_cell.py:133-215) — used as the BACKWARD
    of the fused kernel (pallas_call has no autodiff rule) and numerically
    identical to its forward."""
    from ntm_tracker_tpu.ops.memory import (
        batched_circular_convolution,
        batched_slotwise_cosine_similarity,
        batched_smooth_cosine_similarity,
        sharpen,
    )

    R = read_heads
    k = jnp.tanh(k_raw)
    cos = (
        batched_slotwise_cosine_similarity if slotwise
        else batched_smooth_cosine_similarity
    )
    sim = cos(M_prev, k)
    w_c = jax.nn.softmax(sim * jax.nn.softplus(beta)[..., None], -1)
    g_s = jax.nn.sigmoid(g)[..., None]
    w_g = w_c * g_s + w_prev * (1 - g_s)
    sw_s = jax.nn.softmax(sw, -1)
    w = sharpen(
        batched_circular_convolution(w_g, sw_s),
        (jax.nn.softplus(gamma) + 1.0)[..., None],
    )
    e = jax.nn.sigmoid(erase)
    a = jnp.tanh(add)
    w_write = w[:, R:, :]
    M_erase = jnp.prod(1 - w_write[..., None] * e[:, :, None, :], axis=1)
    M_write = jnp.sum(w_write[..., None] * a[:, :, None, :], axis=1)
    M = M_prev * M_erase + M_write
    src = M if write_first else M_prev
    read = jnp.einsum("brn,bnd->brd", w[:, :R, :], src)
    return M, w, read


@functools.lru_cache(maxsize=None)
def _vjp_wrapped(read_heads: int, write_first: bool, slotwise: bool, interpret: bool):
    """custom_vjp closure per static config: Pallas forward, jnp backward.
    Makes NTMConfig.use_pallas usable under jax.grad (the backward
    recomputes through the reference jnp math, which matches the kernel's
    forward to ~2e-6)."""

    def forward(*args):
        return _pallas_forward(
            *args, read_heads=read_heads, write_first=write_first,
            slotwise=slotwise, interpret=interpret,
        )

    f = jax.custom_vjp(forward)

    def fwd(*args):
        return forward(*args), args

    def bwd(residuals, cotangents):
        _, vjp = jax.vjp(
            lambda *a: _jnp_addressing(
                *a, read_heads=read_heads, write_first=write_first,
                slotwise=slotwise,
            ),
            *residuals,
        )
        return vjp(cotangents)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(
    jax.jit, static_argnames=("read_heads", "write_first", "slotwise", "interpret")
)
def fused_ntm_addressing(
    k: jax.Array,
    beta: jax.Array,
    g: jax.Array,
    sw: jax.Array,
    gamma: jax.Array,
    erase: jax.Array,
    add: jax.Array,
    M_prev: jax.Array,
    w_prev: jax.Array,
    *,
    read_heads: int,
    write_first: bool = False,
    slotwise: bool = False,
    interpret: bool = False,
):
    """Fused replacement for ntm_cell.py:133-215 with a jnp-math custom VJP.
    See _pallas_forward for the kernel itself."""
    return _vjp_wrapped(read_heads, write_first, slotwise, interpret)(
        k, beta, g, sw, gamma, erase, add, M_prev, w_prev
    )


def _pallas_forward(
    k: jax.Array,
    beta: jax.Array,
    g: jax.Array,
    sw: jax.Array,
    gamma: jax.Array,
    erase: jax.Array,
    add: jax.Array,
    M_prev: jax.Array,
    w_prev: jax.Array,
    *,
    read_heads: int,
    write_first: bool = False,
    slotwise: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused replacement for ntm_cell.py:133-215. Returns (M, w, read).

    All head params are RAW (pre-activation) — activations happen inside the
    kernel. Shapes: k [B,H,D], beta/g/gamma [B,H], sw [B,H,S],
    erase/add [B,W,D], M_prev [B,N,D] (standard layout), w_prev [B,H,N].
    The [B,D,N] transposes at the boundary are XLA copies, still far
    cheaper than the ~20 dispatches they replace."""
    B, H, D = k.shape
    N = M_prev.shape[1]
    R = read_heads
    shifts = tuple(circular_convolution_shifts(sw.shape[-1]))

    kern = functools.partial(
        _kernel, read_heads=R, write_first=write_first, shifts=shifts,
        slotwise=slotwise,
    )

    # batch-block the grid so VMEM stays bounded (each block holds the full
    # chain's temporaries; 64 batch rows ~ 8 MB)
    bb = B
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if B % cand == 0:
            bb = cand
            break
    grid = (B // bb,)

    def bspec(*shape):
        return pl.BlockSpec(
            (bb,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    S = sw.shape[-1]
    W = erase.shape[1]
    Mt, w, read = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, D, N), jnp.float32),
            jax.ShapeDtypeStruct((B, H, N), jnp.float32),
            jax.ShapeDtypeStruct((B, R, D), jnp.float32),
        ),
        in_specs=[
            bspec(H, D), bspec(H), bspec(H), bspec(H, S), bspec(H),
            bspec(W, D), bspec(W, D), bspec(D, N), bspec(H, N),
        ],
        out_specs=(bspec(D, N), bspec(H, N), bspec(R, D)),
        interpret=interpret,
    )(
        k.astype(jnp.float32),
        beta.astype(jnp.float32),
        g.astype(jnp.float32),
        sw.astype(jnp.float32),
        gamma.astype(jnp.float32),
        erase.astype(jnp.float32),
        add.astype(jnp.float32),
        jnp.swapaxes(M_prev.astype(jnp.float32), 1, 2),
        w_prev.astype(jnp.float32),
    )
    return jnp.swapaxes(Mt, 1, 2), w, read
