"""Pallas Myers kernel, transposed layout experiment.

Same math as ops/myers_pallas.py but the bit-state lives as (W, TILE_B) —
words on the sublane axis, reads on the lane axis. For uint32 a vreg is
(8, 128): with W=64 words and 128 reads this packs 8 full vregs per state
array instead of 16 half-used ones in the (reads, words) layout, halving
the VPU instruction count per column; word-shifts become sublane rolls.
The faster of the two kernels is selected by benchmark (bench.py reports
the engine path actually used).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centroflye_tpu.ops.myers import n_words

TILE_B = 128


def _shift_up_rows(x, d, W):
    """Sublanes shifted toward higher index by d (zero fill)."""
    rolled = pltpu.roll(x, shift=d, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    return jnp.where(row < d, jnp.uint32(0), rolled)


def _carry_add_rows(a, b, W):
    s = a + b
    g = (s < a).astype(jnp.uint32)
    p = (s == jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
    c = _shift_up_rows(g, 1, W)
    q = _shift_up_rows(p, 1, W)
    d = 1
    while d < W:
        c = c | (q & _shift_up_rows(c, d, W))
        q = q & _shift_up_rows(q, d, W)
        d *= 2
    return s + c


def _make_kernel(m: int, W: int, L: int):
    hw_word = (m - 1) // 32
    hb = (m - 1) % 32

    def kernel(peq_ref, text_ref, lens_ref, dist_ref, end_ref,
               vp_ref, vn_ref, score_ref, best_ref, bestj_ref):
        vp_ref[:] = jnp.full((W, TILE_B), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:] = jnp.zeros((W, TILE_B), jnp.uint32)
        score_ref[:] = jnp.full((1, TILE_B), m, jnp.int32)
        best_ref[:] = jnp.full((1, TILE_B), m, jnp.int32)
        bestj_ref[:] = jnp.full((1, TILE_B), -1, jnp.int32)

        # peq rows as (W, 1) columns for lane-broadcast against chars
        p0 = peq_ref[0, :].reshape(W, 1)
        p1 = peq_ref[1, :].reshape(W, 1)
        p2 = peq_ref[2, :].reshape(W, 1)
        p3 = peq_ref[3, :].reshape(W, 1)
        lens = lens_ref[:]                          # (1, TILE_B)

        def body(j8, _):
            base = pl.multiple_of(j8 * 8, 8)
            chunk = text_ref[pl.ds(base, 8), :].astype(jnp.int32)
            for t in range(8):
                j = base + t
                chars = chunk[t, :].reshape(1, TILE_B)
                eq = jnp.where(chars == 0, p0, jnp.uint32(0)) | \
                    jnp.where(chars == 1, p1, jnp.uint32(0)) | \
                    jnp.where(chars == 2, p2, jnp.uint32(0)) | \
                    jnp.where(chars == 3, p3, jnp.uint32(0))
                vp = vp_ref[:]
                vn = vn_ref[:]
                d0 = (_carry_add_rows(eq & vp, vp, W) ^ vp) | eq | vn
                hp = vn | ~(d0 | vp)
                hn = vp & d0
                hp_w = hp[hw_word, :].reshape(1, TILE_B)
                hn_w = hn[hw_word, :].reshape(1, TILE_B)
                inc = ((hp_w >> jnp.uint32(hb)) & 1).astype(jnp.int32) - \
                    ((hn_w >> jnp.uint32(hb)) & 1).astype(jnp.int32)
                hp_s = (hp << jnp.uint32(1)) | \
                    (_shift_up_rows(hp, 1, W) >> jnp.uint32(31))
                hn_s = (hn << jnp.uint32(1)) | \
                    (_shift_up_rows(hn, 1, W) >> jnp.uint32(31))
                vp_new = hn_s | ~(d0 | hp_s)
                vn_new = hp_s & d0

                active = (j < lens)                 # (1, TILE_B)
                vp_ref[:] = jnp.where(active, vp_new, vp)
                vn_ref[:] = jnp.where(active, vn_new, vn)
                score = jnp.where(active, score_ref[:] + inc, score_ref[:])
                score_ref[:] = score
                improved = active & (score < best_ref[:])
                best_ref[:] = jnp.where(improved, score, best_ref[:])
                bestj_ref[:] = jnp.where(improved, j, bestj_ref[:])
            return 0

        jax.lax.fori_loop(0, L // 8, body, 0)
        dist_ref[:] = best_ref[:]
        end_ref[:] = bestj_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def myers_hw_pallas_v2(peq: jnp.ndarray, text_t: jnp.ndarray,
                       lens: jnp.ndarray, *, m: int,
                       interpret: bool | None = None):
    """Same contract as myers_hw_pallas but lens is (1, B) and outputs are
    (1, B) row vectors internally."""
    L, B = text_t.shape
    assert B % TILE_B == 0
    if L % 8:
        pad = 8 - L % 8
        text_t = jnp.concatenate(
            [text_t, jnp.full((pad, B), 4, jnp.int8)], axis=0)
        L += pad
    W = n_words(m)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kernel = _make_kernel(m, W, L)
    grid = (B // TILE_B,)
    out_shape = (
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    )
    dist, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((W, TILE_B), jnp.uint32),
            pltpu.VMEM((W, TILE_B), jnp.uint32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
        ],
        interpret=interpret,
    )(peq, text_t, lens.reshape(1, B))
    return {"dist": dist[0], "end": end[0]}
