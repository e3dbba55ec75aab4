"""Pallas TPU kernel for batched Myers HW-mode edit distance (recruitment).

The recruitment hot loop (reference rr.cpp:73-79 -> edlib
myersCalcEditDistanceSemiGlobal, edlib.cpp:526) reformulated as a single
fused TPU kernel: each grid program owns a tile of reads; the bit-state
(VP/VN as uint32 lanes) lives in VMEM scratch across a fori_loop over target
columns, so per-column state never round-trips through HBM (the main
overhead of the lax.scan formulation in ops/myers.py).

Per column:
- Eq is computed by 4 masked selects from per-base Peq rows (no gather).
- The multiword addition carry is a Kogge-Stone scan over the word lanes
  (log2(W) rounds of roll+mask), carries flowing from low to high words.
- The last-row score delta is read from the horizontal delta words at the
  query's top bit; a running min + argmin per read tracks the HW result.

Targets arrive transposed (L, B) so the per-column load is a major-dim
dynamic slice. Distance-only (the recruitment task); locations use
ops/myers.py. Exactness is tested against the scan kernel and the DP oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centroflye_tpu.ops.myers import build_peq, n_words

TILE_B = 128


def _shift_up(x, d, W):
    """Lanes shifted toward higher index by d (zero fill): out[i] = x[i-d]."""
    rolled = pltpu.roll(x, shift=d, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < d, jnp.uint32(0), rolled)


def _carry_add(a, b, W):
    """Multiword a + b over (TILE_B, W) uint32 lanes, Kogge-Stone carries."""
    s = a + b
    g = (s < a).astype(jnp.uint32)
    p = (s == jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
    c = _shift_up(g, 1, W)
    q = _shift_up(p, 1, W)
    d = 1
    while d < W:
        c = c | (q & _shift_up(c, d, W))
        q = q & _shift_up(q, d, W)
        d *= 2
    return s + c


def _make_kernel(m: int, W: int, L: int):
    hw_word = (m - 1) // 32
    hb = (m - 1) % 32

    def kernel(peq_ref, text_ref, lens_ref, dist_ref, end_ref,
               vp_ref, vn_ref, score_ref, best_ref, bestj_ref):
        vp_ref[:] = jnp.full((TILE_B, W), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:] = jnp.zeros((TILE_B, W), jnp.uint32)
        score_ref[:] = jnp.full((TILE_B, 1), m, jnp.int32)
        best_ref[:] = jnp.full((TILE_B, 1), m, jnp.int32)
        bestj_ref[:] = jnp.full((TILE_B, 1), -1, jnp.int32)

        p0 = peq_ref[0, :]
        p1 = peq_ref[1, :]
        p2 = peq_ref[2, :]
        p3 = peq_ref[3, :]
        lens = lens_ref[:]                         # (TILE_B, 1)

        def body(j8, _):
            # Mosaic requires sublane-aligned dynamic indexing: load 8
            # target columns at once, then unroll over them statically
            base = pl.multiple_of(j8 * 8, 8)
            chunk = text_ref[pl.ds(base, 8), :].astype(jnp.int32)
            for t in range(8):
                j = base + t
                chars = chunk[t, :].reshape(TILE_B, 1)
                eq = jnp.where(chars == 0, p0[None, :], jnp.uint32(0)) | \
                    jnp.where(chars == 1, p1[None, :], jnp.uint32(0)) | \
                    jnp.where(chars == 2, p2[None, :], jnp.uint32(0)) | \
                    jnp.where(chars == 3, p3[None, :], jnp.uint32(0))
                vp = vp_ref[:]
                vn = vn_ref[:]
                d0 = (_carry_add(eq & vp, vp, W) ^ vp) | eq | vn
                hp = vn | ~(d0 | vp)
                hn = vp & d0
                hp_w = hp[:, hw_word].reshape(TILE_B, 1)
                hn_w = hn[:, hw_word].reshape(TILE_B, 1)
                inc = ((hp_w >> jnp.uint32(hb)) & 1).astype(jnp.int32) - \
                    ((hn_w >> jnp.uint32(hb)) & 1).astype(jnp.int32)
                # bit-shift left by 1 across word lanes: bit 31 of word w-1
                # becomes bit 0 of word w (HW mode shifts a 0 into lane 0)
                hp_s = (hp << jnp.uint32(1)) | \
                    (_shift_up(hp, 1, W) >> jnp.uint32(31))
                hn_s = (hn << jnp.uint32(1)) | \
                    (_shift_up(hn, 1, W) >> jnp.uint32(31))
                vp_new = hn_s | ~(d0 | hp_s)
                vn_new = hp_s & d0

                active = (j < lens)                # (TILE_B, 1)
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
def myers_hw_pallas(peq: jnp.ndarray, text_t: jnp.ndarray,
                    lens: jnp.ndarray, *, m: int,
                    interpret: bool | None = None):
    """HW-mode batched distances via the Pallas kernel.

    Args:
      peq: (5, W) uint32 query table (build_peq).
      text_t: (L, B) int8 TRANSPOSED target codes (B multiple of TILE_B).
      lens: (B, 1) int32 target lengths.
      m: query length.

    Returns:
      dict(dist=(B,), end=(B,)) — identical semantics to
      ops.myers.myers_distance_batch(..., mode="HW").
    """
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
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    dist, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_B, W), jnp.uint32),
            pltpu.VMEM((TILE_B, W), jnp.uint32),
            pltpu.VMEM((TILE_B, 1), jnp.int32),
            pltpu.VMEM((TILE_B, 1), jnp.int32),
            pltpu.VMEM((TILE_B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(peq, text_t, lens)
    return {"dist": dist[:, 0], "end": end[:, 0]}


def recruit_distances_pallas(peq_fwd, peq_rc, codes, lens, *, m: int):
    """Two-strand recruitment distances with the fastest Pallas kernel
    (the fused two-strand chunked-carry v3 — one pass shares text loads,
    masks and loop overhead between strands); codes is the standard
    (B, L) batch (transposed + row-padded internally)."""
    from centroflye_tpu.ops.myers_pallas_v3 import (
        myers_hw_pallas_v3_2strand)
    codes = np.asarray(codes)
    lens = np.asarray(lens)
    B, L = codes.shape
    pad = (-B) % TILE_B
    if pad:
        codes = np.concatenate(
            [codes, np.full((pad, L), 4, np.int8)], axis=0)
        lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
    text_t = jnp.asarray(codes).T
    lens2 = jnp.asarray(lens).reshape(-1, 1).astype(jnp.int32)
    out = myers_hw_pallas_v3_2strand(
        jnp.asarray(peq_fwd), jnp.asarray(peq_rc), text_t, lens2, m=m)
    return out["dist_f"][:B], out["dist_r"][:B]
