"""Pallas Myers kernel, chunked-carry layout — THE production kernel
(earlier whole-axis-roll generations were measured slower and archived;
see git history for ops/myers_pallas.py / ops/myers_pallas_v2.py).

State is (W, TILE_B) uint32, words on sublanes, reads on lanes; the
multiword carry chains run per 8-word chunk instead of over the full
word axis. A whole-axis Kogge-Stone step rolls the entire (W, TILE_B)
state (W=65 for DXZ1: ~9 vregs per roll, 16 rolls per column); here each
chunk does its 3 carry steps on a single (8, 128) vreg and passes one
(1, TILE_B) carry vector to the next chunk. The serialized cross-chunk
dependency is 9 deep, but each link is one vreg op — the instruction
count per column drops by roughly the word count over eight.

Reference role: the recruitment aligner (reference rr.cpp:74-87 /
edlib.cpp:526) — this kernel scores the survivor tier of the fused
recruitment step.
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
CHUNK = 8


def _roll_up(x, d):
    """Sublanes shifted toward higher index by d within one chunk
    (zero fill); x is (CHUNK, TILE_B)."""
    rolled = pltpu.roll(x, shift=d, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    return jnp.where(row < d, jnp.uint32(0), rolled)


def _strand_column(pcs_c, masks, vp_ref, vn_ref, C, hc, hr, hb, row0):
    """One Myers column over all chunks for one strand: reads state from
    the refs, returns (new_vp list, new_vn list, inc). pcs_c[a][c] are the
    per-chunk peq columns."""
    ones = jnp.uint32(0xFFFFFFFF)
    add_c = jnp.zeros(masks[0].shape, jnp.uint32)
    hp_c = jnp.zeros(masks[0].shape, jnp.uint32)
    hn_c = jnp.zeros(masks[0].shape, jnp.uint32)
    inc = None
    new_vp = []
    new_vn = []
    bit0, bit1, kill = masks    # char&1, char&2 (bools), N-kill (uint32)
    for c in range(C):
        sl = slice(CHUNK * c, CHUNK * (c + 1))
        vp = vp_ref[sl, :]
        vn = vn_ref[sl, :]
        # 2-level select tree over the char's two bits (A=0 C=1 G=2 T=3);
        # chars >= 4 (N/PAD) match nothing via the kill mask
        t01 = jnp.where(bit0, pcs_c[1][c], pcs_c[0][c])
        t23 = jnp.where(bit0, pcs_c[3][c], pcs_c[2][c])
        eq = jnp.where(bit1, t23, t01) & kill
        x = eq & vp
        # x + vp + carry-in (carry only into row 0)
        t1 = x + vp
        c1 = (t1 < x).astype(jnp.uint32)
        t2 = t1 + jnp.where(row0, add_c, jnp.uint32(0))
        c2 = (t2 < t1).astype(jnp.uint32)
        g = c1 | c2
        p = (t2 == ones).astype(jnp.uint32)
        # Kogge-Stone carry propagation within the chunk
        cin = _roll_up(g, 1)
        q = _roll_up(p, 1)
        d = 1
        while d < CHUNK:
            cin = cin | (q & _roll_up(cin, d))
            q = q & _roll_up(q, d)
            d *= 2
        s = t2 + cin
        top = slice(CHUNK - 1, CHUNK)
        add_c = (g[top] | (p[top] & cin[top]))
        d0 = (s ^ vp) | eq | vn
        hp = vn | ~(d0 | vp)
        hn = vp & d0
        if c == hc:
            hp_w = hp[hr:hr + 1, :]
            hn_w = hn[hr:hr + 1, :]
            inc = ((hp_w >> jnp.uint32(hb)) & 1).astype(jnp.int32) - \
                ((hn_w >> jnp.uint32(hb)) & 1).astype(jnp.int32)
        hp_in = jnp.where(row0, hp_c,
                          _roll_up(hp, 1) >> jnp.uint32(31))
        hn_in = jnp.where(row0, hn_c,
                          _roll_up(hn, 1) >> jnp.uint32(31))
        hp_cn = hp[top] >> jnp.uint32(31)
        hn_cn = hn[top] >> jnp.uint32(31)
        hp_s = (hp << jnp.uint32(1)) | hp_in
        hn_s = (hn << jnp.uint32(1)) | hn_in
        hp_c = hp_cn
        hn_c = hn_cn
        new_vp.append(hn_s | ~(d0 | hp_s))
        new_vn.append(hp_s & d0)
    return new_vp, new_vn, inc


def _make_kernel(m: int, W: int, L: int):
    WP = -(-W // CHUNK) * CHUNK
    C = WP // CHUNK
    hw_word = (m - 1) // 32
    hb = (m - 1) % 32
    hc, hr = divmod(hw_word, CHUNK)

    def kernel(peq_ref, text_ref, lens_ref, dist_ref, end_ref,
               vp_ref, vn_ref, score_ref, best_ref, bestj_ref):
        vp_ref[:] = jnp.full((WP, TILE_B), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:] = jnp.zeros((WP, TILE_B), jnp.uint32)
        score_ref[:] = jnp.full((1, TILE_B), m, jnp.int32)
        best_ref[:] = jnp.full((1, TILE_B), m, jnp.int32)
        bestj_ref[:] = jnp.full((1, TILE_B), -1, jnp.int32)

        # per-chunk peq columns: (CHUNK, 1) each, indexed [a][c]
        pcs = [[peq_ref[a, CHUNK * c:CHUNK * (c + 1)].reshape(CHUNK, 1)
                for c in range(C)] for a in range(4)]
        lens = lens_ref[:]                          # (1, TILE_B)
        row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_B), 0)
        row0 = row == 0

        def body(j8, _):
            base = pl.multiple_of(j8 * 8, 8)
            chunk_txt = text_ref[pl.ds(base, 8), :].astype(jnp.int32)
            for t in range(8):
                j = base + t
                chars = chunk_txt[t, :].reshape(1, TILE_B)
                masks = ((chars & 1) != 0, (chars & 2) != 0,
                         jnp.where(chars < 4, jnp.uint32(0xFFFFFFFF),
                                   jnp.uint32(0)))
                new_vp, new_vn, inc = _strand_column(
                    pcs, masks, vp_ref, vn_ref, C, hc, hr, hb, row0)

                # state updates past a lane's length are don't-care (no
                # later valid column reads them): write unmasked, gate
                # only score/best on `active`
                active = (j < lens)                 # (1, TILE_B)
                for c in range(C):
                    sl = slice(CHUNK * c, CHUNK * (c + 1))
                    vp_ref[sl, :] = new_vp[c]
                    vn_ref[sl, :] = new_vn[c]
                score = jnp.where(active, score_ref[:] + inc, score_ref[:])
                score_ref[:] = score
                improved = active & (score < best_ref[:])
                best_ref[:] = jnp.where(improved, score, best_ref[:])
                bestj_ref[:] = jnp.where(improved, j, bestj_ref[:])
            return 0

        jax.lax.fori_loop(0, L // 8, body, 0)
        dist_ref[:] = best_ref[:]
        end_ref[:] = bestj_ref[:]

    return kernel, WP


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def myers_hw_pallas_v3(peq: jnp.ndarray, text_t: jnp.ndarray,
                       lens: jnp.ndarray, *, m: int,
                       interpret: bool | None = None):
    """Drop-in for myers_hw_pallas_v2: peq (5, W) uint32, text_t (L, B)
    int8, lens (1, B) or (B, 1) int32; returns {"dist": (B,), "end": (B,)}.
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
    kernel, WP = _make_kernel(m, W, L)
    if WP != W:
        peq = jnp.concatenate(
            [peq, jnp.zeros((5, WP - W), peq.dtype)], axis=1)
    grid = (B // TILE_B,)
    out_shape = (
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    )
    dist, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, WP), lambda i: (0, 0),
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
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
            pltpu.VMEM((1, TILE_B), jnp.int32),
        ],
        interpret=interpret,
    )(peq, text_t, lens.reshape(1, B))
    return {"dist": dist[0], "end": end[0]}


ROWS = CHUNK * 32                      # query rows covered by one chunk


def _make_kernel_banded(m: int, W: int, L: int, k0: int):
    """Threshold-k banded HW kernel (own implementation of the Ukkonen
    block band over the Hyyro update — the reference recruiter's core
    speed trick, edlib.cpp:538 initial band, :598-655 adaptive
    extension/reduction; band algebra mirrors native/myers.cpp
    hw_banded, which is property-tested against the full DP). Band
    granularity is one CHUNK (256 query rows); the band edge `last` is a
    TILE-UNION scalar in SMEM — expansion fires when ANY lane's scalar
    rule would (so the union band contains every lane's scalar band and
    all computed cells hold true DP values), reduction only when EVERY
    lane's rule allows. Distances are exact when <= k0 and reported as m
    otherwise (the recruitment sentinel).

    LOOP INTERCHANGE: the text is processed in 8-column blocks with the
    chunk loop OUTSIDE the column loop — one chunk's (8, 128) vp/vn tile
    stays in registers across all 8 columns and the 8 cross-chunk
    carries buffer in (8, TILE_B) planes, so band decisions, SMEM
    traffic, and the dynamic loop all amortize 8x. Expansion is checked
    once per block with slack 8: the boundary score drops at most 1 per
    column, so a block-start check with that slack fires no later than
    any per-column firing of the exact rule, early expansion is always
    legal (the fresh chunk's all-increment profile only OVERestimates
    cells, and any computed value <= k is exact), and a second mid-block
    expansion is impossible (a fresh chunk's bottom starts ROWS above
    the boundary and can drop at most 8 within the block).

    MEASURED RESULT (v5e, m=2055, L=4096, B=1024): the band does NOT pay
    on TPU — 119 Mcol/s (k=350) / 123 (k=150) vs 141 for the unbanded
    static-unroll kernel and 260 effective for the 2-strand fused pass.
    The dynamic `fori_loop` over band chunks defeats Mosaic's static
    unrolling/pipelining, and on random text the kvec+ROWS reduction
    rule only holds ~5 of 9 chunks, so the saved work never covers the
    control-flow cost. Banding stays a native/host-engine trick
    (native/myers.cpp hw_banded, ~3x there); on TPU the stall-filling
    2-strand kernel is the production scorer. Kept as the measured,
    correctness-tested record of the experiment."""
    WP = -(-W // CHUNK) * CHUNK
    C = WP // CHUNK
    hw_word = (m - 1) // 32
    hb = (m - 1) % 32
    hc, hr = divmod(hw_word, CHUNK)
    last0 = min(max(-(-(k0 + 1) // ROWS) - 1, 0), C - 1)

    def kernel(peq_ref, text_ref, lens_ref, dist_ref, end_ref,
               vp_ref, vn_ref, bscore_ref, state_ref, last_ref):
        vp_ref[:] = jnp.full((WP, TILE_B), 0xFFFFFFFF, jnp.uint32)
        vn_ref[:] = jnp.zeros((WP, TILE_B), jnp.uint32)
        crow = jax.lax.broadcasted_iota(jnp.int32, (C, TILE_B), 0)
        bscore_ref[:] = (crow + 1) * ROWS
        # state rows: row_score, best, bestj, kvec
        state_ref[:] = jnp.concatenate([
            jnp.full((1, TILE_B), m, jnp.int32),
            jnp.full((1, TILE_B), m, jnp.int32),
            jnp.full((1, TILE_B), -1, jnp.int32),
            jnp.full((1, TILE_B), k0, jnp.int32)], axis=0)
        last_ref[0, 0] = last0

        lens = lens_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_B), 0)
        row0 = row == 0
        ones = jnp.uint32(0xFFFFFFFF)

        def body(j8, _):
            base = pl.multiple_of(j8 * 8, 8)
            chunk_txt = text_ref[pl.ds(base, 8), :].astype(jnp.int32)
            bit0s, bit1s, kills = [], [], []
            for t in range(8):
                ch = chunk_txt[t, :].reshape(1, TILE_B)
                bit0s.append((ch & 1) != 0)
                bit1s.append((ch & 2) != 0)
                kills.append(jnp.where(ch < 4, ones, jnp.uint32(0)))

            st0 = state_ref[:]
            kvec0 = st0[3:4]
            bsc0 = bscore_ref[:]
            last = last_ref[0, 0]
            score_last0 = jnp.sum(
                jnp.where(crow == last, bsc0, 0), axis=0, keepdims=True)
            anyexp = (jnp.sum((score_last0 <= kvec0 + 8)
                              .astype(jnp.int32)) > 0) & (last < C - 1)

            @pl.when(anyexp)
            def _expand():
                nc = last + 1
                sl = pl.ds(nc * CHUNK, CHUNK)
                vp_ref[sl, :] = jnp.full((CHUNK, TILE_B), ones,
                                         jnp.uint32)
                vn_ref[sl, :] = jnp.zeros((CHUNK, TILE_B), jnp.uint32)
                bscore_ref[:] = jnp.where(crow == nc,
                                          score_last0 + ROWS, bsc0)
                # the fresh chunk's all-increment profile seeds row m-1
                # when the tap chunk re-enters the band
                @pl.when(nc == hc)
                def _seed_row():
                    rs = score_last0 + (hr * 32 + hb + 1)
                    state_ref[0:1, :] = rs
                last_ref[0, 0] = nc

            last = last_ref[0, 0]
            zero8u = jnp.zeros((8, TILE_B), jnp.uint32)

            def chunk_body(c, carry):
                adds, hps, hns, bsc, taps = carry
                pcb = peq_ref[pl.ds(c * CHUNK, CHUNK), :]
                sl = pl.ds(c * CHUNK, CHUNK)
                vp = vp_ref[sl, :]
                vn = vn_ref[sl, :]
                o_add, o_hp, o_hn, o_tap = [], [], [], []
                hout_sum = jnp.zeros((1, TILE_B), jnp.int32)
                for t in range(8):
                    t01 = jnp.where(bit0s[t], pcb[:, 1:2], pcb[:, 0:1])
                    t23 = jnp.where(bit0s[t], pcb[:, 3:4], pcb[:, 2:3])
                    eq = jnp.where(bit1s[t], t23, t01) & kills[t]
                    x = eq & vp
                    t1 = x + vp
                    c1 = (t1 < x).astype(jnp.uint32)
                    t2 = t1 + jnp.where(row0, adds[t:t + 1], jnp.uint32(0))
                    c2 = (t2 < t1).astype(jnp.uint32)
                    g = c1 | c2
                    p = (t2 == ones).astype(jnp.uint32)
                    cin = _roll_up(g, 1)
                    q = _roll_up(p, 1)
                    d = 1
                    while d < CHUNK:
                        cin = cin | (q & _roll_up(cin, d))
                        q = q & _roll_up(q, d)
                        d *= 2
                    s = t2 + cin
                    top = slice(CHUNK - 1, CHUNK)
                    o_add.append(g[top] | (p[top] & cin[top]))
                    d0 = (s ^ vp) | eq | vn
                    hp = vn | ~(d0 | vp)
                    hn = vp & d0
                    hp_w = hp[hr:hr + 1, :]
                    hn_w = hn[hr:hr + 1, :]
                    o_tap.append(
                        ((hp_w >> jnp.uint32(hb)) & 1).astype(jnp.int32)
                        - ((hn_w >> jnp.uint32(hb)) & 1).astype(jnp.int32))
                    hp_in = jnp.where(row0, hps[t:t + 1],
                                      _roll_up(hp, 1) >> jnp.uint32(31))
                    hn_in = jnp.where(row0, hns[t:t + 1],
                                      _roll_up(hn, 1) >> jnp.uint32(31))
                    hp_cn = hp[top] >> jnp.uint32(31)
                    hn_cn = hn[top] >> jnp.uint32(31)
                    o_hp.append(hp_cn)
                    o_hn.append(hn_cn)
                    hout_sum = hout_sum + hp_cn.astype(jnp.int32) \
                        - hn_cn.astype(jnp.int32)
                    hp_s = (hp << jnp.uint32(1)) | hp_in
                    hn_s = (hn << jnp.uint32(1)) | hn_in
                    vp = hn_s | ~(d0 | hp_s)
                    vn = hp_s & d0
                vp_ref[sl, :] = vp
                vn_ref[sl, :] = vn
                bsc = bsc + jnp.where(crow == c, hout_sum, 0)
                taps = jnp.where(c == hc, jnp.concatenate(o_tap, axis=0),
                                 taps)
                return (jnp.concatenate(o_add, axis=0),
                        jnp.concatenate(o_hp, axis=0),
                        jnp.concatenate(o_hn, axis=0), bsc, taps)

            _, _, _, bsc, taps = jax.lax.fori_loop(
                0, last + 1, chunk_body,
                (zero8u, zero8u, zero8u, bscore_ref[:],
                 jnp.zeros((8, TILE_B), jnp.int32)))
            bscore_ref[:] = bsc

            # sequential best updates over the block's 8 columns
            st = state_ref[:]
            rs, best, bestj, kvec = st[0:1], st[1:2], st[2:3], st[3:4]
            tapped = last >= hc
            for t in range(8):
                rs = rs + taps[t:t + 1]
                j = base + t
                active = (j < lens) & tapped
                improved = active & (rs <= kvec) & (rs < best)
                best = jnp.where(improved, rs, best)
                bestj = jnp.where(improved, j, bestj)
                kvec = jnp.where(improved, rs, kvec)
            state_ref[:] = jnp.concatenate([rs, best, bestj, kvec],
                                           axis=0)

            # single-step band reduction (native myers.cpp:178-179 rule,
            # at block granularity — strictly more conservative)
            score_last = jnp.sum(
                jnp.where(crow == last, bsc, 0), axis=0, keepdims=True)
            allred = jnp.sum(
                (score_last < kvec + ROWS).astype(jnp.int32)) == 0
            last_ref[0, 0] = jnp.where(allred & (last > 0),
                                       last - 1, last)
            return 0

        jax.lax.fori_loop(0, L // 8, body, 0)
        st = state_ref[:]
        ok = st[1:2] <= k0
        dist_ref[:] = jnp.where(ok, st[1:2], m)
        end_ref[:] = jnp.where(ok, st[2:3], -1)

    return kernel, WP, C


@functools.partial(jax.jit, static_argnames=("m", "k", "interpret"))
def myers_hw_pallas_v3_banded(peq: jnp.ndarray, text_t: jnp.ndarray,
                              lens: jnp.ndarray, *, m: int, k: int,
                              interpret: bool | None = None):
    """Threshold-k banded HW distances: exact where dist <= k, sentinel m
    otherwise (end = -1 there). peq (5, W) uint32, text_t (L, B) int8,
    lens (B,)-ish int32. The recruitment decision tier only needs
    distances at or below the threshold — the same contract as the
    reference recruiter's bounded edlib call (rr.cpp:74-79)."""
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
    kernel, WP, C = _make_kernel_banded(m, W, L, int(k))
    # peq transposed to (WP, 8): chunk slices ride the sublane dim (the
    # band's chunk index is dynamic — lane-dim dynamic slicing is not)
    peq_t = jnp.zeros((WP, 8), peq.dtype)
    peq_t = peq_t.at[:W, :5].set(peq.T)
    grid = (B // TILE_B,)
    out_shape = (
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    )
    dist, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((WP, 8), lambda i: (0, 0),
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
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((C, TILE_B), jnp.int32),
            pltpu.VMEM((4, TILE_B), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(peq_t, text_t, lens.reshape(1, B))
    return {"dist": dist[0], "end": end[0]}


def _make_kernel_2strand(m: int, W: int, L: int):
    WP = -(-W // CHUNK) * CHUNK
    C = WP // CHUNK
    hw_word = (m - 1) // 32
    hb = (m - 1) % 32
    hc, hr = divmod(hw_word, CHUNK)

    def kernel(peq_f_ref, peq_r_ref, text_ref, lens_ref,
               dist_f_ref, end_f_ref, dist_r_ref, end_r_ref,
               vp_f, vn_f, vp_r, vn_r, state_ref):
        vp_f[:] = jnp.full((WP, TILE_B), 0xFFFFFFFF, jnp.uint32)
        vn_f[:] = jnp.zeros((WP, TILE_B), jnp.uint32)
        vp_r[:] = jnp.full((WP, TILE_B), 0xFFFFFFFF, jnp.uint32)
        vn_r[:] = jnp.zeros((WP, TILE_B), jnp.uint32)
        # rows: score_f, score_r, best_f, best_r, bestj_f, bestj_r
        state_ref[:] = jnp.concatenate([
            jnp.full((4, TILE_B), m, jnp.int32),
            jnp.full((2, TILE_B), -1, jnp.int32)], axis=0)

        pcs_f = [[peq_f_ref[a, CHUNK * c:CHUNK * (c + 1)].reshape(CHUNK, 1)
                  for c in range(C)] for a in range(4)]
        pcs_r = [[peq_r_ref[a, CHUNK * c:CHUNK * (c + 1)].reshape(CHUNK, 1)
                  for c in range(C)] for a in range(4)]
        lens = lens_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_B), 0)
        row0 = row == 0

        def body(j8, _):
            base = pl.multiple_of(j8 * 8, 8)
            chunk_txt = text_ref[pl.ds(base, 8), :].astype(jnp.int32)
            for t in range(8):
                j = base + t
                chars = chunk_txt[t, :].reshape(1, TILE_B)
                masks = ((chars & 1) != 0, (chars & 2) != 0,
                         jnp.where(chars < 4, jnp.uint32(0xFFFFFFFF),
                                   jnp.uint32(0)))
                active = (j < lens)
                nvp_f, nvn_f, inc_f = _strand_column(
                    pcs_f, masks, vp_f, vn_f, C, hc, hr, hb, row0)
                nvp_r, nvn_r, inc_r = _strand_column(
                    pcs_r, masks, vp_r, vn_r, C, hc, hr, hb, row0)
                # past-length updates are don't-care; only score/best gate
                for c in range(C):
                    sl = slice(CHUNK * c, CHUNK * (c + 1))
                    vp_f[sl, :] = nvp_f[c]
                    vn_f[sl, :] = nvn_f[c]
                    vp_r[sl, :] = nvp_r[c]
                    vn_r[sl, :] = nvn_r[c]
                st = state_ref[:]
                inc2 = jnp.concatenate([inc_f, inc_r], axis=0)
                act2 = jnp.broadcast_to(active, (2, TILE_B))
                score = jnp.where(act2, st[0:2] + inc2, st[0:2])
                improved = act2 & (score < st[2:4])
                best = jnp.where(improved, score, st[2:4])
                bestj = jnp.where(improved, j, st[4:6])
                state_ref[:] = jnp.concatenate([score, best, bestj],
                                               axis=0)
            return 0

        jax.lax.fori_loop(0, L // 8, body, 0)
        st = state_ref[:]
        dist_f_ref[:] = st[2:3]
        dist_r_ref[:] = st[3:4]
        end_f_ref[:] = st[4:5]
        end_r_ref[:] = st[5:6]

    return kernel, WP


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def myers_hw_pallas_v3_2strand(peq_f: jnp.ndarray, peq_r: jnp.ndarray,
                               text_t: jnp.ndarray, lens: jnp.ndarray,
                               *, m: int, interpret: bool | None = None):
    """Both strands in one kernel pass (shared text loads, masks and loop
    overhead): the production recruitment scorer. Returns
    dict(dist_f, end_f, dist_r, end_r) each (B,)."""
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
    kernel, WP = _make_kernel_2strand(m, W, L)
    if WP != W:
        zpad = jnp.zeros((5, WP - W), peq_f.dtype)
        peq_f = jnp.concatenate([peq_f, zpad], axis=1)
        peq_r = jnp.concatenate([peq_r, zpad], axis=1)
    grid = (B // TILE_B,)
    out_shape = tuple(jax.ShapeDtypeStruct((1, B), jnp.int32)
                      for _ in range(4))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
                        for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((WP, TILE_B), jnp.uint32),
            pltpu.VMEM((6, TILE_B), jnp.int32),
        ],
        interpret=interpret,
    )(peq_f, peq_r, text_t, lens.reshape(1, B))
    dist_f, end_f, dist_r, end_r = outs
    return {"dist_f": dist_f[0], "end_f": end_f[0],
            "dist_r": dist_r[0], "end_r": end_r[0]}


def recruit_distances_pallas(peq_fwd, peq_rc, codes, lens, *, m: int):
    """Two-strand recruitment distances with the production Pallas kernel
    (the fused two-strand chunked-carry pass — shared text loads, masks
    and loop overhead between strands); codes is the standard (B, L)
    batch (transposed + row-padded internally). Role: the reference
    recruiter's per-read two-strand edlibAlign (rr.cpp:74-79)."""
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
