"""Fused single-call recruitment step: packed upload -> seed filter ->
on-device compaction -> Myers on survivors.

Each engine batch costs exactly one host->device round trip:
- the host uploads base codes packed 4-per-byte (plus an N-position bitmask,
  8-per-byte): 2.25 bits/base instead of 8 — the host link is the scarce
  resource, on tunneled dev setups especially;
- the device unpacks, counts unit seed hits per row (ops/seed_filter),
  stably partitions passing rows to the front (argsort of the fail flag),
  runs the Pallas Myers kernel on the first K_budget rows only, and
  scatters distances back to original row order (sentinel m for filtered
  rows);
- the host receives (dist_fwd, dist_rc, hits, n_pass) and falls back to the
  unfused exact path for a batch only in the rare n_pass > K_budget case.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centroflye_tpu.ops.kmers import pack_kmers, lookup_codes
from centroflye_tpu.ops.myers import myers_distance_batch


def pack_2bit(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, L) int8 base codes -> (packed (B, L/4) uint8, n_mask (B, L/8)
    uint8). L must be a multiple of 8. PAD/N positions are marked in n_mask
    and packed as base 0."""
    B, L = codes.shape
    assert L % 8 == 0
    is_n = codes >= 4
    vals = np.where(is_n, 0, codes).astype(np.uint8)
    v = vals.reshape(B, L // 4, 4)
    packed = (v[:, :, 0] | (v[:, :, 1] << 2) | (v[:, :, 2] << 4)
              | (v[:, :, 3] << 6))
    nm = is_n.reshape(B, L // 8, 8).astype(np.uint8)
    n_mask = np.zeros((B, L // 8), np.uint8)
    for b in range(8):
        n_mask |= nm[:, :, b] << b
    return packed.astype(np.uint8), n_mask


def _unpack_2bit(packed: jnp.ndarray, n_mask: jnp.ndarray) -> jnp.ndarray:
    """Device inverse of pack_2bit -> (B, L) int8."""
    B, Lq = packed.shape
    parts = [((packed >> (2 * i)) & 3).astype(jnp.int8) for i in range(4)]
    codes = jnp.stack(parts, axis=-1).reshape(B, Lq * 4)
    bits = [((n_mask >> i) & 1).astype(jnp.bool_) for i in range(8)]
    is_n = jnp.stack(bits, axis=-1).reshape(B, Lq * 4)
    return jnp.where(is_n, jnp.int8(4), codes)


def make_fused_recruit(seed_bitmap: np.ndarray,
                       peq_fwd: np.ndarray, peq_rc: np.ndarray,
                       *, m: int, seed_k: int, min_hits: int,
                       k_budget: int = 128, stride: int = 2,
                       use_pallas: bool | None = None):
    """Returns fused(packed, n_mask, lens) -> (df, dr, hits, n_pass), all
    device-resident until the caller materializes. seed_bitmap: the
    direct-address membership bitmap (ops/seed_filter.build_seed_bitmap);
    positions are sampled every `stride` (min_hits is on sampled hits)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    seed_bitmap = jnp.asarray(seed_bitmap)
    peq_fwd = jnp.asarray(peq_fwd)
    peq_rc = jnp.asarray(peq_rc)

    @functools.partial(jax.jit, static_argnames=())
    def fused(packed, n_mask, lens):
        from centroflye_tpu.ops.seed_filter import seed_hit_counts_bitmap
        codes = _unpack_2bit(packed, n_mask)
        B, L = codes.shape
        hits = seed_hit_counts_bitmap(seed_bitmap, codes, lens,
                                      k=seed_k, stride=stride)
        fail = hits < min_hits
        order = jnp.argsort(fail, stable=True)          # passing rows first
        top = order[:k_budget]
        sub_codes = codes[top]
        sub_lens = lens[top]
        if use_pallas:
            from centroflye_tpu.ops.myers_pallas_v2 import (
                myers_hw_pallas_v2)
            out_f = myers_hw_pallas_v2(peq_fwd, sub_codes.T,
                                       sub_lens.reshape(-1, 1), m=m)
            out_r = myers_hw_pallas_v2(peq_rc, sub_codes.T,
                                       sub_lens.reshape(-1, 1), m=m)
        else:
            out_f = myers_distance_batch(peq_fwd, sub_codes, sub_lens,
                                         m=m, mode="HW")
            out_r = myers_distance_batch(peq_rc, sub_codes, sub_lens,
                                         m=m, mode="HW")
        sentinel = jnp.full((B,), m, jnp.int32)
        sub_ok = ~fail[top]
        df = sentinel.at[top].set(
            jnp.where(sub_ok, out_f["dist"], m))
        dr = sentinel.at[top].set(
            jnp.where(sub_ok, out_r["dist"], m))
        n_pass = jnp.sum((~fail).astype(jnp.int32))
        # ONE bundled output array -> one device->host transfer
        return jnp.concatenate(
            [df, dr, hits, n_pass.reshape(1)])

    def fused_unbundled(packed, n_mask, lens):
        out = np.asarray(fused(packed, n_mask, lens))
        B = lens.shape[0]
        return out[:B], out[B:2 * B], out[2 * B:3 * B], int(out[-1])

    return fused_unbundled
