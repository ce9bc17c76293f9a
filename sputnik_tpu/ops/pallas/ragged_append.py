"""Ragged KV-cache append kernel (continuous batching's per-slot write).

The reference has no serving path (SURVEY.md §1); this kernel exists to fix
a TPU-specific trap in ours: appending one token per replica at PER-REPLICA
positions via ``vmap(dynamic_update_slice)`` lowers to a TPU SCATTER that
was measured at ~3.6 ms/token of pure cache copy on the 6-layer benchmark
model (benchmarks/RESULTS.md, decode bisect) — more than the rest of the
decode step combined.

Here the write positions are scalar-prefetched and drive the BLOCK index
maps instead: the grid walks replicas, and each step DMAs in/out only the
32-sublane cache block containing that replica's write position (the
uniform 32-row block keeps the shape legal for int8 caches, whose TPU tile
is (32, 128)). With ``input_output_aliases`` the four cache buffers update
in place — per token the kernel moves ``R * 2 * 32 * hd_pad * itemsize``
KV bytes plus a small scale window (tens of KB total) instead of
scattering across the whole cache.

Mosaic block-shape rule (learned on hardware; interpret mode does NOT
enforce it): the last two dims of every block must be divisible by (8,
128) or equal to the array dims. Hence tokens travel as ``[R, 1, hd_pad]``
(sublane dim == array dim), and the f32 scale rows are viewed as
``[R, s_max // 128, 128]`` with an 8-row subgroup block when ``s_max`` is
a multiple of 1024 (full row otherwise).

The kernel also ENFORCES the capacity invariant the serving layer used to
merely document: a replica whose position is at/after ``s_max``, or whose
``write_ok`` flag is 0 (frozen continuous-batching slot), keeps its cache
bit-identical — the block index map clamps in range and the in-kernel
select writes the old contents back. No caller can corrupt a full slot's
last token through this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ragged_append_kernel", "SUB"]

SUB = 32  # cache-block sublane rows per write (int8 tile = (32, 128))


# NOTE: no donate_argnums here — append_kv is a functional API and eager
# callers may legitimately keep the previous cache (tests, rollback
# comparisons). The pallas-level input_output_aliases below still tells XLA
# the kernel updates in place; inside a jitted decode step where the old
# cache is dead, XLA elides the defensive copy.
@functools.partial(jax.jit, static_argnames=("interpret",))
def ragged_append_kernel(
    pos,        # i32[R]    per-replica write position (clamped in-kernel)
    ok,         # i32[R]    1 = write; 0 = frozen slot, keep cache untouched
    tok_k,      # cache dtype [R, hd_pad]  this step's K rows
    tok_v,      # cache dtype [R, hd_pad]
    tok_ks,     # f32[R, 128]  per-token K dequant scale, lane-broadcast
    tok_vs,     # f32[R, 128]
    k_cache,    # cache dtype [R, s_max, hd_pad]   (updated in place)
    v_cache,    # cache dtype [R, s_max, hd_pad]
    ks_cache,   # f32[R, s_max]
    vs_cache,   # f32[R, s_max]
    *,
    interpret: bool = False,
):
    """Returns the four updated cache buffers (aliased onto the inputs)."""
    R, s_max, hd_pad = k_cache.shape
    if s_max % 128:
        raise ValueError(f"s_max {s_max} must be a multiple of 128")
    nrow = s_max // 128                    # scale rows in the [nrow, 128] view
    sb = 8 if nrow % 8 == 0 else nrow      # scale-block sublane rows

    def kernel(pos_ref, ok_ref, tk_ref, tv_ref, tks_ref, tvs_ref,
               k_ref, v_ref, ks_ref, vs_ref,
               ok_out, ov_out, oks_out, ovs_out):
        r = pl.program_id(0)
        p = jnp.minimum(pos_ref[r], s_max - 1)
        write = (pos_ref[r] < s_max) & (ok_ref[r] == 1)

        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, hd_pad), 0)
        m_kv = (row == p % SUB) & write
        ok_out[0] = jnp.where(m_kv, tk_ref[0], k_ref[0])
        ov_out[0] = jnp.where(m_kv, tv_ref[0], v_ref[0])

        srow = jax.lax.broadcasted_iota(jnp.int32, (sb, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (sb, 128), 1)
        m_sc = (srow == (p // 128) % sb) & (lane == p % 128) & write
        oks_out[0] = jnp.where(m_sc, tks_ref[0], ks_ref[0])
        ovs_out[0] = jnp.where(m_sc, tvs_ref[0], vs_ref[0])

    def kv_idx(r, pos, ok):
        return (r, jnp.minimum(pos[r], s_max - 1) // SUB, 0)

    def sc_idx(r, pos, ok):
        return (r, (jnp.minimum(pos[r], s_max - 1) // 128) // sb, 0)

    kv_spec = pl.BlockSpec((1, SUB, hd_pad), kv_idx)
    sc_spec = pl.BlockSpec((1, sb, 128), sc_idx)
    tok_spec = pl.BlockSpec((1, 1, hd_pad), lambda r, pos, ok: (r, 0, 0))
    tsc_spec = pl.BlockSpec((1, 1, 128), lambda r, pos, ok: (r, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R,),
            in_specs=[tok_spec, tok_spec, tsc_spec, tsc_spec,
                      kv_spec, kv_spec, sc_spec, sc_spec],
            out_specs=[kv_spec, kv_spec, sc_spec, sc_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((R, nrow, 128), ks_cache.dtype),
            jax.ShapeDtypeStruct((R, nrow, 128), vs_cache.dtype),
        ],
        # operand indices include the 2 scalar-prefetch args
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(pos, ok, tok_k[:, None, :], tok_v[:, None, :],
      tok_ks[:, None, :], tok_vs[:, None, :],
      k_cache, v_cache,
      ks_cache.reshape(R, nrow, 128), vs_cache.reshape(R, nrow, 128))
    k2, v2, ks2, vs2 = outs
    return k2, v2, ks2.reshape(R, s_max), vs2.reshape(R, s_max)
