"""ELL-layout sparse softmax Pallas kernel (TPU answer to
``sputnik::SparseSoftmax``, ``/root/reference/src/softmax_cuda.cu:36``).

Values are scattered into the row-padded ELL panel ``[m, l_pad]`` (see
``blocking.EllView``) so each CSR row becomes one contiguous vector lane run;
the kernel is then a plain masked row-softmax on the VPU — no gather at all.
Padding lanes carry ``-inf``-equivalent scores so they contribute exp -> 0,
and fully-masked rows produce zeros rather than NaN (the degenerate case the
reference deliberately exercises, ``tests/transformer/driver.py:11-14``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ell_softmax_panel", "ell_softmax"]

_NEG_LARGE = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def ell_softmax_panel(values_panel, mask_panel, *, bm: int = 8,
                      interpret: bool = False):
    """Masked row softmax on an ``[m_pad, l_pad]`` panel."""
    m_pad, l_pad = values_panel.shape

    def kernel(vals_ref, mask_ref, out_ref):
        mask = mask_ref[:]
        v = jnp.where(mask != 0, vals_ref[:], _NEG_LARGE)
        row_max = jnp.maximum(jnp.max(v, axis=1, keepdims=True), _NEG_LARGE)
        e = jnp.where(mask != 0, jnp.exp(v - row_max), 0.0)
        denom = jnp.sum(e, axis=1, keepdims=True)
        out_ref[:] = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)

    return pl.pallas_call(
        kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, l_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, l_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, l_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
        interpret=interpret,
    )(values_panel, mask_panel)


def ell_softmax(topo, values, *, interpret: bool = False):
    """Row-wise CSR softmax: ``values[nnz_pad] -> [nnz_pad]``."""
    ev = topo.ell()
    bm = 8
    m_pad = _round_up(max(ev.m, 1), bm)

    # values -> ELL panel (scatter is a precomputed gather: panel slot ->
    # values slot, padding -> appended zero; the mask kills it anyway).
    gidx = _ell_gather_index(ev)
    vext = jnp.concatenate([values, jnp.zeros((1,), values.dtype)])
    panel = jnp.take(vext, jnp.asarray(gidx), axis=0).reshape(ev.m, ev.l_pad)
    if m_pad != ev.m:
        panel = jnp.concatenate(
            [panel, jnp.zeros((m_pad - ev.m, ev.l_pad), panel.dtype)]
        )
    mask = jnp.zeros((m_pad, ev.l_pad), jnp.float32)
    mask = mask.at[: ev.m].set(jnp.asarray(ev.mask, jnp.float32))

    out_panel = ell_softmax_panel(panel, mask, bm=bm, interpret=interpret)
    flat = jnp.concatenate(
        [out_panel[: ev.m].reshape(-1), jnp.zeros((1,), jnp.float32)]
    )
    return jnp.take(flat, jnp.asarray(ev.gather_idx))


def _ell_gather_index(ev):
    """i32[m * l_pad]: panel slot -> values slot (padding -> nnz_pad)."""
    import numpy as np

    cached = getattr(ev, "_panel_gather_cache", None)
    if cached is not None:
        return cached
    nnz_pad = ev.scatter_idx.shape[0]
    idx = np.full(ev.dump + 1, nnz_pad, dtype=np.int32)
    idx[ev.scatter_idx] = np.arange(nnz_pad, dtype=np.int32)
    idx = idx[: ev.dump]
    object.__setattr__(ev, "_panel_gather_cache", idx)
    return idx
