"""Checkpoint save/restore for sparse models.

The reference has no persistence at all (SURVEY.md §5). Here: orbax-backed
pytree checkpoints (the TPU-ecosystem standard), plus portable CSR export —
panel-layout value params are converted to flat CSR vectors keyed with the
topology shape so a checkpoint can be reloaded under a *different* block
tiling (tiles are an execution detail, not model state).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint",
           "export_csr", "import_csr"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (e.g. flax params) to ``path`` (orbax format)."""
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore_checkpoint(path: str, like: Any = None) -> Any:
    """Restore a pytree; ``like`` provides structure/dtypes if given."""
    ckpt = _checkpointer()
    if like is not None:
        import orbax.checkpoint as ocp

        return ckpt.restore(os.path.abspath(path),
                            restore_args=ocp.checkpoint_utils.construct_restore_args(like))
    return ckpt.restore(os.path.abspath(path))


def export_csr(layer, values_param) -> dict:
    """Panel/CSR value param of a ``SparseLinear`` -> portable dict with
    flat CSR arrays (topology + values), independent of block tiling."""
    t = layer.topology
    from ..ops import panel_api as P

    vp = np.asarray(values_param)  # dtype-preserving (bf16 serving)
    if layer.layout == "panel":
        spec = layer.spec()
        vals = P.panel_to_values_np(t, vp, spec.bm, spec.bk)
    else:
        vals = vp
    return {
        "m": t.m,
        "n": t.n,
        "row_offsets": np.asarray(t.row_offsets),
        "column_indices": np.asarray(t.column_indices[: t.nnz]),
        "values": vals[: t.nnz],
    }


def import_csr(layer, blob: dict):
    """Portable CSR dict -> value param in ``layer``'s layout. The layer's
    topology must match the stored pattern."""
    t = layer.topology
    if (blob["m"], blob["n"]) != (t.m, t.n):
        raise ValueError(
            f"shape mismatch: checkpoint {blob['m']}x{blob['n']} vs "
            f"layer {t.m}x{t.n}")
    if not np.array_equal(np.asarray(blob["row_offsets"]), t.row_offsets) or \
            not np.array_equal(np.asarray(blob["column_indices"]),
                               t.column_indices[: t.nnz]):
        raise ValueError("topology mismatch between checkpoint and layer")
    stored = np.asarray(blob["values"])
    vals = np.zeros(t.nnz_pad, stored.dtype)
    vals[: t.nnz] = stored
    if layer.layout == "panel":
        from ..ops import panel_api as P

        spec = layer.spec()
        return P.values_to_panel_np(t, vals, spec.bm, spec.bk)
    return vals
