"""Pallas TPU block-CSR kernels (the performance path).

Filled in by ``bsr_spmm.py`` / ``bsr_sddmm.py`` / ``bsr_softmax.py``; this
module exposes the dispatch surface consumed by ``ops.api``. Until a kernel
registers itself, ``supported`` gates everything to the XLA oracle path.
"""

from __future__ import annotations

_AVAILABLE = False


def supported(topo) -> bool:
    if not _AVAILABLE:
        return False
    from . import dispatch

    return dispatch.supported(topo)


def spmm(topo, values, dense):
    from . import dispatch

    return dispatch.spmm(topo, values, dense)


def sddmm(topo, lhs, rhs):
    from . import dispatch

    return dispatch.sddmm(topo, lhs, rhs)


def sparse_softmax(topo, values):
    from . import dispatch

    return dispatch.sparse_softmax(topo, values)
