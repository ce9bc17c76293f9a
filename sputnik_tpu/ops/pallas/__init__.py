"""Pallas TPU block-CSR kernels (the performance path).

``bsr_spmm.py`` / ``bsr_sddmm.py`` / ``ell_softmax.py`` hold the kernels;
``dispatch.py`` is the surface consumed by ``ops.api``.
"""

from __future__ import annotations


def supported(topo) -> bool:
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


def spmm_bias_relu(topo, values, dense, bias, *, relu=True):
    from . import dispatch

    return dispatch.spmm_bias_relu(topo, values, dense, bias, relu=relu)
