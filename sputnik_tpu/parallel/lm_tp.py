"""Token-level tensor/data-parallel serving: ``LMServer.generate`` over
a device mesh.

``LMServer`` (models/lm.py) already threads a ``reduce_fn`` through its
prefill/decode/generate path; this module supplies the missing
composition: the WHOLE token loop (embed -> sharded core -> head ->
sample) inside ONE ``shard_map``, with the transformer core sharded
exactly like ``TPDecoder`` (QKV column-sharded by head groups, two psums
per layer) and the embedding / final-LN / LM-head parameters replicated.
Sampling runs redundantly-but-identically on every tp shard (same
logits after the psum, same key), so no collective is spent on the
token choice; under a ``batch_axis`` each dp slice folds its mesh
position into the key so slices sample independently.

The reference framework stops at activations (SURVEY.md §1 — no
vocabulary, no sampling, no serving); both halves of this file are
framework additions composed: token loop (models/lm.py) x tensor
parallelism (parallel/serving_tp.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.lm import LMServer, SparseLM
from .serving_tp import PagedTPDecoder, TPDecoder

__all__ = ["TPLMServer"]


class TPLMServer:
    """Tensor/data-parallel token-level generation runtime.

    Usage::

        srv = TPLMServer(lm, mesh, s_max=..., bk=...)      # contiguous KV
        srv = TPLMServer(lm, mesh, n_pages=..., s_max=...)  # paged KV
        sparams = srv.shard_params(params)        # ONCE per weight set
        toks, caches = srv.generate(sparams, prompt_tokens, n_new,
                                    key, temperature=0.8, top_k=40)

    ``generate`` with a contiguous decoder is jit-able end to end; the
    paged variant reserves its pages on the host first (same contract as
    ``LMServer(n_pages=...)``) so call it eagerly — the shard_map body
    still compiles. All ``LMServer.generate`` sampling options pass
    through (temperature / top-k / top-p, eos, repetition penalty,
    variable-length prompts).
    """

    def __init__(self, lm: SparseLM, mesh: Mesh, *, axis: str = "tp",
                 batch_axis: Optional[str] = None, s_max: int,
                 bk: int = 256, window: Optional[int] = None,
                 sinks: int = 0, cache_dtype=jnp.bfloat16,
                 n_pages: Optional[int] = None):
        self.lm = lm
        if n_pages is not None:
            self.tpd: TPDecoder = PagedTPDecoder(
                lm.core, mesh, n_pages=n_pages, axis=axis,
                batch_axis=batch_axis, s_max=s_max, bk=bk, window=window,
                sinks=sinks, cache_dtype=cache_dtype)
        else:
            self.tpd = TPDecoder(
                lm.core, mesh, axis=axis, batch_axis=batch_axis,
                s_max=s_max, bk=bk, window=window, sinks=sinks,
                cache_dtype=cache_dtype)
        self.paged = n_pages is not None
        # the per-shard token server: the sharded runtime is the
        # single-chip runtime (over the local decoder) plus the psum hook
        self._srv = LMServer(lm, decoder=self.tpd._ld)

    # -- params ---------------------------------------------------------------

    def shard_params(self, params):
        """Split the LM parameter tree: transformer core stacked
        ``[tp, ...]`` (``TPDecoder.shard_params``), embedding / final-LN /
        LM-head left as-is (replicated across the mesh)."""
        p = params.get("params", params)
        core_tp = self.tpd.shard_params({"params": p["core"]})
        rest = {k: v for k, v in p.items() if k != "core"}
        return {"core_tp": core_tp, "rest": rest}

    # -- generation -----------------------------------------------------------

    def generate(self, sparams, tokens, n_new: int, key=None,
                 prompt_lengths=None, **sampling):
        """Generate ``n_new`` tokens after ``tokens [b, P]`` across the
        mesh. Returns ``(new_tokens [b, n_new], caches)`` (caches stay
        mesh-sharded for follow-up decoding). ``sampling`` forwards to
        ``LMServer.generate`` (temperature, top_k, top_p, eos_id,
        pad_id, repetition_penalty)."""
        tpd = self.tpd
        b = tokens.shape[0]
        if b % tpd.dp:
            raise ValueError(f"batch {b} not divisible by dp {tpd.dp}")
        key = key if key is not None else jax.random.PRNGKey(0)

        extra = []
        if self.paged:
            caches = tpd.init_caches(b)
            # host scheduler: prompt + decode pages in one reservation
            # (prefill runs inside the trace and cannot allocate)
            caches = tpd.reserve(caches, tokens.shape[1] + n_new)
            extra.append(caches)
        if prompt_lengths is not None:
            extra.append(jnp.asarray(prompt_lengths, jnp.int32))

        core_spec = jax.tree.map(lambda _: P(tpd.axis), sparams["core_tp"])
        rest_spec = jax.tree.map(lambda _: P(), sparams["rest"])
        act_spec = P(tpd.batch_axis) if tpd.batch_axis else P()
        cache_spec = P((tpd.batch_axis, tpd.axis)) if tpd.batch_axis \
            else P(tpd.axis)

        in_specs = [core_spec, rest_spec, act_spec, P()]
        if self.paged:
            in_specs.append(jax.tree.map(lambda _: cache_spec, extra[0]))
        if prompt_lengths is not None:
            in_specs.append(act_spec)
        # out caches: tuple of per-layer KV pytrees, every leaf sharded
        # (abstract init for the contiguous structure — no allocation)
        cache_tree = extra[0] if self.paged else jax.eval_shape(
            lambda: tpd._ld.init_caches(b // tpd.dp))
        out_specs = (act_spec, jax.tree.map(lambda _: cache_spec,
                                            cache_tree))

        srv, paged = self._srv, self.paged

        def body(core_sp, rest, toks, key, *rest_args):
            i = 0
            caches = None
            if paged:
                caches, i = rest_args[0], 1
            lengths = rest_args[i] if len(rest_args) > i else None
            local_core = jax.tree.map(lambda a: a[0], core_sp)
            lp = {"params": dict(rest, core=local_core["params"])}
            if tpd.batch_axis:     # decorrelate dp slices' sampling
                key2 = jax.random.fold_in(
                    key, jax.lax.axis_index(tpd.batch_axis))
            else:
                key2 = key
            red = lambda t: jax.lax.psum(t, tpd.axis)  # noqa: E731
            return srv.generate(lp, toks, n_new, key2, reduce_fn=red,
                                caches=caches, prompt_lengths=lengths,
                                **sampling)

        # memoize the jitted shard_map: an eager generate loop otherwise
        # re-traces and re-compiles the whole sharded token loop per call
        ck = (n_new, tuple(sorted(sampling.items())), self.paged,
              prompt_lengths is None)
        jits = getattr(self, "_gen_jits", None)
        if jits is None:
            jits = self._gen_jits = {}
        fn = jits.get(ck)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                body, mesh=tpd.mesh, in_specs=tuple(in_specs),
                out_specs=out_specs, check_vma=False))
            jits[ck] = fn
            while len(jits) > 16:
                jits.pop(next(iter(jits)))
        return fn(sparams["core_tp"], sparams["rest"], tokens, key, *extra)
