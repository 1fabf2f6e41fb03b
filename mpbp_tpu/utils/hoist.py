"""Closure-constant hoisting for jitted drivers.

jit-with-static-callable patterns (the Krylov cycles, benchmark timing
chains) bake every array the callable closes over into the compiled program
as an HLO constant. Under this environment's remote-compile relay the AOT
payload then scales with the OPERATOR SIZE, not the program size — measured
on chip: a 512^2 solve compiles (~180 MB of constants), the 2048^2 solve and
the 1024^2 streamed-DIA SpMV chain are rejected with HTTP 413 (>500 MB).
`hoist_closure` lifts those arrays into explicit call arguments — device
buffers that never enter the compile payload.

Implementation note: jax.closure_convert is NOT the right tool here — in
current JAX it partitions jaxpr consts by `_maybe_perturbed` and only hoists
consts that are (potentially perturbed) tracers, i.e. it exists for AD
correctness, and for a concrete closed-over operator it hoists NOTHING
(measured: consts == [] for the fused-apply matvec; the 2048^2 compile
payload still carried every plane). We trace the jaxpr ourselves and lift
`jaxpr.consts` wholesale.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax import tree_util

_CACHE: dict = {}
_CACHE_MAX = 32


def hoist_closure(fn: Callable | None, example) -> tuple[Callable, list]:
    """(fn, example input) -> (fn2, consts) with fn(v) == fn2(v, *consts)
    and consts EVERY array constant in fn's jaxpr (closed-over operator
    planes, MG hierarchies, ILU factors, ...). Passing consts through a jit
    boundary as dynamic arguments keeps them out of the lowered module.
    Cached by (fn, shape, dtype) so repeated calls with the same operator
    hit the jit cache; conversions whose consts contain tracers (caller
    already under an ambient jit) are never cached."""
    if fn is None:
        fn = _identity
    spec = jax.ShapeDtypeStruct(example.shape, example.dtype)
    key = (fn, spec.shape, str(spec.dtype))
    try:
        hit = _CACHE.get(key)
    except TypeError:           # unhashable fn
        key, hit = None, None
    if hit is not None:
        return hit
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(spec)
    out_tree = tree_util.tree_structure(out_shape)
    jaxpr, consts = closed.jaxpr, list(closed.consts)
    n_consts = len(consts)

    def conv(v, *consts_):
        assert len(consts_) == n_consts, (len(consts_), n_consts)
        out = jax.core.eval_jaxpr(jaxpr, list(consts_), v)
        return tree_util.tree_unflatten(out_tree, out)

    if key is not None and not any(isinstance(c, jax.core.Tracer)
                                   for c in consts):
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = (conv, consts)
    return conv, consts


def _identity(v):
    return v
