"""NaN/Inf guards (SURVEY.md §5.2).

The reference hand-rolls `torch.nan_to_num(grad)` at two call sites
(stable_diffusion_depth.py:358, paint_by_example.py:672). Here the guard is
structural: `checkify` wrappers that turn silent NaNs into hard errors in
debug runs, and a tree-wide sanitizer for production steps.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def nan_to_num_tree(tree: Any) -> Any:
    """`nan_to_num` every float leaf (production-grade grad sanitizer)."""
    def clean(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.nan_to_num(x)
        return x
    return jax.tree_util.tree_map(clean, tree)


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Checkify-compatible in-jit assertion that every leaf is finite."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            checkify.check(jnp.all(jnp.isfinite(leaf)),
                           f"non-finite values in {name} leaf {i}")


def checked(fn: Callable) -> Callable:
    """Wrap a jittable fn so NaN/div-by-zero float errors surface as Python
    exceptions (debug mode): `out = checked(step)(args)`."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
