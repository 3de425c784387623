"""Debug/validation helpers (the "race detection / sanitizers" row of
SURVEY.md §5: the TPU-native equivalents are jit-vs-eager parity, NaN
checking, and deterministic PRNG keys)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Raise if any array leaf contains NaN/Inf (host-side check)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None or not hasattr(leaf, "dtype"):
            continue
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = np.asarray(leaf, dtype=np.float32)
            if not np.isfinite(arr).all():
                key = jax.tree_util.keystr(path)
                raise FloatingPointError(f"non-finite values in {name}{key}")


def check_jit_eager_parity(
    fn: Callable, *args, atol: float = 1e-5, rtol: float = 1e-4
) -> None:
    """Run fn jitted and eagerly; assert all outputs match — catches
    tracing bugs (leaked constants, wrong static handling)."""
    jitted = jax.jit(fn)(*args)
    eager = fn(*args)

    def cmp(a, b):
        if a is None:
            assert b is None
            return
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=atol, rtol=rtol,
        )

    jax.tree.map(cmp, jitted, eager)


def nan_guard(fn: Callable) -> Callable:
    """Wrap fn to run under jax.debug_nans (fail fast at the op producing
    the first NaN)."""

    def wrapped(*args, **kwargs):
        with jax.debug_nans(True):
            return fn(*args, **kwargs)

    return wrapped
