"""Read-only weight-tree views enforcing the engine's rebind-only contract.

Compiled pipelines bake the engine's weight pytrees into their closures
(``core/engine.py`` — flattening ~300 leaves per dispatch costs ~2 ms on a
tunneled TPU), so weights may only change by REBINDING the property
(``engine.variables = new_tree``), never by mutating leaves in place: an
in-place write cannot invalidate the compiled programs and would silently
keep serving stale constants. ``FrozenVars`` makes the illegal write loud —
every mutating dict operation raises ``TypeError`` with the fix spelled out.

Registered as a JAX pytree node (flattens exactly like ``dict``, in sorted
key order) so frozen trees trace/jit/device_put like plain ones. Unflatten
deliberately returns a PLAIN dict: any tree op over a frozen tree
(``jax.tree_util.tree_map`` and friends) therefore yields a mutable copy,
which is also the supported way to edit-then-rebind:

    new = thaw(engine.variables)          # or jax.tree_util.tree_map(lambda x: x, ...)
    new["params"]["head"]["kernel"] = k2
    engine.variables = new                # setter re-freezes + invalidates
"""
from __future__ import annotations

from typing import Any

import jax

_MSG = (
    "engine weight trees are read-only views: in-place mutation cannot "
    "invalidate the compiled pipelines that bake these weights and would "
    "silently serve stale constants. Copy with thaw(tree), edit, then "
    "rebind via the property (engine.variables = new_tree) — see "
    "FaceEngine.variables."
)


class FrozenVars(dict):
    """A dict whose mutating operations raise with the rebind recipe."""

    def _frozen(self, *a, **k):
        raise TypeError(_MSG)

    __setitem__ = _frozen
    __delitem__ = _frozen
    clear = _frozen
    pop = _frozen
    popitem = _frozen
    setdefault = _frozen
    update = _frozen
    __ior__ = _frozen

    def __repr__(self):  # pragma: no cover - debugging nicety
        return f"FrozenVars({dict.__repr__(self)})"

    # pickle/deepcopy reconstruct dict subclasses by replaying __setitem__,
    # which is frozen here — rebuild through the constructor instead (the
    # C-level dict init bypasses the override). deepcopy yields a PLAIN
    # mutable tree: a copy is exactly the edit-then-rebind escape hatch.
    def __reduce__(self):
        return (FrozenVars, (dict(self),))

    def __deepcopy__(self, memo):
        import copy

        return {k: copy.deepcopy(dict.__getitem__(self, k), memo)
                for k in self}


def _flatten_with_keys(fv: FrozenVars):
    keys = sorted(fv)  # match dict's pytree ordering
    return (
        tuple((jax.tree_util.DictKey(k), dict.__getitem__(fv, k)) for k in keys),
        tuple(keys),
    )


def _unflatten(keys, children):
    # plain dict on purpose: tree ops over frozen trees produce mutable copies
    return dict(zip(keys, children))


jax.tree_util.register_pytree_with_keys(
    FrozenVars, _flatten_with_keys, _unflatten)


def freeze(tree: Any) -> Any:
    """Recursively wrap every dict in ``tree`` as :class:`FrozenVars`.

    Containers other than dict (the age/gender ``(age_vars, gen_vars)``
    tuple, lists of blobs) are rebuilt with frozen children; leaves pass
    through. ``None`` stays ``None`` (unconfigured embedder/ag slots)."""
    if isinstance(tree, dict):
        return FrozenVars({k: freeze(v) for k, v in tree.items()})
    if isinstance(tree, tuple):
        return tuple(freeze(v) for v in tree)
    if isinstance(tree, list):
        # lists stay lists (pytree structure must be preserved) but their
        # dict children still freeze
        return [freeze(v) for v in tree]
    return tree


def thaw(tree: Any) -> Any:
    """Deep-copy a (possibly frozen) tree back to plain mutable dicts."""
    if isinstance(tree, dict):
        return {k: thaw(v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return tuple(thaw(v) for v in tree)
    if isinstance(tree, list):
        return [thaw(v) for v in tree]
    return tree
