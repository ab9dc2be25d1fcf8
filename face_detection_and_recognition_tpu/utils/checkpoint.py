"""Checkpoint save/load for model variables (orbax-backed).

The reference's "checkpoints" are vendor weight files (pth/onnx/pb/
caffemodel/IR) loaded by per-runtime loaders (SURVEY.md §5). Here all models
share one on-disk format: an orbax PyTree checkpoint of the flax variables
dict. Torch-origin weights enter through utils/weights.py converters and are
then saved in this format.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_variables(path: str, variables: Any) -> None:
    """Write (or REPLACE) the checkpoint at ``path`` — an explicit save to a
    named destination overwrites, like every vendor format it stands in for."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    variables = jax.tree_util.tree_map(np.asarray, variables)
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_variables(path: str) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
