"""Pytree checkpointing for params and chains.

SURVEY.md section 5 rebuild note: replace the reference's pickle-everything
snapshots with pytree checkpoints of params/chains while keeping the
``file= means load-or-create`` constructor contract (which
StochasticProcess preserves).  This module adds the pytree side: orbax
when available, a portable npz fallback otherwise.
"""

import os

import numpy as np

from . import DictObj

__all__ = ["save_checkpoint", "load_checkpoint"]


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def save_checkpoint(tree, path):
    """Save a params/chain pytree.  Directory path -> orbax; ``.npz`` -> a
    flat numpy archive (dict-of-arrays only)."""
    tree = _to_numpy_tree(tree)
    if path.endswith(".npz"):
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        np.savez(path, **tree)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(path, tree)
    return path


def load_checkpoint(path):
    """Inverse of :func:`save_checkpoint`; returns a DictObj for flat dicts."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return DictObj({k: f[k] for k in f.files})
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckpt:
        out = ckpt.restore(os.path.abspath(path))
    return DictObj(out) if isinstance(out, dict) else out
