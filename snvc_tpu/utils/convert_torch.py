"""One-way PyTorch -> Flax weight conversion.

The reference distributes checkpoints as torch ``.tar`` files with a
``state_dict`` (docs/INFERENCE.md:9-12, epoch_80.tar); this module provides
the conversion layer so released weights can seed parity testing
(SURVEY.md §5 checkpoint/resume):

  * tensor-level layout converters (OIHW->HWIO etc.),
  * a BatchNorm splitter (weight/bias/running_mean/running_var ->
    flax scale/bias + batch_stats mean/var),
  * ``convert_module``: greedy structural alignment of a torch state_dict
    prefix onto a flax parameter subtree, with shape verification.

Numerical parity of converted modules is covered by tests
(tests/test_convert_torch.py) against live torch modules.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d [O, I, kD, kH, kW] -> flax [kD, kH, kW, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kH, kW] -> flax ConvTranspose
    [kH, kW, I, O].

    NOTE: flax's ConvTranspose applies the kernel unflipped
    (transpose_kernel=False); torch's is the gradient of Conv2d, so exact
    numeric parity additionally needs spatial flipping + transpose_kernel —
    use ``flip=True`` when porting torch deconvolutions."""
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def conv_transpose2d_kernel_flipped(w: np.ndarray) -> np.ndarray:
    return conv_transpose2d_kernel(np.asarray(w)[:, :, ::-1, ::-1].copy())


def conv_transpose3d_kernel(w: np.ndarray, flip: bool = False) -> np.ndarray:
    w = np.asarray(w)
    if flip:
        w = w[:, :, ::-1, ::-1, ::-1].copy()
    return np.transpose(w, (2, 3, 4, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [O, I] -> flax [I, O]."""
    return np.transpose(np.asarray(w), (1, 0))


def split_batchnorm(prefix: str, sd: Dict[str, np.ndarray]):
    """torch BN tensors under ``prefix`` -> (params, stats) dicts."""
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def groupnorm_params(prefix: str, sd: Dict[str, np.ndarray]):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


# ---------------------------------------------------------------------------
# structural alignment
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree.keys(), key=_module_sort_key):
            out.extend(_flatten(tree[k], prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def _module_sort_key(name: str):
    """Sort flax auto-names numerically (Conv_2 < Conv_10)."""
    if "_" in name:
        head, _, tail = name.rpartition("_")
        if tail.isdigit():
            return (head, int(tail))
    return (name, -1)


def _convert_tensor(torch_name: str, w: np.ndarray, target_shape) -> Optional[np.ndarray]:
    w = np.asarray(w)
    cands = [w]
    if w.ndim == 4:
        cands = [conv2d_kernel(w), conv_transpose2d_kernel(w)]
    elif w.ndim == 5:
        cands = [conv3d_kernel(w), conv_transpose3d_kernel(w)]
    elif w.ndim == 2:
        cands = [dense_kernel(w), w]
    for c in cands:
        if tuple(c.shape) == tuple(target_shape):
            return c
    return None


def convert_module(
    state_dict: Dict[str, np.ndarray],
    flax_params: Dict,
    flax_batch_stats: Optional[Dict] = None,
    strict: bool = True,
):
    """Greedy in-order alignment of a torch state_dict onto flax trees.

    Works when both sides enumerate the same architecture in the same
    module order (true for straight-line stacks like the hourglass/conv
    blocks).  Raises on any shape mismatch when ``strict``.

    Returns (params, batch_stats) with converted numpy arrays.
    """
    import jax

    # torch tensors in insertion order, with BN stats attached to weights
    items = list(state_dict.items())
    used = [False] * len(items)

    def take(pred, target_shape):
        for i, (name, w) in enumerate(items):
            if used[i] or not pred(name):
                continue
            conv = _convert_tensor(name, w, target_shape)
            if conv is not None:
                used[i] = True
                return name, conv
        return None, None

    new_params = {}
    for path, leaf in _flatten(flax_params):
        shape = tuple(np.shape(leaf))
        key = path[-1]
        if key == "kernel":
            name, w = take(lambda n: n.endswith(".weight") or n == "weight", shape)
        elif key == "scale":
            name, w = take(
                lambda n: n.endswith(".weight") and np.asarray(
                    dict(items)[n]
                ).ndim == 1,
                shape,
            )
        elif key == "bias":
            name, w = take(lambda n: n.endswith(".bias") or n == "bias", shape)
        else:
            name, w = take(lambda n: True, shape)
        if w is None:
            if strict:
                raise ValueError(f"no torch tensor for flax param {path} {shape}")
            w = np.asarray(leaf)
        _set(new_params, path, w)

    new_stats = {}
    if flax_batch_stats:
        for path, leaf in _flatten(flax_batch_stats):
            shape = tuple(np.shape(leaf))
            suffix = ".running_mean" if path[-1] == "mean" else ".running_var"
            name, w = take(lambda n: n.endswith(suffix), shape)
            if w is None:
                if strict:
                    raise ValueError(f"no torch stat for {path}")
                w = np.asarray(leaf)
            _set(new_stats, path, w)
    return new_params, new_stats


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference-style torch .tar checkpoint into numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
