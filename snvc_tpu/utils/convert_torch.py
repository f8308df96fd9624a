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


def conv_transpose2d_kernel(w: np.ndarray, flip: bool = True) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kH, kW] -> flax ConvTranspose
    [kH, kW, I, O].

    flax's ConvTranspose applies the kernel unflipped
    (transpose_kernel=False) while torch's deconv is the gradient of Conv2d
    (spatially flipped), so exact numeric parity requires the spatial flip
    (default) plus torch's padding alignment on the flax side — our deconv
    layers (models/layers.py DeconvNorm/ConvTranspose3dFast) use explicit
    ((1,2),)*ndim padding to match torch (k=3, s=2, p=1, op=1)."""
    w = np.asarray(w)
    if flip:
        w = w[:, :, ::-1, ::-1].copy()
    return np.transpose(w, (2, 3, 0, 1))


def conv_transpose3d_kernel(w: np.ndarray, flip: bool = True) -> np.ndarray:
    """torch ConvTranspose3d [I, O, kD, kH, kW] -> flax [kD, kH, kW, I, O],
    spatially flipped for numeric parity (see conv_transpose2d_kernel)."""
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


def _flatten(
    tree, prefix=(), check_order: bool = False
) -> List[Tuple[Tuple[str, ...], Any]]:
    """Flatten a flax param tree in CREATION order.

    flax dicts preserve module-creation order, which for a faithfully
    mirrored architecture equals torch's registration (state_dict) order —
    including interleaved module types (HRNet's stem convs/bns, stages,
    transitions).  Sorting alphabetically here would visit BatchNorm_*
    before Conv_* and scramble the greedy alignment.

    With check_order=True (the greedy-alignment entry point,
    convert_module), trees that did NOT come from a live model (e.g.
    deserialized checkpoints, whose keys arrive alphabetically:
    Conv_10 < Conv_2) are REJECTED rather than silently cross-wired: an
    alphabetized dict is detectable whenever some module type reaches 10
    instances, and the greedy shape-matcher would otherwise pair
    same-shaped tensors to the wrong modules without any error.  (The
    default skips the check — internal result trees merged in torch-group
    order legitimately interleave module numbers.)"""
    out = []
    if isinstance(tree, dict):
        if check_order:
            _check_creation_order(tree, prefix)
        for k in tree.keys():
            out.extend(_flatten(tree[k], prefix + (k,), check_order))
    else:
        out.append((prefix, tree))
    return out


def _check_creation_order(tree: Dict, prefix: Tuple[str, ...]) -> None:
    """Raise if sibling auto-numbered module names (Type_0, Type_1, ...)
    appear with non-monotonic numeric suffixes — the signature of an
    alphabetically re-sorted (deserialized) tree.  Convert from live-model
    variables, or re-order the tree, before calling convert_module."""
    last: Dict[str, int] = {}
    for k in tree.keys():
        head, _, tail = k.rpartition("_")
        if not (head and tail.isdigit()):
            continue
        n = int(tail)
        if head in last and n < last[head]:
            raise ValueError(
                f"param tree at {'/'.join(prefix) or '<root>'} is not in "
                f"module-creation order ({head}_{last[head]} precedes "
                f"{k}); it was probably deserialized from a checkpoint — "
                "greedy torch alignment needs a live-model tree "
                "(init the flax module and convert onto its variables)"
            )
        last[head] = n


def _module_sort_key(name: str):
    """Sort flax auto-names numerically (Conv_2 < Conv_10)."""
    if "_" in name:
        head, _, tail = name.rpartition("_")
        if tail.isdigit():
            return (head, int(tail))
    return (name, -1)


def _convert_tensor(
    torch_name: str, w: np.ndarray, target_shape, transpose_conv: bool = False
) -> Optional[np.ndarray]:
    """Convert one torch tensor to the flax layout for ``target_shape``.

    ``transpose_conv`` selects the deconvolution converters (spatial flip +
    I/O-preserving transpose).  It must be decided by the *target* — torch
    Conv[I==O] and ConvTranspose weights are shape-ambiguous, and loading a
    deconv weight through the conv converter (or unflipped) is numerically
    wrong even when the shapes line up.
    """
    w = np.asarray(w)
    cands = [w]
    if w.ndim == 4:
        cands = [conv_transpose2d_kernel(w)] if transpose_conv else [conv2d_kernel(w)]
    elif w.ndim == 5:
        cands = [conv_transpose3d_kernel(w)] if transpose_conv else [conv3d_kernel(w)]
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

    def take(pred, target_shape, transpose_conv=False):
        for i, (name, w) in enumerate(items):
            if used[i] or not pred(name):
                continue
            conv = _convert_tensor(name, w, target_shape, transpose_conv)
            if conv is not None:
                used[i] = True
                return name, conv
        return None, None

    new_params = {}
    for path, leaf in _flatten(flax_params, check_order=True):
        shape = tuple(np.shape(leaf))
        key = path[-1]
        if key == "kernel":
            # the flax side knows whether this kernel is a deconv (module
            # path contains ConvTranspose); the torch shape alone cannot
            name, w = take(
                lambda n: n.endswith(".weight") or n == "weight",
                shape,
                transpose_conv=any("ConvTranspose" in p for p in path),
            )
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
        for path, leaf in _flatten(flax_batch_stats, check_order=True):
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


# ---------------------------------------------------------------------------
# Release-checkpoint (epoch_80) name map
# ---------------------------------------------------------------------------

# The reference registers the released VernierScale's modules in this order
# (snvc/models/vernier.py:26-56: _init_3d_net -> _init_coord_head ->
# _init_bbox_head -> _init_feat_extract; BEV_type3 attrs at :249-313), so
# the torch state_dict groups by these prefixes.  Flax sorts "encoder"
# before "head" and auto-numbers by creation order, so a GLOBAL greedy
# alignment would cross-wire same-shaped tensors between the 2D backbone
# and the 3D head — conversion must be routed per group.
_VERNIER_TORCH_GROUPS = (
    "vimg_feat",
    "conv1",
    "conv2",
    "conv3",
    "conv4",
    "hg_conv3d",
    "fg_cls_head",
    "part_reg_head",
    "conv5",
    "hm1",
    "hm2",
    "coord_head",
    "bbox_head",
    "feat_net",
)


def _sorted_children(tree: Dict, prefix: str) -> List[str]:
    return [
        k
        for k in sorted(tree.keys(), key=_module_sort_key)
        if k.startswith(prefix)
    ]


def vernier_group_map(flax_params: Dict, use_part_reg_head: bool,
                      use_bbox_head: bool):
    """torch prefix -> list of flax ("encoder"/"head", child) paths for the
    BEV_type3 VernierScale (head graph: models/vernier.py
    _head_bev_type23, mirroring reference vernier.py:249-313).

    Resolved against the actual parameter tree (not guessed names) so it
    tracks remat/class-name variations of the hourglasses.
    """
    head = flax_params["head"]
    cn3 = _sorted_children(head, "ConvNorm3d_")
    c3 = _sorted_children(head, "Conv3d_")
    # Hourglass_* / HourglassDeep_* / CheckpointHourglass*_* (the rematted
    # 3D hourglass, cfg.remat).  The 3D one always sorts first: "Checkpoint"
    # precedes "Hourglass" alphabetically, and without remat the 3D
    # hourglass is created before the 2D one so its auto-number is lower.
    hgs = [
        k for k in sorted(head.keys(), key=_module_sort_key)
        if "Hourglass" in k
    ]
    n_expected = 6 + (1 if use_part_reg_head else 0)
    assert len(cn3) == n_expected, (cn3, n_expected)
    assert len(hgs) == 2, hgs

    m = {
        "feat_net": [("encoder", _sorted_children(flax_params["encoder"], "HRNet")[0])],
        "vimg_feat": [("head", cn3[0])],
        "conv1": [("head", cn3[1])],
        "conv2": [("head", cn3[2])],
        "conv3": [("head", cn3[3])],
        "hg_conv3d": [("head", hgs[0])],
        "fg_cls_head": [("head", cn3[4]), ("head", c3[0])],
        "conv4": [("head", cn3[-1])],
        "conv5": [("head", _sorted_children(head, "ConvNorm_")[0])],
        "hm1": [("head", hgs[1])],
        "hm2": [("head", _sorted_children(head, "Conv_")[0])],
    }
    if use_part_reg_head:
        m["part_reg_head"] = [("head", cn3[5]), ("head", c3[1])]
    ch = _sorted_children(head, "CoordHead")
    if ch:
        m["coord_head"] = [("head", ch[0])]
    if use_bbox_head:
        m["bbox_head"] = [("head", _sorted_children(head, "FCModel")[0])]
    return m


def _subtree(tree: Dict, path) -> Dict:
    node = tree
    for k in path:
        node = node[k]
    return node


def convert_vernier_checkpoint(
    state_dict: Dict[str, np.ndarray],
    flax_params: Dict,
    flax_batch_stats: Optional[Dict] = None,
    use_part_reg_head: bool = False,
    use_bbox_head: bool = False,
):
    """Convert a reference VernierScale checkpoint (epoch_80-style) into
    flax (params, batch_stats), routing each torch module group onto its
    flax counterpart and aligning greedily inside the group.

    Raises if any torch tensor is left unconsumed or any flax parameter is
    left unfilled — the structural "zero unmatched tensors" guarantee.
    """
    gm = vernier_group_map(flax_params, use_part_reg_head, use_bbox_head)
    new_params: Dict = {}
    new_stats: Dict = {}
    consumed = 0
    for prefix in _VERNIER_TORCH_GROUPS:
        if prefix not in gm:
            continue
        sub_sd = {
            k[len(prefix) + 1 :]: v
            for k, v in state_dict.items()
            if k.startswith(prefix + ".")
            and not k.endswith("num_batches_tracked")
        }
        if not sub_sd:
            raise ValueError(f"checkpoint has no tensors under '{prefix}.'")
        # assemble the flax target forest for this group, in order
        tgt_params = {}
        tgt_stats = {}
        for root, child in gm[prefix]:
            tgt_params.setdefault(root, {})[child] = _subtree(
                flax_params, (root, child)
            )
            if flax_batch_stats and root in flax_batch_stats and child in (
                flax_batch_stats.get(root) or {}
            ):
                tgt_stats.setdefault(root, {})[child] = flax_batch_stats[root][child]
        got_p, got_s = convert_module(sub_sd, tgt_params, tgt_stats or None)
        if prefix == "conv5":
            _permute_conv5_inputs(got_p, flax_params)
        n_leaves = len(_flatten(got_p)) + len(_flatten(got_s))
        if n_leaves != len(sub_sd):
            raise ValueError(
                f"group '{prefix}': {len(sub_sd)} torch tensors but "
                f"{n_leaves} flax leaves — unconsumed tensors in the group"
            )
        _merge(new_params, got_p)
        _merge(new_stats, got_s)
        consumed += len(sub_sd)
    known = set()
    for prefix in gm:
        known.update(
            k for k in state_dict if k.startswith(prefix + ".")
        )
    extra = [k for k in state_dict if k not in known]
    if extra:
        raise ValueError(f"unrouted torch tensors: {extra[:8]} (+{len(extra)-8 if len(extra)>8 else 0})")
    return new_params, new_stats


def _permute_conv5_inputs(conv5_params: Dict, flax_params: Dict) -> None:
    """Reorder the converted conv5 kernel's input channels from the torch
    BEV packing to the flax one.

    The reference flattens the pooled voxel as ``x.reshape(N, F*H, W, L)``
    (channel index = f*H + h, vernier.py:434-436) while the flax head packs
    ``[N, W, L, H*C]`` channels-last (index = h*C + c,
    models/vernier.py _head_bev_type23).  Both orders are internally
    consistent for fresh training, but a torch checkpoint's conv5 weights
    index inputs the torch way — without this permutation the converted
    kernel reads feature f at height h as feature-at-a-different-height.
    """
    # dim = vimg_feat's output width: its kernel is [1, 1, 1, 2*dim, dim]
    head = flax_params["head"]
    vimg = _subtree(head, (_sorted_children(head, "ConvNorm3d_")[0],))
    dim = _flatten(vimg)[0][1].shape[-1]

    def visit(node):
        for k, v in node.items():
            if isinstance(v, dict):
                visit(v)
            elif k == "kernel" and np.ndim(v) == 4:
                kh, kw, cin, cout = v.shape
                H = cin // dim
                assert H * dim == cin, (cin, dim)
                w = np.asarray(v).reshape(kh, kw, dim, H, cout)
                node[k] = np.ascontiguousarray(
                    np.transpose(w, (0, 1, 3, 2, 4))
                ).reshape(kh, kw, cin, cout)

    visit(conv5_params)


def _merge(dst: Dict, src: Dict):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v)
        else:
            dst[k] = v


def abstract_init(model, *args, rng_seed: int = 0, **kwargs):
    """Creation-order, shape-only variables template via one abstract trace.

    Conversion needs a LIVE-ordered flax tree, but every convenient way of
    building one at scale destroys the order or the budget:

      * ``jax.jit(model.init)`` / ``lazy_init`` return pytrees whose dicts
        are rebuilt with SORTED keys (Conv_10 < Conv_2) at the jit
        boundary — the exact cross-wiring hazard _check_creation_order
        rejects,
      * plain eager ``model.init`` preserves order but executes the whole
        forward op-by-op (minutes for the tiny config on CPU, hours at
        release scale).

    This records the flax insertion order from INSIDE a ``jax.eval_shape``
    trace (where the dict is still creation-ordered, no compute, no
    compile) and reorders the abstract result.  Leaves are
    ShapeDtypeStructs — exactly what the torch converters need (they read
    only ``np.shape`` and fill every value from the checkpoint).
    """
    import jax

    order: Dict[Tuple[str, ...], List[str]] = {}

    def record(tree, path=()):
        if isinstance(tree, dict):
            order[path] = list(tree.keys())
            for k in tree:
                record(tree[k], path + (k,))

    def f(rng):
        v = model.init(rng, *args, **kwargs)
        if hasattr(v, "unfreeze"):  # FrozenDict-era flax
            v = v.unfreeze()
        record(v)
        return v

    shapes = jax.eval_shape(f, jax.random.PRNGKey(rng_seed))

    def reorder(tree, path=()):
        if not isinstance(tree, dict):
            return tree
        return {k: reorder(tree[k], path + (k,)) for k in order[path]}

    return reorder(shapes)


def torchify_shape(path, shape):
    """Expected torch tensor shape for a flax leaf (inverse converters)."""
    if path[-1] == "kernel":
        if any("ConvTranspose" in p for p in path):
            return (shape[-2], shape[-1]) + tuple(shape[:-2])
        if len(shape) >= 3:
            return (shape[-1], shape[-2]) + tuple(shape[:-2])
        return (shape[1], shape[0])  # dense
    return tuple(shape)


def fabricate_vernier_state_dict(
    flax_params: Dict,
    flax_batch_stats: Optional[Dict] = None,
    use_part_reg_head: bool = False,
    use_bbox_head: bool = False,
    rng: Optional[np.random.Generator] = None,
):
    """Build a release-checkpoint-SHAPED random torch state_dict for a live
    flax VernierScale tree: same module grouping (vimg_feat..hm2,
    coord_head, bbox_head, feat_net — reference vernier.py:26-56,249-313),
    torch tensor layouts, torch key suffixes.  Used to exercise the full
    convert->infer->evaluate harness (tools/validate_epoch80.py --selftest)
    without the real epoch_80.tar."""
    rng = rng or np.random.default_rng(0)
    gm = vernier_group_map(flax_params, use_part_reg_head, use_bbox_head)
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}
    sd: Dict[str, np.ndarray] = {}
    stats = flax_batch_stats or {}
    for prefix, paths in gm.items():
        j = 0
        for root, child in paths:
            for path, leaf in _flatten(flax_params[root][child]):
                tshape = torchify_shape((child,) + path, np.shape(leaf))
                sd[f"{prefix}.{j}.{suffix[path[-1]]}"] = (
                    rng.standard_normal(tshape).astype(np.float32) * 0.05
                )
                j += 1
            sub_stats = (stats.get(root) or {}).get(child)
            if sub_stats:
                for path, leaf in _flatten(sub_stats):
                    base = 1.0 if path[-1] == "var" else 0.0
                    sd[f"{prefix}.{j}.{suffix[path[-1]]}"] = (
                        base
                        + rng.standard_normal(np.shape(leaf)).astype(np.float32)
                        * 0.01
                    )
                    j += 1
    return sd


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference-style torch .tar checkpoint into numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
