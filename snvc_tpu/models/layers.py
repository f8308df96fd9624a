"""Shared conv building blocks (Flax linen, channels-last).

TPU-native re-design of the reference's conv zoo
(snvc/models/submodule.py:11-361): NHWC / NDHWC layouts so XLA tiles
channels onto the 128-lane axis, GroupNorm-or-BatchNorm switch matching
the reference's ``gn`` config, and the 3D/2D hourglass family used by both
the Vernier head and the global model.

All modules take a ``train`` flag; BatchNorm requires a mutable
``batch_stats`` collection when train=True.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _norm_groups(requested: int, channels: int) -> int:
    g = min(requested, channels)
    while channels % g:
        g -= 1
    return g


class FastGroupNorm(nn.Module):
    """GroupNorm computed as per-(sample, group) f32 moments followed by a
    single fused ``x * a + b`` pass in the compute dtype.

    Numerically identical to nn.GroupNorm(epsilon=1e-5 — torch's default,
    for checkpoint parity with the reference) but avoids the grouped
    reshape of the full activation (flax normalizes a [..., G, C//G] f32
    view of the whole tensor, which on large NDHWC volumes materializes
    f32 copies); here only the [N, C] channel moments are reshaped.
    Parameter names/shapes ("scale"/"bias", [C]) match nn.GroupNorm, so
    converted torch checkpoints load unchanged."""

    groups: int
    epsilon: float = 1e-5  # torch nn.GroupNorm default (reference parity)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        G = self.groups
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        red = tuple(range(1, x.ndim - 1))
        n_red = 1
        for a in red:
            n_red *= x.shape[a]
        n_red *= C // G
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=red).reshape(x.shape[0], G, C // G).sum(-1)
        s2 = jnp.sum(xf * xf, axis=red).reshape(x.shape[0], G, C // G).sum(-1)
        mean = s1 / n_red
        var = s2 / n_red - mean * mean
        inv = jax.lax.rsqrt(var + self.epsilon)  # [N, G]
        a = jnp.repeat(inv, C // G, axis=-1) * scale[None]  # [N, C]
        b = bias[None] - jnp.repeat(mean * inv, C // G, axis=-1) * scale[None]
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (C,)
        dt = self.dtype or x.dtype
        return (
            x.astype(jnp.float32) * a.reshape(shape) + b.reshape(shape)
        ).astype(dt)


class Norm(nn.Module):
    """GroupNorm (gn=True) or BatchNorm, per the reference's switch
    (submodule.py:28,49)."""

    gn: bool = True
    groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.gn:
            return FastGroupNorm(
                groups=_norm_groups(self.groups, x.shape[-1]),
                dtype=self.dtype,
                name="GroupNorm_0",
            )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)


class ConvNorm(nn.Module):
    """2D conv + norm (reference convbn, submodule.py:11-29).

    The reference uses padding=dilation when dilation > 1; with k=3 that
    keeps 'same' spatial dims, which is what we express directly.
    """

    features: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    dilation: int = 1
    gn: bool = True
    groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel,) * 2 if isinstance(self.kernel, int) else self.kernel
        s = (self.stride,) * 2 if isinstance(self.stride, int) else self.stride
        # torch-symmetric padding ((k-1)//2 * dilation per side): equals
        # SAME at stride 1, but flax-SAME at stride 2 pads (0, 1) and
        # shifts converted torch checkpoints by one pixel
        pad = tuple(((kk - 1) // 2 * self.dilation,) * 2 for kk in k)
        x = nn.Conv(
            self.features,
            k,
            strides=s,
            padding=pad,
            kernel_dilation=(self.dilation,) * 2,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return Norm(self.gn, self.groups, dtype=self.dtype)(x, train)


class Conv3d(nn.Module):
    """3D convolution decomposed into per-depth-tap 2D convolutions.

    XLA's TPU lowering of native Conv3D runs ~3x slower than the
    mathematically-identical sum of kd shifted Conv2D applications
    (measured 73 ms -> 23 ms for k=7^3 on [8,16,96,96,64] bf16 on v5e), so
    3D convs here are expressed as
        y[:, d] = sum_dz conv2d(x[:, d*sd + dz*dil - pad], w[dz])
    with flax-SAME padding semantics on every axis.  The parameter keeps
    the standard [kd, kh, kw, I, O] kernel layout.

    ``fold_depth`` selects a second exact formulation for unit depth
    stride: the kd shifted depth slices are concatenated on the CHANNEL
    axis and a SINGLE conv2d with kd*C input channels computes the sum —
    one big MXU matmul instead of kd small-C ones (C=32 leaves 3/4 of the
    128-wide MXU idle; kd*C=96..224 fills it).  "auto" enables it when
    sd==1 and kd*C is MXU-friendly.

    Default is "never": the same-window model-level A/B (BENCH.md,
    2026-08-17) measured the fold a 19% REGRESSION on the full stereo
    model (9.56 -> 7.73 pairs/s) and a wash on the vernier models — the
    kd-fold concatenated volume triples HBM traffic, which buys back
    more than the MXU occupancy gain on these memory-bound stacks.  The
    op-level microbench that motivated it (1.25x on an isolated k3^3)
    did not survive composition with XLA's fusions.

    ``fold_output`` is the OUTPUT-side dual, motivated by the hypothesis
    that F = 32..64 output features under-fill the MXU's 128 output
    lanes: it computes ONE conv2d with [kh, kw, C, kd*F] outputs (every
    (plane, depth-tap) product — the same total FLOPs, wider GEMM) and
    reduces the kd depth-shifted output blocks with a fused sum,
    duplicating only the small output tensor rather than the input.

    Also default "never": the same-window A/B (BENCH.md, 2026-08-19)
    measured it a 20 % REGRESSION on the flagship vernier (10.63 ->
    8.51 inst/s, the k7^3 conv1's 7x-widened activation dominating) and
    -2.7 % on the stereo model, with a +5 % win only on the small
    vernier — i.e. XLA's TPU conv emitter does NOT leave output lanes
    idle at F=32 the way a naive GEMM lowering would, so the fold only
    pays where activations are tiny.  Kept behind SNVC_FOLD_OUT for
    future shapes.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dilation: int = 1
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    fold_depth: str = "never"  # "never" | "auto" | "always"
    fold_output: str = "never"  # "never" | "auto" | "always"
    pallas: str = "never"  # "never" | "auto" — implicit-GEMM k3^3 kernel
    # in-VMEM fold_out Pallas kernel for the large-tap (kd >= 5) shapes
    # (SNVC_FOLD_VMEM hatch): the fold_out GEMM won 1.79x/1.2x standalone
    # on k7/k5 (round-4c) but regressed -23 % composed because the
    # kd*F-widened activation round-trips HBM (round-4d); this kernel
    # keeps the widened tile and the tap accumulator in VMEM
    # (ops/conv3d_fold_pallas.py).  DEFAULT since the round-5 same-window
    # flagship A/B measured it +8.2 % end-to-end (11.42 -> 12.36 inst/s,
    # BENCH.md round-5b) — the first conv formulation win to survive
    # composition; `SNVC_FOLD_VMEM=never` restores the per-tap path.
    fold_vmem: str = "auto"  # "never" | "auto"
    # grouped-tap single-dispatch formulation (SNVC_GROUP_TAPS hatch): the
    # kd depth-shifted slabs concatenated on channels like fold_depth, but
    # convolved with feature_group_count=kd so group dz contracts slab dz
    # against w[dz] alone (an [kh, kw, C, kd*F] grouped GEMM — kd*F output
    # lanes instead of F), then a tap-axis f32 reduce.  Exact; candidate
    # from the round-4b per-stage profile (tools/bench_conv1_k7.py).
    group_taps: str = "never"  # "never" | "always"
    # cross-tap accumulation dtype for the per-tap path (SNVC_TAP_ACCUM):
    # "f32" upcasts each tap's conv output before the 7-way sum (safest);
    # "compute" keeps the sum in the compute dtype — each tap still
    # accumulates its own 49*C-deep contraction in f32 inside the MXU, so
    # only the final kd-way add is low-precision.
    tap_accum: str = "f32"  # "f32" | "compute"

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        sd, sh, sw = self.stride
        dil = self.dilation
        N, D, H, W, C = x.shape
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kd, kh, kw, C, self.features),
            jnp.float32,
        )
        dt = self.dtype or x.dtype
        w = w.astype(dt)
        x = x.astype(dt)
        # auto-fold bounds: C < 128 (wider inputs already fill the MXU) and
        # kd*C <= 256 (folding duplicates the volume kd-fold in HBM; large
        # products pay more in traffic than they gain in MXU occupancy).
        # SNVC_FOLD_DEPTH=never|always|auto overrides per process — a
        # benchmarking escape hatch for same-window model-level A/Bs
        # (tools/bench_conv3d.py, BENCH.md) — parameters are identical
        # either way, so checkpoints are unaffected.
        mode = os.environ.get("SNVC_FOLD_DEPTH", self.fold_depth)
        # sd == 1 gates "always" too: _fold_depth_conv is the unit-depth-
        # stride formulation, so depth-strided convs (Hourglass downs,
        # vernier compress) always take the per-tap path regardless of mode
        fold = sd == 1 and kd > 1 and (
            mode == "always"
            or (mode == "auto" and C < 128 and kd * C <= 256)
        )
        # output-side fold (SNVC_FOLD_OUT hatch): pays kd x on the small
        # OUTPUT tensor to lift the per-tap conv2d's 128-lane occupancy
        # from F/128 to min(kd*F, 128)/128.  F >= 128 already fills the
        # lanes; kd*F is capped so the widened activation stays cheap.
        omode = os.environ.get("SNVC_FOLD_OUT", self.fold_output)
        # "k5up": only the large-tap convs (kd >= 5), where the batch-2
        # shoot-out (artifacts/perf_r4/conv_shootout_b2.json) measured
        # fold_out 1.79x (k7) / 1.2x (k5) while k3 shapes lose — the
        # earlier blanket-auto model A/B (-20 %, BENCH.md 2026-08-19)
        # folded every conv including the losers.
        fold_out = sd == 1 and kd > 1 and not fold and (
            omode == "always"
            or (omode == "k5up" and kd >= 5 and self.features < 128)
            or (omode == "auto" and self.features < 128
                and kd * self.features <= 512)
        )
        # implicit-GEMM Pallas kernel for the hot k3^3/s1/d1 shape: full
        # 27C-deep MXU contraction at ~1x HBM traffic (the im2col fold
        # happens in VMEM; see ops/conv3d_pallas.py).  Same env-hatch
        # pattern as SNVC_FOLD_DEPTH for same-window A/Bs.
        pmode = os.environ.get("SNVC_CONV3D_PALLAS", self.pallas)
        if (
            pmode != "never"
            and jax.default_backend() not in ("cpu",)
            and (self.stride, self.dilation) == ((1, 1, 1), 1)
        ):
            from snvc_tpu.ops.conv3d_pallas import (
                conv3d_k3,
                conv3d_k3_available,
            )

            if conv3d_k3_available(x.shape, w.shape):
                out = conv3d_k3(x, w)
                if self.use_bias:
                    b = self.param(
                        "bias", nn.initializers.zeros, (self.features,),
                        jnp.float32,
                    )
                    out = out + b.astype(dt)
                return out
        vmode = os.environ.get("SNVC_FOLD_VMEM", self.fold_vmem)
        if vmode != "never" and jax.default_backend() not in ("cpu",):
            from snvc_tpu.ops.conv3d_fold_pallas import (
                conv3d_fold_vmem,
                fold_vmem_available,
            )

            if fold_vmem_available(x.shape, w.shape, self.stride, dil):
                out = conv3d_fold_vmem(x, w, dil)
                if self.use_bias:
                    b = self.param(
                        "bias", nn.initializers.zeros, (self.features,),
                        jnp.float32,
                    )
                    out = out + b.astype(dt)
                return out
        gmode = os.environ.get("SNVC_GROUP_TAPS", self.group_taps)
        group = sd == 1 and kd > 1 and not fold and not fold_out and (
            gmode == "always"
        )
        if fold:
            return self._fold_depth_conv(x, w, dt)
        if fold_out:
            return self._fold_output_conv(x, w, dt)
        if group:
            return self._group_taps_conv(x, w, dt)
        # torch-symmetric padding along depth: (k-1)//2 * dilation per side,
        # the same formula as ConvNorm (equals flax-SAME at stride 1; at
        # stride 2 flax-SAME pads (0, 1) which misaligns converted torch
        # checkpoints by one voxel; ((k-1)*dil)//2 would differ for even
        # kernels with dilation > 1)
        eff_kd = (kd - 1) * dil + 1
        pad_d = (kd - 1) // 2 * dil
        Do = (D + 2 * pad_d - eff_kd) // sd + 1
        xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
        # cross-tap accumulation dtype (see tap_accum field doc)
        acc = os.environ.get("SNVC_TAP_ACCUM", self.tap_accum)
        acc_dt = jnp.float32 if acc == "f32" else dt
        out = None
        for dz in range(kd):
            start = dz * dil
            xs = xp[:, start : start + (Do - 1) * sd + 1 : sd]
            xs = xs.reshape(N * Do, H, W, C)
            # no preferred_element_type widening: a (bf16, bf16) -> f32 conv
            # has no transpose rule (grad dies with a dtype mismatch); the
            # MXU accumulates in f32 internally either way, and the cross-
            # tap sum is upcast explicitly below
            pad_h = (kh - 1) // 2 * dil
            pad_w = (kw - 1) // 2 * dil
            o = jax.lax.conv_general_dilated(
                xs,
                w[dz],
                (sh, sw),
                ((pad_h, pad_h), (pad_w, pad_w)),
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(acc_dt)
            out = o if out is None else out + o
        out = out.astype(dt)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(dt)
        Ho, Wo = out.shape[1], out.shape[2]
        return out.reshape(N, Do, Ho, Wo, self.features)

    def _fold_output_conv(self, x, w, dt):
        """Exact sd==1 formulation: ONE conv2d over every padded depth
        plane with [kh, kw, C, kd*F] outputs — each (plane, depth-tap)
        product appears exactly once in both schemes, so FLOPs are
        identical to the per-tap path, but the GEMM's output width is
        kd*F instead of F — then the kd depth-shifted output blocks are
        summed (a fused elementwise reduce over D-aligned slices)."""
        kd, kh, kw = self.kernel
        _, sh, sw = self.stride
        dil = self.dilation
        N, D, H, W, C = x.shape
        F = self.features
        pad_d = (kd - 1) // 2 * dil
        Dp = D + 2 * pad_d
        Do = Dp - (kd - 1) * dil  # depth-valid count after the padded conv
        xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
        # [kd, kh, kw, C, F] -> [kh, kw, C, kd*F]; block dz on the lane axis
        wf = jnp.moveaxis(w, 0, 3).reshape(kh, kw, C, kd * F)
        pad_h = (kh - 1) // 2 * dil
        pad_w = (kw - 1) // 2 * dil
        ys = jax.lax.conv_general_dilated(
            xp.reshape(N * Dp, H, W, C),
            wf,
            (sh, sw),
            ((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        Ho, Wo = ys.shape[1], ys.shape[2]
        ys = ys.reshape(N, Dp, Ho, Wo, kd, F)
        # out[:, d] = sum_dz ys[:, d + dz*dil, ..., dz, :]  (Do == D for
        # odd kernels at sd == 1 with the symmetric (k-1)//2*dil padding)
        out = None
        for dz in range(kd):
            o = ys[:, dz * dil : dz * dil + Do, :, :, dz].astype(jnp.float32)
            out = o if out is None else out + o
        out = out.astype(dt)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(dt)
        return out

    def _group_taps_conv(self, x, w, dt):
        """Exact sd==1 formulation: the kd depth-shifted slabs concatenated
        on channels (as in _fold_depth_conv) but convolved as a GROUPED
        conv2d with feature_group_count=kd — group dz contracts slab dz
        against w[dz] alone, producing kd*F output channels in one GEMM
        phase — followed by a tap-axis f32 reduce."""
        kd, kh, kw = self.kernel
        _, sh, sw = self.stride
        dil = self.dilation
        N, D, H, W, C = x.shape
        F = self.features
        pad_d = (kd - 1) // 2 * dil
        eff_kd = (kd - 1) * dil + 1
        Do = D + 2 * pad_d - eff_kd + 1
        xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
        slabs = jnp.concatenate(
            [xp[:, dz * dil : dz * dil + Do] for dz in range(kd)], axis=-1
        )  # [N, Do, H, W, kd*C]
        # [kd, kh, kw, C, F] -> [kh, kw, C, kd*F]; group dz reads O block dz
        wg = jnp.concatenate([w[dz] for dz in range(kd)], axis=-1)
        pad_h = (kh - 1) // 2 * dil
        pad_w = (kw - 1) // 2 * dil
        ys = jax.lax.conv_general_dilated(
            slabs.reshape(N * Do, H, W, kd * C),
            wg,
            (sh, sw),
            ((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=kd,
        )
        Ho, Wo = ys.shape[1], ys.shape[2]
        out = jnp.sum(
            ys.reshape(N * Do, Ho, Wo, kd, F).astype(jnp.float32), axis=3
        ).astype(dt)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(dt)
        return out.reshape(N, Do, Ho, Wo, F)

    def _fold_depth_conv(self, x, w, dt):
        """Exact sd==1 formulation: kd depth-shifted slices concatenated on
        channels, one conv2d with [kh, kw, kd*C, O] kernel."""
        kd, kh, kw = self.kernel
        _, sh, sw = self.stride
        dil = self.dilation
        N, D, H, W, C = x.shape
        pad_d = (kd - 1) // 2 * dil
        eff_kd = (kd - 1) * dil + 1
        Do = D + 2 * pad_d - eff_kd + 1
        xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
        folded = jnp.concatenate(
            [xp[:, dz * dil : dz * dil + Do] for dz in range(kd)], axis=-1
        )  # [N, Do, H, W, kd*C]
        # [kd, kh, kw, C, O] -> [kh, kw, kd*C, O] matching the channel concat
        wk = jnp.moveaxis(w, 0, 2).reshape(kh, kw, kd * C, self.features)
        pad_h = (kh - 1) // 2 * dil
        pad_w = (kw - 1) // 2 * dil
        out = jax.lax.conv_general_dilated(
            folded.reshape(N * Do, H, W, kd * C),
            wk,
            (sh, sw),
            ((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(dt)
        Ho, Wo = out.shape[1], out.shape[2]
        return out.reshape(N, Do, Ho, Wo, self.features).astype(dt)


class ConvNorm3d(nn.Module):
    """3D conv + norm, NDHWC (reference convbn_3d, submodule.py:32-50)."""

    features: int
    kernel: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    dilation: int = 1
    gn: bool = True
    groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel,) * 3 if isinstance(self.kernel, int) else self.kernel
        s = (self.stride,) * 3 if isinstance(self.stride, int) else self.stride
        x = Conv3d(
            self.features, k, s, self.dilation, use_bias=False, dtype=self.dtype
        )(x)
        return Norm(self.gn, self.groups, dtype=self.dtype)(x, train)


class ConvTranspose3dFast(nn.Module):
    """k3 stride-2 2x-upsampling 3D transposed conv as 8 parity sub-convs.

    XLA's TPU lowering of the native input-dilated Conv3D is pathological
    (measured 630 ms for the full-res hourglass deconv vs <100 ms for the
    equivalent forward convs).  Alignment matches torch's
    ConvTranspose3d(k=3, s=2, p=1, output_padding=1) — the reference's only
    deconv configuration (snvc/models/submodule.py:127-211) — i.e. explicit
    padding (1, 2) on the dilated input.  Each output parity class per axis
    then sees fixed kernel taps (k = stored flax kernel = spatially-flipped
    torch kernel, see utils/convert_torch.py):
        y[2j]   = k[1] x[j]                    (1-tap)
        y[2j+1] = k[0] x[j] + k[2] x[j+1]      (2-tap conv, pad (0,1))
    so the 3D transposed conv is exactly 8 small forward convolutions over
    the *undilated* input (no zero-multiply waste), interleaved.  The
    parameter ("kernel", [3,3,3,I,O]) matches nn.ConvTranspose with
    padding ((1,2),)*3 — converted checkpoints (flipped by the converter)
    load unchanged; parity tests in tests/test_models.py and
    tests/test_convert_torch.py."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        N, D, H, W, C = x.shape
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, C, self.features),
            jnp.float32,
        )
        dt = self.dtype or x.dtype
        w = w.astype(dt)
        x = x.astype(dt)
        taps = {0: (1,), 1: (0, 2)}  # parity -> kernel tap indices
        # depth padded once for the 2-tap (parity-1) slices
        xdp = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        ys = []
        for pd in (0, 1):
            for ph in (0, 1):
                for pw in (0, 1):
                    pad2 = (
                        (0, 1) if ph == 1 else (0, 0),
                        (0, 1) if pw == 1 else (0, 0),
                    )
                    o = None
                    for i, kd in enumerate(taps[pd]):
                        xs = (xdp[:, i : i + D] if pd == 1 else x).reshape(
                            N * D, H, W, C
                        )
                        k2 = w[kd][np.array(taps[ph])][:, np.array(taps[pw])]
                        # no preferred_element_type: see Conv3d (grad has no
                        # transpose rule for dtype-widening convs)
                        t = jax.lax.conv_general_dilated(
                            xs,
                            k2,
                            (1, 1),
                            pad2,
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ).astype(jnp.float32)
                        o = t if o is None else o + t
                    ys.append(o.reshape(N, D, H, W, self.features).astype(dt))
        y = jnp.stack(ys, axis=0).reshape(2, 2, 2, N, D, H, W, self.features)
        y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7)  # N, D,pd, H,ph, W,pw, O
        return y.reshape(N, 2 * D, 2 * H, 2 * W, self.features)


class DeconvNorm(nn.Module):
    """2x transposed-conv upsample + norm (2D or 3D by ``ndim``)."""

    features: int
    ndim: int = 3
    gn: bool = True
    groups: int = 32
    dtype: Optional[Dtype] = None
    decomposed: bool = True  # parity-decomposed 3D deconv (False = native)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ndim == 3 and self.decomposed:
            x = ConvTranspose3dFast(
                self.features, dtype=self.dtype, name="ConvTranspose_0"
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (3,) * self.ndim,
                strides=(2,) * self.ndim,
                # torch ConvTranspose(k3, s2, p1, op1) alignment, matching
                # ConvTranspose3dFast (kernels are flipped-torch layout)
                padding=((1, 2),) * self.ndim,
                use_bias=False,
                dtype=self.dtype,
            )(x)
        return Norm(self.gn, self.groups, dtype=self.dtype)(x, train)


class ResBlock2d(nn.Module):
    """Two 3x3 convs with a residual (reference submodule.BasicBlock:52-74;
    note: no final relu, matching the reference exactly)."""

    features: int
    stride: int = 1
    dilation: int = 1
    gn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNorm(
            self.features, 3, self.stride, self.dilation, self.gn, dtype=self.dtype
        )(x, train)
        out = nn.relu(out)
        out = ConvNorm(self.features, 3, 1, self.dilation, self.gn, dtype=self.dtype)(
            out, train
        )
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride,) * 2,
                use_bias=False,
                dtype=self.dtype,
            )(x)
            x = Norm(self.gn, dtype=self.dtype)(x, train)
        return out + x


class Hourglass(nn.Module):
    """Two-level U-Net over 3D (ndim=3) or 2D (ndim=2) volumes with the
    reference's pre/post skip-state interface (submodule.py:85-168,317-361).

    __call__(x, presqu, postsqu) -> (out, pre, post); all at the input
    channel count ``features`` except pre/post at 2x.
    """

    features: int
    ndim: int = 3
    gn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        f2 = self.features * 2
        Conv = ConvNorm3d if self.ndim == 3 else ConvNorm
        out = nn.relu(Conv(f2, 3, 2, gn=self.gn, dtype=self.dtype)(x, train))
        pre = Conv(f2, 3, 1, gn=self.gn, dtype=self.dtype)(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)
        out = nn.relu(Conv(f2, 3, 2, gn=self.gn, dtype=self.dtype)(pre, train))
        out = nn.relu(Conv(f2, 3, 1, gn=self.gn, dtype=self.dtype)(out, train))
        up = DeconvNorm(f2, self.ndim, self.gn, dtype=self.dtype)(out, train)
        post = nn.relu(up + (presqu if presqu is not None else pre))
        out = DeconvNorm(self.features, self.ndim, self.gn, dtype=self.dtype)(
            post, train
        )
        return out, pre, post


class HourglassDeep(nn.Module):
    """Four-level (1/16) encoder-decoder with skip adds
    (reference hourglass_downsample_16 / hourglass2d_downsample_16,
    submodule.py:223-315).  __call__(x) -> out at input channels."""

    features: int
    ndim: int = 3
    gn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f2 = self.features * 2
        Conv = ConvNorm3d if self.ndim == 3 else ConvNorm

        def down(h, stride):
            return nn.relu(Conv(f2, 3, stride, gn=self.gn, dtype=self.dtype)(h, train))

        def match_add(up, skip):
            # crop the upsample to the skip extent (handles small/odd dims
            # the reference's fixed 32-deep grids never hit)
            sl = (slice(None),) + tuple(slice(0, s) for s in skip.shape[1:-1])
            return up[sl + (slice(None),)] + skip

        d1 = down(down(x, 2), 1)  # 1/2
        d2 = down(down(d1, 2), 1)  # 1/4
        d3 = down(down(d2, 2), 1)  # 1/8
        d4 = down(down(d3, 2), 1)  # 1/16
        u1 = match_add(DeconvNorm(f2, self.ndim, self.gn, dtype=self.dtype)(d4, train), d3)
        u2 = match_add(DeconvNorm(f2, self.ndim, self.gn, dtype=self.dtype)(u1, train), d2)
        u3 = match_add(DeconvNorm(f2, self.ndim, self.gn, dtype=self.dtype)(u2, train), d1)
        out = DeconvNorm(self.features, self.ndim, self.gn, dtype=self.dtype)(u3, train)
        sl = (slice(None),) + tuple(slice(0, s) for s in x.shape[1:-1])
        return out[sl + (slice(None),)]


def avg_pool_height(x, factor: int):
    """Average-pool the depth (h) axis of an NDHWC volume by ``factor``
    (reference AvgPool3d((k,1,1)), vernier.py:289)."""
    N, D, H, W, C = x.shape
    return jnp.mean(x.reshape(N, D // factor, factor, H, W, C), axis=2)


def pixel_shuffle_2d(x, factor: int):
    """Depth-to-space on NHWC (reference nn.PixelShuffle, hrnet.py:333)."""
    N, H, W, C = x.shape
    r = factor
    x = x.reshape(N, H, W, C // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(N, H * r, W * r, C // (r * r))
