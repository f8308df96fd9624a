"""In-VMEM fold_out Pallas kernel for the large-tap 3D convolutions.

The vernier head's conv1_k7 (7^3, 64->32) is the single biggest block of
the flagship refinement step (26 % of the step at 34 % MXU, BENCH.md
round-4b) — the reference hot path is the conv1/conv2/conv3 prelude of
snvc/models/vernier.py:414-455.  The round-4c formulation shoot-out
measured the fold_out GEMM (one conv2d per depth plane with kd*F output
lanes, then a depth-shifted tap reduce) 1.79x faster standalone on this
exact shape, but composing it through XLA REGRESSED the model 23 %
(round-4d): the kd*F-widened activation ys round-trips HBM and stalls
the program.  This kernel keeps the fold_out formulation entirely in
VMEM: the widened per-plane GEMM tile and a rolling ``effd``-deep f32
accumulator never leave the chip, so the MXU-occupancy win survives
composition.

Formulation (stride 1, odd kernel, any dilation):

    out[d] = sum_dz conv2d(xp[d + dz*dil], w[dz])        # per-tap view
    ysT(p, r) = A @ B(p, r)   A: [kd*F, kh*kw*C]   B: [kh*kw*C, W]

One grid step computes ysT for ONE padded depth plane p and ONE row tile
(TH output rows, one dot per row), then scatters the kd sublane-blocks
into the rolling accumulator slot for output depth d = p - dz*dil; slot
d%effd is emitted when its last tap arrives (plane d + (kd-1)*dil).  The
MXU contraction is kh*kw*C deep (3136 for k7/C=64) with kd*F x W output
tiles — both sides past the 128 MXU width, unlike the per-tap path's
F=32 lanes.  The per-plane halo DMA is double-buffered across grid steps
(each step issues the next step's window before computing on its own).

Layout: Mosaic rejects HBM-DMA minors that are not whole 128-lane tiles
(the measured conv3d_pallas C=64 rejection, BENCH.md 2026-08-19), so the
input is pre-transposed to [N, Dp, Hp, C, Wpad] — the DMA'd window slices
only leading axes, and the (C, Wpad) minor pair is (16k, 128m)-tiled by
construction.  tools/probe_mosaic_align.py verified the remaining
in-kernel ops (sublane- and lane-offset slicing) on this toolchain; the
kernel needs NO minor-dim reshape anywhere.  The output leaves the
kernel as [N, D, H, F, W] — the SAME layout as the (unpadded) input —
so chained large-tap convs (the conv1/conv2/conv3 head prelude) compose
with zero intermediate transposes via ``conv3d_fold_vmem_t``; the NDHWC
wrapper pays one W<->C swap on each end (~5 ms at flagship scale vs the
~98 ms stage).

Forward only; gradients fall back to the per-tap XLA formulation via
custom_vjp, exactly like ops/conv3d_pallas.conv3d_k3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def conv3d_pertap_xla(x, w, dilation: int = 1):
    """Per-tap reference formulation (matches models.layers.Conv3d's
    default path): kd depth-shifted SAME conv2ds summed in f32."""
    kd, kh, kw = w.shape[:3]
    N, D, H, W, C = x.shape
    pad_d = (kd - 1) // 2 * dilation
    xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation
    out = None
    for dz in range(kd):
        xs = xp[:, dz * dilation : dz * dilation + D].reshape(N * D, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs,
            w[dz].astype(x.dtype),
            (1, 1),
            ((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        out = o if out is None else out + o
    return out.reshape(N, D, H, W, w.shape[-1]).astype(x.dtype)


def _kernel(x_hbm, a_ref, out_ref, xwin, bmat, acc, sem, *,
            TH, W, C, F, kd, kh, kw, dil, D):
    """Grid (N, H//TH, Dp), depth innermost.

    x_hbm: [N, Dp, Hpad, C, Wpad] (ANY); a_ref: [kd*F, kh*kw*C] VMEM;
    out block: [1, 1, TH, F, W]; xwin: [2, TH+effh-1, C, Wpad] double
    buffer (step i computes from slot i%2 while slot (i+1)%2 fills);
    bmat: [kh*kw*C, W] im2col scratch (rebuilt per output row — no concat
    temporaries);
    acc: [effd, TH, F, W] f32 rolling accumulator (persists across steps).
    """
    n = pl.program_id(0)
    h = pl.program_id(1)
    p = pl.program_id(2)
    HT = pl.num_programs(1)
    DP = pl.num_programs(2)
    effd = (kd - 1) * dil + 1
    effh = (kh - 1) * dil + 1
    idx = (n * HT + h) * DP + p
    total = pl.num_programs(0) * HT * DP

    def dma(i, slot):
        # flat grid index -> (n', h', p') window coordinates
        p_ = i % DP
        nh = i // DP
        return pltpu.make_async_copy(
            x_hbm.at[nh // HT, p_, pl.ds((nh % HT) * TH, TH + effh - 1)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(idx == 0)
    def _():
        dma(idx, 0).start()

    nxt = jnp.minimum(idx + 1, total - 1)  # clamp keeps the (predicated)
    # last-step prefetch construction in bounds

    @pl.when(idx + 1 < total)
    def _():
        dma(nxt, (idx + 1) % 2).start()

    dma(idx, idx % 2).wait()
    cur = idx % 2

    # retire the slot that will hold output depth d == p: its previous
    # occupant (d == p - effd) was emitted at plane p - 1
    acc[p % effd] = jnp.zeros((TH, F, W), jnp.float32)

    for r in range(TH):
        # B[(kh', kw', c), w] = xwin[cur, r + kh'*dil, c, w + kw'*dil]
        for dh in range(kh):
            for dw in range(kw):
                base = (dh * kw + dw) * C
                bmat[base : base + C, :] = xwin[
                    cur, r + dh * dil, :, dw * dil : dw * dil + W
                ]
        ys = jnp.dot(
            a_ref[...], bmat[...], preferred_element_type=jnp.float32
        )  # [kd*F, W]

        # scatter the kd tap blocks into their output depths' slots
        for dz in range(kd):
            d = p - dz * dil

            @pl.when(jnp.logical_and(d >= 0, d < D))
            def _(dz=dz, d=d, r=r, ys=ys):
                acc[d % effd, r] += ys[dz * F : (dz + 1) * F, :]

    # output depth p - (effd - 1) saw its last tap this step
    @pl.when(p >= effd - 1)
    def _():
        out_ref[0, 0] = acc[(p - (effd - 1)) % effd].astype(out_ref.dtype)


def fold_vmem_available(x_shape, w_shape, stride=(1, 1, 1), dilation=1):
    """Gate: odd kernels with kd >= 5 (where fold_out's standalone win is
    measured), stride 1, sane channel tiling, row-tileable H, and
    W >= 128 — the per-row dot's lane dim is W, and the small-config A/B
    (W=96, artifacts/perf_r5/small_fold_{default,never}.json) measured
    the under-filled kernel -9 % end-to-end (69.7 vs 76.4 inst/s) while
    the flagship's W=192 wins +8.2 %."""
    if not _HAS_PLTPU:
        return False
    kd, kh, kw = w_shape[:3]
    if tuple(stride) != (1, 1, 1):
        return False
    if kd < 5 or kd % 2 == 0 or kh % 2 == 0 or kw % 2 == 0:
        return False
    N, D, H, W, C = x_shape
    F = w_shape[-1]
    effd = (kd - 1) * dilation + 1
    if D < effd:  # rolling emit schedule assumes every slot cycles
        return False
    if C % 16 != 0 or (kd * F) % 8 != 0:
        return False
    if W < _LANE:
        return False
    return H % _tile_rows(W) == 0


def _tile_rows(W: int) -> int:
    """Output rows per grid step.  The im2col B is per-row ([kh*kw*C, W],
    ~1.2 MB at k7/C=64/W=192); TH sizes the double-buffered halo window,
    the rolling accumulator (effd*TH*F*W f32) and the output block."""
    return 4 if W >= 128 else 8


def _fold_vmem_fwd_t(xt, w, dilation: int = 1, interpret: bool = False):
    """t-layout forward: [N, D, H, C, W] -> [N, D, H, F, W].

    Input and output share the layout, so chained calls compose without
    intermediate transposes (each call re-pads, which XLA fuses)."""
    N, D, H, C, W = xt.shape
    kd, kh, kw, _, F = w.shape
    dil = dilation
    TH = _tile_rows(W)
    effd = (kd - 1) * dil + 1
    pad_d = (kd - 1) // 2 * dil
    pad_h = (kh - 1) // 2 * dil
    pad_w = (kw - 1) // 2 * dil
    Dp = D + 2 * pad_d
    Wpad = _round_up(W + 2 * pad_w, _LANE)

    xp = jnp.pad(
        xt,
        (
            (0, 0),
            (pad_d, pad_d),
            (pad_h, pad_h),
            (0, 0),
            (pad_w, Wpad - W - pad_w),
        ),
    )  # [N, Dp, Hpad, C, Wpad]

    # A[(dz, f), (kh', kw', c)] = w[dz, kh', kw', c, f]
    a = jnp.transpose(w, (0, 4, 1, 2, 3)).reshape(kd * F, kh * kw * C)
    a = a.astype(xt.dtype)

    kernel = functools.partial(
        _kernel, TH=TH, W=W, C=C, F=F, kd=kd, kh=kh, kw=kw, dil=dil, D=D
    )
    itemsize = 2 if xt.dtype == jnp.bfloat16 else 4
    return pl.pallas_call(
        kernel,
        grid=(N, H // TH, Dp),
        # XLA's cost model sees custom calls as ~free; declare the true
        # executed FLOPs (Dp planes x per-row GEMMs) so bench.py's
        # cost-analysis MFU accounting stays honest with the kernel on
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Dp * H * W * kd * F * kh * kw * C,
            bytes_accessed=(N * Dp * (H + 2 * pad_h) * C * Wpad
                            + N * D * H * F * W) * itemsize,
            transcendentals=0,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kd * F, kh * kw * C), lambda n, h, p: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, F, W),
            lambda n, h, p: (n, jnp.clip(p - (effd - 1), 0, D - 1), h, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((N, D, H, F, W), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + (kh - 1) * dil, C, Wpad), xt.dtype),
            pltpu.VMEM((kh * kw * C, W), xt.dtype),
            pltpu.VMEM((effd, TH, F, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a)


def _fold_vmem_fwd(x, w, dilation: int = 1, interpret: bool = False):
    """NDHWC forward: one W<->C swap on each side of the t-layout kernel."""
    out = _fold_vmem_fwd_t(jnp.swapaxes(x, -1, -2), w, dilation, interpret)
    return jnp.swapaxes(out, -1, -2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_fold_vmem(x, w, dilation: int = 1):
    """Large-tap stride-1 SAME 3D conv: in-VMEM fold_out Pallas forward,
    per-tap XLA backward (both compute the same tap sums; the forward
    accumulates all kd*kh*kw taps in one f32 VMEM tile)."""
    return _fold_vmem_fwd(x, w, dilation)


def _fwd(x, w, dilation):
    return _fold_vmem_fwd(x, w, dilation), (x, w)


def _bwd(dilation, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: conv3d_pertap_xla(xx, ww, dilation), x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


conv3d_fold_vmem.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_fold_vmem_t(xt, w, dilation: int = 1):
    """t-layout ([N, D, H, C, W] -> [N, D, H, F, W]) variant for chained
    prelude convs — zero transposes between consecutive calls."""
    return _fold_vmem_fwd_t(xt, w, dilation)


def _fwd_t(xt, w, dilation):
    return _fold_vmem_fwd_t(xt, w, dilation), (xt, w)


def _bwd_t(dilation, res, g):
    xt, w = res
    x = jnp.swapaxes(xt, -1, -2)
    _, vjp = jax.vjp(lambda xx, ww: conv3d_pertap_xla(xx, ww, dilation), x, w)
    dx, dw = vjp(jnp.swapaxes(g, -1, -2).astype(x.dtype))
    return jnp.swapaxes(dx, -1, -2), dw.astype(w.dtype)


conv3d_fold_vmem_t.defvjp(_fwd_t, _bwd_t)
