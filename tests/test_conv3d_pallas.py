"""Implicit-GEMM Pallas conv3d: interpret-mode parity + gradient path.

Covers ops/conv3d_pallas.py (the k3^3/stride-1 kernel replacing the XLA
3D-conv lowering on the stereo stack's hot shapes; reference analog
snvc/models/submodule.py:85-315).  Without the interpret-mode run the
kernel only ever executes on real TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snvc_tpu.ops.conv3d_pallas import (
    _conv3d_pallas_fwd,
    conv3d_k3,
    conv3d_k3_available,
    conv3d_xla,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestConv3dPallasInterpret:
    @pytest.mark.parametrize(
        "shape,feats",
        [
            ((1, 4, 8, 16, 32), 32),  # stereo-stack-like (TH=8)
            ((2, 3, 8, 12, 16), 8),  # multi-batch, small C
            ((1, 2, 4, 8, 64), 32),  # C=64 branch (TH=4)
        ],
    )
    def test_matches_xla(self, rng, shape, feats):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, shape[-1], feats)), jnp.float32
        )
        got = np.asarray(_conv3d_pallas_fwd(x, w, interpret=True))
        want = np.asarray(conv3d_xla(x, w))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_bf16_matches_xla(self, rng):
        """bf16 activations (the model's compute dtype): f32-accumulated
        dot, bf16 output, tolerance at bf16 resolution."""
        x = jnp.asarray(
            rng.standard_normal((1, 3, 8, 16, 32)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 32, 16)), jnp.float32
        )
        got = np.asarray(
            _conv3d_pallas_fwd(x, w, interpret=True).astype(jnp.float32)
        )
        want = np.asarray(conv3d_xla(x, w).astype(jnp.float32))
        # |out| ~ sqrt(27*32) ~ 30; bf16 eps ~ 2^-8
        np.testing.assert_allclose(got, want, atol=0.5)

    def test_availability_gate(self):
        # C must be a whole number of 128-lane tiles: the manual halo DMA
        # slices the channel minor, and Mosaic rejects sub-tile extents
        # (measured on the flagship, BENCH.md 2026-08-19) — so the gate
        # turns the kernel OFF for the models' C=32/64 stacks
        ok = conv3d_k3_available((1, 4, 8, 16, 128), (3, 3, 3, 128, 32))
        # the gate itself is backend-independent except for _HAS_PLTPU
        from snvc_tpu.ops import conv3d_pallas

        assert ok == conv3d_pallas._HAS_PLTPU
        assert not conv3d_k3_available((1, 4, 8, 16, 32), (3, 3, 3, 32, 32))
        assert not conv3d_k3_available((1, 4, 8, 16, 64), (3, 3, 3, 64, 32))
        # rejected: stride, dilation, kernel, wide F, row mis-tiling
        assert not conv3d_k3_available(
            (1, 4, 8, 16, 128), (3, 3, 3, 128, 32), stride=(2, 1, 1)
        )
        assert not conv3d_k3_available(
            (1, 4, 8, 16, 128), (3, 3, 3, 128, 32), dilation=2
        )
        assert not conv3d_k3_available((1, 4, 8, 16, 128), (3, 3, 1, 128, 32))
        assert not conv3d_k3_available((1, 4, 8, 16, 128), (3, 3, 3, 128, 256))
        assert not conv3d_k3_available((1, 4, 6, 16, 128), (3, 3, 3, 128, 32))

    def test_custom_vjp_grads_match_xla(self, rng, monkeypatch):
        """conv3d_k3's backward is the XLA vjp; check end-to-end grads by
        running the custom_vjp function with its forward monkeypatched to
        interpret mode (CPU has no Mosaic)."""
        import snvc_tpu.ops.conv3d_pallas as m

        monkeypatch.setattr(
            m, "_conv3d_pallas_fwd",
            lambda x, w, interpret=False: m.conv3d_xla(x, w),
        )
        x = jnp.asarray(rng.standard_normal((1, 3, 8, 12, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)), jnp.float32)
        gx, gw = jax.grad(lambda x, w: (conv3d_k3(x, w) ** 2).sum(), (0, 1))(
            x, w
        )
        rx, rw = jax.grad(lambda x, w: (conv3d_xla(x, w) ** 2).sum(), (0, 1))(
            x, w
        )
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3)
