"""Plane-sweep cost volume parity tests (XLA path; CUDA-op semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.ops.cost_volume import plane_sweep_volume


def reference_volume(left, right, shifts, ds):
    """Direct numpy transcription of the CUDA semantics
    (BuildCostVolume_cuda.cu:64-98): left half strided copy, right half
    bilinear at x*ds - shift[d] (zero outside)."""
    N, H, W, C = left.shape
    D = len(shifts)
    Ho, Wo = H // ds, W // ds
    out = np.zeros((N, D, Ho, Wo, 2 * C), left.dtype)
    for n in range(N):
        for d in range(D):
            for y in range(Ho):
                for x in range(Wo):
                    out[n, d, y, x, :C] = left[n, y * ds, x * ds]
                    xs = x * ds - shifts[d]
                    x0 = int(np.floor(xs))
                    f = xs - x0
                    v = np.zeros(C, left.dtype)
                    if 0 <= x0 < W:
                        v += (1 - f) * right[n, y * ds, x0]
                    if 0 <= x0 + 1 < W:
                        v += f * right[n, y * ds, x0 + 1]
                    out[n, d, y, x, C:] = v
    return out


class TestPlaneSweep:
    @pytest.mark.parametrize("ds", [1, 2])
    def test_matches_cuda_semantics(self, rng, ds):
        left = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
        right = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
        shifts = np.array([0.0, 1.5, 3.0, 7.25], np.float32)
        got = np.asarray(
            plane_sweep_volume(jnp.array(left), jnp.array(right), jnp.array(shifts), ds)
        )
        want = reference_volume(left, right, shifts, ds)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_zero_shift_identity(self, rng):
        left = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
        right = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
        out = np.asarray(
            plane_sweep_volume(jnp.array(left), jnp.array(right), jnp.zeros(1), 1)
        )
        np.testing.assert_allclose(out[0, 0, ..., :2], left[0], atol=1e-6)
        np.testing.assert_allclose(out[0, 0, ..., 2:], right[0], atol=1e-6)

    def test_gradients_deterministic(self, rng):
        """The CUDA backward needed atomicAdd; the XLA transpose is a
        deterministic scatter — same results across runs."""
        left = jnp.array(rng.standard_normal((1, 4, 8, 2)).astype(np.float32))
        right = jnp.array(rng.standard_normal((1, 4, 8, 2)).astype(np.float32))
        shifts = jnp.array([0.5, 2.25])

        def loss(l, r):
            v = plane_sweep_volume(l, r, shifts, 1)
            return jnp.sum(v**2)

        g1 = jax.grad(loss, argnums=(0, 1))(left, right)
        g2 = jax.grad(loss, argnums=(0, 1))(left, right)
        for a, b in zip(g1, g2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # numerical check on a single element of dright
        eps = 1e-3
        k = (0, 2, 3, 1)
        rp = right.at[k].add(eps)
        rm = right.at[k].add(-eps)
        num = (loss(left, rp) - loss(left, rm)) / (2 * eps)
        assert float(g1[1][k]) == pytest.approx(float(num), rel=1e-2)


class TestPallasKernelInterpret:
    def test_psv_kernel_matches_xla(self, rng):
        """The plane-sweep Pallas kernel (interpret mode on CPU) equals the
        XLA gather formulation — without this, _psv_kernel is only ever
        executed on real TPU hardware and a Mosaic regression ships unseen."""
        from snvc_tpu.ops.cost_volume import _psv_pallas_fwd

        N, H, W, C = 2, 8, 24, 16  # H*C = 128 (lane-aligned)
        D = 5
        left = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        right = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        # fractional + integer + zero shifts, incl. one pushing taps
        # out of range on the left edge
        shifts = jnp.asarray(np.array([0.0, 1.0, 2.5, 7.25, 21.9], np.float32))
        got = np.asarray(_psv_pallas_fwd(left, right, shifts, interpret=True))
        want = np.asarray(plane_sweep_volume(left, right, shifts, 1))
        assert got.shape == want.shape == (N, D, H, W, 2 * C)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_psv_kernel_per_sample_shifts(self, rng):
        """[N, D] per-sample shift tables (per-frame calibration) must
        match the per-sample XLA formulation — the stereo model passes
        the batched table in ONE pallas call (vmapping pallas_call makes
        SMEM block shapes Mosaic rejects at batch > 1)."""
        from snvc_tpu.ops.cost_volume import (
            _plane_sweep_xla_any,
            _psv_pallas_fwd,
        )

        N, H, W, C = 3, 8, 24, 16
        D = 4
        left = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        right = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        shifts = jnp.asarray(
            rng.uniform(0.0, W - 2, size=(N, D)).astype(np.float32)
        )
        got = np.asarray(_psv_pallas_fwd(left, right, shifts, interpret=True))
        want = np.asarray(_plane_sweep_xla_any(left, right, shifts, 1))
        assert got.shape == want.shape == (N, D, H, W, 2 * C)
        np.testing.assert_allclose(got, want, atol=1e-5)
