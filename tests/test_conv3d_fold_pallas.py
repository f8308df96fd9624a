"""In-VMEM fold_out Pallas conv: interpret-mode parity + gradient path.

Covers ops/conv3d_fold_pallas.py — the large-tap (k5/k7) kernel targeting
the vernier head's conv1/conv2/conv3 prelude (reference hot path
snvc/models/vernier.py:414-455; profile: BENCH.md round-4b).  Without the
interpret-mode run the kernel only ever executes on real TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snvc_tpu.ops.conv3d_fold_pallas import (
    _fold_vmem_fwd,
    conv3d_fold_vmem,
    conv3d_pertap_xla,
    fold_vmem_available,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestFoldVmemInterpret:
    @pytest.mark.parametrize(
        "shape,kernel,dil,feats",
        [
            ((1, 8, 8, 16, 32), (7, 7, 7), 1, 16),  # conv1_k7-like
            ((1, 6, 8, 12, 16), (5, 5, 5), 1, 8),  # conv2_k5-like
            ((1, 10, 16, 12, 16), (5, 5, 5), 2, 8),  # conv3_k5_d2-like
            ((2, 7, 8, 16, 64), (7, 7, 7), 1, 32),  # batch>1, C=64
        ],
    )
    def test_matches_pertap(self, rng, shape, kernel, dil, feats):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal(kernel + (shape[-1], feats)) * 0.1,
            jnp.float32,
        )
        # (small test shapes sit below the gate's W >= 128 perf floor;
        # parity exercises the kernel directly)
        got = np.asarray(_fold_vmem_fwd(x, w, dilation=dil, interpret=True))
        want = np.asarray(conv3d_pertap_xla(x, w, dilation=dil))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_bf16_matches_pertap(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 32)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((7, 7, 7, 32, 16)) * 0.1, jnp.float32
        )
        got = np.asarray(
            _fold_vmem_fwd(x, w.astype(jnp.bfloat16), interpret=True).astype(
                jnp.float32
            )
        )
        want = np.asarray(
            conv3d_pertap_xla(x, w.astype(jnp.bfloat16)).astype(jnp.float32)
        )
        # |out| ~ sqrt(343*32)*0.1 ~ 10; bf16 eps ~ 2^-8
        np.testing.assert_allclose(got, want, atol=0.5)

    def test_t_layout_chain_matches_pertap(self, rng):
        """Two chained t-layout calls (the conv1->conv2 prelude pattern,
        zero transposes between them) equal the chained per-tap NDHWC
        reference."""
        from snvc_tpu.ops.conv3d_fold_pallas import _fold_vmem_fwd_t

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 32)), jnp.float32)
        w1 = jnp.asarray(
            rng.standard_normal((7, 7, 7, 32, 16)) * 0.1, jnp.float32
        )
        w2 = jnp.asarray(
            rng.standard_normal((5, 5, 5, 16, 16)) * 0.1, jnp.float32
        )
        xt = jnp.swapaxes(x, -1, -2)
        y1 = _fold_vmem_fwd_t(xt, w1, 1, interpret=True)
        y2 = _fold_vmem_fwd_t(y1, w2, 2, interpret=True)
        got = np.asarray(jnp.swapaxes(y2, -1, -2))
        want = np.asarray(
            conv3d_pertap_xla(conv3d_pertap_xla(x, w1, 1), w2, 2)
        )
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_availability_gate(self):
        from snvc_tpu.ops import conv3d_fold_pallas as m

        ok = fold_vmem_available((1, 8, 8, 192, 32), (7, 7, 7, 32, 16))
        assert ok == m._HAS_PLTPU
        # k3 stays on the per-tap path (fold_out lost those shapes, 4c)
        assert not fold_vmem_available((1, 8, 8, 192, 32), (3, 3, 3, 32, 16))
        # strided, even-kernel, ragged-C, short-D, row-mis-tiled: rejected
        assert not fold_vmem_available(
            (1, 8, 8, 192, 32), (7, 7, 7, 32, 16), stride=(2, 1, 1)
        )
        assert not fold_vmem_available((1, 8, 8, 192, 32), (7, 7, 6, 32, 16))
        assert not fold_vmem_available((1, 8, 8, 192, 24), (7, 7, 7, 24, 16))
        assert not fold_vmem_available((1, 4, 8, 192, 32), (7, 7, 7, 32, 16))
        assert not fold_vmem_available((1, 8, 6, 192, 32), (7, 7, 7, 32, 16))
        # W < 128 under-fills the per-row dot's lanes: measured -9 % on
        # the small config (W=96) — rejected, per-tap path keeps it
        assert not fold_vmem_available((1, 8, 8, 96, 32), (7, 7, 7, 32, 16))

    def test_custom_vjp_grads_match_pertap(self, rng, monkeypatch):
        """conv3d_fold_vmem's backward is the per-tap XLA vjp; check
        end-to-end grads with the forward monkeypatched to interpret
        mode (CPU has no Mosaic)."""
        import snvc_tpu.ops.conv3d_fold_pallas as m

        monkeypatch.setattr(
            m,
            "_fold_vmem_fwd",
            lambda x, w, dilation=1, interpret=False: m.conv3d_pertap_xla(
                x, w, dilation
            ),
        )
        x = jnp.asarray(rng.standard_normal((1, 6, 8, 12, 16)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((5, 5, 5, 16, 8)) * 0.1, jnp.float32
        )
        gx, gw = jax.grad(
            lambda x, w: (conv3d_fold_vmem(x, w, 1) ** 2).sum(), (0, 1)
        )(x, w)
        rx, rw = jax.grad(
            lambda x, w: (conv3d_pertap_xla(x, w, 1) ** 2).sum(), (0, 1)
        )(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3)
