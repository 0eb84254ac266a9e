"""Pallas Riccati kernel vs the lax.scan sweep (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops import riccati as R
from mpc_tpu.ops import pallas_riccati as PR
from tests.test_riccati import _random_problem


def _batch_problem(rng, B, H):
    probs = [_random_problem(rng, H) for _ in range(B)]
    return [jnp.asarray(np.stack([p[i] for p in probs]), jnp.float32)
            for i in range(11)]


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, 4, 5, 5)), jnp.float32)
    packed = PR.pack_lanes(x, PR.LANE_TILE)
    assert packed.shape == (1, 4, 25, 8, 128)
    back = PR.unpack_lanes(packed, 7, (5, 5))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pallas_backward_matches_scan():
    rng = np.random.default_rng(7)
    B, H = 5, 9
    Q, Rm, M, qx, qu, QH, qH, A, Bm, r, dx0 = _batch_problem(rng, B, H)
    quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
    dyn = R.LinDyn(A=A, B=Bm, r=r)

    gains_ref = jax.vmap(
        lambda q, qh2, qH2, dn: R.backward_pass(q, qh2, qH2, dn, 1e-6))(
        quad, QH, qH, dyn)
    gains_pl = PR.backward_pass_pallas(quad, QH, qH, dyn, reg=1e-6,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(gains_pl.K),
                               np.asarray(gains_ref.K), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gains_pl.d),
                               np.asarray(gains_ref.d), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gains_pl.dV1),
                               np.asarray(gains_ref.dV1), rtol=1e-2)
