"""ops/banded_pallas.py: the VMEM-streaming banded matvec kernel equals the
jnp einsum contraction on the same C4 layout (interpret mode on CPU; the
real-TPU compile is exercised by bench --band-kernel pallas and guarded by
the engine's test-compile fallback)."""

import numpy as np
import jax.numpy as jnp
import pytest

from devicekmc_tpu.ops.banded_pallas import banded_matvec_pallas


def _ref_contract(C4, xp2):
    R, m_pad, B, _ = C4.shape
    xst = jnp.stack([xp2[k:k + R] for k in range(m_pad)], axis=1)
    return jnp.einsum(
        "rkbj,rkj->rb", C4.astype(jnp.float32), xst.astype(jnp.float32)
    )


@pytest.mark.parametrize("R,m_pad,B", [(4, 3, 128), (3, 16, 128), (1, 8, 128)])
def test_kernel_matches_einsum(R, m_pad, B):
    rng = np.random.default_rng(R * 100 + m_pad)
    C4 = jnp.asarray(rng.standard_normal((R, m_pad, B, B)), jnp.float32)
    xp2 = jnp.asarray(rng.standard_normal((R + m_pad - 1, B)), jnp.float32)
    y = banded_matvec_pallas(C4, xp2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_contract(C4, xp2)), rtol=2e-5,
        atol=1e-4,
    )


def test_kernel_bf16_storage():
    """bf16-stored band with f32 MXU accumulation (transport_bf16_inner)."""
    rng = np.random.default_rng(7)
    C4 = jnp.asarray(rng.standard_normal((2, 8, 128, 128)), jnp.bfloat16)
    xp2 = jnp.asarray(rng.standard_normal((9, 128)), jnp.bfloat16)
    y = banded_matvec_pallas(C4, xp2, interpret=True)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_contract(C4, xp2)), rtol=2e-2,
        atol=2e-1,
    )


def test_matvec_dispatch_equality(tmp_path):
    """_banded_nb_matvec(kernel='pallas', interpret) == kernel='jnp' on a
    real band built from a small simulation geometry."""
    # build a tiny synthetic band the way build_banded_nb lays it out:
    # random symmetric banded coupling, B=128 (kernel tile floor)
    rng = np.random.default_rng(3)
    Na, B, p = 300, 128, 1
    m_pad = 3
    R = -(-Na // B)
    C4 = np.zeros((R, m_pad, B, B), np.float32)
    # scatter a few hundred couplings within the band
    ri = rng.integers(0, Na, 500)
    ci = np.clip(ri + rng.integers(-120, 121, 500), 0, Na - 1)
    off = ci - (ri // B - p) * B
    ok = (off >= 0) & (off < m_pad * B)
    ri, ci, off = ri[ok], ci[ok], off[ok]
    C4[ri // B, off // B, ri % B, off % B] = rng.standard_normal(ri.size)
    band = dict(
        C=jnp.asarray(C4),
        front=jnp.zeros(p * B, jnp.float32),
        pi=jnp.arange(Na, dtype=jnp.int32),
        inv=jnp.arange(Na, dtype=jnp.int32),
    )
    from devicekmc_tpu.physics.current import _banded_nb_matvec

    xa = jnp.asarray(rng.standard_normal(Na), jnp.float32)
    y_jnp = _banded_nb_matvec(band, xa, kernel="jnp")
    # the pallas path self-selects interpret mode off-TPU (current.py)
    y_pl = _banded_nb_matvec(band, xa, kernel="pallas")
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_jnp), rtol=2e-5, atol=1e-5
    )
