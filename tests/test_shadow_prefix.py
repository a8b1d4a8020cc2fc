"""Parity of the fused Pallas shadow prefix-max kernel vs the XLA
associative-scan formulation (ops/shadow_scan.py::scan_wedge), in Pallas
interpret mode on CPU.

Inputs are quantized so every m = R*h*sinθ / z = R*h*cosθ product is
exact in f32: XLA rounds the product chain differently inside and
outside a Pallas kernel (different fusion contexts, measured 1 ulp), and
a 1-ulp wobble on m can flip WHICH blocker wins a near-tie — both
answers are physically valid, but only exact inputs make the comparison
deterministic. The kernel's scan logic itself (combine order,
tie-breaking, carry across theta tiles) is exercised exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.ops import shadow_prefix
from moonrtx_tpu.ops.shadow_scan import _argmax_combine


def _xla_reference(hs, st, ct, sar):
    """The exact lines scan_wedge lowers without the kernel."""
    n_phi = hs.shape[1]
    r = C.MOON_RADIUS * hs
    m = r * st
    z = r * ct
    neg = jnp.full((1, n_phi), -1.0, m.dtype)
    m_pad = jnp.concatenate([neg, m[:-1]], axis=0)
    z_pad = jnp.concatenate([jnp.zeros((1, n_phi), z.dtype), z[:-1]], axis=0)
    m_max, z_at = jax.lax.associative_scan(
        _argmax_combine, (m_pad, z_pad), axis=0)
    dz = jnp.maximum(z_at - z, 1e-6)
    alpha = jnp.arctan2(m_max - m, dz)
    factor = jnp.clip(0.5 - alpha / (2.0 * sar), 0.0, 1.0)
    return jnp.where(m_max < 0.0, 1.0, factor)


def _exact_inputs(n_theta, n_phi, seed=7):
    """Heights ~1.0 and sin/cos-like tables quantized to 2^-8 so the
    m/z product chains stay below 2^24 and never round."""
    rng = np.random.default_rng(seed)
    q = 2.0 ** -8
    hs = np.round((1.0 + 0.004 * rng.standard_normal((n_theta, n_phi))
                   + 0.01 * (rng.random((n_theta, n_phi)) < 0.002)) / q) * q
    tgrid = np.linspace(0.05, 0.95, n_theta)
    st = np.round(np.sin(np.pi * tgrid)[:, None] / q) * q
    ct = np.round(np.cos(np.pi * tgrid)[:, None] / q) * q
    return (jnp.asarray(hs, jnp.float32), jnp.asarray(st, jnp.float32),
            jnp.asarray(ct, jnp.float32))


@pytest.mark.parametrize("n_theta,n_phi", [(256, 128), (512, 256),
                                           (1536, 512)])
def test_prefix_kernel_matches_xla(n_theta, n_phi):
    hs, st, ct = _exact_inputs(n_theta, n_phi)
    sar = jnp.float32(0.0046)
    ref = np.asarray(_xla_reference(hs, st, ct, sar))
    out = np.asarray(shadow_prefix.shadow_factor_tpu(
        hs, st, ct, sar, C.MOON_RADIUS, interpret=True))
    # exact inputs => identical blocker selection; the only remaining
    # difference is the kernel atan2 polynomial (~1e-6 rad over a
    # 2*sar ~ 0.01 rad penumbra ramp)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_prefix_kernel_tie_breaking():
    """Equal keys along a meridian must keep the EARLIEST blocker's z
    (strict > in the combine), matching the XLA scan.

    All values are sums of a few powers of two so every m/z product is
    exact in f32 under ANY multiply association (XLA rounds differently
    inside and outside the kernel otherwise). Two tall blockers at rows
    5 and 100 have EXACTLY equal m but different z; rows after both sit
    in the penumbra, where alpha = atan2(m_tall - m, z_at - z) makes the
    selected blocker's z observable in the factor."""
    n_theta, n_phi = 256, 128
    st = np.repeat([0.5, 0.25, 0.125, 0.0625], 64)[:, None]
    hs = np.broadcast_to(np.repeat([0.5, 1.0, 2.0, 4.0], 64)[:, None],
                         (n_theta, n_phi)).copy()      # m = 2.5 everywhere
    hs[5, :] *= 1.0 + 2.0 ** -6    # m_tall = 2.5390625, z = 2.5390625
    hs[100, :] *= 1.0 + 2.0 ** -6  # m_tall equal, z = 5.078125
    ct = np.repeat([0.5, 0.5, -0.25, -0.5], 64)[:, None]
    hs, st, ct = (jnp.asarray(v, jnp.float32) for v in (hs, st, ct))
    sar = jnp.float32(0.01)
    ref = np.asarray(_xla_reference(hs, st, ct, sar))
    out = np.asarray(shadow_prefix.shadow_factor_tpu(
        hs, st, ct, sar, C.MOON_RADIUS, interpret=True))
    # the test only bites if the tied rows actually land in the
    # penumbra (an always-0/1 factor would pass vacuously)
    assert (0.05 < ref[128:, 0]).all() and (ref[128:, 0] < 0.45).all()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_prefix_ok_shapes():
    assert shadow_prefix.prefix_ok(1536, 4096)
    assert shadow_prefix.prefix_ok(2304, 2048)
    assert shadow_prefix.prefix_ok(512, 512)
    assert not shadow_prefix.prefix_ok(100, 4096)
    assert not shadow_prefix.prefix_ok(1536, 100)
