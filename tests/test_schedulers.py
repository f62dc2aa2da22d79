import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.guidance import schedulers as sch


@pytest.fixture(scope="module")
def sched():
    return sch.NoiseSchedule.scaled_linear()


def test_table_endpoints(sched):
    # scaled_linear: β₀ = 0.00085, β_T−1 = 0.012 exactly
    assert float(sched.betas[0]) == pytest.approx(0.00085, rel=1e-6)
    assert float(sched.betas[-1]) == pytest.approx(0.012, rel=1e-6)
    assert float(sched.alphas_cumprod[0]) == pytest.approx(1 - 0.00085,
                                                           rel=1e-6)
    # ᾱ decreasing, in (0, 1)
    ac = np.asarray(sched.alphas_cumprod)
    assert (np.diff(ac) < 0).all() and ac[-1] > 0 and ac[0] < 1
    # known SD constant: ᾱ_999 ≈ 0.0047 (diffusers value for this schedule)
    assert float(ac[-1]) == pytest.approx(0.00466, abs=2e-4)


def test_add_noise_limits(sched):
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.full_like(x0, 2.0)
    lo = sched.add_noise(x0, noise, jnp.asarray(0))
    hi = sched.add_noise(x0, noise, jnp.asarray(999))
    np.testing.assert_allclose(np.asarray(lo),
                               np.sqrt(1 - 0.00085) * 1 +
                               np.sqrt(0.00085) * 2, rtol=1e-5)
    # at t=999 almost pure noise: √ᾱ·x₀ + √(1−ᾱ)·ε with ᾱ ≈ 0.00466
    expect = np.sqrt(0.00466) * 1.0 + np.sqrt(1 - 0.00466) * 2.0
    assert abs(float(hi[0, 0, 0, 0]) - expect) < 0.01


def test_ddim_timesteps_grid():
    ts = np.asarray(sch.ddim_timesteps(50))
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert (np.diff(ts) == -20).all()


def _oracle_eps(sched, x0):
    def eps(x_t, t):
        a = sched.alphas_cumprod[t]
        return (x_t - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
    return eps


def test_ddim_chain_recovers_x0(sched):
    """With the exact ε oracle for a fixed x₀, DDIM from pure noise at any
    start converges to x₀."""
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    eps_fn = _oracle_eps(sched, x0)
    n = 10
    lat = jax.random.normal(jax.random.key(1), x0.shape)
    for t in np.asarray(sch.ddim_timesteps(n)):
        t = jnp.asarray(t)
        lat = sch.ddim_step(sched, eps_fn(lat, t), t, lat, n).prev_sample
    # the final DDIM step keeps √(1−ᾱ₀) ≈ 0.03 of the noise direction, so
    # recovery is to ~0.1, not machine precision
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=0.15)
    assert float(jnp.mean((lat - x0) ** 2)) < 2e-3


def test_ddim_invert_roundtrip(sched):
    """invert then sample with the same ε oracle returns the start latent."""
    x0 = jax.random.normal(jax.random.key(2), (1, 8, 8, 4)) * 0.3
    eps_fn = _oracle_eps(sched, x0)
    n = 10
    ts = np.asarray(sch.ddim_timesteps(n))
    lat = x0
    for t in ts[::-1]:  # ascending: invert x0 → xT
        t = jnp.asarray(t)
        lat = sch.ddim_inverse_step(sched, eps_fn(lat, t), t, lat,
                                    n).prev_sample
    for t in ts:        # descending: back to x0
        t = jnp.asarray(t)
        lat = sch.ddim_step(sched, eps_fn(lat, t), t, lat, n).prev_sample
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=0.1)
    assert float(jnp.mean((lat - x0) ** 2)) < 1e-3


def test_sds_weight_forms(sched):
    t = jnp.asarray(500)
    a = float(sched.alphas_cumprod[500])
    assert float(sched.sds_weight(t, "sqrt")) == pytest.approx(
        np.sqrt(a) * (1 - a), rel=1e-5)
    assert float(sched.sds_weight(t, "sigma2")) == pytest.approx(1 - a,
                                                                 rel=1e-5)


def test_strength_timesteps():
    ts, start = sch.strength_timesteps(50, strength=0.5)
    assert start == 25 and len(np.asarray(ts)) == 25
    assert np.asarray(ts)[0] == 481


def test_pndm_step_runs(sched):
    state = sch.pndm_init((1, 4, 4, 4))
    lat = jnp.ones((1, 4, 4, 4))
    for i, t in enumerate(np.asarray(sch.ddim_timesteps(10))):
        eps = jnp.full_like(lat, 0.1)
        lat, state = sch.pndm_step(sched, state, eps, jnp.asarray(t), lat, 10)
    assert np.isfinite(np.asarray(lat)).all()
    assert int(state.counter) == 10
