"""DDIM scheduler unit tests vs hand-computed alpha-bar tables (SURVEY §4.2)."""

import numpy as np
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import DDIMConfig
from elasticdiffusion_tpu.sched.ddim import DDIMScheduler


def test_beta_table_scaled_linear():
    s = DDIMScheduler(DDIMConfig())
    # endpoints of scaled_linear: sqrt-space linspace squared
    assert np.isclose(s.betas[0], 0.00085)
    assert np.isclose(s.betas[-1], 0.012)
    i = 500
    expected = (0.00085 ** 0.5 + (0.012 ** 0.5 - 0.00085 ** 0.5) * i / 999) ** 2
    assert np.isclose(s.betas[i], expected, rtol=1e-6)
    assert np.all(np.diff(s.betas) > 0)


def test_timesteps_leading_spacing():
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    # leading spacing: arange(50)*20 reversed, +1 offset
    expected = (np.arange(50) * 20)[::-1] + 1
    np.testing.assert_array_equal(st.timesteps, expected)
    assert st.timesteps[0] == 981 and st.timesteps[-1] == 1


def test_step_closed_form():
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)

    i = 3  # t = 46*20+1 = 921, prev_t = 901
    t = int(st.timesteps[i])
    a_t = s.alphas_cumprod[t]
    a_prev = s.alphas_cumprod[t - 20]
    x0_expected = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    prev_expected = np.sqrt(a_prev) * x0_expected + np.sqrt(1 - a_prev) * eps

    prev, x0 = s.step(st, jnp.asarray(eps), i, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(x0), x0_expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prev), prev_expected, rtol=1e-5, atol=1e-5)


def test_step_final_alpha():
    """Last step (t=1) uses alphas_cumprod[0] (set_alpha_to_one=False)."""
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    coeffs = s.step_coeffs(st, 49)
    assert np.isclose(coeffs[2], np.sqrt(s.alphas_cumprod[0]))


def test_add_noise():
    s = DDIMScheduler(DDIMConfig())
    x0 = np.ones((1, 4, 4, 4), dtype=np.float32)
    eps = np.full((1, 4, 4, 4), 2.0, dtype=np.float32)
    t = 500
    a = s.alphas_cumprod[t]
    out = s.add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
    np.testing.assert_allclose(np.asarray(out),
                               np.sqrt(a) * x0 + np.sqrt(1 - a) * eps, rtol=1e-6)


def test_undo_step_matches_sequential():
    """undo_step must equal the reference's sequential re-noising
    (/root/reference/elastic_diffusion.py:692-704)."""
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    t = int(st.timesteps[10])
    s1mb, sb = s.undo_step_coeffs(st, t)
    assert s1mb.shape == (20,)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    noises = rng.standard_normal((20, 1, 4, 4, 4)).astype(np.float32)

    # sequential oracle
    y = x.copy()
    for i in range(20):
        beta = s.betas[t + i]
        y = np.sqrt(1 - beta) * y + np.sqrt(beta) * noises[i]

    out = DDIMScheduler.undo_step_from_coeffs(jnp.asarray(x), jnp.asarray(noises),
                                              jnp.asarray(s1mb), jnp.asarray(sb))
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-5)


def test_undo_step_clips_at_train_end():
    """Micro-steps beyond num_train_timesteps are skipped."""
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    s1mb, _ = s.undo_step_coeffs(st, 990)
    assert s1mb.shape == (10,)  # 990..999 only


def test_coeff_tables_match_step_coeffs():
    s = DDIMScheduler(DDIMConfig())
    st = s.set_timesteps(50)
    table = s.coeff_tables(st)
    assert table.shape == (50, 4)
    for i in (0, 7, 49):
        np.testing.assert_allclose(table[i], np.asarray(s.step_coeffs(st, i),
                                                        dtype=np.float32), rtol=1e-6)
