"""Diffusion schedules + process formulas: golden parity vs the reference's
torch implementations (run on CPU as oracles) with injected noise."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import _reference_oracle as oracle
from deepmimic_diffusion_mujoco_tpu.diffusion import process, schedules

requires_ref = pytest.mark.skipif(not oracle.available(), reason="no reference")


@requires_ref
def test_cosine_betas_diffuser_parity():
    helpers = oracle.ref_diffuser_package()
    ref = helpers.cosine_beta_schedule(100).numpy()
    ours = schedules.cosine_betas(100, convention="diffuser")
    np.testing.assert_allclose(ours, ref, atol=1e-7)


@requires_ref
@pytest.mark.parametrize("kind", ["linear", "cosine"])
def test_v4_schedule_parity(kind):
    v4mod = oracle.load_module("diffuser/models/diffusion_v4.py", "ref_v4")
    ref = v4mod.DiffusionV4(
        noise_steps=200, beta_start=1e-4, beta_end=0.02, joint_dim=69,
        frames=40, device="cpu", schedule_type=kind,
    )
    ours = schedules.make_schedule(
        kind=kind, timesteps=200, beta_start=1e-4, beta_end=0.02, convention="v4"
    )
    np.testing.assert_allclose(np.asarray(ours.betas), ref.beta.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.alphas_cumprod), ref.alpha_hat.numpy(), atol=1e-6
    )


@requires_ref
def test_posterior_coefficients_parity():
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.diffusion import GaussianDiffusion

    class Dummy(torch.nn.Module):
        def forward(self, x, cond, t):
            return x

    ref = GaussianDiffusion(Dummy(), horizon=16, transition_dim=35, n_timesteps=50)
    ours = schedules.make_schedule(kind="cosine", timesteps=50, convention="diffuser")
    for name in (
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(ref, name).numpy(),
            atol=1e-5,
            rtol=1e-4,  # reference computes in float32; we derive in float64
            err_msg=name,
        )


def _sched(T=50):
    return schedules.make_schedule(kind="cosine", timesteps=T, convention="diffuser")


@requires_ref
def test_q_sample_and_steps_parity_with_injected_noise():
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.diffusion import GaussianDiffusion

    class Dummy(torch.nn.Module):
        def forward(self, x, cond, t):
            return x

    T = 50
    ref = GaussianDiffusion(
        Dummy(), horizon=16, transition_dim=35, n_timesteps=T, predict_epsilon=True
    )
    ours = _sched(T)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 16, 35)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 7, 23, 49])

    # forward noising
    ref_xt = ref.q_sample(torch.tensor(x0), torch.tensor(t), torch.tensor(eps)).numpy()
    our_xt = process.q_sample(ours, jnp.array(x0), jnp.array(t), jnp.array(eps))
    np.testing.assert_allclose(np.asarray(our_xt), ref_xt, atol=1e-5)

    # epsilon -> x0
    ref_x0 = ref.predict_start_from_noise(
        torch.tensor(ref_xt), torch.tensor(t), torch.tensor(eps)
    ).numpy()
    our_x0 = process.predict_start_from_noise(ours, jnp.array(ref_xt), jnp.array(t), jnp.array(eps))
    np.testing.assert_allclose(np.asarray(our_x0), ref_x0, atol=1e-3)

    # posterior step with injected reverse noise, incl. t==0 noise zeroing
    z = rng.normal(size=x0.shape).astype(np.float32)
    mean, _, logvar = ref.q_posterior(
        torch.tensor(ref_x0), torch.tensor(ref_xt), torch.tensor(t)
    )
    ref_z = torch.tensor(z.copy())
    ref_z[torch.tensor(t) == 0] = 0
    ref_step = (mean + torch.exp(0.5 * logvar) * ref_z).numpy()
    our_step = process.posterior_step(
        ours, jnp.array(ref_xt), jnp.array(t), jnp.array(ref_x0), jnp.array(z)
    )
    np.testing.assert_allclose(np.asarray(our_step), ref_step, atol=1e-4)


@requires_ref
def test_v4_ddpm_step_and_x0_to_eps_parity():
    import torch

    v4mod = oracle.load_module("diffuser/models/diffusion_v4.py", "ref_v4b")
    T = 100
    ref = v4mod.DiffusionV4(
        noise_steps=T, beta_start=1e-4, beta_end=0.02, joint_dim=35,
        frames=16, device="cpu", schedule_type="cosine", predict_x0=True,
    )
    ours = schedules.make_schedule(kind="cosine", timesteps=T, convention="v4")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 16, 35)).astype(np.float32)
    x0_hat = rng.normal(size=x.shape).astype(np.float32)
    z = rng.normal(size=x.shape).astype(np.float32)
    t = np.array([5, 50, 99])

    tt = torch.tensor(t)
    alpha_hat = ref.alpha_hat[tt][:, None, None]
    eps_ref = (torch.tensor(x) - torch.sqrt(alpha_hat) * torch.tensor(x0_hat)) / torch.sqrt(1 - alpha_hat)
    eps_ours = process.predict_noise_from_start(ours, jnp.array(x), jnp.array(t), jnp.array(x0_hat))
    np.testing.assert_allclose(np.asarray(eps_ours), eps_ref.numpy(), atol=1e-4)

    alpha = ref.alpha[tt][:, None, None]
    beta = ref.beta[tt][:, None, None]
    ref_step = (
        1 / torch.sqrt(alpha)
        * (torch.tensor(x) - ((1 - alpha) / torch.sqrt(1 - alpha_hat)) * eps_ref)
        + torch.sqrt(beta) * torch.tensor(z)
    ).numpy()
    our_step = process.ddpm_step(ours, jnp.array(x), jnp.array(t), eps_ours, jnp.array(z))
    np.testing.assert_allclose(np.asarray(our_step), ref_step, atol=1e-4)


@requires_ref
def test_loss_weights_parity():
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.diffusion import GaussianDiffusion

    class Dummy(torch.nn.Module):
        def forward(self, x, cond, t):
            return x

    ref = GaussianDiffusion(
        Dummy(), horizon=16, transition_dim=35, n_timesteps=10,
        action_weight=5.0, loss_discount=0.99,
    )
    ours = process.diffuser_loss_weights(16, 35, action_weight=5.0, discount=0.99)
    # we derive discounts in float64, the reference in float32 -> ~2e-6 drift
    np.testing.assert_allclose(
        np.asarray(ours), ref.loss_fn.weights.numpy(), atol=1e-5
    )


def test_q_sample_roundtrip():
    """predict_start_from_noise inverts q_sample exactly."""
    s = _sched(50)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 35))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([3, 40])
    xt = process.q_sample(s, x0, t, eps)
    x0_rec = process.predict_start_from_noise(s, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    eps_rec = process.predict_noise_from_start(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-3)


def test_masked_mse():
    pred = jnp.ones((2, 4, 3))
    targ = jnp.zeros((2, 4, 3))
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=jnp.float32)
    # all errors are 1 -> masked mean must be exactly 1
    assert float(process.mse_loss(pred, targ, mask)) == pytest.approx(1.0)


def test_x0_space_loss_keeps_content_weight_at_high_t():
    """MDM-style x0-space loss (NOT in the reference): a perfect x0 model
    scores ~0 at every t, and the content-error gradient does NOT vanish
    at high t (the eps-space loss scales it by sqrt(abar/(1-abar)) -> 0,
    which is why eps-trained class conditioning collapsed; see
    process.v4_training_loss)."""
    import jax
    from deepmimic_diffusion_mujoco_tpu.diffusion import process, schedules

    sched = schedules.make_schedule("cosine", 1000, convention="v4")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 6))
    t_hi = jnp.full((4,), 980, jnp.int32)

    perfect, _ = process.v4_training_loss(
        sched, lambda x, t: x0, x0, t_hi, rng, predict_x0=True,
        loss_space="x0")
    assert float(perfect) < 1e-10

    # a model that is off by a constant delta in x0 space
    delta = 0.5

    def off_model(x, t):
        return x0 + delta

    l_x0, _ = process.v4_training_loss(
        sched, off_model, x0, t_hi, rng, predict_x0=True, loss_space="x0")
    l_eps, _ = process.v4_training_loss(
        sched, off_model, x0, t_hi, rng, predict_x0=True, loss_space="eps")
    # x0 space sees the full delta^2; eps space sees it shrunk by SNR
    np.testing.assert_allclose(float(l_x0), delta ** 2, rtol=1e-5)
    assert float(l_eps) < 0.01 * float(l_x0)
