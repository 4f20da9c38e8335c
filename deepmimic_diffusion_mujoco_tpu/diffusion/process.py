"""Forward/reverse diffusion formulas as pure functions.

One engine expresses every formula the reference's three stacks use
(SURVEY.md section 2.3): stack A's Diffuser GaussianDiffusion
(diffuser/models/diffusion.py), stack B's DiffusionV4
(diffuser/models/diffusion_v4.py), and the loss weighting of both.

Everything here is shape-polymorphic, jit-safe, and takes the Schedule as a
pytree argument — no module state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedules import Schedule, extract


def q_sample(sched: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward noising q(x_t | x_0) (diffusion.py:244-253)."""
    nd = x0.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x0
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(sched: Schedule, x_t, t, eps):
    """x0_hat from predicted epsilon (diffusion.py:149-160)."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_noise_from_start(sched: Schedule, x_t, t, x0):
    """epsilon_hat from predicted x0 (diffusion_v4.py:117-123)."""
    nd = x_t.ndim
    acp = extract(sched.alphas_cumprod, t, nd)
    return (x_t - jnp.sqrt(acp) * x0) / jnp.sqrt(1.0 - acp)


def predict_v(sched: Schedule, x0, t, noise):
    """v-parameterization target: v = sqrt(acp)*eps - sqrt(1-acp)*x0
    (stack C's denoising_diffusion_pytorch objective="pred_v",
    ddpm/ddpm.ipynb via README.md:50-54)."""
    nd = x0.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x0
    )


def predict_start_from_v(sched: Schedule, x_t, t, v):
    """x0_hat from a v-prediction."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def q_posterior(sched: Schedule, x0, x_t, t):
    """Mean / variance / clipped log-variance of q(x_{t-1} | x_t, x_0)
    (diffusion.py:162-171)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x0
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def ddpm_step(sched: Schedule, x_t, t, eps_hat, noise):
    """Stack-B reverse update (diffusion_v4.py:136-146):
    x_{t-1} = 1/sqrt(a) * (x - (1-a)/sqrt(1-abar) * eps_hat) + sqrt(b)*noise.
    """
    nd = x_t.ndim
    alpha = extract(sched.alphas, t, nd)
    acp = extract(sched.alphas_cumprod, t, nd)
    beta = extract(sched.betas, t, nd)
    mean = (x_t - (1.0 - alpha) / jnp.sqrt(1.0 - acp) * eps_hat) / jnp.sqrt(alpha)
    return mean + jnp.sqrt(beta) * noise


def ddim_step(sched: Schedule, x_t, t, t_prev, x0_hat, eps_hat, noise, eta: float = 0.0):
    """DDIM update between arbitrary timesteps t -> t_prev (the live
    replacement for the reference's vendored-and-broken SpacedDiffusion /
    respace.py timestep striding — SURVEY.md section 2.11)."""
    nd = x_t.ndim
    acp = extract(sched.alphas_cumprod, t, nd)
    acp_prev = jnp.where(
        (t_prev >= 0).reshape((-1,) + (1,) * (nd - 1)),
        extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0), nd),
        jnp.ones_like(acp),
    )
    sigma = (
        eta
        * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp))
        * jnp.sqrt(1.0 - acp / acp_prev)
    )
    dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, 0.0)) * eps_hat
    return jnp.sqrt(acp_prev) * x0_hat + dir_xt + sigma * noise


def posterior_step(sched: Schedule, x_t, t, x0_hat, noise):
    """Stack-A reverse update: posterior mean + exp(0.5*logvar)*noise, with
    noise zeroed at t == 0 (diffusion.py:20-29)."""
    mean, _, log_var = q_posterior(sched, x0_hat, x_t, t)
    nonzero = (t > 0).astype(x_t.dtype).reshape((-1,) + (1,) * (x_t.ndim - 1))
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


# ---------------------------------------------------------------------------
# Loss weighting (stack A, diffusion.py:115-146)
# ---------------------------------------------------------------------------


def diffuser_loss_weights(
    horizon: int,
    transition_dim: int,
    action_weight: float = 1.0,
    discount: float = 1.0,
    weights_dict: dict | None = None,
) -> jnp.ndarray:
    """(H, D) per-element loss weights: discount**h per frame, action_weight
    on frame 0. The reference treats the whole transition as "action"
    (action_dim == transition_dim, diffusion.py:59-60), so `weights_dict`
    offsets land beyond the array for parity with that quirk — we instead
    apply them directly at the given dims, which is the intended behavior.
    """
    dim_weights = jnp.ones((transition_dim,), dtype=jnp.float32)
    if weights_dict:
        for ind, w in weights_dict.items():
            dim_weights = dim_weights.at[ind].multiply(w)
    discounts = discount ** jnp.arange(horizon, dtype=jnp.float32)
    discounts = discounts / discounts.mean()
    w = discounts[:, None] * dim_weights[None, :]
    return w.at[0, :].set(action_weight)


def weighted_loss(pred, target, weights, kind: str = "l2"):
    """Weighted L1/L2 with the reference's a0 diagnostic
    (helpers.py:164-199). Returns (scalar_loss, info dict)."""
    err = jnp.abs(pred - target) if kind == "l1" else (pred - target) ** 2
    loss = (err * weights).mean()
    a0_loss = (err[:, 0, :] / weights[0, :]).mean()
    return loss, {"a0_loss": a0_loss}


def mse_loss(pred, target, mask=None):
    """Plain MSE (stack B, diffusion_v4.py:188). Optional frame mask for
    padded batches (masked mean over valid frames)."""
    err = (pred - target) ** 2
    if mask is None:
        return err.mean()
    m = mask[..., None]
    return (err * m).sum() / (m.sum() * err.shape[-1])


# ---------------------------------------------------------------------------
# Training losses
# ---------------------------------------------------------------------------


def kl_divergence_loss(
    sched: Schedule,
    x0: jnp.ndarray,
    x_t: jnp.ndarray,
    x0_hat: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """KL(q(x_{t-1}|x_t, x0) || p(x_{t-1}|x_t, x0_hat))
    (losses/kl_loss.py:4-81 — the reference imports it into the tuning
    model but never calls it; here it is live as loss kind "kl" via
    kl_training_loss -> train.loop.make_loss_fn -> diffusion.loss config).
    Both distributions share the posterior variance, so the KL reduces to
    the scaled squared mean difference."""
    mean_q, var, _ = q_posterior(sched, x0, x_t, t)
    mean_p, _, _ = q_posterior(sched, x0_hat, x_t, t)
    return (0.5 * (mean_q - mean_p) ** 2 / jnp.maximum(var, 1e-20)).mean()


def kl_training_loss(
    sched: Schedule,
    model_fn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    predict_x0: bool = True,
):
    """Full KL training objective (loss kind "kl" in train.loop.make_loss_fn
    — the LIVE wiring of the reference's dead losses/kl_loss.py, which
    transformer_temporal_new.py:34 imports and never calls): noise x0,
    recover x0_hat from the model prediction, and take the posterior KL
    between the true q(x_{t-1}|x_t,x0) and the model-implied distribution."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    pred = model_fn(x_noisy, t)
    x0_hat = pred if predict_x0 else predict_start_from_noise(
        sched, x_noisy, t, pred)
    return kl_divergence_loss(sched, x0, x_noisy, x0_hat, t), {}


def diffuser_p_losses(
    sched: Schedule,
    model_fn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    weights: jnp.ndarray,
    predict_epsilon: bool = True,
    loss_kind: str = "l2",
    conditioning_fn=None,
):
    """Stack-A p_losses (diffusion.py:255-272): conditioning applied to BOTH
    the noised input and the reconstruction (a training-time quirk unique to
    stack A — SURVEY.md section 7)."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    if conditioning_fn is not None:
        x_noisy = conditioning_fn(x_noisy)
    x_recon = model_fn(x_noisy, t)
    if conditioning_fn is not None:
        x_recon = conditioning_fn(x_recon)
    target = noise if predict_epsilon else x0
    return weighted_loss(x_recon, target, weights, loss_kind)


def angle_velocity_loss(
    sched: Schedule,
    model_fn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    smooth_loss_weight: float = 0.1,
):
    """Tuning-model loss (transformer_temporal_new.py:178-232): the model
    predicts noise; recover x0_hat and take MSE on the angles plus a
    velocity-smoothness MSE on frame differences."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    eps_hat = model_fn(x_noisy, t)
    x0_hat = predict_start_from_noise(sched, x_noisy, t, eps_hat)
    angle_loss = ((x0_hat - x0) ** 2).mean()
    pred_vel = x0_hat[:, 1:] - x0_hat[:, :-1]
    true_vel = x0[:, 1:] - x0[:, :-1]
    velocity_loss = ((pred_vel - true_vel) ** 2).mean()
    loss = angle_loss + smooth_loss_weight * velocity_loss
    return loss, {"loss_angle": angle_loss, "loss_velocity": velocity_loss}


def v_training_loss(
    sched: Schedule,
    model_fn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    mask: jnp.ndarray | None = None,
):
    """Stack-C objective (denoising_diffusion_pytorch objective="pred_v",
    ddpm/ddpm.ipynb): MSE between the model output and the v target."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    v_hat = model_fn(x_noisy, t)
    v = predict_v(sched, x0, t, noise)
    return mse_loss(v_hat, v, mask), {}


def v4_training_loss(
    sched: Schedule,
    model_fn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    predict_x0: bool = True,
    mask: jnp.ndarray | None = None,
    t_weights: jnp.ndarray | None = None,
    loss_space: str = "eps",
):
    """Stack-B training loss (diffusion_v4.py:151-191): MSE in epsilon space;
    an x0-predicting model's output is converted to epsilon first.

    `t_weights` (B,) are importance weights from a non-uniform timestep
    sampler (resample.py:28-48); info carries the per-sample losses the
    loss-aware sampler's ring buffer records (resample.py:124-153).

    loss_space="x0" is MDM's "simple" objective (MSE directly on the
    recovered x0), NOT in the reference. The eps-space loss weights an
    x0-predicting model's error by sqrt(abar/(1-abar)) — which vanishes at
    high t, exactly where sampling decides WHAT motion to form: measured
    on the class-conditional all-clips config, the eps-space-trained model
    ignored its labels entirely (class accuracy 0.11 = chance in
    cli/cfg_eval.py, class embeddings frozen at init scale). x0-space
    gives every timestep full weight on content, making conditioning
    trainable."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    pred = model_fn(x_noisy, t)
    if loss_space == "x0":
        x0_hat = pred if predict_x0 else predict_start_from_noise(
            sched, x_noisy, t, pred)
        err = (x0_hat - x0) ** 2
    else:
        if predict_x0:
            eps_hat = predict_noise_from_start(sched, x_noisy, t, pred)
        else:
            eps_hat = pred
        err = (eps_hat - noise) ** 2
    if mask is None:
        per_sample = err.mean(axis=tuple(range(1, err.ndim)))
    else:
        m = mask[..., None]
        per_sample = (err * m).sum(axis=(1, 2)) / (
            m.sum(axis=(1, 2)) * err.shape[-1]
        )
    if t_weights is None:
        # unweighted: keep the reference's global masked mean exactly
        if mask is None:
            loss = err.mean()
        else:
            m = mask[..., None]
            loss = (err * m).sum() / (m.sum() * err.shape[-1])
    else:
        loss = (per_sample * t_weights).mean()
    return loss, {"per_sample_loss": per_sample}
