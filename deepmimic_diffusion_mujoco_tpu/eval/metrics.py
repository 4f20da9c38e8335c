"""On-device evaluation metrics: motion FID, SiFID, diversity, sampling rate.

Functional rewrite of the reference's eval stack:

- `MotionFID` (metrics/fid_score.py:7-144): "activations" are the raw
  flattened trajectories (no learned feature extractor); mu/Sigma with the
  (n-1) covariance normalizer; matrix sqrt of Sigma1 @ Sigma2 via SVD with
  singular values clamped at 1e-6; Frechet formula.
- `eval.py:15-89`: sliding-window slicing, inter-diversity (half-batch L2),
  intra-diversity (random window pairs), SiFID (per-sample FID over
  window slices vs ground-truth slices, window=10 step=10).

All statistics run on device in float32; only the scalar results move to
host. The per-sample SiFID loop is vmapped instead of the reference's
Python loop.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def slice_windows(sample: jnp.ndarray, window_size: int, step_size: int = 10) -> jnp.ndarray:
    """(T, D) -> (num_windows, window_size, D) (eval.py:15-21)."""
    T = sample.shape[0]
    offsets = np.arange(T - window_size + 1)[::step_size]
    idx = offsets[:, None] + np.arange(window_size)[None, :]
    return sample[jnp.asarray(idx)]


def activation_statistics(data: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mu/Sigma of flattened trajectories (fid_score.py:24-43)."""
    feats = data.reshape(data.shape[0], -1).astype(jnp.float32)
    mu = feats.mean(axis=0)
    centered = feats - mu[None]
    sigma = centered.T @ centered / (feats.shape[0] - 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> jnp.ndarray:
    """Frechet distance with the reference's SVD matrix sqrt
    (fid_score.py:45-81). NOTE: kept for parity — sqrt via SVD of
    Sigma1 @ Sigma2 equals the true matrix sqrt only up to the product's
    non-normality; the reference accepts this approximation."""
    diff = mu1 - mu2
    diff_sq = jnp.dot(diff, diff)
    product = sigma1 @ sigma2
    u, s, vh = jnp.linalg.svd(product)
    covmean = u @ jnp.diag(jnp.sqrt(jnp.clip(s, eps))) @ vh
    return diff_sq + jnp.trace(sigma1) + jnp.trace(sigma2) - 2 * jnp.trace(covmean)


def motion_fid(real: jnp.ndarray, generated: jnp.ndarray) -> float:
    """FID between two trajectory batches (B, H, D)."""
    mu1, s1 = activation_statistics(real)
    mu2, s2 = activation_statistics(generated)
    return float(frechet_distance(mu1, s1, mu2, s2))


def inter_diversity(samples: jnp.ndarray) -> float:
    """Half-batch embedding distance (eval.py:55-58). Odd batches drop the
    middle element (the reference FIXMEs this case; we define it)."""
    n = samples.shape[0] // 2
    emb = samples.reshape(samples.shape[0], -1)
    second = emb[-n:] if samples.shape[0] % 2 else emb[n:]
    return float(jnp.linalg.norm(emb[:n] - second, axis=1).mean())


def intra_diversity(samples: jnp.ndarray, rng: jax.Array, window_size: int = 10) -> float:
    """Mean L2 between two random windows of each sample (eval.py:80-89)."""
    B, T, D = samples.shape
    offsets = jax.random.randint(rng, (B, 2), 0, T - window_size)
    win = np.arange(window_size)

    def one(sample, off):
        w0 = sample[off[0] + win]
        w1 = sample[off[1] + win]
        return jnp.linalg.norm((w0 - w1).reshape(-1))

    return float(jax.vmap(one)(samples, offsets).mean())


def sifid(
    generated: jnp.ndarray,
    gt_sample: jnp.ndarray,
    window_size: int = 10,
    step_size: int = 10,
    gt_step_size: int | None = None,
) -> float:
    """Single-instance FID (eval.py:60-77): per generated sample, FID of its
    window slices vs the ground-truth clip's window slices; mean over the
    batch. vmapped over samples.

    `gt_step_size` (default = step_size, the reference behavior) strides
    the GROUND-TRUTH side separately: step 1 gives a densely-windowed
    reference, which matters for short clips — the 25-frame run clip at
    the reference stride yields only 2 windows, a rank-deficient
    covariance that mis-ranks even perfect samples (round-5 measurement;
    cfg_eval uses gt_step_size=1)."""
    gt_slices = slice_windows(
        gt_sample, window_size,
        step_size if gt_step_size is None else gt_step_size)
    gt_mu, gt_sigma = activation_statistics(gt_slices)

    def one(sample):
        sl = slice_windows(sample, window_size, step_size)
        mu, sigma = activation_statistics(sl)
        return frechet_distance(gt_mu, gt_sigma, mu, sigma)

    return float(jax.vmap(one)(generated).mean())


def timed_sampling_rate(sample_fn, num_samples: int) -> tuple[jnp.ndarray, float]:
    """samples/s with device sync (eval.py:44-53 without the hidden
    async-dispatch bias: we block_until_ready before stopping the clock)."""
    t0 = time.perf_counter()
    samples = sample_fn(num_samples)
    jax.block_until_ready(samples)
    dt = time.perf_counter() - t0
    return samples, num_samples / dt


def evaluate(
    sample_fn,
    gt_sample: jnp.ndarray,
    num_samples: int = 50,
    replications: int = 5,
    window_size: int = 10,
    seed: int = 0,
) -> dict:
    """The eval.py:92-142 harness: per replication draw samples, compute
    sampling rate + diversity + SiFID; report mean/std over replications."""
    rows = []
    for rep in range(replications):
        samples, rate = timed_sampling_rate(sample_fn, num_samples)
        rng = jax.random.PRNGKey(seed + rep)
        gt_intra = intra_diversity(
            jnp.broadcast_to(gt_sample, (2,) + gt_sample.shape), rng, window_size
        )
        intra = intra_diversity(samples, rng, window_size)
        rows.append({
            "sampling_rate": rate,
            "inter_diversity": inter_diversity(samples),
            "intra_diversity": intra,
            "gt_intra_diversity": gt_intra,
            "intra_diversity_gt_diff": abs(intra - gt_intra),
            "sifid": sifid(samples, gt_sample, window_size),
        })
    out = {}
    for key in rows[0]:
        vals = np.array([r[key] for r in rows])
        out[key] = {"mean": float(vals.mean()), "std": float(vals.std())}
    return out
