"""Constraint injection ("apply_conditioning") as pure, composable functions.

The reference's signature capability (SURVEY.md section 2.4) is hard
state-overwrite inside the reverse loop: a `conditioning_fn` hook applied to
x after initialization and after every denoise step
(diffuser/models/diffusion.py:194,206,215-218). The concrete conditioners
live in diffuser/models/sampling_config.py:6-32 and in notebook closures
(archive/*.ipynb).

Here every conditioner compiles to ONE fused select:

    x <- x * (1 - mask) + values * mask

with (mask, values) precomputed on host as broadcastable arrays. This is the
jit/TPU-native replacement for the reference's in-place tensor mutation: a
pure (B, H, D) -> (B, H, D) function, trivially fusable by XLA into the
surrounding sampler step, and exactly equivalent to the intended overwrite
semantics (the reference's buggy closure variants are documented in
SURVEY.md section 7 and not replicated).

Conditioners compose: `chain(c1, c2)` applies them in order, which matches
sequential in-place mutation.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

# A conditioner maps trajectories (B, H, D) -> (B, H, D), pure.
Conditioner = Callable[[jnp.ndarray], jnp.ndarray]


def identity(x: jnp.ndarray) -> jnp.ndarray:
    """The default: conditioning disabled (sampling_config.py:6-9).

    Unlike the reference ("toggle by editing the file", README.md:90-93),
    selection is a config value, not a source edit.
    """
    return x


def masked_overwrite(mask: jnp.ndarray, values: jnp.ndarray) -> Conditioner:
    """Generic conditioner: overwrite where mask == 1.

    mask / values broadcast against (B, H, D). This single primitive
    expresses every concrete conditioner in the reference.
    """
    mask = jnp.asarray(mask, dtype=jnp.float32)
    values = jnp.asarray(values, dtype=jnp.float32)

    def fn(x: jnp.ndarray) -> jnp.ndarray:
        return x * (1.0 - mask) + values * mask

    return fn


def chain(*conditioners: Conditioner) -> Conditioner:
    """Apply conditioners left-to-right (sequential overwrite semantics)."""

    def fn(x: jnp.ndarray) -> jnp.ndarray:
        for c in conditioners:
            x = c(x)
        return x

    return fn


# ---------------------------------------------------------------------------
# Concrete behaviors (SURVEY.md section 2.4 catalog)
# ---------------------------------------------------------------------------


def clamp_dims(dim_values: dict[int, float], feature_dim: int) -> Conditioner:
    """Motion editing: hold given feature dims at fixed values on EVERY frame.

    The reference's "holding a box" conditioner overwrites shoulder/elbow
    dims 13-16 and 17-20 each denoise step
    (sampling_config.py:23-32, README.md:95).
    """
    mask = np.zeros((feature_dim,), np.float32)
    vals = np.zeros((feature_dim,), np.float32)
    for d, v in dim_values.items():
        mask[d] = 1.0
        vals[d] = v
    return masked_overwrite(mask[None, None, :], vals[None, None, :])


def holding_box(feature_dim: int = 35) -> Conditioner:
    """The exact pose of apply_conditioning_motion_editing
    (sampling_config.py:23-32): shoulder triples (13-15, 17-19) zeroed,
    elbows (16, 20) at 1.57 rad (~90 degrees)."""
    pose = {d: 0.0 for d in (13, 14, 15, 17, 18, 19)}
    pose[16] = 1.57
    pose[20] = 1.57
    return clamp_dims(pose, feature_dim)


def clamp_frame0(frame0: jnp.ndarray) -> Conditioner:
    """Diffuser `conditions = {0: frame0}` contract
    (data_loaders/motion_dataset.py:52): pin frame 0 to the dataset frame."""
    frame0 = jnp.asarray(frame0)
    B, D = frame0.shape

    def fn(x: jnp.ndarray) -> jnp.ndarray:
        return x.at[:, 0, :D].set(frame0.astype(x.dtype))

    return fn


def clamp_frames(
    reference: jnp.ndarray,
    frames: Sequence[int] | np.ndarray,
    dims: slice | Sequence[int] = slice(None),
    horizon: int | None = None,
) -> Conditioner:
    """Keyframe checkpointing / inbetweening / blending primitive: clamp the
    given frames (optionally only some feature dims) to a reference motion.

    `reference` is (H, D) or (B, H, D). Covers:
    - long-projection keyframe checkpoints (+/- window frames around
      keyframes pinned to a tiled clip, archive/3_5_long_projection_v2.ipynb
      cells 23-27),
    - inbetweening (clamp a window to a target clip,
      archive/4_motion_inbetweening_v2.ipynb cells 21-25),
    - blending (clamp all but +/-5 frames at the seam,
      archive/5_motion_blending_v2.ipynb cells 20-22).
    """
    ref = np.asarray(reference, np.float32)
    if ref.ndim == 2:
        ref = ref[None]
    H, D = ref.shape[1], ref.shape[2]
    if horizon is None:
        horizon = H
    frame_mask = np.zeros((horizon,), np.float32)
    frame_mask[np.asarray(frames, np.int64)] = 1.0
    dim_mask = np.zeros((D,), np.float32)
    dim_mask[np.arange(D)[dims] if isinstance(dims, slice) else np.asarray(dims)] = 1.0
    mask = frame_mask[None, :, None] * dim_mask[None, None, :]
    values = np.zeros((ref.shape[0], horizon, D), np.float32)
    values[:, :H] = ref
    return masked_overwrite(mask, values)


def inbetween(
    start_clip: jnp.ndarray,
    end_clip: jnp.ndarray,
    horizon: int,
    edge: int,
) -> Conditioner:
    """Clamp the first `edge` frames to start_clip and the last `edge` frames
    to end_clip, leaving the middle free for the model to fill
    (archive/4_motion_inbetweening_v2.ipynb)."""
    start = np.asarray(start_clip, np.float32)
    end = np.asarray(end_clip, np.float32)
    D = start.shape[-1]
    ref = np.zeros((horizon, D), np.float32)
    ref[:edge] = start[:edge]
    ref[-edge:] = end[-edge:]
    frames = list(range(edge)) + list(range(horizon - edge, horizon))
    return clamp_frames(ref, frames, horizon=horizon)


def blend(
    first_clip: np.ndarray,
    second_clip: np.ndarray,
    seam_halfwidth: int = 5,
    root_continuity: bool = True,
    free_dims_second: slice = slice(3, 35),
) -> tuple[np.ndarray, Conditioner]:
    """Walk->backflip style blending (archive/5_motion_blending_v2.ipynb
    cells 20-22). Returns (starting_motion, conditioner):

    - starting_motion = concat(first, second shifted for root continuity),
    - conditioner clamps everything except +/- seam_halfwidth frames at the
      seam; the second half is clamped only on `free_dims_second`
      (the reference frees the root xyz of the second clip: x[:, end:, 3:35]).
    """
    a = np.asarray(first_clip, np.float32)
    b = np.asarray(second_clip, np.float32).copy()
    if root_continuity:
        b[:, :3] += a[-1, :3] - b[0, :3]
    start_motion = np.concatenate([a, b], axis=0)
    H, D = start_motion.shape
    seam = a.shape[0]
    lo, hi = seam - seam_halfwidth, seam + seam_halfwidth

    mask = np.zeros((1, H, D), np.float32)
    mask[:, :lo, :] = 1.0
    dim_mask = np.zeros((D,), np.float32)
    dim_mask[free_dims_second] = 1.0
    mask[:, hi:, :] = dim_mask[None, None, :]
    return start_motion, masked_overwrite(mask, start_motion[None])


def steer_root(
    path_xy: np.ndarray,
    horizon: int,
    feature_dim: int,
    frames: Sequence[int] | None = None,
) -> Conditioner:
    """Root-trajectory steering (archive/6_walking_trajectory_v2.ipynb
    cell 20): overwrite root x,y of the given frames with a target path."""
    path_xy = np.asarray(path_xy, np.float32)
    if frames is None:
        frames = range(path_xy.shape[0])
    frames = np.asarray(list(frames), np.int64)
    values = np.zeros((1, horizon, feature_dim), np.float32)
    mask = np.zeros((1, horizon, feature_dim), np.float32)
    values[0, frames, 0] = path_xy[:, 0]
    values[0, frames, 1] = path_xy[:, 1]
    mask[0, frames, 0] = 1.0
    mask[0, frames, 1] = 1.0
    return masked_overwrite(mask, values)
