"""Trajectory datasets: windowing, cyclic augmentation, batching.

Reproduces both reference dataset semantics as pure array transforms:

- v1 (diffusion/data_loaders/motion_dataset.py:12-52): single clip, qpos-only
  (T, 35); horizon truncated to the largest multiple of 8 (the temporal U-Net
  downsamples 3x); augmented with all T cyclic rotations; conditions
  ``{0: frame0}``.
- v2 (diffusion/data_loaders/motion_dataset_v2.py:30-130): qpos||qvel
  (T, 69) with per-clip class labels; ``shuffle=True`` -> cyclic rotations
  with a root-xyz continuity fix-up; ``shuffle=False`` -> the clip replicated
  ``replicas`` times. Multi-clip jagged batches become padded arrays with a
  validity mask (XLA needs static shapes — SURVEY.md section 7 "nested/jagged").

Unlike the reference's torch DataLoader, batching here is an explicit
host-side RNG + gather; the training loop moves batches to device with the
mesh's data sharding (see parallel/sharding.py).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from .mocap import MocapClip, load_clip


class Batch(NamedTuple):
    """A device-ready batch. `mask` is 1.0 on valid frames, 0.0 on padding."""

    trajectories: np.ndarray   # (B, H, D)
    motion_class: np.ndarray   # (B,) int32
    mask: np.ndarray           # (B, H) float32
    cond_frame: np.ndarray     # (B, D) frame-0 conditioning (v1 contract)


def truncate_to_multiple(x: np.ndarray, k: int = 8) -> np.ndarray:
    """Drop trailing frames so T % k == 0 (motion_dataset.py:26-28)."""
    t = x.shape[0] - (x.shape[0] % k)
    return x[:t]


def cyclic_rotations(x: np.ndarray) -> np.ndarray:
    """All T rotations concat(x[i:], x[:i]) (motion_dataset.py:31-37)."""
    T = x.shape[0]
    idx = (np.arange(T)[:, None] + np.arange(T)[None, :]) % T
    return x[idx]


def cyclic_rotations_rooted(x: np.ndarray) -> np.ndarray:
    """Cyclic rotations with root-xyz continuity fix-up.

    Matches motion_dataset_v2.py:86-101: the wrapped suffix is shifted by the
    clip's net root displacement, then both halves are re-anchored so the
    rotated motion starts at the clip's original root position. Rotations
    i == 0 and i == T-1 are left untouched (reference quirk, kept for parity).
    """
    T = x.shape[0]
    diff3 = x[-1, :3] - x[0, :3]
    out = np.empty((T,) + x.shape, dtype=x.dtype)
    for i in range(T):
        prefix = x[i:].copy()
        suffix = x[:i].copy()
        if i != 0 and i != T - 1:
            suffix[:, :3] += diff3
            first_diff3 = prefix[0, :3] - x[0, :3]
            prefix[:, :3] -= first_diff3
            suffix[:, :3] -= first_diff3
        out[i] = np.concatenate([prefix, suffix], axis=0)
    return out


def flattened_normalized(qpos: np.ndarray, frames: int = 80):
    """Stack-C preprocessing (ddpm/ddpm.ipynb cells 2-4): min-max normalize
    to [0, 1] and flatten (frames, 35) -> (1, frames*35, 1) for a 1-channel
    1-D diffusion. Returns (flat, (min_val, max_val))."""
    x = np.asarray(qpos[:frames], np.float32)
    lo, hi = float(x.min()), float(x.max())
    norm = (x - lo) / (hi - lo)
    return norm.reshape(1, -1, 1), (lo, hi)


def unflatten_denormalized(flat: np.ndarray, bounds: tuple[float, float],
                           feature_dim: int = 35) -> np.ndarray:
    """Inverse of :func:`flattened_normalized` (ddpm.ipynb cells 11-13)."""
    lo, hi = bounds
    x = np.asarray(flat).reshape(-1, feature_dim)
    return x * (hi - lo) + lo


@dataclass
class MotionDataset:
    """In-memory trajectory dataset over one or more mocap clips."""

    trajectories: np.ndarray     # (N, H, D) float32, zero-padded
    motion_class: np.ndarray     # (N,) int32
    lengths: np.ndarray          # (N,) int32 valid frame counts
    horizon: int
    feature_dim: int

    # ---- constructors -------------------------------------------------

    @classmethod
    def from_clips(
        cls,
        clips: list[MocapClip],
        include_velocity: bool = True,
        augment: str = "cyclic_rooted",  # "cyclic" | "cyclic_rooted" | "replicate" | "none"
        replicas: int = 1000,
        horizon_multiple: int = 1,
        pad_to: int | None = None,
        frames_limit: int | None = None,
    ) -> "MotionDataset":
        """`frames_limit` + augment="replicate" reproduces the early
        SpinkickDiffuserDataset (first 64 frames repeated,
        data_loaders/spinkick_diffuser_dataset.py:11-52)."""
        trajs, labels, lengths = [], [], []
        for clip in clips:
            x = clip.combined() if include_velocity else clip.qpos
            if frames_limit is not None:
                x = x[:frames_limit]
            x = truncate_to_multiple(x, horizon_multiple) if horizon_multiple > 1 else x
            if augment == "cyclic":
                variants = cyclic_rotations(x)
            elif augment == "cyclic_rooted":
                variants = cyclic_rotations_rooted(x)
            elif augment == "replicate":
                variants = np.broadcast_to(x, (replicas,) + x.shape)
            elif augment == "none":
                variants = x[None]
            else:
                raise ValueError(f"unknown augment mode {augment!r}")
            trajs.append(np.asarray(variants, dtype=np.float32))
            labels.extend([clip.motion_class] * len(variants))
            lengths.extend([x.shape[0]] * len(variants))

        H = pad_to if pad_to is not None else max(t.shape[1] for t in trajs)
        D = trajs[0].shape[2]
        N = sum(t.shape[0] for t in trajs)
        stacked = np.zeros((N, H, D), dtype=np.float32)
        off = 0
        for t in trajs:
            stacked[off : off + t.shape[0], : t.shape[1]] = t[:, :H]
            off += t.shape[0]
        return cls(
            trajectories=stacked,
            motion_class=np.asarray(labels, dtype=np.int32),
            lengths=np.asarray(lengths, dtype=np.int32),
            horizon=H,
            feature_dim=D,
        )

    @classmethod
    def from_path(cls, path: str, max_files: int | None = None, **kw) -> "MotionDataset":
        """Load a single .txt clip or every clip in a directory."""
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".txt")
            )
            if max_files is not None:
                files = files[:max_files]
        else:
            files = [path]
        return cls.from_clips([load_clip(f) for f in files], **kw)

    def truncated(self, horizon: int) -> "MotionDataset":
        """Clamp every trajectory to `horizon` frames (e.g. a model whose
        max_seq_len is shorter than the longest clip)."""
        if horizon >= self.horizon:
            return self
        return MotionDataset(
            trajectories=self.trajectories[:, :horizon],
            motion_class=self.motion_class,
            lengths=np.minimum(self.lengths, horizon),
            horizon=horizon,
            feature_dim=self.feature_dim,
        )

    # ---- access --------------------------------------------------------

    def __len__(self) -> int:
        return self.trajectories.shape[0]

    @property
    def max_sequence_length(self) -> int:
        return int(self.lengths.max())

    def mask(self) -> np.ndarray:
        return (
            np.arange(self.horizon)[None, :] < self.lengths[:, None]
        ).astype(np.float32)

    def batch(self, indices: np.ndarray) -> Batch:
        traj = self.trajectories[indices]
        return Batch(
            trajectories=traj,
            motion_class=self.motion_class[indices],
            mask=(
                np.arange(self.horizon)[None, :] < self.lengths[indices][:, None]
            ).astype(np.float32),
            cond_frame=traj[:, 0],
        )

    def epochs(self, batch_size: int, seed: int = 0, shuffle: bool = True,
               class_balanced: bool = False):
        """Infinite batch iterator (the reference's `cycle(DataLoader)`,
        diffuser/utils/training.py:11-14).

        Datasets smaller than the batch are oversampled to a full batch
        (each epoch's order is several concatenated permutations): the
        reference's DataLoader would emit a short final batch, but short
        batches are dynamic shapes under jit, so a fixed batch with
        repeats is the TPU-correct equivalent — without this a small clip
        with a big batch_size would yield nothing and spin forever.

        class_balanced=True draws each batch row's CLASS uniformly, then a
        random item of that class. Cyclic augmentation yields T variants
        per clip, so plain permutation weights classes by clip length —
        the 25-frame run clip is seen 6.6x less than the 164-frame
        cartwheel, and in round 5 exactly the shortest clips (run,
        backflip) were the classes CFG sampling confused. Not a reference
        behavior (its torch DataLoader has the same length bias); a
        deliberate improvement, off by default.
        """
        rng = np.random.default_rng(seed)
        n = len(self)
        if class_balanced:
            classes = np.unique(self.motion_class)
            by_class = [np.where(self.motion_class == c)[0] for c in classes]
            while True:
                cls = rng.integers(0, len(classes), size=batch_size)
                idx = np.array([
                    by_class[c][rng.integers(len(by_class[c]))] for c in cls
                ])
                yield self.batch(idx)
        reps = max(1, -(-batch_size // n))  # ceil
        while True:
            order = np.concatenate([
                rng.permutation(n) if shuffle else np.arange(n)
                for _ in range(reps)
            ])
            for i in range(0, order.size - batch_size + 1, batch_size):
                yield self.batch(order[i : i + batch_size])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host batch assembly + H2D transfer with device compute: a
    background thread keeps `size` device-resident batches queued ahead
    (the host-sharded prefetch of SURVEY.md section 7; replaces the
    reference's DataLoader worker, training.py:72-74)."""
    import queue
    import threading

    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(x):
        if sharding is not None:
            return jax.device_put(np.asarray(x), sharding)
        return jax.device_put(np.asarray(x))

    def worker():
        for batch in iterator:
            if stop.is_set():
                return
            q.put(jax.tree_util.tree_map(put, batch))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
