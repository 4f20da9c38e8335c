"""Host-side mocap playback via the installed MuJoCo bindings.

The mocap_player equivalent (mocap_player.py:7-91): kinematic playback of a
(T, 35) qpos motion with the phase-offset wraparound that keeps the
character moving forward across loops. Uses the modern `mujoco` package
(the reference used mujoco-py 2.1); rendering degrades gracefully when no
GL context is available (headless CI), in which case frames can still be
produced via offscreen rendering if EGL/OSMesa exists, else playback is
compute-only (useful as the FK oracle).
"""
from __future__ import annotations

import numpy as np

from .humanoid_model import to_xml


def _load_mujoco():
    try:
        import mujoco

        return mujoco
    except Exception as e:  # pragma: no cover
        raise ImportError(f"mujoco bindings unavailable: {e}") from e


class MocapPlayer:
    def __init__(self):
        mujoco = _load_mujoco()
        self.mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(to_xml())
        self.data = mujoco.MjData(self.model)

    def forward(self, qpos: np.ndarray):
        """Set qpos and run kinematics (the sim.forward() analog)."""
        self.data.qpos[:] = np.asarray(qpos, np.float64)
        self.mujoco.mj_forward(self.model, self.data)
        return self.data

    def body_positions(self, qpos: np.ndarray) -> dict[str, np.ndarray]:
        data = self.forward(qpos)
        return {
            self.model.body(i).name: data.xpos[i].copy()
            for i in range(self.model.nbody)
        }

    def play(
        self,
        motion: np.ndarray,
        loops: int = 1,
        fps: float = 30.0,
        render: bool = True,
        video_path: str | None = None,
        width: int = 640,
        height: int = 480,
    ):
        """Playback loop with root-xy phase carry (mocap_player.py:69-79).

        Yields nothing; optionally writes a video via VideoSaver. Returns
        the list of rendered frames if offscreen rendering succeeded.
        """
        motion = np.asarray(motion, np.float64)
        renderer = None
        frames = []
        played = []
        if render or video_path:
            try:
                renderer = self.mujoco.Renderer(self.model, height=height, width=width)
            except Exception:
                renderer = None  # headless without GL: software fallback below
        phase_offset = np.zeros(3)
        for _ in range(loops):
            for config in motion:
                qpos = config.copy()
                qpos[0:3] += phase_offset
                self.forward(qpos)
                played.append(qpos.copy())
                if renderer is not None:
                    renderer.update_scene(self.data)
                    frames.append(renderer.render().copy())
            phase_offset = self.data.qpos[0:3].copy()
            phase_offset[2] = 0.0
        if renderer is None and (render or video_path) and played:
            # no GL on this host: rasterize the capsule skeleton in software
            # so playback still yields frames / a video artifact
            from .softrender import render_motion

            frames = list(render_motion(
                np.stack(played), width=width, height=height))
        if video_path and frames:
            from .video import VideoSaver

            saver = VideoSaver(video_path, width=width, height=height, fps=int(fps))
            for f in frames:
                saver.write(f)
            saver.close()
        return frames


def play_mocap_np_file(path: str, loops: int = 1, **kw):
    """CLI-compatible entry (mocap_player.py:42-81): play a saved .npy
    motion of shape (T, 35); pads/truncates the feature dim like the
    reference's save path does."""
    motion = np.load(path)
    if motion.ndim != 2:
        raise ValueError(f"expected (T, D) motion, got {motion.shape}")
    if motion.shape[1] > 35:
        motion = motion[:, :35]
    elif motion.shape[1] < 35:
        motion = np.pad(motion, ((0, 0), (0, 35 - motion.shape[1])))
    return MocapPlayer().play(motion, loops=loops, **kw)
