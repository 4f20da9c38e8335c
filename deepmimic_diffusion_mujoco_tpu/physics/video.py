"""Video writer (the VideoSaver equivalent, diffusion/VideoSaver.py:7-47).

Uses OpenCV when available (MJPG .avi like the reference), else falls back
to writing raw .npy frame stacks so headless environments still produce an
artifact.
"""
from __future__ import annotations

import numpy as np


class VideoSaver:
    def __init__(self, path: str, width: int = 640, height: int = 480, fps: int = 30):
        self.path = path
        self.width = width
        self.height = height
        self.fps = fps
        self._frames = []
        self._writer = None
        try:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            writer = cv2.VideoWriter(path, fourcc, fps, (width, height))
            # VideoWriter constructs even when the codec/container is
            # unusable — it just writes nothing; verify it actually opened
            self._writer = writer if writer.isOpened() else None
            self._cv2 = cv2
        except Exception:
            self._writer = None

    def write(self, frame: np.ndarray):
        """frame: (H, W, 3) RGB uint8."""
        if self._writer is not None:
            self._writer.write(self._cv2.cvtColor(frame, self._cv2.COLOR_RGB2BGR))
        else:
            self._frames.append(np.asarray(frame))

    def close(self):
        if self._writer is not None:
            self._writer.release()
        elif self._frames:
            np.save(self.path + ".npy", np.stack(self._frames))
