"""End-to-end CLI workflow: train -> sample -> play -> evaluate, in-process
(the CLIs are argparse mains; we call them with argv lists)."""
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "motions")
WALK = os.path.join(DATA, "humanoid3d_walk.txt")

TINY = [
    "--set",
    "model.latent_dim=32", "model.num_layers=1", "model.n_heads=2",
    "model.dim_feedforward=64", "model.max_seq_len=40",
    "model.num_classes=9", "diffusion.noise_steps=8",
    "train.log_every=5", "train.ema_start=5",
    # bare-string override (not valid JSON) must parse as a string
    "data.augment=cyclic_rooted",
]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "run")
    from deepmimic_diffusion_mujoco_tpu.cli import train

    train.main([
        "--data", WALK, "--architecture", "transformer",
        "--steps", "20", "--batch-size", "4", "--out", out, *TINY,
    ])
    return out


def test_train_cli_artifacts(run_dir):
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "training_metrics.json"))
    with open(os.path.join(run_dir, "training_metrics.json")) as f:
        metrics = json.load(f)
    assert len(metrics["metrics"]) >= 2
    ckpts = os.listdir(os.path.join(run_dir, "checkpoints"))
    assert any(c.startswith("state_") for c in ckpts)


def test_sample_cli_and_playback(run_dir, tmp_path, capsys):
    from deepmimic_diffusion_mujoco_tpu.cli import sample, play

    out_dir = str(tmp_path / "samples")
    sample.main([
        "--run", run_dir, "--num", "2", "--frames", "24",
        "--conditioner", "holding_box", "--out", out_dir,
    ])
    files = sorted(os.listdir(out_dir))
    assert files == ["motion1.npy", "motion2.npy"]
    m = np.load(os.path.join(out_dir, "motion1.npy"))
    assert m.shape == (24, 35)
    # conditioner contract: shoulders 0, elbows 1.57 (reference's own check)
    np.testing.assert_allclose(m[:, 13:16], 0.0)
    np.testing.assert_allclose(m[:, 16], 1.57, atol=1e-6)
    # playback through the MuJoCo engine (headless: compute-only)
    play.main([os.path.join(out_dir, "motion1.npy"), "--no-render"])
    assert "played" in capsys.readouterr().out


def test_compare_cli_clamps_horizon_to_gt(run_dir, tmp_path):
    """compare-models with --gt must sample at min(gt_len, max_seq_len) —
    learned position slots beyond the trained horizon are untrained, so the
    old max_seq_len default scored garbage SiFID (regression for the
    round-3 fix)."""
    from deepmimic_diffusion_mujoco_tpu.cli import compare

    out_dir = str(tmp_path / "cmp")
    compare.main([
        "--runs", run_dir, "--gt", WALK, "--num", "2", "--out", out_dir,
    ])
    with open(os.path.join(out_dir, "compare_report.json")) as f:
        report = json.load(f)
    entry = next(iter(report.values()))
    # walk clip has 39 frames < max_seq_len 40 -> horizon clamps to 39
    assert entry["frames"] == 39
    assert "sifid" in entry
    m = np.load(entry["motion_paths"][0])
    assert m.shape == (39, 35)


def test_sample_cli_cfg_and_ema(run_dir, tmp_path):
    from deepmimic_diffusion_mujoco_tpu.cli import sample

    out_dir = str(tmp_path / "s2")
    sample.main([
        "--run", run_dir, "--num", "1", "--frames", "16",
        "--class-id", "0", "--cfg-scale", "2.5", "--ema", "--out", out_dir,
    ])
    assert np.load(os.path.join(out_dir, "motion1.npy")).shape == (16, 35)


def test_evaluate_cli(run_dir, tmp_path, capsys):
    from deepmimic_diffusion_mujoco_tpu.cli import evaluate

    out = str(tmp_path / "eval.json")
    evaluate.main([
        "--run", run_dir, "--gt", WALK, "--num", "4", "--reps", "2",
        "--frames", "24", "--json", out, "--rmse",
        "--check", "sampling_rate.mean>0", "--check", "rmse.min>=0",
    ])
    with open(out) as f:
        res = json.load(f)
    assert res["sampling_rate"]["mean"] > 0
    assert "sifid" in res
    assert res["rmse"]["min"] <= res["rmse"]["mean"]
    # the regression gate: a violated bound exits nonzero
    assert evaluate.check_results(res, ["sifid.mean<=1e9"]) == []
    with pytest.raises(SystemExit):
        evaluate.main([
            "--run", run_dir, "--gt", WALK, "--num", "2", "--reps", "1",
            "--frames", "24", "--check", "sampling_rate.mean<=0",
        ])


def test_sweep_cli(tmp_path):
    from deepmimic_diffusion_mujoco_tpu.cli import sweep

    grid = tmp_path / "grid.json"
    grid.write_text(json.dumps({"train.lr": [1e-3, 1e-4]}))
    base = tmp_path / "base.json"
    from deepmimic_diffusion_mujoco_tpu.train.config import ExperimentConfig

    cfg = ExperimentConfig(name="tiny")
    cfg = cfg.override({
        "data.path": WALK, "model.latent_dim": 32, "model.num_layers": 1,
        "model.n_heads": 2, "model.dim_feedforward": 64,
        "model.max_seq_len": 40, "model.num_classes": 9,
        "diffusion.noise_steps": 8, "train.num_train_steps": 10,
        "train.batch_size": 4, "train.log_every": 5,
    })
    cfg.save(str(base))
    out = str(tmp_path / "sweep")
    sweep.main(["--config", str(base), "--grid", str(grid), "--out", out])
    with open(os.path.join(out, "final_summary.json")) as f:
        summary = json.load(f)
    assert len(summary["all"]) == 2
    assert summary["best"]["best_loss"] <= summary["all"][-1]["best_loss"]
    assert os.path.exists(os.path.join(out, "best_configs.txt"))


def test_sample_cfg_sweep(run_dir, tmp_path):
    from deepmimic_diffusion_mujoco_tpu.cli import sample

    out_dir = str(tmp_path / "sweep")
    sample.main([
        "--run", run_dir, "--num", "1", "--frames", "16",
        "--class-id", "0", "--cfg-sweep", "0,3", "--out", out_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "cfg_sweep.json"))
    a = np.load(os.path.join(out_dir, "cfg_0", "motion1.npy"))
    b = np.load(os.path.join(out_dir, "cfg_3", "motion1.npy"))
    assert a.shape == b.shape == (16, 35)
    assert np.abs(a - b).max() > 0  # guidance changed the sample


def test_prefetch_to_device():
    from deepmimic_diffusion_mujoco_tpu.data.datasets import (
        MotionDataset,
        prefetch_to_device,
    )

    ds = MotionDataset.from_path(WALK, augment="cyclic_rooted")
    it = prefetch_to_device(ds.epochs(4, seed=0), size=2)
    b1 = next(it)
    b2 = next(it)
    import jax
    assert isinstance(b1.trajectories, jax.Array)
    assert b1.trajectories.shape == b2.trajectories.shape


@pytest.mark.slow  # ~70s two full CLI train runs
def test_train_resume(tmp_path):
    """Kill-and-resume: a second invocation with --resume continues from
    the saved step instead of starting over."""
    from deepmimic_diffusion_mujoco_tpu.cli import train

    out = str(tmp_path / "resume_run")
    args = [
        "--data", WALK, "--architecture", "transformer",
        "--steps", "6", "--batch-size", "4", "--out", out, *TINY,
        "--set", "train.save_every=3", "train.log_every=2",
        "train.gradient_accumulate_every=2",
    ]
    train.main(args)
    from deepmimic_diffusion_mujoco_tpu.train.checkpoint import Checkpointer

    # TrainState.step counts gradient applications (microbatches):
    # 6 optimizer steps x accum 2 = 12
    step_before = Checkpointer(os.path.join(out, "checkpoints")).latest_step()
    assert step_before == 12
    train.main(args + ["--resume"])
    step_after = Checkpointer(os.path.join(out, "checkpoints")).latest_step()
    assert step_after == 24


def test_scaling_cli_gate_record(tmp_path):
    """The scaling CLI emits the launch-day artifact contract (VERDICT r4
    missing #3): {n_hosts, per-width efficiency, gate, gate_evaluated,
    gate_pass}. On virtual CPU devices the gate is recorded but NOT
    evaluated (exit 0 regardless of the meaningless CPU 'efficiency')."""
    from deepmimic_diffusion_mujoco_tpu.cli import scaling

    out = tmp_path / "scaling.json"
    report = scaling.main([
        "--widths", "1,2", "--batch-per-device", "2", "--dim", "8",
        "--steps", "2", "--gate", "0.8", "--json", str(out),
    ])
    rec = json.loads(out.read_text())
    assert rec["n_hosts"] == 1
    assert rec["measurement_valid"] is False          # virtual CPU devices
    assert rec["gate"] == 0.8
    assert rec["gate_evaluated"] is False
    assert rec["gate_pass"] is None
    for w in ("1", "2"):
        assert "efficiency" in rec[w] and "steps_per_s" in rec[w]
    assert report["gate"] == 0.8


@pytest.mark.slow
def test_scaling_cli_two_process(tmp_path):
    """The one-command-per-host pod launch path of the scaling CLI: two
    real processes distributed-init over a localhost coordinator and both
    emit the scaling record with n_hosts=2."""
    import socket
    import subprocess
    import sys

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    repo = os.path.join(os.path.dirname(__file__), "..")

    def env():
        e = dict(os.environ)
        e.pop("PALLAS_AXON_POOL_IPS", None)
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        return e

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "deepmimic_diffusion_mujoco_tpu.cli.scaling",
             "--widths", "2,4", "--batch-per-device", "2", "--dim", "8",
             "--steps", "2", "--gate", "0.8",
             "--json", str(tmp_path / f"scaling_{i}.json"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            cwd=repo, env=env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        rec = json.loads((tmp_path / f"scaling_{i}.json").read_text())
        assert rec["n_hosts"] == 2
        assert rec["gate_evaluated"] is False  # still CPU
