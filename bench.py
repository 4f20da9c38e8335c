"""Headline benchmark: training throughput on the reference's production
workload — TemporalUnet dim 128, batch 32, grad-accum 2, cartwheel clip.

The reference's only recoverable throughput number is "80s to run 1 epoch"
(500-1000 steps) on the author's GPU VM => ~6-12 optimizer steps/s
(archive/0_temporal_unet_diffusion_v2.ipynb cells 15-16; BASELINE.md).
`vs_baseline` divides our steps/s by 12 (the generous end of that range).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
secondary perf keys (same object, driver reads the four required fields):

- flop_per_step / achieved_tflops / mfu: XLA cost-analysis FLOPs per
  optimizer step divided by measured wall time and the chip's bf16 peak.
- sampling: device-synced reverse-chain throughput for the two production
  model families (reference metric: eval.py:44-53 sampling rate) — DDPM
  T=1000, strided DDIM-50 (serving path), and the CFG-batched chain.
- physics: dynamics-mode env steps/s at 4096 and 65536 parallel humanoids
  (BASELINE north-star config 5: >=10k env-steps/s with tracking reward).

Delivery contract hardening (VERDICT round 3 item 1 — round 3's capture
timed out inside the first TPU compile and the driver got NOTHING):

- Each section runs in its own subprocess with a wall-clock deadline and
  one retry (the tunnel to the chip intermittently hangs; a hung compile
  in a child is killed without sinking the parent).
- Children stream every metric to a JSON scratch file as soon as it is
  measured, so a section that dies mid-way still contributes everything
  it finished.
- The persistent XLA compilation cache is enabled (.jax_cache/), so a
  retry — or the driver's end-of-round run after this round's in-session
  runs — skips compilation entirely.
- The parent ALWAYS prints the final JSON line, with the primary metric
  taken from the best section that completed (train > sampling > physics).

Round 5 (VERDICT r4 weak #1 — BENCH_r04 recorded a fabricated 0.0 for the
U-Net T=1000 chain because all 5 reps came back under the sanity floor and
"no valid reps" silently became B/inf): every timed region now ends with a
forced device->host readback (np.asarray of the result) so a timing cannot
complete without the data existing, and "no rep above the floor" is a hard
section FAILURE (raise -> parent retry -> sampling_error if both attempts
die) instead of a 0.0 delivered as truth.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_STEPS_PER_S = 12.0
BASELINE_SAMPLES_PER_S = 0.64  # reference transformer_inference sampling rate

# bf16 MXU peak FLOP/s per chip, by device_kind substring (public specs).
_PEAK_BF16 = {
    "v6": 918e12,      # Trillium
    "v5p": 459e12,
    "v5e": 197e12,     # v5 litepod
    "v5": 197e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 45e12,
}


def _chip_peak_flops(dev) -> float:
    kind = getattr(dev, "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return 197e12  # assume v5e-class if unrecognizable through the tunnel


class _StreamingExtras(dict):
    """Dict that rewrites a JSON scratch file on every insert, so the
    parent recovers everything measured before a hang/kill."""

    def __init__(self, path: str | None):
        super().__init__()
        self._path = path

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        if self._path:
            tmp = self._path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(self), f)
            os.replace(tmp, self._path)


def bench_train(jax, jnp, extras: dict):
    from deepmimic_diffusion_mujoco_tpu.data.datasets import MotionDataset
    from deepmimic_diffusion_mujoco_tpu.diffusion import process, schedules
    from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
    from deepmimic_diffusion_mujoco_tpu.train.loop import make_train_many
    from deepmimic_diffusion_mujoco_tpu.train.state import TrainState, make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    # reference notebook config: dim 128, horizon = cartwheel truncated to
    # multiple of 8, bs 32, grad-accum 2, Adam 2e-5, cosine schedule T=1000
    ds = MotionDataset.from_path(
        os.path.join(REPO, "data/motions/humanoid3d_cartwheel.txt"),
        include_velocity=False, augment="cyclic", horizon_multiple=8,
    )
    sched = schedules.make_schedule("cosine", 1000, convention="diffuser")
    model = TemporalUnet(
        transition_dim=35, dim=128,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    H = ds.horizon
    # init params on the host CPU backend: the remote TPU compile of the
    # (throwaway) init program is intermittently very slow through the
    # tunnel; the params are tiny and transfer instantly
    with jax.default_device(jax.devices("cpu")[0]):
        x = jnp.zeros((2, H, 35))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    params = jax.device_put(params, jax.devices()[0])
    weights = process.diffuser_loss_weights(H, 35)

    def loss_fn(p, batch, rng):
        t_rng, n_rng = jax.random.split(rng)
        x0 = batch.trajectories
        t = jax.random.randint(t_rng, (x0.shape[0],), 0, sched.num_timesteps)
        return process.diffuser_p_losses(
            sched, lambda xx, tt: model.apply(p, xx, tt), x0, t, n_rng,
            weights, predict_epsilon=True, loss_kind="l2",
        )

    # The reference runs grad-accum 2 over bs-32 microbatches because of GPU
    # memory; MultiSteps averages the two grads, which is exactly the
    # gradient of one bs-64 batch — so each optimizer step here consumes one
    # 64-sample batch (identical update math, identical data per step,
    # half the fixed overhead).
    accum = 2
    tx = make_optimizer("adam", lr=2e-5)
    state = TrainState.create(params, tx)
    train_many = make_train_many(tx, loss_fn)

    # device-resident input pipeline: stage K optimizer steps ahead, run the
    # whole K-step loop as one compiled scan (zero host round-trips). The
    # tunneled chip pays ~37 ms of SERIAL dispatch per executable call
    # (profile_train_step.py), so bigger K is strictly better; a single
    # K=100 device_put exceeds a tunnel transfer limit and stacking 50+
    # device arrays hits a backend concatenate limit, so stage in 50-step
    # host chunks and 2-operand-concatenate them on device.
    K_CHUNK, N_CHUNKS = 50, 3
    K = K_CHUNK * N_CHUNKS
    batches = ds.epochs(32 * accum, seed=0)

    def stage_chunk():
        stack = [next(batches) for _ in range(K_CHUNK)]
        return jax.tree_util.tree_map(
            lambda *xs: jax.device_put(np.stack([np.asarray(x) for x in xs])),
            *stack,
        )

    chunks = [stage_chunk() for _ in range(N_CHUNKS)]
    staged = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
    _log("[bench] compiling train program")
    # make_train_many is already jitted (with state donation); lower/compile
    # it directly so cost_analysis sees the real program
    compiled = train_many.lower(state, staged, jax.random.PRNGKey(0)).compile()
    state, losses = compiled(state, staged, jax.random.PRNGKey(0))  # warm
    jax.block_until_ready(losses)
    # the tunneled chip's sync path intermittently stalls for tens of
    # seconds (compute itself is unaffected) — repeat the timed block and
    # report the best repetition so one stall doesn't mask real throughput
    n_calls, reps = 2, 4
    best_dt = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, losses = compiled(
                state, staged, jax.random.PRNGKey(r * n_calls + i + 1))
        np.asarray(losses)  # forced host readback: the sync of record
        best_dt = min(best_dt, time.perf_counter() - t0)
        # stream the running-best so even a mid-measurement kill delivers
        extras["train_steps_per_s"] = round((n_calls * K) / best_dt, 2)
    steps_per_s = (n_calls * K) / best_dt

    # FLOPs per optimizer step: count on a SINGLE-step lowering — XLA cost
    # analysis tallies a lax.scan body once regardless of trip count, so
    # the K-step program's "flops" is really one iteration's worth
    flop_per_step = None
    try:
        def one_step(p, batch, rng):
            return jax.grad(lambda pp: loss_fn(pp, batch, rng)[0])(p)

        ca = jax.jit(one_step).lower(
            params, jax.tree_util.tree_map(lambda x: x[0], staged),
            jax.random.PRNGKey(0),
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flop_per_step = float(ca["flops"])
    except Exception:
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flop_per_step = float(ca["flops"])  # scan body counted once
        except Exception:
            flop_per_step = None
    if flop_per_step is not None:
        achieved = flop_per_step * steps_per_s
        peak = _chip_peak_flops(jax.devices()[0])
        extras["train_flop_per_step"] = round(flop_per_step / 1e9, 1)  # GFLOP
        extras["train_achieved_tflops"] = round(achieved / 1e12, 1)
        extras["train_mfu"] = round(achieved / peak, 3)
        extras["chip_peak_tflops_bf16"] = round(peak / 1e12, 0)
    return steps_per_s


def bench_sampling(jax, jnp, extras: dict):
    """Device-synced reverse-chain throughput (reference eval.py:44-53)."""
    from deepmimic_diffusion_mujoco_tpu.diffusion import sampling, schedules
    from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
    from deepmimic_diffusion_mujoco_tpu.models.transformer import (
        TransformerMotionModel,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    B, H, D, T = 16, 64, 35, 1000

    def timed_chain(name, sched, model_fn, mode, T_steps, model_evals_per_t,
                    **sample_kw):
        fn = jax.jit(lambda rng: sampling.sample_loop(
            sched, model_fn, (B, H, D), rng, mode=mode,
            predict_epsilon=True, **sample_kw).trajectories)
        out = fn(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        # median of 5, not best-of: the tunnel's sync path once returned a
        # physically impossible 0.38 ms for a 50-eval DDIM chain (BENCH r4
        # first capture) — a single bogus-fast rep must not win. The timed
        # region ends with a full device->host transfer of the result
        # (np.asarray), so a timing cannot complete without the samples
        # actually existing on the host — block_until_ready alone was
        # fooled 5/5 times in BENCH_r04 and emitted a fabricated 0.0.
        times = []
        host = None
        for r in range(5):
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(r + 1))
            host = np.asarray(out)  # forced readback: the sync of record
            dt = time.perf_counter() - t0
            if dt > 2e-3:
                times.append(dt)
        if not times:
            # no rep survived the sanity floor: the measurement harness is
            # being fooled — FAIL the section (parent retries; both attempts
            # failing records sampling_error) instead of emitting 0.0
            raise RuntimeError(
                f"sampling chain {name}: all 5 timed reps below the 2 ms "
                "sanity floor despite forced host readback")
        if not np.isfinite(host).all():
            raise RuntimeError(f"sampling chain {name}: non-finite output")
        med = sorted(times)[len(times) // 2]
        samples_per_s = B / med
        extras[f"sample_{name}_samples_per_s"] = round(samples_per_s, 2)
        extras[f"sample_{name}_denoise_evals_per_s"] = round(
            samples_per_s * T_steps * model_evals_per_t, 0)
        return samples_per_s

    # stack-A production sampler: TemporalUnet dim 128, posterior chain T=1000
    sched = schedules.make_schedule("cosine", T, convention="diffuser")
    unet = TemporalUnet(transition_dim=D, dim=128, dtype=dtype)
    with jax.default_device(cpu):
        up = unet.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)),
                       jnp.zeros((2,)))
    up = jax.device_put(up, dev)
    timed_chain("unet_bs16_T1000", sched,
                lambda x, t, y: unet.apply(up, x, t), "posterior", T, 1)
    # strided DDIM (the low-latency serving path; the reference's respace
    # equivalent): 50 denoise evals instead of 1000
    timed_chain("unet_bs16_ddim50", sched,
                lambda x, t, y: unet.apply(up, x, t), "ddim", 50, 1,
                ddim_steps=50)

    # stack-B production sampler: MDM transformer latent 256 x 8 layers,
    # v4 chain T=1000 (the BASELINE 0.64 samples/s configuration)
    sched_v4 = schedules.make_schedule("cosine", T, convention="v4")
    tr = TransformerMotionModel(input_dim=D, dtype=dtype)
    with jax.default_device(cpu):
        tp = tr.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)),
                     jnp.zeros((2,)))
    tp = jax.device_put(tp, dev)
    sps = timed_chain("transformer_bs16_T1000", sched_v4,
                      lambda x, t, y: tr.apply(tp, x, t), "v4", T - 1, 1)
    extras["sample_transformer_vs_baseline"] = round(
        sps / BASELINE_SAMPLES_PER_S, 1)

    # classifier-free-guided chain (the reference's CFG inference mode,
    # transformer_inference.py:550-605): cond+uncond stacked into ONE
    # 2B-batch forward per step (sampling.py cfg_batched) instead of the
    # reference's two sequential forwards
    trc = TransformerMotionModel(input_dim=D, num_classes=9, dtype=dtype)
    with jax.default_device(cpu):
        tcp = trc.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)),
                       jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))
    tcp = jax.device_put(tcp, dev)
    timed_chain("transformer_cfg3_bs16_T1000", sched_v4,
                lambda x, t, y: trc.apply(tcp, x, t, y), "v4", T - 1, 2,
                cfg_scale=3.0, y=jnp.zeros((B,), jnp.int32),
                uncond_y=jnp.full((B,), 9, jnp.int32))
    return sps


def bench_physics(jax, jnp, extras: dict):
    """Dynamics-mode tracking env at 4096 parallel humanoids (north-star
    config 5: >=10k env-steps/s with tracking reward, BASELINE.md)."""
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics.env import PhysicsTrackingEnv

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    env = PhysicsTrackingEnv(clip.qpos, clip.qvel)
    result = None
    # N=4096 is the cross-round comparison point; N=65536 is where the
    # whole-control-step Pallas kernel saturates the chip
    for N, key in ((4096, "physics_env_steps_per_s"),
                   (65536, "physics_env_steps_per_s_n65536")):
        state = env.reset(N)
        # whole-rollout scan: one dispatch per 20 control steps (the
        # RL-consumer shape; sequential step() calls pay ~32 ms tunnel
        # dispatch per step)
        n_steps = 20
        s2, rs = env.rollout(state, n_steps)  # compile
        jax.block_until_ready(rs)
        # guard: bf16-default matmuls once NaN'd the mass matrix on TPU —
        # throughput of garbage is not a benchmark
        if not bool(jnp.isfinite(rs).all()):
            raise RuntimeError("physics rollout produced non-finite rewards")
        extras["physics_reward_mean"] = round(float(rs.mean()), 4)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            s2, rs = env.rollout(state, n_steps)
            # forced readback sync: a device reduce + scalar transfer (the
            # full (n_steps, N) array is ~5 MB at N=65536 — transferring it
            # through the tunnel inside the timed region cost ~40% of the
            # measured throughput on the first round-5 capture)
            float(rs.sum())
            best = min(best, time.perf_counter() - t0)
        extras[key] = round(N * n_steps / best, 0)
        if result is None:
            result = N * n_steps / best
    return result


_SECTIONS = {
    "train": bench_train,
    "sampling": bench_sampling,
    "physics": bench_physics,
}

# per-section wall-clock budget (seconds) for the FIRST attempt; the retry
# gets the same. Warm-cache runs finish in a fraction of this.
_SECTION_BUDGET_S = {"train": 420, "sampling": 420, "physics": 300}


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _child_main(section: str, out_path: str):
    """Run one bench section, streaming metrics to out_path as measured."""
    import jax
    import jax.numpy as jnp

    _log(f"[bench:{section}] devices: {jax.devices()}")
    extras = _StreamingExtras(out_path)
    _SECTIONS[section](jax, jnp, extras)
    extras["_section_complete"] = True


def _run_section(section: str, deadline: float) -> dict:
    """Run a section subprocess with a deadline + one retry; return extras."""
    budget = _SECTION_BUDGET_S[section]
    merged: dict = {}
    for attempt in (1, 2):
        remaining = deadline - time.monotonic()
        if remaining < 30:
            merged.setdefault(f"{section}_error", "global deadline exhausted")
            break
        tmo = min(budget, remaining)
        out_path = os.path.join(
            tempfile.gettempdir(), f"bench_{section}_{os.getpid()}.json")
        if os.path.exists(out_path):
            os.unlink(out_path)
        env = dict(os.environ, BENCH_SECTION=section, BENCH_OUT=out_path)
        _log(f"[bench] section {section} attempt {attempt} "
             f"(budget {tmo:.0f}s)")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            start_new_session=True)
        try:
            rc = proc.wait(timeout=tmo)
        except subprocess.TimeoutExpired:
            rc = None
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            _log(f"[bench] section {section} attempt {attempt} TIMED OUT "
                 f"after {tmo:.0f}s")
        try:
            with open(out_path) as f:
                got = json.load(f)
            os.unlink(out_path)
        except (OSError, json.JSONDecodeError):
            got = {}
        complete = got.pop("_section_complete", False)
        merged.update(got)
        if rc == 0 and complete:
            merged.pop(f"{section}_error", None)
            return merged
        merged[f"{section}_error"] = (
            f"attempt {attempt}: "
            + ("timeout" if rc is None else f"exit code {rc}"))
    return merged


def main():
    # persistent compilation cache: a retried attempt (or the driver's
    # end-of-round run after this round's in-session runs) skips the TPU
    # compile that sank BENCH_r03 entirely
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

    section = os.environ.get("BENCH_SECTION")
    if section:
        _child_main(section, os.environ["BENCH_OUT"])
        return

    total_budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    deadline = time.monotonic() + total_budget
    extras: dict = {}
    for name in ("train", "sampling", "physics"):
        extras.update(_run_section(name, deadline))
        _log(f"[bench] section {name} done")

    # primary metric: train steps/s if measured, else fall back to the best
    # section that produced a number — the driver must ALWAYS get a line
    if "train_steps_per_s" in extras:
        steps = extras.pop("train_steps_per_s")
        head = {
            "metric": "train_steps_per_s_temporal_unet_dim128_bs32x2accum",
            "value": steps,
            "unit": "optimizer_steps/s/chip",
            "vs_baseline": round(steps / BASELINE_STEPS_PER_S, 2),
        }
    elif "sample_transformer_bs16_T1000_samples_per_s" in extras:
        sps = extras["sample_transformer_bs16_T1000_samples_per_s"]
        head = {
            "metric": "sampling_transformer_bs16_T1000",
            "value": sps,
            "unit": "samples/s/chip",
            "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 2),
        }
    elif "physics_env_steps_per_s" in extras:
        eps = extras["physics_env_steps_per_s"]
        head = {
            "metric": "physics_env_steps_per_s_n4096",
            "value": eps,
            "unit": "env_steps/s/chip",
            "vs_baseline": round(eps / 10000.0, 2),
        }
    else:
        head = {
            "metric": "bench_failed_all_sections",
            "value": 0.0,
            "unit": "none",
            "vs_baseline": 0.0,
        }
    print(json.dumps({**head, **extras}))


if __name__ == "__main__":
    main()
