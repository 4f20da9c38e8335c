"""Decompose the headline train step's wall time (VERDICT r1 item 4).

Measures, on the bench configuration (TemporalUnet dim 128, bs 64 fused,
cartwheel horizon), each stage as its own compiled program:

  forward loss            — model fwd only
  forward + backward      — jax.grad of the loss
  full optimizer step     — grad + adam + EMA (the per-step program)
  K-step scan             — the staged scan bench.py times

and prints per-stage wall time, XLA cost-analysis FLOPs, achieved TFLOP/s
and MFU, so the non-MXU fraction is attributable: (fwd+bwd) - fwd ~= bwd;
step - (fwd+bwd) ~= optimizer/EMA + scheduling; scan amortization shows
dispatch overhead. Optionally writes a jax.profiler trace (--trace DIR).

Run on the TPU chip:  timeout 600 python scripts/profile_train_step.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps=4, inner=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default=None, help="jax.profiler trace dir")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip bf16 peak (v5e default)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.datasets import MotionDataset
    from deepmimic_diffusion_mujoco_tpu.diffusion import process, schedules
    from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
    from deepmimic_diffusion_mujoco_tpu.train.state import TrainState, make_optimizer

    on_tpu = jax.default_backend() == "tpu"
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
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, H, 35)),
                            jnp.zeros((2,)))
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

    tx = make_optimizer("adam", lr=2e-5)
    state = TrainState.create(params, tx)

    batches = ds.epochs(64, seed=0)
    batch = jax.tree_util.tree_map(jnp.asarray, next(batches))
    rng = jax.random.PRNGKey(1)

    peak = args.peak_tflops * 1e12
    report = []

    def stage(name, fn, *a, per_call_steps=1, flop_div=None):
        # flop_div defaults to 1 because XLA cost analysis counts a
        # lax.scan body ONCE regardless of trip count — for the scan stage
        # the reported flops already IS one step's worth
        jitted = jax.jit(fn)
        compiled = jitted.lower(*a).compile()
        dt = timed(compiled, *a)
        fl = flops_of(compiled)
        report.append((name, dt / per_call_steps, fl / (flop_div or 1)))

    # 1) forward loss only
    stage("forward", lambda p, b, r: loss_fn(p, b, r)[0], params, batch, rng)
    # 2) forward + backward
    stage("fwd+bwd", lambda p, b, r: jax.grad(
        lambda pp: loss_fn(pp, b, r)[0])(p), params, batch, rng)
    # 3) one full optimizer step — non-donating copy of make_train_step so
    # the same state buffer can be re-timed (loop.py's version donates)
    def step_fn(state, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        return state.apply_gradients(grads, tx)

    stage("full step", step_fn, state, batch, rng)

    # 4) K-step staged scan (the bench program), non-donating
    K = 20

    def scan_fn(state, batches, rng):
        def body(carry, b):
            st, r = carry
            r, sr = jax.random.split(r)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, b, sr)
            return (st.apply_gradients(grads, tx), r), loss

        (state, _), losses = jax.lax.scan(body, (state, rng), batches)
        return state, losses

    staged = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[next(batches) for _ in range(K)],
    )
    stage(f"scan x{K}", scan_fn, state, staged, rng, per_call_steps=K)

    print(f"{'stage':<12} {'ms':>9} {'GFLOP':>9} {'TFLOP/s':>9} {'MFU':>6}")
    for name, dt, fl in report:
        tf = fl / dt / 1e12
        print(f"{name:<12} {dt * 1e3:>9.3f} {fl / 1e9:>9.1f} "
              f"{tf:>9.1f} {tf * 1e12 / peak:>6.1%}")
    fwd = report[0][1]
    fb = report[1][1]
    full = report[2][1]
    scan = report[3][1]
    print(f"\nbackward       ~= {1e3 * (fb - fwd):.3f} ms")
    print(f"optimizer+EMA  ~= {1e3 * (full - fb):.3f} ms")
    print(f"dispatch saved by scan ~= {1e3 * (full - scan):.3f} ms/step")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                state = jax.jit(step_fn)(state, batch,
                                         jax.random.PRNGKey(i + 2))
            jax.block_until_ready(state.params)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
