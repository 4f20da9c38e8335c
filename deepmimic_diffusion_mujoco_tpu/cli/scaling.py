"""Data-parallel scaling-efficiency measurement (SURVEY.md §5.8; BASELINE
target: efficiency >= 0.8 at N >= 2).

Measures optimizer steps/s for the production TemporalUnet train step at
data-parallel widths 1, 2, 4, ... over the available devices, with the
GLOBAL batch scaled proportionally (weak scaling — the pod-growth regime),
and prints per-width efficiency vs linear. On CPU this runs against the
8-virtual-device mesh (correctness/efficiency-methodology check); on a TPU
pod slice the same command is the real measurement, and `--gate 0.8`
turns it into the BASELINE acceptance check (exit 1 below the gate):

    # single host / pod slice visible to one process
    python -m deepmimic_diffusion_mujoco_tpu.cli.scaling --widths 1,2,4,8 \\
        --gate 0.8 --json scaling.json
    # multi-host pod: one command per host (the whole launch procedure)
    python -m deepmimic_diffusion_mujoco_tpu.cli.scaling \\
        --coordinator <host0>:29500 --num-processes N --process-id i \\
        --gate 0.8 --json scaling.json

The JSON record carries {n_hosts, widths{efficiency,...}, gate,
gate_evaluated, gate_pass}; on virtual CPU devices the gate is recorded
but NOT evaluated (measurement_valid=false — one physical CPU cannot
measure scaling) so CI can exercise the artifact contract without
pretending to a pod.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def measure(widths, batch_per_device=32, dim=128, steps=10, reps=3):
    import jax
    import jax.numpy as jnp

    from ..data.datasets import MotionDataset
    from ..diffusion import process, schedules
    from ..models.temporal_unet import TemporalUnet
    from ..parallel import mesh as meshlib
    from ..train.loop import make_train_many
    from ..train.state import TrainState, make_optimizer
    import os

    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    ds = MotionDataset.from_path(
        os.path.join(repo, "data/motions/humanoid3d_cartwheel.txt"),
        include_velocity=False, augment="cyclic", horizon_multiple=8,
    )
    sched = schedules.make_schedule("cosine", 1000, convention="diffuser")
    on_tpu = jax.default_backend() == "tpu"
    model = TemporalUnet(
        transition_dim=35, dim=dim,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    H = ds.horizon
    import numpy as np

    # keep the template on the host: train_many donates its state, and a
    # same-device device_put can alias rather than copy — donation would
    # delete the template for the next width
    params0 = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, H, 35)), jnp.zeros((2,))),
    )
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
    results = {}
    for w in widths:
        mesh = meshlib.make_mesh(data=w, devices=jax.devices()[:w])
        repl = meshlib.replicated(mesh)
        params = jax.device_put(params0, repl)
        state = TrainState.create(params, tx)
        train_many = make_train_many(tx, loss_fn)

        B = batch_per_device * w
        batches = ds.epochs(B, seed=0)
        stack = [next(batches) for _ in range(steps)]
        staged = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *stack
        )
        # shard (steps, B, ...) on the batch axis (axis 1)
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")
        )
        staged = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), staged
        )
        state, losses = train_many(state, staged, jax.random.PRNGKey(0))
        jax.block_until_ready(losses)
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            state, losses = train_many(state, staged, jax.random.PRNGKey(r))
            jax.block_until_ready(losses)
            best = min(best, time.perf_counter() - t0)
        results[w] = steps / best
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--widths", default=None,
                    help="comma-separated device counts (default: 1,2,4,..,N)")
    ap.add_argument("--batch-per-device", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--gate", type=float, default=None,
                    help="minimum acceptable efficiency at the widest "
                         "measured width (BASELINE target: 0.8); exit 1 "
                         "below it on real hardware")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.num_processes and args.num_processes > 1:
        from ..parallel import mesh as meshlib

        meshlib.initialize_multihost(
            args.coordinator, args.num_processes, args.process_id)

    import jax

    n = len(jax.devices())
    if args.widths:
        widths = [int(w) for w in args.widths.split(",")]
    else:
        widths = [w for w in (1, 2, 4, 8, 16, 32, 64) if w <= n]
    res = measure(widths, args.batch_per_device, args.dim, args.steps)
    report = {"n_hosts": int(jax.process_count()),
              "n_devices": n,
              "measurement_valid": True}
    # virtual CPU "devices" share one physical CPU: label the artifact so
    # its efficiency column can never be quoted as a scaling result
    # (VERDICT round-3 weak #3)
    if jax.devices()[0].platform == "cpu":
        report["WARNING"] = (
            "METHODOLOGY SMOKE TEST ONLY — all devices are XLA virtual CPU "
            "devices on one physical CPU; per-device throughput drops as "
            "1/N by construction and 'efficiency' is physically "
            "meaningless. Run on a real pod slice for the measurement.")
        report["measurement_valid"] = False
    print(f"{'devices':>8} {'steps/s':>10} {'samples/s':>12} {'efficiency':>11}")
    eff = 1.0
    for w in widths:
        # weak scaling (fixed batch/device): ideal keeps steps/s constant as
        # devices grow, so efficiency = steps/s relative to the narrowest run
        eff = res[w] / res[widths[0]]
        samples = res[w] * args.batch_per_device * w
        print(f"{w:>8} {res[w]:>10.2f} {samples:>12.0f} {eff:>11.2f}")
        report[str(w)] = {"steps_per_s": round(res[w], 3),
                          "samples_per_s": round(samples, 1),
                          "efficiency": round(eff, 3)}
    # acceptance gate (BASELINE: >= 0.8 at N >= 2 hosts): evaluated on the
    # WIDEST width's efficiency, only where the measurement is physical
    report["gate"] = args.gate
    report["gate_evaluated"] = bool(args.gate) and report["measurement_valid"]
    report["gate_pass"] = (
        bool(eff >= args.gate) if report["gate_evaluated"] else None)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)
    if report["gate_evaluated"] and not report["gate_pass"]:
        print(f"FAIL: efficiency {eff:.3f} < gate {args.gate}", file=sys.stderr)
        sys.exit(1)
    if report["gate_evaluated"]:
        print(f"PASS: efficiency {eff:.3f} >= gate {args.gate}")
    return report


if __name__ == "__main__":
    main()
