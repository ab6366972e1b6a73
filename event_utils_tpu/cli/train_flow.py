"""Self-supervised optical-flow training CLI (BASELINE config 5 shape:
streaming voxel dataloader feeding an EV-FlowNet-style net).

Example:
    python -m event_utils_tpu.cli.train_flow outdoor_day1_memmap \\
        --sensor 256 256 --k 20000 --batch_size 8 --epochs 2 \\
        --ckpt_dir /tmp/flow_ckpt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train EV-FlowNet self-supervised on an event file")
    parser.add_argument("path", nargs="?", default=None,
                        help="memmap dir (or H5 file); omit with --simulate")
    parser.add_argument("--simulate", action="store_true",
                        help="training-in-the-loop: generate fresh "
                             "simulated scenes ON DEVICE each step (no "
                             "files; see training.in_the_loop)")
    parser.add_argument("--steps", type=int, default=1000,
                        help="steps for --simulate mode")
    parser.add_argument("--capacity", type=int, default=16384,
                        help="per-window event capacity for --simulate")
    parser.add_argument("--v_max", type=float, default=40.0,
                        help="|velocity| bound (px/s) for --simulate scenes")
    parser.add_argument("--window_t", type=float, default=0.1,
                        help="seconds of events per --simulate window")
    parser.add_argument("--num_frames", type=int, default=9,
                        help="rendered frames per --simulate window (ESIM "
                             "temporal resolution)")
    parser.add_argument("--metrics_out", default=None,
                        help="write {losses, aee_curve} JSON here "
                             "(--simulate mode)")
    parser.add_argument("--supervised_weight", type=float, default=0.0,
                        help="weight of the sim-supervised AEE term "
                             "(--simulate mode only; the contrast term "
                             "alone does not converge from random init — "
                             "see runs/flow128)")
    parser.add_argument("--omega_max", type=float, default=0.0,
                        help="max |rotation rate| rad/s for --simulate "
                             "scenes (nonzero: dense similarity-field GT)")
    parser.add_argument("--burn_in", type=int, default=0,
                        help="extra simulated windows BEFORE the trained one "
                             "(--simulate mode): train on steady-state "
                             "sensor statistics instead of fresh-sensor "
                             "warm-up (continuous recordings are steady-"
                             "state; see training.in_the_loop."
                             "simulate_flow_batch). Size --capacity for "
                             "burn_in+1 windows.")
    parser.add_argument("--fresh_prob", type=float, default=0.0,
                        help="with --burn_in: probability each batch "
                             "element trains on the FRESH first window "
                             "instead of the steady-state last one — "
                             "mixed-regime training (single-regime diets "
                             "trade fresh vs steady accuracy; see "
                             "runs/flow128_similarity). Eval stays pinned "
                             "steady-state.")
    parser.add_argument("--age_max", type=float, default=0.0,
                        help="per-element scene-age jitter in seconds "
                             "(--simulate): render each scene at a random "
                             "age U[0, age_max] so the net sees the "
                             "texture drift (scale e^{s*age}) that "
                             "continuous recordings accumulate; GT is the "
                             "true field at the trained window's time")
    parser.add_argument("--s_max", type=float, default=0.0,
                        help="max |divergence rate| 1/s for --simulate "
                             "scenes (nonzero: dense similarity-field GT)")
    parser.add_argument("--seed", type=int, default=0,
                        help="scene-generation seed (--simulate mode; vary "
                             "across resumed stages so scenes don't replay)")
    parser.add_argument("--eval_seed", type=int, default=None,
                        help="pin the --simulate held-out batch to this "
                             "seed (comparable curves across stages)")
    parser.add_argument("--sensor", nargs=2, type=int, default=(64, 64),
                        help="crop/pad target (multiples of 8)")
    parser.add_argument("--num_bins", type=int, default=5)
    parser.add_argument("--k", type=int, default=20000,
                        help="events per window")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_end", type=float, default=None,
                        help="cosine-decay the learning rate from --lr to "
                             "this value over --steps (--simulate mode); a "
                             "single process then covers the whole "
                             "warmup+decay production schedule")
    parser.add_argument("--params_out", default=None,
                        help="after training, also dump the final params as "
                             "a flat .npz (small, committable — survives "
                             "environments that drop the orbax ckpt dir)")
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_params", default=None,
                        help="warm-start weights from a --params_out .npz "
                             "(optimizer state re-initialized)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the batch over all devices")
    args = parser.parse_args(argv)
    if args.resume and args.resume_params:
        raise SystemExit("--resume (orbax ckpt) and --resume_params (npz "
                         "snapshot) are alternatives; pass one")

    import os

    import numpy as np

    from ..data_loaders import NativeWindowedLoader
    from ..training import FlowTrainer

    if args.simulate:
        from ..training import train_flow_in_the_loop
        mesh = None
        if args.data_parallel:
            from ..parallel import make_mesh
            mesh = make_mesh(axis_name="batch")
            print(f"data-parallel over {mesh.devices.size} devices "
                  "(sharded in-the-loop simulation)")
        lr = args.lr
        if args.lr_end is not None:
            import optax
            lr = optax.cosine_decay_schedule(
                args.lr, decay_steps=args.steps,
                alpha=args.lr_end / args.lr)
        trainer = FlowTrainer(sensor_size=tuple(args.sensor),
                              num_bins=args.num_bins,
                              learning_rate=lr, mesh=mesh,
                              supervised_weight=args.supervised_weight)
        if args.resume and args.ckpt_dir:
            step = trainer.restore_checkpoint(args.ckpt_dir)
            print(f"resumed from step {step}")
        elif args.resume_params:
            from ..training.checkpointing import load_params_npz
            step = load_params_npz(trainer, args.resume_params)
            print(f"warm-started weights from {args.resume_params} "
                  f"(step {step}; fresh optimizer state)")
        def write_metrics(losses, aee):
            # Rewritten after every eval (atomic) so an interrupted run —
            # tunnel outage, timeout — keeps its curve up to the last eval.
            import json
            import os as _os
            tmp = args.metrics_out + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"losses": [round(float(x), 5) for x in losses],
                           "aee_curve": [[int(s), round(float(a), 3)]
                                         for s, a in aee],
                           "config": {"sensor": list(args.sensor),
                                      "num_bins": args.num_bins,
                                      "batch_size": args.batch_size,
                                      "steps": args.steps,
                                      "capacity": args.capacity,
                                      "v_max": args.v_max,
                                      "window_t": args.window_t,
                                      "num_frames": args.num_frames,
                                      "omega_max": args.omega_max,
                                      "s_max": args.s_max,
                                      "burn_in": args.burn_in,
                                      "fresh_prob": args.fresh_prob,
                                      "age_max": args.age_max,
                                      "lr": args.lr,
                                      "lr_end": args.lr_end,
                                      "supervised_weight":
                                          args.supervised_weight,
                                      # provenance: which scenes this stage
                                      # saw and what it resumed from
                                      "seed": args.seed,
                                      "eval_seed": args.eval_seed,
                                      "resume_params":
                                          args.resume_params}}, f)
            _os.replace(tmp, args.metrics_out)
            if args.params_out:
                # refresh the committable weights at every eval point so an
                # interrupted run keeps them
                from ..training.checkpointing import save_params_npz
                save_params_npz(trainer, args.params_out)

        losses, aee = train_flow_in_the_loop(
            trainer, steps=args.steps, batch_size=args.batch_size,
            capacity=args.capacity, v_max=args.v_max, seed=args.seed,
            window_t=args.window_t, num_frames=args.num_frames,
            omega_max=args.omega_max, s_max=args.s_max,
            burn_in=args.burn_in, fresh_prob=args.fresh_prob,
            age_max=args.age_max,
            eval_seed=args.eval_seed, ckpt_dir=args.ckpt_dir,
            on_eval=write_metrics if args.metrics_out else None)
        if args.metrics_out:
            write_metrics(losses, aee)
        if args.params_out:
            from ..training.checkpointing import save_params_npz
            save_params_npz(trainer, args.params_out)
            print(f"final params saved to {args.params_out}")
        print(f"final loss: {np.mean(losses[-10:]):.5f} over "
              f"{len(losses)} steps"
              + (f"; final AEE {aee[-1][1]:.2f} px/s" if aee else ""))
        return
    if args.path is None:
        raise SystemExit("path is required unless --simulate is given")
    if args.supervised_weight:
        raise SystemExit("--supervised_weight needs --simulate (recordings "
                         "carry no per-window ground-truth flow here)")

    if os.path.isdir(args.path) and not os.path.exists(
            os.path.join(args.path, "t.npy")):
        # A directory of .h5 recordings (cli.simulate --num_sequences
        # factory): chain one slab loader per file with a shared capacity
        # so jitted consumers see one batch shape.
        from ..data_loaders import ChainLoader, H5WindowedLoader
        h5s = sorted(os.path.join(args.path, f)
                     for f in os.listdir(args.path) if f.endswith(".h5"))
        if not h5s:
            raise SystemExit(f"{args.path} has neither t.npy (memmap) nor "
                             ".h5 recordings")
        cap = 1 << max(int(np.ceil(np.log2(max(args.k, 1)))), 0)
        loader = ChainLoader([
            H5WindowedLoader(p, method="k_events", k=args.k,
                             batch_size=args.batch_size, capacity=cap,
                             drop_last=args.data_parallel) for p in h5s])
        print(f"training over {len(h5s)} recordings "
              f"({len(loader)} batches/epoch)")
    elif os.path.isdir(args.path):
        # data-parallel sharding needs every batch full
        loader = NativeWindowedLoader(args.path, method="k_events", k=args.k,
                                      batch_size=args.batch_size,
                                      shuffle=True,
                                      drop_last=args.data_parallel)
    else:
        # HDF5: slab-streaming loader (sequential windows; shuffling an H5
        # would defeat the sequential chunk reads — convert to memmap for
        # shuffled epochs)
        from ..data_loaders import H5WindowedLoader
        loader = H5WindowedLoader(args.path, method="k_events", k=args.k,
                                  batch_size=args.batch_size,
                                  drop_last=args.data_parallel)

    if len(loader) == 0:
        raise SystemExit(
            "No full batches: reduce --batch_size or --k "
            f"(windows of {args.k} events)")

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh
        mesh = make_mesh(axis_name="batch")
        print(f"data-parallel over {mesh.devices.size} devices")

    trainer = FlowTrainer(sensor_size=tuple(args.sensor),
                          num_bins=args.num_bins, learning_rate=args.lr,
                          mesh=mesh)
    if args.resume and args.ckpt_dir:
        step = trainer.restore_checkpoint(args.ckpt_dir)
        print(f"resumed from step {step}")
    elif args.resume_params:
        from ..training.checkpointing import load_params_npz
        step = load_params_npz(trainer, args.resume_params)
        print(f"warm-started weights from {args.resume_params} "
              f"(step {step}; fresh optimizer state)")

    losses = trainer.fit(loader, epochs=args.epochs, ckpt_dir=args.ckpt_dir)
    if args.params_out:
        from ..training.checkpointing import save_params_npz
        save_params_npz(trainer, args.params_out)
        print(f"final params saved to {args.params_out}")
    print(f"final loss: {np.mean(losses[-10:]):.5f} over {len(losses)} steps")


if __name__ == "__main__":
    main()
