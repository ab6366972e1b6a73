"""E2VID reconstruction training CLI: frame-supervised recurrent training.

End-to-end drive of the reconstruction stack (the companion of
``train_flow``): a ``between_frames`` dataset yields time-synchronized
(voxel grid, frame) pairs, consecutive windows form truncated-BPTT
sequences, and ``ReconstructionTrainer`` unrolls the recurrent E2VID over
them on device. Checkpoint/resume via orbax.

Example:
    python -m event_utils_tpu.cli.train_reconstruction scene.h5 \\
        --seq_len 4 --epochs 2 --lpips_weight 0.2 --ckpt_dir /tmp/e2v
"""

from __future__ import annotations

import argparse


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train E2VID on an H5/memmap recording with frames")
    parser.add_argument("path", nargs="?", default=None,
                        help="H5 file or memmap dir (needs frames); omit "
                             "with --simulate")
    parser.add_argument("--simulate", action="store_true",
                        help="training-in-the-loop: simulate fresh scenes "
                             "ON DEVICE each step into truncated-BPTT "
                             "sequences (no files; see "
                             "training.in_the_loop)")
    parser.add_argument("--steps", type=int, default=1000,
                        help="steps for --simulate mode")
    parser.add_argument("--capacity", type=int, default=65536,
                        help="events per simulated sequence (--simulate)")
    parser.add_argument("--v_max", type=float, default=40.0,
                        help="|velocity| bound (px/s) for --simulate scenes")
    parser.add_argument("--window_t", type=float, default=0.05,
                        help="seconds per voxel window (--simulate)")
    parser.add_argument("--sensor", nargs=2, type=int, default=(64, 64),
                        help="simulated sensor H W, multiples of 8 "
                             "(--simulate)")
    parser.add_argument("--metrics_out", default=None,
                        help="write {losses, psnr_curve} JSON here "
                             "(--simulate mode)")
    parser.add_argument("--omega_max", type=float, default=0.0,
                        help="max |rotation rate| rad/s for --simulate "
                             "scenes (0: pure translation)")
    parser.add_argument("--s_max", type=float, default=0.0,
                        help="max |divergence rate| 1/s for --simulate "
                             "scenes (0: pure translation)")
    parser.add_argument("--eval_seed", type=int, default=None,
                        help="pin the --simulate held-out batch to this "
                             "seed (keep curves comparable across resumed "
                             "stages that vary --seed)")
    parser.add_argument("--carry_segments", type=int, default=1,
                        help="--simulate: consecutive seq_len segments per "
                             "scene, GRU state carried across them (trains "
                             "the long-horizon regime; BPTT memory "
                             "unchanged). --capacity bounds events per "
                             "FULL scene — scale it accordingly")
    parser.add_argument("--num_bins", type=int, default=5)
    parser.add_argument("--base_features", type=int, default=32,
                        help="E2VID encoder width at the first level")
    parser.add_argument("--recurrent_levels", type=int, default=1,
                        help="encoder levels carrying ConvGRU state, "
                             "deepest-first (1: bottleneck only — the "
                             "historical tree; 3: every level, the full "
                             "E2VID design)")
    parser.add_argument("--num_res_blocks", type=int, default=0,
                        help="residual blocks at the bottleneck "
                             "(reference E2VID uses 2)")
    parser.add_argument("--burn_in", type=int, default=0,
                        help="drop the loss of the first N windows per "
                             "sequence (state still threads through them) "
                             "— train at steady state, not cold start")
    parser.add_argument("--seq_len", type=int, default=4,
                        help="truncated-BPTT unroll length (windows)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="independent sequences per step")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_end", type=float, default=None,
                        help="cosine-decay the learning rate from --lr to "
                             "this value over --steps (--simulate mode); a "
                             "single process then covers the whole "
                             "warmup+decay production schedule, with no "
                             "cross-session resume to lose")
    parser.add_argument("--params_out", default=None,
                        help="after training, also dump the final params as "
                             "a flat .npz (small, committable — survives "
                             "environments that drop the orbax ckpt dir)")
    parser.add_argument("--lpips_weight", type=float, default=0.0,
                        help="random-feature perceptual loss weight")
    parser.add_argument("--mse_weight", type=float, default=0.0,
                        help="squared-error loss weight on top of L1 "
                             "(PSNR is log-MSE; ~4.0 makes the two terms "
                             "comparable on [0,1] images — the PSNR-"
                             "targeted fine-tune lever)")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="maintain an exponential moving average of "
                             "the weights (e.g. 0.999); evals and "
                             "--params_out then use the EMA — the "
                             "standard late-training variance killer")
    parser.add_argument("--combined_channels", action="store_true",
                        help="single polarity-summed voxel (default: "
                             "neg/pos stacked, 2*num_bins channels)")
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_params", default=None,
                        help="warm-start weights from a --params_out .npz "
                             "(optimizer state re-initialized; pass the "
                             "matching architecture flags)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--data_parallel", action="store_true",
                        help="--simulate mode: shard batch + per-scene "
                             "simulation over all devices")
    parser.add_argument("--cache_windows", action="store_true",
                        help="materialize every (voxel, frame) window once "
                             "per recording into a sidecar .npz; epochs and "
                             "re-runs then skip the per-window voxelization "
                             "entirely (production runs on slow hosts)")
    parser.add_argument("--shuffle", action="store_true",
                        help="sample random sequence start offsets each "
                             "epoch instead of the fixed aligned batches "
                             "(uses all windows; needs --cache_windows)")
    parser.add_argument("--seed", type=int, default=0,
                        help="--shuffle sampling seed; also the scene-"
                             "generation seed in --simulate mode (vary it "
                             "across resumed stages so scenes don't replay)")
    return parser


def _model_kwargs(args):
    """Non-default E2VID architecture kwargs from CLI flags, reconciled
    with a resumed checkpoint's ``model.json`` sidecar: on ``--resume`` the
    sidecar wins when the flags are at their defaults, and an explicit
    flag that contradicts the sidecar is an error (restoring into a
    mismatched parameter tree fails much less legibly)."""
    kwargs = {}
    if args.base_features != 32:
        kwargs["base_features"] = args.base_features
    if args.recurrent_levels != 1:
        kwargs["recurrent_levels"] = args.recurrent_levels
    if args.num_res_blocks:
        kwargs["num_res_blocks"] = args.num_res_blocks
    saved = None
    source = None
    if getattr(args, "resume", False) and args.ckpt_dir:
        from ..training.checkpointing import read_model_config

        saved = read_model_config(args.ckpt_dir)
        source = "the checkpoint's model.json"
    elif getattr(args, "resume_params", None):
        # The .npz snapshot embeds its architecture (__model_json__); use
        # it so warm-starting never needs the arch flags re-passed.
        from ..training.checkpointing import read_model_json_npz

        saved = read_model_json_npz(args.resume_params)
        source = f"{args.resume_params}'s __model_json__"
    if saved:
        for k, v in kwargs.items():
            # kwargs holds only explicit non-default flags, and the sidecar
            # stores only the snapshot's non-default kwargs — so a key
            # missing from `saved` means the snapshot was built at the
            # default, which the explicit flag contradicts too.
            if saved.get(k) != v:
                raise SystemExit(
                    f"--{k} {v} contradicts {source} "
                    f"({saved.get(k, 'default')}); "
                    "drop the flag to resume the saved architecture")
        merged = dict(saved)
        merged.update(kwargs)
        return merged
    return kwargs


def _pad_to_multiple_hw(arr, multiple=8):
    """Zero-pad trailing (H, W) dims to a multiple (UNet stride needs it)."""
    import numpy as np

    H, W = arr.shape[-2], arr.shape[-1]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, ph), (0, pw)]
    return np.pad(arr, pad)


def iter_sequences(dataset, seq_len, batch_size):
    """Group consecutive dataset windows into (T, B, C, H, W) voxel
    sequences + (T, B, 1, H, W) frame targets (frames arrive already
    float32/255-normalized from BaseVoxelDataset.transform_frame)."""
    import numpy as np

    n_seq = len(dataset) // seq_len
    per_batch = seq_len * batch_size
    for s0 in range(0, n_seq * seq_len - per_batch + 1, per_batch):
        voxels, frames = [], []
        for b in range(batch_size):
            vseq, fseq = [], []
            for t in range(seq_len):
                item = dataset[s0 + b * seq_len + t]
                vox = np.asarray(item["voxel"], np.float32)
                frame = np.asarray(item["frame"], np.float32)
                if frame.ndim == 2:
                    frame = frame[None]
                vseq.append(_pad_to_multiple_hw(vox))
                fseq.append(_pad_to_multiple_hw(frame))
            voxels.append(np.stack(vseq))
            frames.append(np.stack(fseq))
        yield (np.stack(voxels, axis=1), np.stack(frames, axis=1))


def _source_stamp(src_path):
    """(mtime_ns, size) of a recording — for memmap dirs, of its t.npy."""
    import os

    p = src_path
    if os.path.isdir(p):
        t = os.path.join(p, "t.npy")
        p = t if os.path.exists(t) else p
    st = os.stat(p)
    return st.st_mtime_ns, st.st_size


def materialize_windows(dataset, cache_path=None, src_path=None):
    """Fetch every between-frames window of ``dataset`` once, returning
    ``(N, C, H, W)`` voxels + ``(N, 1, H, W)`` frames (HW padded to /8).

    With ``cache_path``, the stacks are saved to/loaded from a sidecar
    ``.npz`` so repeated epochs and resumed segments never re-run the
    per-window voxelization (the dominant cost on slow hosts: each
    ``dataset[i]`` is an H5 slice + a device scatter round-trip). The cache
    is keyed on the source recording's (mtime_ns, size) via ``src_path``;
    a regenerated recording at the same path rebuilds it (caches written
    before this key existed are rebuilt once).
    """
    import os

    import numpy as np

    stamp = (np.asarray(_source_stamp(src_path), np.int64)
             if src_path else None)
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        if stamp is None or ("src_stamp" in z
                             and np.array_equal(z["src_stamp"], stamp)):
            return z["voxels"], z["frames"]
        print(f"window cache stale ({cache_path}); rebuilding")
    voxels, frames = [], []
    for i in range(len(dataset)):
        item = dataset[i]
        vox = np.asarray(item["voxel"], np.float32)
        frame = np.asarray(item["frame"], np.float32)
        if frame.ndim == 2:
            frame = frame[None]
        voxels.append(_pad_to_multiple_hw(vox))
        frames.append(_pad_to_multiple_hw(frame))
    voxels = np.stack(voxels)
    frames = np.stack(frames)
    if cache_path:
        payload = {"voxels": voxels, "frames": frames}
        if stamp is not None:
            payload["src_stamp"] = stamp
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, cache_path)
    return voxels, frames


def iter_sequences_cached(voxels, frames, seq_len, batch_size, rng=None):
    """Batch materialized window stacks into (T, B, C, H, W) sequences.

    Deterministic mode (``rng=None``) reproduces :func:`iter_sequences`'s
    aligned non-overlapping batches. With an ``np.random.Generator``, one
    epoch yields the same number of batches but each sequence starts at a
    random offset in ``[0, N - seq_len]`` — every window participates and
    batches differ across epochs.
    """
    import numpy as np

    n = len(voxels)
    per_batch = seq_len * batch_size
    if n < per_batch:
        return
    t_idx = np.arange(seq_len)[None, :]
    if rng is None:
        n_seq = n // seq_len
        for s0 in range(0, n_seq * seq_len - per_batch + 1, per_batch):
            starts = s0 + np.arange(batch_size) * seq_len
            idx = starts[:, None] + t_idx
            yield (voxels[idx].transpose(1, 0, 2, 3, 4),
                   frames[idx].transpose(1, 0, 2, 3, 4))
    else:
        for _ in range(n // per_batch):
            starts = rng.integers(0, n - seq_len + 1, size=batch_size)
            idx = starts[:, None] + t_idx
            yield (voxels[idx].transpose(1, 0, 2, 3, 4),
                   frames[idx].transpose(1, 0, 2, 3, 4))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.resume and args.resume_params:
        raise SystemExit("--resume (orbax ckpt) and --resume_params (npz "
                         "snapshot) are alternatives; pass one")

    import os

    import numpy as np

    from ..data_loaders import DynamicH5Dataset, MemMapDataset
    from ..training.reconstruction import ReconstructionTrainer

    if args.simulate:
        from ..training import train_reconstruction_in_the_loop
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
        # resolved once: _model_kwargs re-opens --resume_params each call
        model_kwargs = _model_kwargs(args)
        trainer = ReconstructionTrainer(
            sensor_size=tuple(args.sensor), num_bins=args.num_bins,
            combined_channels=args.combined_channels,
            learning_rate=lr, lpips_weight=args.lpips_weight,
            mesh=mesh, model_kwargs=model_kwargs,
            burn_in=args.burn_in, mse_weight=args.mse_weight,
            ema_decay=args.ema_decay)
        if args.resume and args.ckpt_dir:
            step = trainer.restore_checkpoint(args.ckpt_dir)
            print(f"resumed from step {step}")
        elif args.resume_params:
            from ..training.checkpointing import load_params_npz
            step = load_params_npz(trainer, args.resume_params)
            print(f"warm-started weights from {args.resume_params} "
                  f"(step {step}; fresh optimizer state)")
        def write_metrics(losses, curve):
            # Rewritten after every eval (atomic) so an interrupted run —
            # tunnel outage, timeout — keeps its curve up to the last eval.
            import json
            import os as _os
            tmp = args.metrics_out + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"losses": [round(float(x), 5) for x in losses],
                           "psnr_curve": [[int(c[0])]
                                          + [round(float(x), 4)
                                             for x in c[1:]]
                                          for c in curve],
                           "config": {"sensor": list(args.sensor),
                                      "num_bins": args.num_bins,
                                      "seq_len": args.seq_len,
                                      "batch_size": args.batch_size,
                                      "steps": args.steps,
                                      "capacity": args.capacity,
                                      "v_max": args.v_max,
                                      "window_t": args.window_t,
                                      "lr": args.lr,
                                      "lr_end": args.lr_end,
                                      "lpips_weight": args.lpips_weight,
                                      "mse_weight": args.mse_weight,
                                      "ema_decay": args.ema_decay,
                                      "model_kwargs": model_kwargs,
                                      "carry_segments": args.carry_segments,
                                      "burn_in": args.burn_in,
                                      # provenance: which scenes this stage
                                      # saw and what it resumed from
                                      "seed": args.seed,
                                      "eval_seed": args.eval_seed,
                                      "resume_params":
                                          getattr(args, "resume_params",
                                                  None)}},
                          f)
            _os.replace(tmp, args.metrics_out)
            if args.params_out:
                # refresh the committable weights at every eval point so an
                # interrupted run keeps them (the orbax dir is a bulk
                # artifact this environment can drop)
                from ..training.checkpointing import save_params_npz
                save_params_npz(trainer, args.params_out)

        losses, curve = train_reconstruction_in_the_loop(
            trainer, steps=args.steps, batch_size=args.batch_size,
            seq_len=args.seq_len, capacity=args.capacity,
            v_max=args.v_max, window_t=args.window_t, seed=args.seed,
            omega_max=args.omega_max, s_max=args.s_max,
            carry_segments=args.carry_segments,
            eval_seed=args.eval_seed, ckpt_dir=args.ckpt_dir,
            on_eval=write_metrics if args.metrics_out else None)
        if args.metrics_out:
            write_metrics(losses, curve)
        if args.params_out:
            from ..training.checkpointing import save_params_npz
            save_params_npz(trainer, args.params_out)
            print(f"final params saved to {args.params_out}")
        print(f"final loss: {np.mean(losses[-10:]):.5f} over "
              f"{len(losses)} steps"
              + (f"; final PSNR {curve[-1][1]:.2f} dB / "
                 f"SSIM {curve[-1][2]:.3f}" if curve else ""))
        return
    if args.path is None:
        raise SystemExit("path is required unless --simulate is given")

    kwargs = dict(voxel_method={"method": "between_frames",
                                "sliding_window_w": 0},
                  num_bins=args.num_bins,
                  combined_voxel_channels=args.combined_channels,
                  return_events=False, return_frame=True,
                  return_format="numpy")
    # A directory of .h5 recordings (e.g. a cli.simulate --num_sequences
    # sweep) trains over every file; sequences never straddle recordings
    # (the ConvGRU state must not carry across unrelated scenes).
    if os.path.isdir(args.path) and not os.path.exists(
            os.path.join(args.path, "t.npy")):
        h5s = sorted(os.path.join(args.path, f)
                     for f in os.listdir(args.path) if f.endswith(".h5"))
        if not h5s:
            raise SystemExit(f"{args.path} has neither t.npy (memmap) nor "
                             ".h5 recordings")
        datasets = [(p, DynamicH5Dataset(p, **kwargs)) for p in h5s]
        print(f"training over {len(datasets)} recordings")
    elif os.path.isdir(args.path):
        datasets = [(args.path.rstrip("/"), MemMapDataset(args.path,
                                                          **kwargs))]
    else:
        datasets = [(args.path, DynamicH5Dataset(args.path, **kwargs))]
    datasets = [(p, d) for p, d in datasets
                if len(d) >= args.seq_len * args.batch_size]
    if not datasets:
        raise SystemExit("no recording has enough between-frame windows; "
                         "reduce --seq_len/--batch_size")
    sizes = {tuple(d.sensor_resolution) for _, d in datasets}
    if len(sizes) > 1:
        raise SystemExit(f"recordings disagree on sensor size: {sizes}")

    H, W = datasets[0][1].sensor_resolution
    Hp, Wp = H + (-H) % 8, W + (-W) % 8
    trainer = ReconstructionTrainer(
        sensor_size=(Hp, Wp), num_bins=args.num_bins,
        combined_channels=args.combined_channels, learning_rate=args.lr,
        lpips_weight=args.lpips_weight, model_kwargs=_model_kwargs(args),
        burn_in=args.burn_in, mse_weight=args.mse_weight,
        ema_decay=args.ema_decay)
    if args.resume and args.ckpt_dir:
        step = trainer.restore_checkpoint(args.ckpt_dir)
        print(f"resumed from step {step}")
    elif args.resume_params:
        from ..training.checkpointing import load_params_npz
        step = load_params_npz(trainer, args.resume_params)
        print(f"warm-started weights from {args.resume_params} "
              f"(step {step}; fresh optimizer state)")

    if args.shuffle and not args.cache_windows:
        raise SystemExit("--shuffle needs --cache_windows")
    if args.cache_windows:
        tag = f"b{args.num_bins}" + ("c" if args.combined_channels else "")
        stacks = [materialize_windows(d, f"{p}.wincache_{tag}.npz",
                                      src_path=p)
                  for p, d in datasets]
    rng = np.random.default_rng(args.seed) if args.shuffle else None

    steps = 0
    done = False
    for epoch in range(args.epochs):
        for src_i, (_, dataset) in enumerate(datasets):
            if args.cache_windows:
                vox_stack, frame_stack = stacks[src_i]
                batches = iter_sequences_cached(
                    vox_stack, frame_stack, args.seq_len, args.batch_size,
                    rng=rng)
            else:
                batches = iter_sequences(
                    dataset, args.seq_len, args.batch_size)
            for voxels, frames in batches:
                loss = trainer.train_sequence(voxels, frames)
                steps += 1
                print(f"epoch {epoch} step {trainer.step} loss {loss:.4f}",
                      flush=True)
                if args.max_steps and steps >= args.max_steps:
                    done = True
                    break
            if done:
                break
        if done:
            break

    for _, dataset in datasets:
        dataset.close()
    if args.ckpt_dir:
        trainer.save_checkpoint(args.ckpt_dir)
        print(f"checkpoint saved to {args.ckpt_dir} at step {trainer.step}")
    if args.params_out:
        from ..training.checkpointing import save_params_npz
        save_params_npz(trainer, args.params_out)
        print(f"final params saved to {args.params_out}")


if __name__ == "__main__":
    main()
