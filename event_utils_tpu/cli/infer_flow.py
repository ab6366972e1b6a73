"""EV-FlowNet inference CLI: dense flow fields from a recording.

The inference companion of ``train_flow``: windows a recording, voxelizes,
runs the trained EV-FlowNet per window, and writes ``flow_NNNN.npy``
``(2, H, W)`` fields plus ``timestamps.txt`` — exactly the directory layout
``cli.visualize_flow`` consumes (and the reference's flow-visualization
pipeline expects, reference visualize_flow.py:83-96), so predictions can be
rendered or used for motion compensation directly.

Example:
    python -m event_utils_tpu.cli.infer_flow scene.h5 --ckpt_dir /tmp/flow \\
        --k 20000 --output_dir /tmp/flow_out --render
"""

from __future__ import annotations

import argparse


def build_parser():
    parser = argparse.ArgumentParser(
        description="Predict dense optical flow from events with EV-FlowNet")
    parser.add_argument("path", help="H5 file or memmap dir")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--ckpt_dir", default=None,
                        help="orbax checkpoint from train_flow (omitted: "
                             "random init — pipeline smoke only)")
    parser.add_argument("--ckpt_step", type=int, default=None,
                        help="restore this step instead of the latest")
    parser.add_argument("--params", default=None,
                        help="committable .npz weights snapshot from "
                             "train_flow --params_out — alternative to "
                             "--ckpt_dir")
    parser.add_argument("--method", default="k_events",
                        choices=["k_events", "t_seconds", "between_frames"])
    parser.add_argument("--k", type=int, default=20000)
    parser.add_argument("--t", type=float, default=0.05)
    parser.add_argument("--num_bins", type=int, default=5)
    parser.add_argument("--combined_channels", action="store_true")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="windows per device call")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--render", action="store_true",
                        help="also write flow_NNNN.png HSV renderings")
    parser.add_argument("--eval_gt", action="store_true",
                        help="score predictions against the recording's "
                             "ground-truth flow with AEE (between_frames "
                             "only; e.g. a cli.simulate recording)")
    parser.add_argument("--no_window_cache", action="store_true",
                        help="disable the sidecar .npz window cache")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import os

    import numpy as np

    from ..data_loaders import DynamicH5Dataset, MemMapDataset
    from ..training.loop import FlowTrainer
    from .reconstruct import _voxel_method, _window_source
    from .train_reconstruction import _pad_to_multiple_hw

    if args.eval_gt and args.method != "between_frames":
        raise SystemExit("--eval_gt needs --method between_frames (window i "
                         "pairs with flow field i)")

    cls = MemMapDataset if os.path.isdir(args.path) else DynamicH5Dataset
    dataset = cls(args.path, voxel_method=_voxel_method(args),
                  num_bins=args.num_bins,
                  combined_voxel_channels=args.combined_channels,
                  return_events=False, return_format="numpy")

    H, W = dataset.sensor_resolution
    if args.render:
        import matplotlib

        matplotlib.use("Agg")
    Hp, Wp = H + (-H) % 8, W + (-W) % 8
    trainer = FlowTrainer(sensor_size=(Hp, Wp), num_bins=args.num_bins,
                          combined_channels=args.combined_channels)
    if args.params and args.ckpt_dir:
        raise SystemExit("--params and --ckpt_dir are alternatives; "
                         "pass one")
    if args.ckpt_dir:
        step = trainer.restore_checkpoint(args.ckpt_dir,
                                          step=args.ckpt_step)
        print(f"restored checkpoint step {step}")
    elif args.params:
        from ..training.checkpointing import load_params_npz
        step = load_params_npz(trainer, args.params)
        print(f"loaded weights snapshot {args.params} (step {step})")
    else:
        print("WARNING: no --ckpt_dir/--params; predicting with random "
              "weights")

    if args.eval_gt and not dataset.has_flow:
        raise SystemExit("--eval_gt: recording has no ground-truth flow")

    os.makedirs(args.output_dir, exist_ok=True)
    n = len(dataset) if args.max_frames is None \
        else min(len(dataset), args.max_frames)
    # get_flow(i) is the raw VELOCITY field (px/s) — the item dict's
    # 'flow' is already converted to displacement
    flow_gt = (lambda ds, i, item: np.asarray(ds.get_flow(i), np.float32)) \
        if args.eval_gt else None
    fetch_windows, all_stamps = _window_source(
        dataset, args, n, pad=_pad_to_multiple_hw, gt_fn=flow_gt,
        gt_channels=2, cache_suffix=".flowcache.npz")
    stamps = []
    aees = []
    base_aees = []
    vox_mass = []
    written = 0
    for s0 in range(0, n, args.batch_size):
        hi = min(s0 + args.batch_size, n)
        idxs = range(s0, hi)
        voxels, gt_flows = fetch_windows(s0, hi)
        flows = np.asarray(trainer.predict(voxels))[:, :, :H, :W]
        for i, flow in zip(idxs, flows):
            np.save(os.path.join(args.output_dir, f"flow_{written:04d}.npy"),
                    flow.astype(np.float32))
            stamps.append(float(all_stamps[i]))
            if args.eval_gt:
                # voxel mass ~ event count: flags (near-)empty windows —
                # e.g. the slice before the recording's first frame —
                # which carry no motion information to predict from
                vox_mass.append(float(np.abs(voxels[i - s0]).sum()))
            if args.render:
                import matplotlib.pyplot as plt

                from ..utils.util import flow2bgr_np

                rgb = flow2bgr_np(flow[0], flow[1])[..., ::-1]  # BGR -> RGB
                plt.imsave(os.path.join(args.output_dir,
                                        f"flow_{written:04d}.png"), rgb)
            if args.eval_gt:
                from ..utils.metrics import average_endpoint_error

                gt = gt_flows[i - s0]
                aees.append(float(average_endpoint_error(flow, gt)))
                base_aees.append(float(average_endpoint_error(
                    np.zeros_like(gt), gt)))
                if args.render:
                    import matplotlib.pyplot as plt

                    from ..utils.util import flow2bgr_np

                    rgb = flow2bgr_np(gt[0], gt[1])[..., ::-1]
                    plt.imsave(os.path.join(
                        args.output_dir, f"flow_gt_{written:04d}.png"), rgb)
            written += 1
    dataset.close()
    np.savetxt(os.path.join(args.output_dir, "timestamps.txt"),
               np.asarray(stamps))
    print(f"wrote {written} flow fields to {args.output_dir}")
    if aees:
        import json

        # Headline over INFORMATIVE windows only: a window holding <1% of
        # the median voxel mass (e.g. the empty slice before the first
        # frame of a between_frames recording) has nothing to predict
        # from; scoring its necessarily-zero output against the full GT
        # field would just add one baseline-sized error per empty window.
        # Per-window numbers (all windows) stay in metrics.json.
        mass = np.asarray(vox_mass)
        informative = mass >= 0.01 * max(float(np.median(mass)), 1e-9)
        aees_np = np.asarray(aees)
        base_np = np.asarray(base_aees)
        n_inf = int(informative.sum())
        metrics = {"aee_px_s": round(float(aees_np[informative].mean()), 3),
                   "zero_flow_aee_px_s":
                       round(float(base_np[informative].mean()), 3),
                   "num_fields": n_inf,
                   "num_fields_total": len(aees),
                   "aee_per_window": [round(float(a), 3) for a in aees],
                   "zero_flow_aee_per_window":
                       [round(float(a), 3) for a in base_np],
                   "voxel_mass_per_window":
                       [round(float(m), 1) for m in mass],
                   # provenance: which weights and recording produced this
                   "params": args.params or args.ckpt_dir,
                   "recording": args.path}
        with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        skipped = len(aees) - n_inf
        print(f"vs ground-truth flow: AEE {metrics['aee_px_s']} px/s "
              f"over {n_inf} fields "
              f"(zero-flow baseline {metrics['zero_flow_aee_px_s']}"
              + (f"; {skipped} near-empty window(s) excluded" if skipped
                 else "") + ")")


if __name__ == "__main__":
    main()
