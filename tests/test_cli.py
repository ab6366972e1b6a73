"""CLI entry-point smoke tests (in-process, headless)."""

import json
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from conftest import make_events

SENSOR = (24, 32)


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    from event_utils_tpu.data_formats import hdf5_packager
    rng = np.random.default_rng(0)
    xs, ys, ts, ps = make_events(rng, n=4000, sensor=SENSOR, t_max=0.5)
    path = str(tmp_path_factory.mktemp("cli") / "scene.h5")
    ep = hdf5_packager(path)
    ep.set_data_available(3, 0)
    ep.package_events(xs, ys, ts, ps > 0)
    for i, ft in enumerate((0.1, 0.25, 0.4)):
        ep.package_image(np.zeros(SENSOR, np.uint8), ft, i)
    ep.add_metadata(len(xs), int((ps > 0).sum()), int((ps <= 0).sum()),
                    0.5, 0.0, 0.5, 3, 0, sensor_size=SENSOR)
    ep.close()
    return path


def test_visualize_cli_voxel_image(h5_path, tmp_path):
    from event_utils_tpu.cli.visualize import main
    out = str(tmp_path / "viz")
    main([h5_path, "--output_path", out, "--visualization", "voxel_image",
          "--w_width", "0.2", "--end_frame", "1"])
    assert len(os.listdir(out)) == 1


def test_visualize_cli_event_image(h5_path, tmp_path):
    from event_utils_tpu.cli.visualize import main
    out = str(tmp_path / "viz2")
    main([h5_path, "--output_path", out, "--visualization", "event_image",
          "--w_width", "0.2", "--end_frame", "2"])
    assert len(os.listdir(out)) == 2


def test_h5_to_memmap_cli(h5_path, tmp_path):
    from event_utils_tpu.data_formats.h5_to_memmap import main
    out = str(tmp_path / "mm")
    main([h5_path, "--output_dir", out])
    sub = os.path.join(out, "scene")
    assert os.path.exists(os.path.join(sub, "t.npy"))
    assert os.path.exists(os.path.join(sub, "metadata.json"))


def test_add_attribute_cli(h5_path):
    import h5py
    from event_utils_tpu.data_formats.add_hdf5_attribute import main
    main([h5_path, "myattr", "42", "--type", "int"])
    with h5py.File(h5_path) as f:
        assert f.attrs["myattr"] == 42


@pytest.mark.slow
def test_cmax_demo_cli(h5_path, capsys):
    from event_utils_tpu.cli.cmax_demo import main
    main([h5_path, "--start_idx", "0", "--num_events", "1500",
          "--img_size", str(SENSOR[0]), str(SENSOR[1])])
    out = capsys.readouterr().out
    assert "variance" in out and "sosa" in out


def test_visualize_events_cli_sliding(h5_path, tmp_path):
    from event_utils_tpu.cli.visualize_events import main
    out = str(tmp_path / "ev3d")
    main([h5_path, "--output_path", out, "--plot_method", "t_seconds",
          "--w_width", "0.2", "--num_show", "200"])
    assert len(os.listdir(out)) >= 1


def test_visualize_flow_cli(h5_path, tmp_path):
    from event_utils_tpu.cli.visualize_flow import main
    flow_dir = tmp_path / "flows"
    flow_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(str(flow_dir / f"flow_{i:04d}.npy"),
                rng.normal(size=(2,) + SENSOR).astype(np.float32))
    np.savetxt(str(flow_dir / "timestamps.txt"), np.array([0.1, 0.25, 0.4]))
    out = str(tmp_path / "fviz")
    main([h5_path, "--flow_path", str(flow_dir), "--output_path", out,
          "--num_show", "200"])
    assert len(os.listdir(out)) >= 1


def test_augment_demo_cli(h5_path, tmp_path):
    """Augmentation figure-sweep demo (reference
    event_augmentation.py:225-267)."""
    from event_utils_tpu.cli.augment_demo import main
    out = str(tmp_path / "aug")
    main([h5_path, "--output_path", out, "--num", "1000",
          "--num_compress", "50", "--sensor", "24", "32",
          "--to_add", "1.0"])
    names = sorted(os.listdir(out))
    for stem in ("raw", "add_correlated", "add_random", "remove", "rotate",
                 "flip_x"):
        assert any(n.startswith(stem) for n in names), (stem, names)


@pytest.mark.slow
def test_train_reconstruction_cli(h5_path, tmp_path):
    """End-to-end E2VID reconstruction training drive: between_frames
    dataset -> voxel/frame sequences -> recurrent train step -> checkpoint."""
    from event_utils_tpu.cli.train_reconstruction import main
    ckpt = str(tmp_path / "e2v_ckpt")
    main([h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
          "--max_steps", "1", "--lpips_weight", "0.2", "--ckpt_dir", ckpt])
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0
    # resume restores the saved step
    main([h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
          "--max_steps", "1", "--ckpt_dir", ckpt, "--resume"])


@pytest.mark.slow
def test_train_reconstruction_cli_arch_sidecar(h5_path, tmp_path):
    """Non-default architecture flags flow train -> model.json sidecar ->
    reconstruct (which must rebuild the matching tree to restore), and a
    contradicting resume flag fails fast."""
    import pytest

    from event_utils_tpu.cli.reconstruct import main as recon
    from event_utils_tpu.cli.train_reconstruction import main as train
    ckpt = str(tmp_path / "e2v_arch")
    args = [h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
            "--max_steps", "1", "--ckpt_dir", ckpt,
            "--recurrent_levels", "3", "--num_res_blocks", "1",
            "--base_features", "16", "--burn_in", "1"]
    train(args)
    assert os.path.exists(os.path.join(ckpt, "model.json"))
    # resume with matching (default) flags: sidecar architecture wins
    train([h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
           "--max_steps", "1", "--ckpt_dir", ckpt, "--resume"])
    with pytest.raises(SystemExit, match="contradicts"):
        train([h5_path, "--seq_len", "2", "--batch_size", "1",
               "--epochs", "1", "--max_steps", "1", "--ckpt_dir", ckpt,
               "--resume", "--recurrent_levels", "2"])
    out = str(tmp_path / "recon_arch_out")
    recon([h5_path, "--output_dir", out, "--ckpt_dir", ckpt,
           "--method", "k_events", "--k", "800", "--max_frames", "2",
           "--chunk", "2"])
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 2


@pytest.mark.slow
def test_train_reconstruction_resume_params_arch_from_npz(tmp_path):
    """--resume_params restores the snapshot's architecture from its
    embedded __model_json__ — no arch flags needed on the warm-start
    command — and a contradicting explicit flag fails fast."""
    import pytest

    from event_utils_tpu.cli.train_reconstruction import main as train
    params = str(tmp_path / "p.npz")
    base = ["--simulate", "--sensor", "16", "16", "--steps", "1",
            "--seq_len", "2", "--batch_size", "1", "--capacity", "512",
            "--v_max", "10", "--window_t", "0.05"]
    train(base + ["--recurrent_levels", "2", "--base_features", "16",
                  "--params_out", params])
    assert os.path.exists(params)
    # no arch flags: the npz's __model_json__ supplies them
    train(base + ["--resume_params", params])
    with pytest.raises(SystemExit, match="contradicts"):
        train(base + ["--resume_params", params, "--recurrent_levels", "3"])
    # snapshot-at-default vs explicit non-default is also a contradiction
    # (num_res_blocks was default=0 when the snapshot was written, so it is
    # absent from __model_json__ — the check must still catch it rather
    # than fail later inside load_params_npz)
    with pytest.raises(SystemExit, match="contradicts"):
        train(base + ["--resume_params", params, "--num_res_blocks", "1"])


@pytest.mark.slow
def test_train_reconstruction_resume_params_file_mode(h5_path, tmp_path,
                                                      capsys):
    """--resume_params warm-starts file-based (non --simulate) training
    too — previously the flag was silently ignored there and the run
    trained from random init while looking like a warm start."""
    from event_utils_tpu.cli.train_reconstruction import main as train
    params = str(tmp_path / "warm.npz")
    base = [h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
            "--max_steps", "1", "--base_features", "16"]
    train(base + ["--params_out", params])
    assert os.path.exists(params)
    capsys.readouterr()
    train(base + ["--resume_params", params])
    assert "warm-started weights" in capsys.readouterr().out


@pytest.mark.slow
def test_train_flow_cli_h5_streaming(h5_path, tmp_path):
    """train_flow drives the H5 slab-streaming loader end-to-end (the
    memmap path is covered by the training tests)."""
    from event_utils_tpu.cli.train_flow import main
    ckpt = str(tmp_path / "flow_ckpt")
    main([h5_path, "--sensor", "24", "32", "--k", "500", "--batch_size", "2",
          "--epochs", "1", "--ckpt_dir", ckpt])
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0


@pytest.mark.slow
def test_infer_flow_cli(h5_path, tmp_path):
    """train_flow -> infer_flow chain; output dir is directly consumable by
    visualize_flow (flow_NNNN.npy + timestamps.txt layout)."""
    from event_utils_tpu.cli.infer_flow import main as infer
    from event_utils_tpu.cli.train_flow import main as train
    from event_utils_tpu.cli.visualize_flow import main as viz
    ckpt = str(tmp_path / "flow_ckpt")
    train([h5_path, "--sensor", "24", "32", "--k", "500",
           "--batch_size", "2", "--epochs", "1", "--ckpt_dir", ckpt])
    out = str(tmp_path / "flow_out")
    infer([h5_path, "--output_dir", out, "--ckpt_dir", ckpt,
           "--method", "k_events", "--k", "800", "--max_frames", "3",
           "--render"])
    flows = sorted(f for f in os.listdir(out) if f.endswith(".npy"))
    assert len(flows) == 3
    f0 = np.load(os.path.join(out, flows[0]))
    assert f0.shape == (2, 24, 32) and f0.dtype == np.float32
    stamps = np.loadtxt(os.path.join(out, "timestamps.txt"))
    assert len(stamps) == 3 and np.all(np.diff(stamps) > 0)
    assert any(f.endswith(".png") for f in os.listdir(out))
    # the emitted directory drives the flow visualizer unchanged
    viz_out = str(tmp_path / "flow_viz")
    viz([h5_path, "--flow_path", out, "--output_path", viz_out,
         "--num_show", "100"])
    assert len(os.listdir(viz_out)) >= 1


@pytest.mark.slow
def test_reconstruct_cli(h5_path, tmp_path):
    """train_reconstruction -> reconstruct chain: recurrent state threads
    across device chunks and frames land in [0, 1]."""
    from event_utils_tpu.cli.reconstruct import main as recon
    from event_utils_tpu.cli.train_reconstruction import main as train
    ckpt = str(tmp_path / "e2v_ckpt")
    train([h5_path, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
           "--max_steps", "1", "--ckpt_dir", ckpt])
    out = str(tmp_path / "recon_out")
    recon([h5_path, "--output_dir", out, "--ckpt_dir", ckpt,
           "--method", "k_events", "--k", "800", "--max_frames", "3",
           "--chunk", "2", "--npy"])
    pngs = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert len(pngs) == 3
    stack = np.load(os.path.join(out, "frames.npy"))
    assert stack.shape == (3, 24, 32)
    assert stack.min() >= 0.0 and stack.max() <= 1.0
    assert len(np.loadtxt(os.path.join(out, "timestamps.txt"))) == 3


def test_visualize_cli_num_compress_numeric(h5_path, tmp_path):
    """--num_compress accepts integers (was str-typed -> TypeError in
    plot_events; review r2)."""
    from event_utils_tpu.cli.visualize_events import main
    out = str(tmp_path / "ev_nc")
    main([h5_path, "--output_path", out, "--plot_method", "t_seconds",
          "--w_width", "0.2", "--num_show", "200", "--num_compress", "50"])
    assert len(os.listdir(out)) >= 1


def test_visualize_events_between_frames_skip(h5_path, tmp_path):
    """between_frames with skip_frames > 1 renders the FULL span (the
    reference-layout column mix-up rendered empty/truncated ranges;
    review r2)."""
    from event_utils_tpu.cli.visualize_events import main
    out = str(tmp_path / "ev_bf")
    main([h5_path, "--output_path", out, "--plot_method", "between_frames",
          "--num_show", "200", "--skip_frames", "2"])
    assert len(os.listdir(out)) >= 1


def test_visualize_events_sliding_stride_default(h5_path, tmp_path):
    """w_width without sw_width advances one window per frame (was a silent
    1-second arange step; review r2): a 0.5 s recording at 0.1 s windows
    must yield ~4 frames, not 1."""
    from event_utils_tpu.cli.visualize_events import main
    out = str(tmp_path / "ev_sl")
    main([h5_path, "--output_path", out, "--plot_method", "t_seconds",
          "--w_width", "0.1", "--num_show", "100"])
    assert len(os.listdir(out)) >= 3


@pytest.mark.slow
def test_simulate_factory_and_multifile_training(tmp_path):
    """cli.simulate --num_sequences writes a directory of randomized
    ground-truth recordings, and train_reconstruction trains over the whole
    directory (sequences never straddle recordings)."""
    import json

    from event_utils_tpu.cli.simulate import main as sim
    from event_utils_tpu.cli.train_reconstruction import main as train

    d = str(tmp_path / "factory")
    sim([d, "--num_sequences", "2", "--sensor", "24", "24",
         "--velocity", "25", "10", "--duration", "0.2", "--fps", "80",
         "--frame_fps", "30", "--octaves", "3"])
    files = sorted(os.listdir(d))
    assert "seq_000.h5" in files and "seq_001.h5" in files
    g0 = json.load(open(os.path.join(d, "seq_000.h5.gt.json")))
    g1 = json.load(open(os.path.join(d, "seq_001.h5.gt.json")))
    assert g0["params"] != g1["params"]  # per-sequence randomized motion

    ckpt = str(tmp_path / "ck")
    train([d, "--seq_len", "2", "--batch_size", "1", "--epochs", "1",
           "--max_steps", "3", "--ckpt_dir", ckpt])
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0


def test_visualize_events_k_events_windows(h5_path, tmp_path):
    """--plot_method k_events renders fixed-count windows (the reference's
    branch is a bare `pass`; ours previously silently fell back to
    t_seconds)."""
    from event_utils_tpu.cli.visualize_events import main
    out = str(tmp_path / "kev")
    main([h5_path, "--output_path", out, "--plot_method", "k_events",
          "--num_events", "2000", "--num_show", "500"])
    assert len(os.listdir(out)) >= 2


def test_eval_cmax_cli(tmp_path, capsys):
    """simulate -> eval_cmax: model-free flow accuracy report end-to-end."""
    import json

    from event_utils_tpu.cli.eval_cmax import main as ev
    from event_utils_tpu.cli.simulate import main as sim

    path = str(tmp_path / "gt.h5")
    sim([path, "--sensor", "32", "32", "--velocity", "25", "12",
         "--duration", "0.4", "--fps", "120", "--frame_fps", "20",
         "--c_pos", "0.12", "--c_neg", "0.12", "--octaves", "3"])
    out = str(tmp_path / "m.json")
    ev([path, "--roi_size", "16", "16", "--k", "3000", "--maxiter", "10",
        "--output", out])
    m = json.load(open(out))
    assert m["num_rois"] > 0 and np.isfinite(m["median_aee_px_s"])


@pytest.mark.slow
def test_stream_flow_cli(tmp_path):
    """simulate -> stream_flow: streaming ingest + warm-started grid_cmax
    -> dense flow fields in the visualize_flow layout, with sustained-
    throughput metrics."""
    import json

    from event_utils_tpu.cli.simulate import main as sim
    from event_utils_tpu.cli.stream_flow import main as stream

    path = str(tmp_path / "s.h5")
    sim([path, "--sensor", "32", "32", "--velocity", "25", "12",
         "--duration", "0.8", "--fps", "120", "--frame_fps", "20",
         "--c_pos", "0.12", "--c_neg", "0.12", "--octaves", "3"])
    out = str(tmp_path / "flow")
    stream([path, "--output_dir", out, "--k", "6000", "--maxiter", "20",
            "--roi_size", "16", "16", "--max_windows", "2",
            "--pyramid_first"])
    files = sorted(os.listdir(out))
    assert "flow_0000.npy" in files and "timestamps.txt" in files
    flow = np.load(os.path.join(out, "flow_0000.npy"))
    assert flow.shape == (2, 32, 32)
    m = json.load(open(os.path.join(out, "metrics.json")))
    assert m["num_windows"] == 2 and m["mevs_sustained"] > 0
    # uniform-velocity scene: the dense field's median must be near GT
    med = np.median(flow.reshape(2, -1), axis=1)
    assert np.hypot(med[0] - 25, med[1] - 12) < 10.0, med
    # --denoise preprocessing: still solves (dense texture = full support)
    out2 = str(tmp_path / "flow_dn")
    stream([path, "--output_dir", out2, "--k", "6000", "--maxiter", "20",
            "--roi_size", "16", "16", "--max_windows", "1",
            "--denoise", "0.05"])
    flow2 = np.load(os.path.join(out2, "flow_0000.npy"))
    med2 = np.median(flow2.reshape(2, -1), axis=1)
    assert np.hypot(med2[0] - 25, med2[1] - 12) < 10.0, med2


@pytest.mark.slow
def test_train_flow_simulate_in_the_loop(tmp_path):
    """train_flow --simulate: zero-file training-in-the-loop with metrics
    JSON (losses + AEE curve) and an orbax checkpoint."""
    import json

    from event_utils_tpu.cli.train_flow import main

    mpath = str(tmp_path / "m.json")
    main(["--simulate", "--steps", "6", "--sensor", "16", "16",
          "--num_bins", "2", "--batch_size", "2", "--capacity", "512",
          "--v_max", "15", "--ckpt_dir", str(tmp_path / "ck"),
          "--metrics_out", mpath])
    m = json.load(open(mpath))
    assert len(m["losses"]) == 6
    assert all(np.isfinite(v) for v in m["losses"])
    assert m["config"]["sensor"] == [16, 16]
    assert (tmp_path / "ck").exists()


@pytest.mark.slow
def test_reconstruct_window_cache(h5_path, tmp_path):
    """Sidecar window cache: repeat runs reuse it byte-identically, and a
    source-file touch (mtime change) invalidates it."""
    import json

    from event_utils_tpu.cli.reconstruct import main as recon

    cache = h5_path + ".reconcache.npz"
    if os.path.exists(cache):
        os.remove(cache)
    out1 = str(tmp_path / "wc1")
    recon([h5_path, "--output_dir", out1, "--method", "between_frames",
           "--eval_gt"])
    assert os.path.exists(cache)
    stat1 = os.stat(cache).st_mtime_ns
    out2 = str(tmp_path / "wc2")
    recon([h5_path, "--output_dir", out2, "--method", "between_frames",
           "--eval_gt"])
    m1 = json.load(open(os.path.join(out1, "metrics.json")))
    m2 = json.load(open(os.path.join(out2, "metrics.json")))
    assert m1 == m2
    assert os.stat(cache).st_mtime_ns == stat1  # cache reused, not rebuilt
    # touching the source invalidates
    os.utime(h5_path, ns=(1, 1))
    out3 = str(tmp_path / "wc3")
    recon([h5_path, "--output_dir", out3, "--method", "between_frames",
           "--eval_gt"])
    assert os.stat(cache).st_mtime_ns != stat1  # rebuilt
    m3 = json.load(open(os.path.join(out3, "metrics.json")))
    assert m3 == m1  # same data -> same result


@pytest.mark.slow
def test_train_flow_cli_simulate_schedule_and_params(tmp_path):
    """--simulate with --lr_end (single-process cosine schedule),
    --params_out, then --resume_params warm start (train_flow side of the
    production-run plumbing)."""
    from event_utils_tpu.cli.train_flow import main
    metrics = str(tmp_path / "m.json")
    params = str(tmp_path / "p.npz")
    main(["--simulate", "--sensor", "16", "16", "--steps", "3",
          "--batch_size", "2", "--capacity", "512", "--v_max", "10",
          "--window_t", "0.05", "--num_frames", "5",
          "--supervised_weight", "1.0", "--lr", "1e-3", "--lr_end", "1e-4",
          "--metrics_out", metrics, "--params_out", params])
    assert os.path.exists(params)
    with open(metrics) as f:
        cfg = json.load(f)["config"]
    assert cfg["lr_end"] == 1e-4
    main(["--simulate", "--sensor", "16", "16", "--steps", "1",
          "--batch_size", "2", "--capacity", "512", "--v_max", "10",
          "--window_t", "0.05", "--num_frames", "5",
          "--supervised_weight", "1.0", "--resume_params", params])
    # steady-state curriculum: burn_in windows precede the trained one
    main(["--simulate", "--sensor", "16", "16", "--steps", "1",
          "--batch_size", "2", "--capacity", "1024", "--v_max", "10",
          "--window_t", "0.05", "--num_frames", "5", "--burn_in", "1",
          "--supervised_weight", "1.0", "--resume_params", params,
          "--metrics_out", metrics])
    with open(metrics) as f:
        assert json.load(f)["config"]["burn_in"] == 1


def test_train_cli_resume_flag_conflicts():
    """--resume (orbax) + --resume_params (npz) are alternatives in BOTH
    training CLIs: passing both must fail fast, not silently prefer the
    checkpoint (r4 review finding)."""
    from event_utils_tpu.cli.train_flow import main as flow_main
    from event_utils_tpu.cli.train_reconstruction import main as recon_main

    with pytest.raises(SystemExit, match="alternatives"):
        flow_main(["--simulate", "--steps", "1", "--resume",
                   "--ckpt_dir", "/tmp/x", "--resume_params", "/tmp/p.npz"])
    with pytest.raises(SystemExit, match="alternatives"):
        recon_main(["--simulate", "--steps", "1", "--resume",
                    "--ckpt_dir", "/tmp/x", "--resume_params",
                    "/tmp/p.npz"])


def test_eval_cmax_pyramid_arg_validated_at_parse_time():
    """A malformed --pyramid value dies in argparse, before any dataset
    is opened (r4 review finding)."""
    from event_utils_tpu.cli.eval_cmax import build_parser

    with pytest.raises(SystemExit):
        build_parser().parse_args(["/nonexistent.h5", "--pyramid", "1.5"])
    with pytest.raises(SystemExit):
        build_parser().parse_args(["/nonexistent.h5", "--pyramid", "aut"])
    args = build_parser().parse_args(["/nonexistent.h5", "--pyramid",
                                      "auto"])
    assert args.pyramid == "auto"
    assert build_parser().parse_args(["/x.h5", "--pyramid", "2"]).pyramid \
        == 2
