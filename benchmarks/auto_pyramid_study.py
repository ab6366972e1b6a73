import sys
import os as _os
_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _root); sys.path.insert(0, _os.path.join(_root, "tests")); sys.path.insert(0, _os.path.join(_root, "benchmarks"))
import os
os.environ["EVENT_UTILS_TPU_PLATFORM"] = "cpu"
import event_utils_tpu
import numpy as np, jax
from event_utils_tpu.contrast_max.events_cmax import grid_cmax_batched

def dense_scene():
    from event_utils_tpu.simulation.esim import (SimulatorConfig, simulate_scene,
                                                 smooth_texture, translating_scene)
    H, W = 64, 64
    vel = (30.0, -20.0)
    tex = smooth_texture(jax.random.PRNGKey(7), (H, W), octaves=4)
    ev, _, _, _ = simulate_scene(translating_scene(tex, vel), 0.25, fps=200.0,
                                 cfg=SimulatorConfig())
    xs, ys, ts, ps = (np.asarray(a, np.float32) for a in (ev.xs, ev.ys, ev.ts, ev.ps))
    kw = dict(roi_size=(16, 16), img_size=(H, W), maxiter=30, capacity=2048)
    def gt(rois):
        return np.asarray([vel] * len(rois))
    return (xs, ys, ts, ps), kw, gt

def sparse_scene():
    rng = np.random.default_rng(0)
    from test_cmax import synthetic_flow_events
    xs, ys, ts, ps = synthetic_flow_events(rng, vx=10.0, vy=5.0,
                                           n_events=6000, sensor=(24, 32))
    kw = dict(roi_size=(12, 16), img_size=(24, 32), maxiter=15, capacity=2048)
    def gt(rois):
        return np.asarray([(10.0, 5.0)] * len(rois))
    return (xs, ys, ts, ps), kw, gt

def rotating_scene():
    from bench_cmax import make_scene, ROI, H, W
    xs, ys, ts, ps = make_scene()
    kw = dict(roi_size=ROI, img_size=(H, W), maxiter=30, capacity=2048)
    omega, ccx, ccy = 1.2, W / 2, H / 2
    def gt(rois):
        ctr_x = rois[:, 1] + ROI[1] / 2
        ctr_y = rois[:, 0] + ROI[0] / 2
        return np.stack([-omega * (ctr_y - ccy), omega * (ctr_x - ccx)], 1)
    return (xs, ys, ts, ps), kw, gt

for name, mk in (("sparse", sparse_scene), ("dense", dense_scene),
                 ("rotating_bench", rotating_scene)):
    ev, kw, gtf = mk()
    rows = {}
    for label, extra in (("plain", {}),
                         ("pyramid2", dict(pyramid=2, smooth="median")),
                         ("auto", dict(pyramid="auto"))):
        p, rois, f, v = grid_cmax_batched(*ev, **kw, **extra)
        v = np.asarray(v); p = np.asarray(p)
        gt = gtf(np.asarray(rois))
        e = np.linalg.norm(p[v] - gt[v], axis=1)
        rows[label] = (float(np.median(e)), float(np.mean(e)))
    print(name, {k: (round(a,2), round(b,2)) for k,(a,b) in rows.items()}, flush=True)
