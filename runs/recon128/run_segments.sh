#!/bin/bash
# Segmented E2VID production run (VERDICT r2 #2, reconstruction half).
# 8 segments x 240 steps of train_reconstruction over the 6-scene factory,
# orbax resume between segments, reconstruct --eval_gt on the held-out
# scene after each segment -> curve.jsonl (PSNR/SSIM vs step).
set -e
cd /root/repo
DIR=runs/recon128
CKPT=$DIR/ckpt
SEG_STEPS=240

# Pre-materialize window caches in a CPU process first: the per-window
# voxelize round-trips are ~5x faster on the host CPU than through the
# TPU tunnel for these tiny (~5k-event) windows, and the trainer then
# starts straight into device steps.
python - "$DIR/data" <<'EOF'
import sys, glob
import jax; jax.config.update("jax_platforms", "cpu")
from event_utils_tpu.data_loaders import DynamicH5Dataset
from event_utils_tpu.cli.train_reconstruction import materialize_windows
kwargs = dict(voxel_method={"method": "between_frames",
                            "sliding_window_w": 0},
              num_bins=5, combined_voxel_channels=False,
              return_events=False, return_frame=True,
              return_format="numpy")
for p in sorted(glob.glob(sys.argv[1] + "/*.h5")):
    materialize_windows(DynamicH5Dataset(p, **kwargs),
                        p + ".wincache_b5.npz", src_path=p)
    print("materialized", p, flush=True)
EOF

for seg in $(seq 1 8); do
  RESUME=""
  if [ -d "$CKPT" ] && [ -n "$(ls -A $CKPT 2>/dev/null)" ]; then
    RESUME="--resume"
  fi
  echo "=== segment $seg ($RESUME) ===" >> $DIR/train.log
  python -m event_utils_tpu.cli.train_reconstruction $DIR/data \
      --seq_len 6 --batch_size 4 --lr 8e-4 --lpips_weight 0.2 \
      --epochs 1000 --max_steps $SEG_STEPS --cache_windows --shuffle \
      --seed $seg \
      --ckpt_dir $CKPT $RESUME >> $DIR/train.log 2>&1
  STEP=$(grep -o 'step [0-9]*' $DIR/train.log | tail -1 | cut -d' ' -f2)
  EVAL=$DIR/eval_seg$seg
  python -m event_utils_tpu.cli.reconstruct $DIR/heldout.h5 \
      --ckpt_dir $CKPT --method between_frames --eval_gt \
      --output_dir $EVAL --max_frames 40 >> $DIR/train.log 2>&1
  python - "$seg" "$STEP" "$EVAL" $DIR/curve.jsonl <<'EOF'
import json, sys
seg, step, ev, curve = sys.argv[1:]
m = json.load(open(ev + "/metrics.json"))
m.update(segment=int(seg), step=int(step))
with open(curve, "a") as f:
    f.write(json.dumps(m) + "\n")
print("segment", seg, "step", step, m)
EOF
done
echo "ALL SEGMENTS DONE" >> $DIR/train.log
