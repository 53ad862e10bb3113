# Round-5 soak: the FAITHFUL training objective at scale semantics.
#
# Round 4 proved the VGG19 perceptual objective compiles, optimizes, and
# runs at 85.1 img/s/chip — but only for a 160-step segment; every long run
# so far trained the L1 fallback. This soak closes that gap: the full
# round-4 recipe (chroma-jittered data so anchor conditioning survives,
# global batch 96 = 32 x grad_accum 3, poly lr, grad clip, bf16) with
# `--vgg_npz` engaged for EVERY step, --device_data (dataset resident in
# HBM; the axon tunnel never sits on the step path), val cadence, live
# jsonl metrics, and step-time p50/p99 at exit.
#
# VGG weights are the frozen random-init npz (tools/make_random_vgg.py) —
# the exact torchvision layout/shapes/FLOPs; pretrained *values* are
# egress-blocked (VERDICT r3 Missing #3). Drop-in replaceable when a
# weights drop lands.
#
# Failure injection (same protocol as round 4): launch with
#   bash scripts/soak_r05.sh & echo $! > /tmp/soak5.pid
# deliver one SIGTERM mid-run to the train process, then re-run with
# `--resume` appended and let it finish.
set -e

test -f runs/vgg19_random.npz || \
    python tools/make_random_vgg.py --out runs/vgg19_random.npz

python -m disentangledcolorization_tpu.cli.train_colorizer \
    --data runs/overfit_data_jit --dataset disco --name colorizer_vgg_r05 \
    --save_dir runs --batch_size 96 --grad_accum 3 --epochs 200 \
    --lr 2e-4 --scheduler poly --eval_freq 5 --grad_clip 1.0 \
    --compute_dtype bfloat16 --device_data \
    --vgg_npz runs/vgg19_random.npz \
    --dense_pos --enhanced --spixel_ckpt runs/spixel_overfit16 "$@"
