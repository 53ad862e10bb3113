# Round-4 scale-semantics soak + anchor-conditioning recipe (VERDICT r3
# Next #2 and #4, one run):
#
#  * DATA: chroma-jittered variants of the bundled images (--jitter 3: the
#    same grayscale content appears with 4 different GT colorizations, so
#    gray->color is NOT a function and minimizing the hint-path losses
#    REQUIRES conditioning on the anchor colors — the recipe that keeps
#    --diverse / interactive hints alive on trained weights).
#  * SCALE SEMANTICS: global batch 96 via --batch_size 96 --grad_accum 3
#    (the step scans 3 microbatches of 32 — the measured throughput sweet
#    spot — matching the reference's 4 GPUs x batch 24 global batch,
#    scripts/train_imagenet_ddp.sh), >=2000 optimizer steps, val cadence
#    every 5 epochs, live jsonl metrics, step-time p50/p99 +
#    first-vs-last-quartile drift logged at exit.
#  * FAILURE INJECTION: launch stage 2 with `... & echo $! > /tmp/soak.pid`,
#    deliver one SIGTERM mid-run (kill -TERM $(cat /tmp/soak.pid)) — the
#    GracefulShutdown handler checkpoints and exits — then re-run stage 2
#    with --resume and let it finish.
#
# Stage 1 is reused from the round-3 chain (runs/spixel_overfit16): the L
# channel — SpixelNet's input — is bit-unchanged by chroma jitter, and its
# ab-edge structure is rotation-equivariant, so the frozen affinity model
# transfers.
set -e

python tools/make_overfit_data.py --out runs/overfit_data_jit \
    --copies 4 --crops 60 --jitter 3 --val_copies 24

python -m disentangledcolorization_tpu.cli.train_colorizer \
    --data runs/overfit_data_jit --dataset disco --name colorizer_jit \
    --save_dir runs --batch_size 96 --grad_accum 3 --epochs 200 \
    --lr 2e-4 --scheduler poly --eval_freq 5 --grad_clip 1.0 \
    --compute_dtype bfloat16 \
    --dense_pos --enhanced --spixel_ckpt runs/spixel_overfit16 "$@"

python tools/make_capability_evidence.py --checkpt runs/colorizer_jit \
    --out docs/evidence_r04/capabilities
