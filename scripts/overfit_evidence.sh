# End-to-end trained-weight evidence chain on one TPU chip (the round-3
# quality proof — docs/STATUS.md "Round-3"): build the tiny dataset from the
# 4 bundled reference images, train stage 1 (SpixelNet) then stage 2
# (AnchorColorProb, frozen stage-1), and evaluate the trained checkpoint
# through the standard inference + metrics pipeline.
#
# Mirrors the reference recipe semantics at small scale
# (/root/reference/scripts/train_yours.sh; main/colorizer/train_colorizer.py).
# Wall time on one v5e through the axon tunnel: ~20 min stage 1 (40 epochs),
# ~50 min stage 2 (150 epochs), ~17 min eval.
set -e

python tools/make_overfit_data.py --out runs/overfit_data

python -m disentangledcolorization_tpu.cli.train_spixel \
    --data runs/overfit_data --dataset disco --name spixel_overfit16 \
    --save_dir runs --batch_size 16 --epochs 40 --psize 16 --feat ab

python -m disentangledcolorization_tpu.cli.train_colorizer \
    --data runs/overfit_data --dataset disco --name colorizer_overfit \
    --save_dir runs --batch_size 32 --epochs 150 --lr 2e-4 --scheduler poly \
    --dense_pos --enhanced --spixel_ckpt runs/spixel_overfit16

python tools/make_eval_artifact.py --round 3 --checkpt runs/colorizer_overfit \
    --save_images docs/evidence_r03/images
