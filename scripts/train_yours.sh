#!/bin/sh
# Colorizer training on a custom dataset (reference scripts/train_yours.sh)
python -m disentangledcolorization_tpu.cli.train_colorizer \
    --data ./dataset --dataset disco --name colorizer_run --batch_size 24 \
    --epochs 60 --lr 2e-4 --scheduler poly --dense_pos --enhanced \
    --spixel_ckpt ./checkpoints/spixel16.pkl
