#!/bin/sh
# Stage-1 SpixelNet, psize 16 (reference scripts/spixelseg_ab16-imagenet.sh)
python -m disentangledcolorization_tpu.cli.train_spixel \
    --data ./imagenet --dataset imagenet --name spixel16 --batch_size 128 \
    --epochs 20 --psize 16 --feat ab
