#!/bin/sh
# Stage-1 SpixelNet, psize 8 (reference scripts/spixelseg_ab8-imagenet.sh)
python -m disentangledcolorization_tpu.cli.train_spixel \
    --data ./imagenet --dataset imagenet --name spixel8 --batch_size 128 \
    --epochs 20 --psize 8 --feat ab
