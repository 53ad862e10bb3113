#!/bin/sh
# ImageNet recipe (reference scripts/train_imagenet_ddp.sh: 4 GPU x batch 24;
# here the device mesh is auto-detected, batch is per-device)
python -m disentangledcolorization_tpu.cli.train_colorizer \
    --data ./imagenet --dataset imagenet --name colorizer_imagenet --batch_size 24 \
    --epochs 60 --lr 2e-4 --scheduler poly --dense_pos --enhanced \
    --spixel_ckpt ./checkpoints/spixel16.pkl
