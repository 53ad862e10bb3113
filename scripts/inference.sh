#!/bin/sh
# Colorizer inference (reference scripts/inferece.sh equivalent)
python -m disentangledcolorization_tpu.cli.infer \
    --checkpt ./checkpoints/disco-beta.pkl --data ./data --name results --n_clusters 8
