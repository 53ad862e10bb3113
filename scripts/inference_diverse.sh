#!/bin/sh
# Diverse mode: 3 colorizations per image (reference --diverse)
python -m disentangledcolorization_tpu.cli.infer \
    --checkpt ./checkpoints/disco-beta.pkl --data ./data --name results --n_clusters 8 --diverse
