#!/bin/sh
# Launch the colorization server (dynamic request batching over HTTP).
# Reference has no serving entry point; see README "Serving" section.
python -m disentangledcolorization_tpu.serve \
    --host 127.0.0.1 --port 8712 \
    --checkpt ./checkpoints/disco-beta.pkl \
    --n_clusters 8 --max_batch 56
