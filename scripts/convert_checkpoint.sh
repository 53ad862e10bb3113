#!/bin/sh
# Convert a reference PyTorch checkpoint (reference checkpoints/disco_download.sh
# fetches disco-beta.pth.tar from Google Drive; this container has no egress —
# run the download on a networked machine, then convert here):
python -m disentangledcolorization_tpu.tools.convert_torch \
    ./checkpoints/disco-beta.pth.tar ./checkpoints/disco-beta.pkl
