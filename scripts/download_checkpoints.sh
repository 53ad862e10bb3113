#!/bin/sh
# Fetch the published DISCO checkpoints and convert them to native flax
# variables. Counterpart of the reference's checkpoints/disco_download.sh
# (same Google-Drive artifact ids, README.md:57-61 of the reference).
#
# The converter (tools/convert_torch.py) maps every reference state_dict —
# disco-beta / DISCO-c0.2 / DISCO-rand / SpixelNet-s{8,16} — onto this
# framework's pytrees (conv transpose flips, BN stats, folded spectral norm),
# so converted checkpoints load directly into cli/infer.py --checkpt and the
# trainers. Run from the repo root. Requires network egress.
set -e
mkdir -p checkpoints && cd checkpoints

gdrive_fetch() { # id outfile
    wget --load-cookies /tmp/cookies.txt \
        "https://docs.google.com/uc?export=download&confirm=$(wget --quiet \
        --save-cookies /tmp/cookies.txt --keep-session-cookies \
        --no-check-certificate "https://docs.google.com/uc?export=download&id=$1" -O- \
        | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p')&id=$1" -O "$2"
    rm -rf /tmp/cookies.txt
}

# DISCO colorizer (recommended beta checkpoint; same id as the reference)
gdrive_fetch 1J4vB6kG4xBLUUKpXr5IhnSSa4maXgRvQ disco-beta.pth.tar

cd ..
# arch (colorizer / spixelseg / VGG19) is auto-detected from the state_dict
python -m disentangledcolorization_tpu.tools.convert_torch \
    checkpoints/disco-beta.pth.tar checkpoints/disco-beta.pkl
echo "converted: checkpoints/disco-beta.pkl"
echo "usage: python -m disentangledcolorization_tpu.cli.infer --checkpt checkpoints/disco-beta.pkl --data <dir>"
