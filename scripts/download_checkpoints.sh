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
#
# Security: the checkpoint is unpickled at conversion time (torch zip format),
# so a tampered download could execute code. TLS verification is ON (no
# --no-check-certificate), the file is sanity-checked before conversion, and
# if DISCO_SHA256 is set the digest is verified and a mismatch aborts. Set it
# once you know the published artifact's hash:
#   DISCO_SHA256=<hex> sh scripts/download_checkpoints.sh
set -e
mkdir -p checkpoints && cd checkpoints

gdrive_fetch() { # id outfile
    # Modern Drive large-file flow: the virus-scan interstitial is a form on
    # drive.usercontent.google.com taking id/confirm/uuid. confirm=t skips it;
    # the legacy cookie-scrape flow broke silently (saved the HTML page).
    wget "https://drive.usercontent.google.com/download?id=$1&export=download&confirm=t" \
        -O "$2" || \
    wget "https://docs.google.com/uc?export=download&id=$1&confirm=t" -O "$2"

    # Sanity-check BEFORE the converter unpickles it: an HTML error/consent
    # page starts with '<'; real torch checkpoints are zip ('PK') or legacy
    # pickle archives and are tens-to-hundreds of MB.
    head_bytes=$(head -c 1 "$2")
    size=$(wc -c < "$2")
    if [ "$head_bytes" = "<" ] || [ "$size" -lt 1000000 ]; then
        echo "ERROR: $2 does not look like a torch checkpoint (size=${size}B," >&2
        echo "starts with '${head_bytes}') — Drive likely served an HTML page." >&2
        echo "Download manually from https://drive.google.com/uc?id=$1 and" >&2
        echo "re-run the converter step below." >&2
        exit 1
    fi
    if [ -n "$DISCO_SHA256" ]; then
        echo "$DISCO_SHA256  $2" | sha256sum -c - || {
            echo "ERROR: sha256 mismatch for $2 — refusing to unpickle." >&2
            exit 1
        }
    else
        echo "note: DISCO_SHA256 not set; skipping digest pin. sha256 of $2:"
        sha256sum "$2"
    fi
}

# DISCO colorizer (recommended beta checkpoint; same id as the reference)
gdrive_fetch 1J4vB6kG4xBLUUKpXr5IhnSSa4maXgRvQ disco-beta.pth.tar

cd ..
# arch (colorizer / spixelseg / VGG19) is auto-detected from the state_dict
python -m disentangledcolorization_tpu.tools.convert_torch \
    checkpoints/disco-beta.pth.tar checkpoints/disco-beta.pkl
echo "converted: checkpoints/disco-beta.pkl"
echo "usage: python -m disentangledcolorization_tpu.cli.infer --checkpt checkpoints/disco-beta.pkl --data <dir>"
echo "full parity run: python tools/parity_drop.py --pth checkpoints/disco-beta.pth.tar"
