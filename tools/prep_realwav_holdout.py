"""Stage the reference-shipped VBD wav pairs as a real-speech holdout set.

Copies the four distinct clean/noisy pairs shipped with the reference
(`/root/reference/dataset/VBD_SNR-5/{train,train2,valid,valid2}` —
the -5 dB remixes produced by the reference's dataset-prep notebook,
reference: dataset/single_SNRize.ipynb / readme.md) into a
``clean/``+``noisy/`` pair directory consumable by
``tools/sampler_quality.py --realwav_holdout_dir``.

Any file longer than the 2.0-s synthetic fixtures' 256-frame width bucket
(``transforms.spec.width_bucket``: frames = 1 + t//hop, padded to %64) is
trimmed to the maximum-energy window of ``--target_samples`` so every
holdout file shares the synthetic selection files' compiled enhance
program (one TPU compile per sampler config, not two).

Usage:
    python tools/prep_realwav_holdout.py --out_dir .cache/realwav_holdout
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PAIRS = [
    # (label, clean path, noisy path) — all five are distinct mixtures
    # (checked: noisy waveforms differ pairwise, incl. valid vs valid2 and
    # the original-SNR VBD mix vs its -5 dB remix).
    ("p226_train", "VBD_SNR-5/train/clean/p226_001.wav",
     "VBD_SNR-5/train/noisy/p226_001.wav"),
    ("p226_vbd", "VBD/train/clean/p226_001.wav",
     "VBD/train/noisy/p226_001.wav"),
    ("p286_train2", "VBD_SNR-5/train2/clean/p286_001.wav",
     "VBD_SNR-5/train2/noisy/p286_001.wav"),
    ("p232_valid", "VBD_SNR-5/valid/clean/p232_001.wav",
     "VBD_SNR-5/valid/noisy/p232_001.wav"),
    ("p232_valid2", "VBD_SNR-5/valid2/clean/p232_001.wav",
     "VBD_SNR-5/valid2/noisy/p232_001.wav"),
]


def best_window(x: np.ndarray, n: int) -> int:
    """Start index of the length-``n`` window with maximum energy (the
    trim must keep speech — PESQ discards near-silent signals)."""
    if x.shape[-1] <= n:
        return 0
    e = np.cumsum(np.concatenate([[0.0], (x[0] ** 2).astype(np.float64)]))
    win = e[n:] - e[:-n]
    return int(np.argmax(win))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_root", type=str,
                        default="/root/reference/dataset")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--target_samples", type=int, default=32000,
                        help="trim-to length for files that exceed the "
                             "256-frame bucket (default 2.0 s @ 16 kHz, "
                             "matching the synthetic selection fixtures)")
    args = parser.parse_args(argv)

    from diffse_tpu.data.wavio import read_wav, write_wav
    from diffse_tpu.transforms.spec import width_bucket

    bucket_frames, _ = width_bucket(args.target_samples, 128)
    # largest t with 1 + t//hop <= bucket_frames (the last sample count
    # that still lands in the target bucket)
    max_samples = (bucket_frames - 1) * 128 + 127

    for sub in ("clean", "noisy"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)

    for label, crel, nrel in DEFAULT_PAIRS:
        cpath = os.path.join(args.dataset_root, crel)
        npath = os.path.join(args.dataset_root, nrel)
        x, sr = read_wav(cpath)
        y, sr2 = read_wav(npath)
        assert sr == sr2 == 16000, (sr, sr2)
        n = min(x.shape[-1], y.shape[-1])
        x, y = x[:, :n], y[:, :n]
        if n > max_samples:
            s = best_window(x, args.target_samples)
            x = x[:, s:s + args.target_samples]
            y = y[:, s:s + args.target_samples]
            print(f"[realwav] {label}: trimmed {n} -> {x.shape[-1]} samples "
                  f"(max-energy window at {s})")
        else:
            print(f"[realwav] {label}: {n} samples (kept whole)")
        write_wav(os.path.join(args.out_dir, "clean", label + ".wav"), x, sr)
        write_wav(os.path.join(args.out_dir, "noisy", label + ".wav"), y, sr)
    print(f"[realwav] staged {len(DEFAULT_PAIRS)} pairs in {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
