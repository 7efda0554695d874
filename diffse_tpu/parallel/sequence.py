"""Sequence (frames)-parallel enhancement over a 1-D ``seq`` mesh.

The reference serves one utterance on one GPU; its only length tool is
pad-to-64 cropping (sgmse utils.py:79-86) — a multi-second utterance is a
single-device program. The TPU-native scaling path for *long* utterances is
to shard the spectrogram's time (frames) axis across chips: the U-Net is a
conv/FIR-resample fabric along (F, T), so GSPMD partitions every conv with
halo exchanges over ICI, and the dense spatial attention at feature-height 16
becomes an all-gather — all inserted by the compiler from ONE sharding
annotation on the spectrogram inputs (the scaling-book recipe: build a mesh,
annotate, let XLA place collectives).

This composes with the existing parallelism layers:

- ``parallel.mesh``            data-parallel training/eval (the reference's DDP twin)
- ``parallel.model_sharding``  tensor-parallel kernels over a (data, model) mesh
- ``parallel.sequence``        frames-parallel single-utterance enhancement (this)

Numerics: GSPMD partitioning is semantics-preserving — the sharded program
computes the same math with reduction shapes unchanged, so outputs agree
with the single-device program to float tolerance (asserted in
tests/test_sequence_parallel.py).

Divisibility: the U-Net halves T per resolution (ch_mult depth d => T/2^(d-1)
at the bottom). When a deep level's frame count stops dividing the mesh,
GSPMD pads/partially-replicates that level — correctness is unaffected; the
FLOP-heavy top levels stay fully sharded. For peak efficiency pick
``n_seq`` <= T_pad / 2^(d-1) (e.g. T_pad=256, d=7 => bottom T=4: n_seq=4 keeps
every level aligned on a v5e-4 slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_mesh(
    n_seq: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = "seq",
) -> Mesh:
    """1-D mesh over the sequence (spectrogram frames) axis."""
    if devices is None:
        devices = jax.devices()
    if n_seq is not None:
        if len(devices) < n_seq:
            raise ValueError(f"need {n_seq} devices, have {len(devices)}")
        devices = devices[:n_seq]
    return Mesh(np.asarray(devices), (axis_name,))


def spec_seq_sharding(mesh: Mesh, axis_name: str = "seq") -> NamedSharding:
    """Sharding for a [B, C, F, T] spectrogram: frames (last axis) over the
    mesh's ``seq`` axis."""
    return NamedSharding(mesh, P(None, None, None, axis_name))


def constrain_frames(x: jax.Array, mesh: Mesh, axis_name: str = "seq"):
    """``with_sharding_constraint`` pinning the last (frames) axis to ``seq``.

    Use inside a jitted program on any [..., T] spectrogram-like value; GSPMD
    propagates the layout through the surrounding convolution fabric.
    """
    spec = P(*([None] * (x.ndim - 1) + [axis_name]))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
