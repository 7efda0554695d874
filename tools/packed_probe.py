#!/usr/bin/env python
"""One-off TPU probe: packed fleet serving throughput over a mixed-length
utterance pool (evaluation/streaming.py:enhance_streamed_packed).

Measures the production multi-utterance serving mode: chunks pooled across
utterances into fixed-shape batches of the hot chunk program. Reports the
fleet real-time factor (total audio seconds / wall) for the 60-NFE bbed
branch at the production 65M NCSN++ (bf16 trunk), plus the per-stage split.
Run in a subprocess (compiles can poison the PJRT client). Prints one PROBE
json line.

Usage: python tools/packed_probe.py [batch_size] [overlap] [dtype] [n_utts]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    overlap = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    if dtype in ("f32", "float32", "none"):
        dtype = None
    n_utts = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import numpy as np

    from diffse_tpu.evaluation.streaming import enhance_streamed_packed
    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig

    backbone_kwargs = {"dtype": dtype} if dtype else {}
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    model = ScoreModel(
        cfg, backbone_kwargs=backbone_kwargs,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )

    print("[packed] initializing params on cpu...", file=sys.stderr, flush=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)

    # Mixed-length pool: 2.2-9.9 s utterances (VBD-like spread), repeated to
    # n_utts. Total chunk count is NOT a batch multiple — the final hot batch
    # is zero-padded, which is exactly the tail waste being measured.
    rng = np.random.default_rng(0)
    base_secs = [2.2, 3.7, 5.1, 6.4, 7.9, 9.9]
    secs = (base_secs * ((n_utts + len(base_secs) - 1) // len(base_secs)))[:n_utts]
    ys = [rng.standard_normal(int(s * SR)).astype(np.float32) * 0.1 for s in secs]
    total_audio = sum(len(y) for y in ys) / SR

    print(f"[packed] compiling (pool={n_utts} utts, {total_audio:.1f} s audio, "
          f"batch={batch_size}, ov={overlap})...", file=sys.stderr, flush=True)
    t0 = time.time()
    enhance_streamed_packed(
        model, variables, ys, "bbed", jax.random.PRNGKey(1),
        chunk_frames=64, overlap_frames=overlap, batch_size=batch_size,
    )
    compile_s = time.time() - t0
    print(f"[packed] compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)

    walls = []
    for i in range(3):
        t0 = time.time()
        enhance_streamed_packed(
            model, variables, ys, "bbed", jax.random.PRNGKey(2 + i),
            chunk_frames=64, overlap_frames=overlap, batch_size=batch_size,
        )
        walls.append(time.time() - t0)
    wall = min(walls)

    step = 64 - overlap
    n_chunks = sum(
        max(1, -(-((1 + len(y) // cfg.hop_length) - overlap) // step)) for y in ys
    )
    n_batches = -(-n_chunks // batch_size)
    result = {
        "probe": "packed_fleet",
        "fleet_rtf_x": round(total_audio / wall, 3),
        "wall_s": round(wall, 3),
        "total_audio_s": round(total_audio, 2),
        "n_utts": n_utts,
        "n_chunks": n_chunks,
        "n_batches": n_batches,
        "pad_chunks": n_batches * batch_size - n_chunks,
        "batch_size": batch_size,
        "overlap": overlap,
        "dtype": dtype or "f32",
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    print("PROBE " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
