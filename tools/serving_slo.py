#!/usr/bin/env python
"""Measure serving latency SLOs (p50/p95/p99) under concurrent load.

Drives the production serving runtime (diffse_tpu/serving/service.py —
dynamic batcher over the packed fleet engine) with closed-loop concurrent
clients and reports the per-request end-to-end latency distribution,
throughput (serving RTF) and occupancy for each queue-depth knob setting —
the numbers the `max_flight_utts`/`max_wait_ms` knobs are validated against
(VERDICT r4 #7). The reference has no serving runtime and no latency
instrument at all (its only speed hook is the per-utterance RTF timer,
sgmse-bbed/sgmse/model.py:834-838).

Usage (real chip):
    python tools/serving_slo.py --ckpt <orbax dir> --platform ambient \
        --clients 8 --requests_per_client 6 --certified

Writes SERVING_SLO.json at the repo root (or --out_json) with one row per
knob setting; bench.py attaches it to the benchmark extras when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--monitor", type=str, default=None)
    parser.add_argument("--platform", type=str, default="cpu",
                        help="'cpu' (forces the CPU backend; smoke) or "
                             "'ambient' (the real TPU)")
    parser.add_argument("--clients", type=int, default=8,
                        help="concurrent closed-loop client threads")
    parser.add_argument("--requests_per_client", type=int, default=6)
    parser.add_argument("--audio_s", type=float, default=2.0,
                        help="request audio length (seconds)")
    parser.add_argument("--certified", action="store_true",
                        help="serve the quality-certified NFE-reduction "
                             "sampler config from SAMPLER_QUALITY.json "
                             "(bench._load_certified_config); error if none "
                             "is certified")
    parser.add_argument("--knobs", type=str,
                        default="flight16_wait25,flight8_wait25,flight4_wait10",
                        help="comma list of flight<max_flight_utts>_wait"
                             "<max_wait_ms> settings to sweep")
    parser.add_argument("--out_json", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    if args.platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import numpy as np

    import bench
    from diffse_tpu.serving.service import EnhanceService, ServiceConfig
    from diffse_tpu.train.restore import load_score_model
    from diffse_tpu.train.state import eval_variables

    sampler_kwargs = None
    sampler_label = "rd_ald_N30 (reference eval config)"
    if args.certified:
        picked = bench._load_certified_config()
        if picked is None:
            print("[slo] --certified: no certified config in "
                  "SAMPLER_QUALITY.json", file=sys.stderr)
            return 2
        label, scfg, _ = picked
        sampler_kwargs = {k: scfg[k] for k in
                          ("predictor", "corrector", "N", "timestep_type",
                           "corrector_steps", "snr") if k in scfg}
        sampler_label = f"{label} ({scfg['nfe']} NFE, certified)"

    model, state = load_score_model(args.ckpt, monitor=args.monitor)
    variables = eval_variables(state)
    if args.platform != "cpu":
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
    print(f"[slo] serving {model.cfg.model_type} with {sampler_label}")

    # deterministic request corpus: synthetic noisy utterances
    rng = np.random.default_rng(0)
    n = int(args.audio_s * 16000)
    corpus = [rng.standard_normal(n).astype(np.float32) * 0.1
              for _ in range(8)]

    def parse_knob(s):
        f, w = s.split("_")
        return int(f[len("flight"):]), float(w[len("wait"):])

    results = {}
    for knob in args.knobs.split(","):
        flight, wait_ms = parse_knob(knob)
        cfg = ServiceConfig(max_flight_utts=flight, max_wait_ms=wait_ms,
                            sampler_kwargs=sampler_kwargs)
        with EnhanceService(model, variables, config=cfg) as svc:
            t_warm = time.monotonic()
            svc.enhance(corpus[0])  # compile + warm every per-chunk jit
            warm_s = time.monotonic() - t_warm
            base = svc.stats()

            def client(cid):
                r = np.random.default_rng(cid)
                for _ in range(args.requests_per_client):
                    svc.enhance(corpus[int(r.integers(len(corpus)))])

            threads = [threading.Thread(target=client, args=(c,))
                       for c in range(args.clients)]
            t0 = time.monotonic()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.monotonic() - t0
            s = svc.stats()

        nreq = s["requests"] - base["requests"]
        audio = nreq * args.audio_s
        row = {
            "max_flight_utts": flight,
            "max_wait_ms": wait_ms,
            "clients": args.clients,
            "requests": nreq,
            "warmup_s": round(warm_s, 2),
            "wall_s": round(wall, 2),
            "offered_load_rtf": round(audio / wall, 2),
            "occupancy": round(
                nreq / max(s["flights"] - base["flights"], 1), 2),
            "latency_ms": s["latency_ms"],
        }
        results[knob] = row
        lm = row["latency_ms"] or {}
        print(f"[slo] {knob:>18}: {nreq} reqs in {wall:.1f}s "
              f"(load {row['offered_load_rtf']}x RT, occupancy "
              f"{row['occupancy']}) p50 {lm.get('p50')} ms  "
              f"p95 {lm.get('p95')} ms  p99 {lm.get('p99')} ms",
              flush=True)

    out = {
        "sampler": sampler_label,
        "platform": args.platform,
        "audio_s_per_request": args.audio_s,
        "knobs": results,
    }
    path = args.out_json or os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)), "SERVING_SLO.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[slo] RESULT {json.dumps(out)}")
    print(f"[slo] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
