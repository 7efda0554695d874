"""Serving CLI: load a checkpoint and run the HTTP enhancement server.

Beyond-reference production surface (the reference's only inference entry is
the eval.py file loop, sgmse-bbed/eval.py:126-132). Usage:

    python serve.py --ckpt runs/my_model --port 8080
    curl -s --data-binary @noisy.wav http://127.0.0.1:8080/enhance > out.wav
    curl -s http://127.0.0.1:8080/stats

Concurrent requests are pooled into MXU-aligned chunk batches by the dynamic
batcher (diffse_tpu/serving/service.py); SNR-adaptive checkpoints estimate
each request's SNR unless the client passes ``?est_snr=``.
"""

from __future__ import annotations

import argparse


def main(argv=None, block=True):
    """``block=False`` starts the server and returns ``(server, service,
    thread)`` for embedding/tests instead of joining forever."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint directory (hparams.json + steps)")
    parser.add_argument("--artifact", type=str, default=None,
                        help="AOT artifact directory (tools/export_artifact.py)"
                             " — serve the serialized program without any "
                             "model code (no dynamic batching; *_snr branches "
                             "need ?est_snr= from the client)")
    parser.add_argument("--ckpt_step", type=int, default=None)
    parser.add_argument("--monitor", type=str, default=None,
                        help="pick best step by this metric instead of latest")
    parser.add_argument("--snr_ckpt", type=str, default=None,
                        help="SNR-estimator checkpoint for *_snr branches")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--chunk_frames", type=int, default=64)
    parser.add_argument("--overlap_frames", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--max_flight_utts", type=int, default=16)
    parser.add_argument("--max_wait_ms", type=float, default=25.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--predictor", type=str, default=None,
                        help="bbed sampler predictor override (e.g. 'heun' "
                             "with --corrector none --sampler_n 15 — the "
                             "quality-certified NFE-reduction config, "
                             "SAMPLER_QUALITY.json)")
    parser.add_argument("--corrector", type=str, default=None)
    parser.add_argument("--sampler_n", type=int, default=None,
                        help="bbed reverse-step count override (default 30)")
    parser.add_argument("--corrector_steps", type=int, default=None,
                        help="bbed corrector inner steps per reverse step "
                             "(default 1; the certified 30-NFE config "
                             "rd_ald2_logit_N10 uses 2 — SAMPLER_QUALITY)")
    parser.add_argument("--timestep_type", type=str, default=None,
                        choices=("linear", "bridge_geom", "logit"),
                        help="bbed sampler time-grid override ('logit' = "
                             "stiffness-aware two-sided clustering; "
                             "required for fixed-step probability-flow "
                             "predictors on bridge SDEs, DEVNOTES r4)")
    args = parser.parse_args(argv)

    from ..serving.http import make_server, serve_forever_in_thread
    from ..serving.service import EnhanceService, ServiceConfig
    from ..train.restore import load_score_model, load_snr_model
    from ..train.state import eval_variables

    if (args.ckpt is None) == (args.artifact is None):
        parser.error("exactly one of --ckpt / --artifact is required")
    if args.artifact and (args.snr_ckpt or args.ckpt_step is not None
                          or args.monitor):
        # no estimator / step selection exists inside an artifact — silently
        # ignoring these would serve degraded output without warning
        parser.error("--snr_ckpt/--ckpt_step/--monitor apply to --ckpt mode "
                     "only; an artifact is a fixed program (clients pass "
                     "?est_snr= for *_snr branches)")

    if args.artifact:
        from ..serving.export import ArtifactService

        service = ArtifactService(args.artifact, seed=args.seed)
        server = make_server(service, host=args.host, port=args.port)
        host, port = server.server_address[:2]
        buckets = [b["pad_samples"] for b in service.meta.get("buckets", [])]
        print(f"serving artifact {service.meta.get('branch')} "
              f"(buckets {buckets}) on http://{host}:{port}", flush=True)
        thread = serve_forever_in_thread(server)
        if not block:
            return server, service, thread
        try:
            thread.join()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
            service.close()
        return

    snr_model = None
    if args.snr_ckpt:
        snr_m, snr_state = load_snr_model(args.snr_ckpt)
        snr_model = (snr_m.dnn, eval_variables(snr_state))

    model, state = load_score_model(
        args.ckpt, step=args.ckpt_step, monitor=args.monitor,
        snr_model=snr_model,
    )
    variables = eval_variables(state)  # EMA weights, as at eval (eval.py:98)

    sampler_kwargs = {
        k: v for k, v in (("predictor", args.predictor),
                          ("corrector", args.corrector),
                          ("N", args.sampler_n),
                          ("timestep_type", args.timestep_type),
                          ("corrector_steps", args.corrector_steps))
        if v is not None
    } or None
    service = EnhanceService(model, variables, config=ServiceConfig(
        chunk_frames=args.chunk_frames, overlap_frames=args.overlap_frames,
        batch_size=args.batch_size, max_flight_utts=args.max_flight_utts,
        max_wait_ms=args.max_wait_ms, seed=args.seed,
        sampler_kwargs=sampler_kwargs,
    ))
    server = make_server(service, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"serving {service.model_type} on http://{host}:{port} "
          f"(POST /enhance, GET /healthz, GET /stats)", flush=True)
    thread = serve_forever_in_thread(server)
    if not block:
        return server, service, thread
    try:
        thread.join()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
