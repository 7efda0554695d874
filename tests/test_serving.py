"""Serving subsystem tests: dynamic batcher correctness (concurrent requests
== the packed engine run directly), SNR-branch estimation, HTTP front end."""

import threading
import urllib.request

import jax
import numpy as np
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.serving import EnhanceService, ServiceConfig

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                     attn_resolutions=(16,), image_size=256)


def _model(model_type="sebridge", snr_conditioned="false"):
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type=model_type,
                           snr_conditioned=snr_conditioned, sigma_max=1.0,
                           num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    return model, variables


def _wavs(rng, lengths):
    return [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]


def test_service_batches_concurrent_requests(rng):
    """Concurrent mixed-length requests come back correct (vs the packed
    engine run directly on the same flight, deterministic branch) and the
    batcher actually coalesces them into one flight."""
    from diffse_tpu.evaluation.streaming import enhance_streamed_packed

    model, variables = _model()
    wavs = _wavs(rng, [3000, 9000, 17000, 6500])

    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=8, max_wait_ms=300.0, seed=0))
    try:
        # hold the dispatcher on a first tiny request while the real flight
        # queues up behind it, then verify the flight ran as one
        futs = [svc.submit(w) for w in wavs]
        outs = [f.result(timeout=300) for f in futs]

        # reference: the packed engine on the identical flight + key. The
        # dispatcher keys flights as fold_in(base, idx); all four requests
        # must land in flight 0 (max_wait 300 ms is generous vs submit time).
        ref = enhance_streamed_packed(
            model, variables, wavs, svc.model_type,
            jax.random.fold_in(jax.random.PRNGKey(0), 0),
            chunk_frames=64, overlap_frames=2, batch_size=8,
            fixed_snr=model.cfg.fixed_snr)
        stats = svc.stats()
        assert stats["requests"] == 4
        assert stats["flights"] == 1, "requests were not coalesced"
        for o, r, w in zip(outs, ref, wavs):
            assert o.shape == w.shape
            np.testing.assert_allclose(o, np.asarray(r), atol=1e-5)
    finally:
        svc.close()


def test_service_multiple_flights_and_stats(rng):
    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=2, max_wait_ms=50.0))
    try:
        futs = [svc.submit(w) for w in _wavs(rng, [4000, 4100, 4200, 4300, 4400])]
        for f in futs:
            out = f.result(timeout=300)
            assert np.all(np.isfinite(out))
        stats = svc.stats()
        assert stats["requests"] == 5
        assert stats["flights"] >= 3  # max 2 utts per flight
        assert stats["audio_seconds"] > 0 and stats["rtf_x_realtime"] > 0
        assert stats["errors"] == 0
    finally:
        svc.close()


def test_service_snr_branch_estimates_when_oracle_absent(rng):
    """A *_snr branch estimates per-request SNR via the model's estimator;
    an explicit est_snr short-circuits it."""
    from diffse_tpu.models.snrnet import SNRNet

    model, variables = _model(model_type="sebridge_v3", snr_conditioned="true")
    snrnet = SNRNet()
    snr_vars = snrnet.init(jax.random.PRNGKey(1),
                           jax.numpy.zeros((1, 2, 256, 16)))
    model.snr_model = (snrnet, snr_vars)

    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=4, max_wait_ms=50.0))
    try:
        assert svc.model_type.endswith("_snr")
        out = svc.enhance(_wavs(rng, [5000])[0], timeout=300)
        assert np.all(np.isfinite(out))
        out2 = svc.enhance(_wavs(rng, [5000])[0], est_snr=0.5, timeout=300)
        assert np.all(np.isfinite(out2))
    finally:
        svc.close()


def test_service_rejects_after_close(rng):
    model, variables = _model()
    svc = EnhanceService(model, variables)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(100, np.float32))


def test_http_server_roundtrip(rng):
    """POST a WAV, get the enhanced WAV back; /healthz and /stats respond."""
    import json

    from diffse_tpu.data.wavio import parse_wav, wav_bytes
    from diffse_tpu.serving.http import make_server, serve_forever_in_thread

    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=4, max_wait_ms=10.0))
    server = make_server(svc, port=0)
    thread = serve_forever_in_thread(server)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        y = rng.standard_normal(5000).astype(np.float32) * 0.1
        body = wav_bytes(y, 16000, subtype="float32")
        req = urllib.request.Request(base + "/enhance", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            out, sr = parse_wav(r.read())
        assert sr == 16000
        assert out.shape == (1, 5000)
        assert np.all(np.isfinite(out))

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1

        # malformed body -> 400, not a wedged connection
        bad = urllib.request.Request(base + "/enhance", data=b"not a wav",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=10)
        svc.close()


@pytest.mark.slow
def test_service_concurrency_stress(rng):
    """Many client threads racing into flights: every request resolves, no
    request is dropped or double-resolved, outputs keep their own lengths,
    and the service survives interleaved stats() calls."""
    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=4, max_wait_ms=10.0, seed=0))
    lengths = [2000, 5000, 9000, 13000]
    results = {}
    errors = []
    lock = threading.Lock()

    def client(tid):
        try:
            local_rng = np.random.default_rng(tid)
            w = (local_rng.standard_normal(lengths[tid % 4]) * 0.1).astype(
                np.float32)
            out = svc.enhance(w, timeout=600)
            with lock:
                results[tid] = (w.shape, out.shape,
                                bool(np.isfinite(out).all()))
            svc.stats()
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append((tid, repr(e)))

    threads = [threading.Thread(target=client, args=(t,)) for t in range(12)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=900)
        assert not errors, errors
        assert len(results) == 12
        for wshape, oshape, finite in results.values():
            assert wshape == oshape and finite
        stats = svc.stats()
        assert stats["requests"] == 12
        assert stats["errors"] == 0
        assert 1 <= stats["flights"] <= 12
    finally:
        svc.close()
