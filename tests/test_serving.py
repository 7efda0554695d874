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


# ---------------------------------------------------------------- failure modes


def _blocked_service(model, variables, release, started, **cfg_kwargs):
    """Service whose first flight blocks on `release` (fault injection: a
    saturated/stuck chip), signalling `started` when the flight begins."""
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=1, max_wait_ms=5.0, **cfg_kwargs))
    real_execute = svc._execute_flight

    def slow_execute(flight):
        started.set()
        release.wait(timeout=60)
        real_execute(flight)

    svc._execute_flight = slow_execute
    return svc


def test_submit_rejects_oversized_request(rng):
    """A request longer than max_audio_seconds fails fast at submit with
    RequestTooLarge (not after queueing behind the chip)."""
    from diffse_tpu.serving import RequestTooLarge

    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        max_audio_seconds=0.5))
    try:
        with pytest.raises(RequestTooLarge):
            svc.submit(rng.standard_normal(16000).astype(np.float32))
        assert svc.stats()["rejected"] == 1
        # an in-limit request still serves
        out = svc.enhance(
            rng.standard_normal(4000).astype(np.float32) * 0.1, timeout=300)
        assert out.shape == (4000,)
    finally:
        svc.close()


def test_queue_depth_limit_sheds_load(rng):
    """With the dispatcher stuck on a flight, the queue cap rejects new
    submits with ServiceOverloaded instead of growing an unbounded backlog."""
    from diffse_tpu.serving import ServiceOverloaded

    model, variables = _model()
    release, started = threading.Event(), threading.Event()
    svc = _blocked_service(model, variables, release, started,
                           max_queue_utts=2)
    try:
        w = rng.standard_normal(3000).astype(np.float32) * 0.1
        f0 = svc.submit(w)            # consumed into the (stuck) flight
        assert started.wait(timeout=30)
        f1, f2 = svc.submit(w), svc.submit(w)   # fill the queue to the cap
        with pytest.raises(ServiceOverloaded):
            svc.submit(w)
        assert svc.stats()["rejected"] == 1
        release.set()                 # unstick: everything queued completes
        for f in (f0, f1, f2):
            assert f.result(timeout=300).shape == (3000,)
    finally:
        release.set()
        svc.close()


def test_queue_time_limit_fails_stale_requests(rng):
    """A request that outwaits max_queue_seconds behind a stuck flight is
    failed with ServiceOverloaded when the dispatcher reaches it — fresh
    requests behind it still serve."""
    import time as _time

    from diffse_tpu.serving import ServiceOverloaded

    model, variables = _model()
    release, started = threading.Event(), threading.Event()
    svc = _blocked_service(model, variables, release, started,
                           max_queue_seconds=0.2)
    try:
        w = rng.standard_normal(3000).astype(np.float32) * 0.1
        f0 = svc.submit(w)            # consumed into the (stuck) flight
        assert started.wait(timeout=30)
        stale = svc.submit(w)         # queued; will age past 0.2 s
        _time.sleep(0.4)
        release.set()
        assert f0.result(timeout=300).shape == (3000,)
        with pytest.raises(ServiceOverloaded):
            stale.result(timeout=300)
        assert svc.stats()["expired"] == 1
        # the service is healthy afterwards
        assert svc.enhance(w, timeout=300).shape == (3000,)
    finally:
        release.set()
        svc.close()


def test_dispatcher_death_fails_queued_futures(rng):
    """If the dispatcher thread dies (a bug escaping the per-flight guard),
    queued clients get the error instead of hanging forever, and subsequent
    submits are rejected."""
    model, variables = _model()
    release, started = threading.Event(), threading.Event()
    svc = _blocked_service(model, variables, release, started)
    try:
        w = rng.standard_normal(3000).astype(np.float32) * 0.1
        f0 = svc.submit(w)
        assert started.wait(timeout=30)
        queued = svc.submit(w)        # waiting behind the stuck flight

        def bomb():
            raise AssertionError("injected dispatcher bug")

        svc._collect_flight = bomb    # next loop iteration kills the thread
        release.set()
        assert f0.result(timeout=300).shape == (3000,)  # in-flight completes
        with pytest.raises(RuntimeError, match="dispatcher died"):
            queued.result(timeout=60)
        svc._dispatcher.join(timeout=60)
        with pytest.raises(RuntimeError, match="dispatcher died"):
            svc.submit(w)
    finally:
        release.set()


def test_flight_timeout_unblocks_clients(rng):
    """A flight exceeding flight_timeout_s fails its clients with
    FlightTimeout; the service serves the next flight normally after the
    stuck program finishes."""
    from diffse_tpu.serving import FlightTimeout

    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=1, max_wait_ms=5.0,
        flight_timeout_s=0.15,
        # this test is about the FLIGHT deadline: keep the queue deadline
        # out of the way (the recovery request sits queued while the next
        # flight COMPILES, which takes >30 s on a contended CI core)
        max_queue_seconds=600.0))
    real_execute = svc._execute_flight
    calls = []

    def sometimes_slow(flight):
        calls.append(None)
        if len(calls) == 1:
            threading.Event().wait(0.6)   # one stuck flight
        real_execute(flight)

    svc._execute_flight = sometimes_slow
    try:
        w = rng.standard_normal(3000).astype(np.float32) * 0.1
        with pytest.raises(FlightTimeout):
            svc.enhance(w, timeout=300)
        assert svc.stats()["flight_timeouts"] == 1
        # recovered: the next flight serves (generous deadline — the tight
        # one above is only for the injected stall, not real compute)
        svc.cfg.flight_timeout_s = 300.0
        assert svc.enhance(w, timeout=300).shape == (3000,)
    finally:
        svc.close()


def test_http_request_limits(rng):
    """HTTP front end: body-size cap and service-level RequestTooLarge both
    surface as 413; Content-Length is required."""
    from diffse_tpu.data.wavio import wav_bytes
    from diffse_tpu.serving.http import make_server, serve_forever_in_thread

    model, variables = _model()
    svc = EnhanceService(model, variables, config=ServiceConfig(
        batch_size=8, max_flight_utts=4, max_wait_ms=10.0,
        max_audio_seconds=0.5))
    server = make_server(svc, port=0, max_body_bytes=200_000)
    thread = serve_forever_in_thread(server)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        # service-level audio-length limit -> 413
        body = wav_bytes(rng.standard_normal(16000).astype(np.float32) * 0.1,
                         16000, subtype="float32")
        req = urllib.request.Request(base + "/enhance", data=body,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 413

        # HTTP-level body cap -> 413 without reading the body
        big = wav_bytes(rng.standard_normal(80000).astype(np.float32) * 0.1,
                        16000, subtype="float32")
        req = urllib.request.Request(base + "/enhance", data=big,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 413

        # in-limit request still round-trips
        ok = wav_bytes(rng.standard_normal(4000).astype(np.float32) * 0.1,
                       16000, subtype="float32")
        req = urllib.request.Request(base + "/enhance", data=ok, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
    finally:
        server.shutdown()
        thread.join(timeout=10)
        svc.close()


def test_service_latency_slo_stats(rng):
    """stats() reports the per-request end-to-end latency SLO window
    (p50/p95/p99/max over the last latency_window requests) — the numbers
    the queue-depth/linger knobs are validated against (VERDICT r4 #7)."""
    model, variables = _model()
    wavs = _wavs(rng, [3000, 6000, 4000, 5000])

    with EnhanceService(model, variables, config=ServiceConfig(
            batch_size=8, max_flight_utts=4, max_wait_ms=50.0,
            latency_window=3)) as svc:
        assert svc.stats()["latency_ms"] is None  # nothing served yet
        futs = [svc.submit(w) for w in wavs]
        for f in futs:
            f.result(timeout=300)
        s = svc.stats()

    lm = s["latency_ms"]
    assert lm is not None
    # the window is bounded by latency_window, not by requests served
    assert lm["count"] == 3
    assert 0.0 < lm["p50"] <= lm["p95"] <= lm["p99"] <= lm["max"]
    # end-to-end latency includes queue wait: must be >= 0 and sane (< 5 min)
    assert lm["max"] < 300_000
