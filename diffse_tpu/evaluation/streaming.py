"""Overlap-chunked streaming enhancement.

Production-serving path: split an arbitrarily long utterance into fixed-width
chunks (default 64 frames = ~0.5 s, the bucket the NCSN++ shape contract
already requires), enhance every chunk in ONE batched jitted call, and
overlap-add the chunk waveforms with a linear cross-fade. This bounds the
compiled program set to a single width bucket regardless of utterance length
(the reference instead pads each utterance to a multiple of 64 frames and
recompiles per length bucket, sgmse/util/other.py:83-90).

Chunks see only local context, so results differ slightly from full-context
enhancement near chunk boundaries; the cross-fade keeps transitions smooth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.score_model import ScoreModel
from .inference import _eval_fn, spec_sample


def _crossfade_weights(chunk_len: int, overlap: int, position: str) -> np.ndarray:
    """Linear cross-fade window for a chunk: ramp over the overlapped regions."""
    w = np.ones(chunk_len, dtype=np.float32)
    if overlap > 0:
        # half-sample-offset ramp: head ramp + the next chunk's tail ramp sum
        # to exactly 1 across the overlap
        ramp = ((np.arange(overlap) + 0.5) / overlap).astype(np.float32)
        if position not in ("first", "only"):
            w[:overlap] = ramp
        if position not in ("last", "only"):
            w[-overlap:] = ramp[::-1]
    return w


def enhance_streamed(
    model: ScoreModel,
    variables,
    y_wav: np.ndarray,
    model_type: str,
    key: jax.Array,
    chunk_frames: int = 64,
    overlap_frames: int = 16,
    x_wav: Optional[np.ndarray] = None,
    est_snr: float = 1.0,
    fixed_snr: Optional[float] = None,
    trim_frames: int = 0,
    sampler_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """Enhance one utterance of any length via overlapped fixed-width chunks.

    Args:
        y_wav: noisy waveform ``[T]``.
        model_type: an evaluate_model branch name (e.g. 'sebridge_v2',
            'sebridge_v3_snr', 'bbed').
        chunk_frames / overlap_frames: chunk geometry in STFT frames
            (chunk_frames must be a multiple of 64).
        x_wav: optional clean reference (only used by branches that need X).
        trim_frames: discard this many frames from each interior chunk edge
            before the overlap-add (they carry the least context and the
            iSTFT window taper); requires ``overlap_frames > 2*trim_frames``
            so trimmed chunks still overlap. Utterance edges are never
            trimmed.

    Returns:
        enhanced waveform ``[T]`` (numpy).
    """
    assert chunk_frames % 64 == 0, "chunk_frames must be a multiple of 64"
    assert 0 <= overlap_frames < chunk_frames
    assert trim_frames >= 0 and 2 * trim_frames < max(overlap_frames, 1) or \
        trim_frames == 0, "need overlap_frames > 2*trim_frames"
    hop = model.cfg.hop_length
    y_wav = np.asarray(y_wav).reshape(-1)
    x_wav = y_wav if x_wav is None else np.asarray(x_wav).reshape(-1)
    t_orig = y_wav.shape[-1]

    chunk_len = (chunk_frames - 1) * hop
    hop_len = (chunk_frames - overlap_frames - 1) * hop
    overlap_len = chunk_len - hop_len
    trim_len = trim_frames * hop

    # chunk start offsets covering the signal
    starts = list(range(0, max(t_orig - overlap_len, 1), hop_len))

    xb = np.zeros((len(starts), chunk_len), dtype=np.float32)
    yb = np.zeros((len(starts), chunk_len), dtype=np.float32)
    for i, s in enumerate(starts):
        seg = y_wav[s : s + chunk_len]
        xseg = x_wav[s : s + chunk_len]
        yb[i, : len(seg)] = seg
        xb[i, : len(xseg)] = xseg

    fn = _eval_fn(model, model_type, chunk_frames, fixed_snr=fixed_snr,
                  sampler_kwargs=sampler_kwargs)
    est = jnp.full((len(starts),), est_snr, dtype=jnp.float32)
    out_chunks = np.asarray(
        fn(variables, jnp.asarray(xb), jnp.asarray(yb), key, est)
    )

    # overlap-add with linear cross-fades over the kept (untrimmed) regions
    total = starts[-1] + chunk_len
    acc = np.zeros(total, dtype=np.float64)
    wsum = np.zeros(total, dtype=np.float64)
    for i, s in enumerate(starts):
        if len(starts) == 1:
            # A lone chunk is both first AND last: no interior edges exist,
            # so nothing may be trimmed (else the utterance tail would land
            # in a wsum=0 region and be emitted as silence).
            pos = "only"
        elif i == 0:
            pos = "first"
        elif i == len(starts) - 1:
            pos = "last"
        else:
            pos = "mid"
        lo = trim_len if pos in ("mid", "last") else 0
        hi = chunk_len - (trim_len if pos in ("first", "mid") else 0)
        kept = hi - lo
        ov = overlap_len - 2 * trim_len if trim_len else overlap_len
        w = _crossfade_weights(kept, ov, pos)
        acc[s + lo : s + hi] += out_chunks[i][lo:hi] * w
        wsum[s + lo : s + hi] += w
    wsum = np.where(wsum > 1e-8, wsum, 1.0)
    out = (acc / wsum).astype(np.float32)
    return out[:t_orig]


def _frame_crossfade_weights(n: int, chunk: int, overlap: int) -> np.ndarray:
    """[n, chunk] frame-domain cross-fade weights: half-sample-offset ramps
    over the overlap so adjacent chunks sum to exactly 1; utterance edges
    (first head / last tail) are never ramped."""
    w = np.ones((n, chunk), dtype=np.float32)
    if overlap > 0 and n > 1:
        ramp = ((np.arange(overlap) + 0.5) / overlap).astype(np.float32)
        w[1:, :overlap] = ramp
        w[:-1, -overlap:] = ramp[::-1]
    return w


def _c2f(z: jnp.ndarray) -> jnp.ndarray:
    """``[., C, F, T]`` complex -> ``[., 2C, F, T]`` float (real ++ imag).

    Complex spectrogram chunks must NOT cross jit boundaries in the packed
    pipeline: the axon TPU bridge mishandles complex64 buffers outside a
    single program (CLAUDE.md) — measured on-chip: passing the prep stage's
    complex chunk arrays into the hot chunk program poisons the client
    (trace-time constant fetches raise UNIMPLEMENTED) or wedges the final
    float fetch (hang). With float-only boundaries the identical pipeline
    runs and fetches cleanly (round-5 DEVNOTES). Complex exists only INSIDE
    each compiled program; XLA fuses the repack to nothing.
    """
    return jnp.concatenate([z.real, z.imag], axis=1)


def _f2c(f: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_c2f`: first half of axis 1 is Re, second is Im."""
    c = f.shape[1] // 2
    return (f[:, :c] + 1j * f[:, c:]).astype(jnp.complex64)


def _stream_cache(model: ScoreModel) -> dict:
    """Per-model jit cache (like ScoreModel._enhance_cache): the jitted
    closures capture the model, so a module-global cache would pin every
    served model and its compiled programs for the process lifetime."""
    return model.__dict__.setdefault("_stream_jit_cache", {})


def _spec_prep(model: ScoreModel, model_type: str, fs: float,
               x_in, y_in, est, n: int, step: int, chunk: int):
    """Traceable shared prep: per-utterance normalization (exactly the eval
    harness's, inference.py:156), whole-utterance STFT + compression, and
    overlapped chunk slicing. Returns ``(Xc, Yc, norm, noise_size)`` where
    ``noise_size`` is the utterance-level |X-Y| max needed by the
    sebridge_v2_fixed rescale (None for other branches)."""
    from ..models.score_model import calculate_normfac_direct

    norm = jnp.max(jnp.abs(y_in))
    if model_type in ("sebridge_v2_snr", "sebridge_v3_snr"):
        norm = norm * calculate_normfac_direct(1.0, est, fs)
    y_n = y_in[None] / norm
    x_n = x_in[None] / norm
    if model_type == "sebridge_v3_fixed":
        y_n = x_n + (y_n - x_n) * fs  # inference.py:165-166
    Yf = model._forward_transform(model._stft(y_n))[:, None]  # [1,1,F,T]
    Xf = model._forward_transform(model._stft(x_n))[:, None]
    noise_size = None
    if model_type == "sebridge_v2_fixed":
        # The chunks tile the whole utterance, so this equals the max over
        # the chunk batch — but it must be computed per UTTERANCE, never over
        # a batch mixing several utterances (inference.py:252-255).
        noise_size = jnp.max(jnp.abs(Xf - Yf))
    Yc = jnp.concatenate(
        [Yf[..., i * step : i * step + chunk] for i in range(n)]
    )  # [n,1,F,chunk]
    Xc = jnp.concatenate(
        [Xf[..., i * step : i * step + chunk] for i in range(n)]
    )
    return Xc, Yc, norm, noise_size


def _spec_ola(model: ScoreModel, sample, weights, n: int, step: int,
              chunk: int, total_frames: int, pad_samples: int):
    """Traceable shared finish: decompress, frame-domain cross-fade
    overlap-add, single iSTFT. Returns the normalized-domain waveform
    ``[1, pad_samples]``."""
    lin = model._backward_transform(sample)  # [n,1,F,chunk] linear STFT
    w = weights[:, None, None, :].astype(lin.dtype)
    acc = jnp.zeros((1, 1, lin.shape[2], total_frames), dtype=lin.dtype)
    wsum = jnp.zeros((total_frames,), dtype=jnp.float32)
    for i in range(n):
        sl = slice(i * step, i * step + chunk)
        acc = acc.at[..., sl].add(lin[i : i + 1] * w[i : i + 1])
        wsum = wsum.at[sl].add(weights[i])
    acc = acc / jnp.maximum(wsum, 1e-8).astype(acc.dtype)
    return model._istft(acc[:, 0], length=pad_samples)


def enhance_streamed_spec(
    model: ScoreModel,
    variables,
    y_wav: np.ndarray,
    model_type: str,
    key: jax.Array,
    chunk_frames: int = 64,
    overlap_frames: int = 2,
    x_wav: Optional[np.ndarray] = None,
    est_snr: float = 1.0,
    fixed_snr: Optional[float] = None,
    sampler_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """Spec-domain streaming: ONE on-device program per (n_chunks, geometry).

    Unlike :func:`enhance_streamed` (which chunks the *waveform*, so every
    chunk pays its own STFT center-reflect padding and per-chunk max-abs
    normalization), this path computes a single whole-utterance STFT, slices
    it into overlapped ``chunk_frames``-wide windows (every chunk edge sees
    REAL signal context, not reflect-pad artifacts), enhances all chunks as
    one batch, cross-fades the *linear* (decompressed) spectrogram chunks,
    and runs a single iSTFT — normalization, chunking, enhancement,
    overlap-add and synthesis are all inside one XLA program, so the host
    does no per-chunk work at all. Per-utterance normalization matches the
    full-context ``enhance()`` exactly (model.py:726-752).

    Compute overhead over full-context enhancement is only the overlap
    ratio ``chunk/(chunk-overlap)``; the default 2-frame overlap costs 3.2%.
    Defaults chosen by trained-net measurement (tools/streaming_quality.py,
    DEVNOTES round 3): PESQ/SI-SDR parity with full-context at overlap >= 2
    for both 1.5 s and 4 s utterances; 16 ms of cross-fade suffices because
    every chunk edge sees real signal context.
    """
    assert chunk_frames % 64 == 0, "chunk_frames must be a multiple of 64"
    assert 0 <= overlap_frames < chunk_frames
    cfg = model.cfg
    hop = cfg.hop_length
    y_wav = np.asarray(y_wav).reshape(-1)
    x_wav = y_wav if x_wav is None else np.asarray(x_wav).reshape(-1)
    t_orig = y_wav.shape[-1]

    step, n, total_frames, pad_samples = _packed_geometry(
        t_orig, hop, chunk_frames, overlap_frames
    )

    yp = np.zeros(pad_samples, dtype=np.float32)
    xp = np.zeros(pad_samples, dtype=np.float32)
    yp[: min(t_orig, pad_samples)] = y_wav[:pad_samples]
    xp[: min(t_orig, pad_samples)] = x_wav[:pad_samples]

    fs = cfg.fixed_snr if fixed_snr is None else fixed_snr
    # sampler_kwargs (bbed only): predictor/corrector/N/snr overrides of the
    # reference sampler config — e.g. the quality-certified NFE-reduction
    # serving config {"predictor": "heun", "corrector": "none", "N": 15}.
    sk = dict(sampler_kwargs or {})
    cache = _stream_cache(model)
    cache_key = ("spec", model_type, n, chunk_frames, overlap_frames, fs,
                 tuple(sorted(sk.items())))
    fn = cache.get(cache_key)
    if fn is None:
        # numpy closure constant (not a pre-uploaded device array): device
        # constants embed via a trace-time value fetch the axon bridge can
        # refuse — see _c2f
        weights = _frame_crossfade_weights(n, chunk_frames, overlap_frames)

        def stream_fn(variables, x_in, y_in, key, est):
            est_b = jnp.broadcast_to(jnp.atleast_1d(est), (n,))
            Xc, Yc, norm, noise_size = _spec_prep(
                model, model_type, fs, x_in, y_in, est, n, step, chunk_frames
            )
            sample = spec_sample(
                model, variables, model_type, Xc, Yc, key, est_b, fs,
                noise_size=noise_size, **sk,
            )
            x_hat = _spec_ola(model, sample, jnp.asarray(weights), n, step,
                              chunk_frames, total_frames, pad_samples)
            return x_hat * norm

        fn = jax.jit(stream_fn)
        cache[cache_key] = fn

    out = np.asarray(
        fn(variables, jnp.asarray(xp), jnp.asarray(yp), key,
           jnp.asarray(est_snr, dtype=jnp.float32))
    )[0]
    out = out[:t_orig]
    if out.shape[-1] < t_orig:
        out = np.pad(out, (0, t_orig - out.shape[-1]))
    return out


def _packed_geometry(t_orig: int, hop: int, chunk: int, overlap: int):
    step = chunk - overlap
    frames = 1 + t_orig // hop
    n = max(1, -(-(frames - overlap) // step))  # ceil
    total_frames = n * step + overlap
    pad_samples = (total_frames - 1) * hop
    return step, n, total_frames, pad_samples


def enhance_streamed_packed(
    model: ScoreModel,
    variables,
    y_wavs,
    model_type: str,
    key: jax.Array,
    chunk_frames: int = 64,
    overlap_frames: int = 2,
    batch_size: int = 16,
    x_wavs=None,
    est_snrs=None,
    fixed_snr: Optional[float] = None,
    sampler_kwargs: Optional[dict] = None,
):
    """Fleet serving: pool spec-domain chunks ACROSS utterances into
    fixed-shape batches of the measured-optimal chunk program.

    :func:`enhance_streamed_spec` compiles one fused program per utterance
    chunk-count ``n`` and runs each utterance's chunks as its own batch — a
    mixed-length workload therefore pays one compile per distinct length and
    runs many batches that are not MXU-row-aligned (a 15-row batch measured
    ~6% slower than 16, DEVNOTES round 3). This path instead splits serving
    into three stages so the HOT program has ONE fixed shape:

    1. prep (per utterance, cheap, cached per chunk-count ``n``): whole-
       utterance STFT + compression + overlapped chunk slicing + the exact
       per-utterance normalization of the eval harness (inference.py:156).
    2. chunk enhancement (hot, one compile total): the branch sampler over
       ``[batch_size, 1, F, chunk_frames]`` batches drawn from the pooled
       queue of every utterance's chunks; the final partial batch is
       zero-padded to shape (rows are independent — padding rows are
       discarded). All batches are dispatched before any is fetched, so
       device execution pipelines across the whole workload.
    3. finish (per utterance, cheap, cached per ``n``): decompress,
       frame-domain cross-fade overlap-add, single iSTFT, de-normalize.

    Chunk geometry and quality behavior are identical to
    :func:`enhance_streamed_spec` (same slicing, weights and normalization;
    for deterministic branches the outputs agree to float tolerance — the
    noisy branches draw per-batch noise, so draws differ but statistics
    match). Returns a list of numpy waveforms, each trimmed/zero-padded to
    its input length.
    """
    assert chunk_frames % 64 == 0, "chunk_frames must be a multiple of 64"
    assert 0 <= overlap_frames < chunk_frames
    assert batch_size >= 1
    cfg = model.cfg
    hop = cfg.hop_length
    fs = cfg.fixed_snr if fixed_snr is None else fixed_snr
    chunk = chunk_frames
    overlap = overlap_frames

    y_wavs = [np.asarray(y).reshape(-1) for y in y_wavs]
    x_wavs = (y_wavs if x_wavs is None
              else [np.asarray(x).reshape(-1) for x in x_wavs])
    if est_snrs is None:
        est_snrs = [1.0] * len(y_wavs)
    m = len(y_wavs)
    cache = _stream_cache(model)
    needs_noise = model_type == "sebridge_v2_fixed"

    def _prep_fn(n, step):
        ck = ("prep", model_type, n, chunk, overlap, fs)
        fn = cache.get(ck)
        if fn is not None:
            return fn

        def prep(x_in, y_in, est):
            Xc, Yc, norm, noise_size = _spec_prep(
                model, model_type, fs, x_in, y_in, est, n, step, chunk
            )
            # float-only outputs: complex chunks stay inside the program
            # (axon bridge complex-boundary defect — see _c2f)
            return _c2f(Xc), _c2f(Yc), norm, noise_size

        fn = jax.jit(prep)
        cache[ck] = fn
        return fn

    sk = dict(sampler_kwargs or {})  # bbed sampler-config overrides

    def _chunk_fn():
        ck = ("chunk", model_type, batch_size, chunk, fs,
              tuple(sorted(sk.items())))
        fn = cache.get(ck)
        if fn is not None:
            return fn

        # float-in / float-out: the complex spectrograms are rebuilt and
        # re-split INSIDE the program (axon bridge complex-boundary defect
        # — see _c2f); XLA fuses the repacking away.
        if needs_noise:
            def run(variables, Xb, Yb, key, est_b, noise_b):
                out = spec_sample(model, variables, model_type, _f2c(Xb),
                                  _f2c(Yb), key, est_b, fs,
                                  noise_size=noise_b, **sk)
                return _c2f(out)
        else:
            def run(variables, Xb, Yb, key, est_b):
                out = spec_sample(model, variables, model_type, _f2c(Xb),
                                  _f2c(Yb), key, est_b, fs, **sk)
                return _c2f(out)

        fn = jax.jit(run)
        cache[ck] = fn
        return fn

    def _finish_fn(n, step, total_frames, pad_samples):
        ck = ("finish", model_type, n, chunk, overlap, fs)
        fn = cache.get(ck)
        if fn is not None:
            return fn
        # keep the weights a NUMPY closure constant: a pre-uploaded device
        # array would be embedded via a trace-time value fetch, which the
        # axon bridge can refuse (UNIMPLEMENTED) once complex programs ran
        weights = _frame_crossfade_weights(n, chunk, overlap)

        def finish(sample, norm):
            x_hat = _spec_ola(model, _f2c(sample), jnp.asarray(weights), n,
                              step, chunk, total_frames, pad_samples)
            return x_hat * norm

        fn = jax.jit(finish)
        cache[ck] = fn
        return fn

    # ---- stage 1: per-utterance prep; build the pooled chunk queue --------
    geoms, Xcs, Ycs, norms, ests, noises = [], [], [], [], [], []
    for i in range(m):
        t_orig = y_wavs[i].shape[-1]
        step, n, total_frames, pad_samples = _packed_geometry(
            t_orig, hop, chunk, overlap
        )
        geoms.append((t_orig, step, n, total_frames, pad_samples))
        yp = np.zeros(pad_samples, dtype=np.float32)
        xp = np.zeros(pad_samples, dtype=np.float32)
        yp[: min(t_orig, pad_samples)] = y_wavs[i][:pad_samples]
        xp[: min(t_orig, pad_samples)] = x_wavs[i][:pad_samples]
        est = jnp.asarray(est_snrs[i], dtype=jnp.float32)
        Xc, Yc, norm, noise_size = _prep_fn(n, step)(
            jnp.asarray(xp), jnp.asarray(yp), est
        )
        Xcs.append(Xc)
        Ycs.append(Yc)
        norms.append(norm)
        ests.append(jnp.full((n,), est_snrs[i], dtype=jnp.float32))
        if needs_noise:
            # per-UTTERANCE rescale magnitude, broadcast to this utterance's
            # chunks — never taken across the mixed hot batch
            noises.append(jnp.broadcast_to(noise_size, (n, 1, 1, 1)))

    Xall = jnp.concatenate(Xcs)  # [total_chunks, 1, F, chunk]
    Yall = jnp.concatenate(Ycs)
    est_all = jnp.concatenate(ests)
    noise_all = jnp.concatenate(noises) if needs_noise else None
    total_chunks = Xall.shape[0]
    n_batches = -(-total_chunks // batch_size)
    padded = n_batches * batch_size
    if padded > total_chunks:
        padn = padded - total_chunks
        Xall = jnp.concatenate([Xall, jnp.zeros((padn,) + Xall.shape[1:],
                                                Xall.dtype)])
        Yall = jnp.concatenate([Yall, jnp.zeros((padn,) + Yall.shape[1:],
                                                Yall.dtype)])
        est_all = jnp.concatenate([est_all, jnp.ones((padn,), est_all.dtype)])
        if needs_noise:
            noise_all = jnp.concatenate(
                [noise_all, jnp.ones((padn, 1, 1, 1), noise_all.dtype)]
            )

    # ---- stage 2: hot fixed-shape chunk program, pipelined dispatch -------
    run = _chunk_fn()
    outs = []
    for bi in range(n_batches):
        sl = slice(bi * batch_size, (bi + 1) * batch_size)
        bkey = jax.random.fold_in(key, bi)
        if needs_noise:
            outs.append(run(variables, Xall[sl], Yall[sl], bkey, est_all[sl],
                            noise_all[sl]))
        else:
            outs.append(run(variables, Xall[sl], Yall[sl], bkey, est_all[sl]))
    samples = jnp.concatenate(outs)[:total_chunks]

    # ---- stage 3: per-utterance overlap-add + iSTFT ------------------------
    results, off = [], 0
    for i in range(m):
        t_orig, step, n, total_frames, pad_samples = geoms[i]
        sample = samples[off : off + n]
        off += n
        out = np.asarray(
            _finish_fn(n, step, total_frames, pad_samples)(sample, norms[i])
        )[0][:t_orig]
        if out.shape[-1] < t_orig:
            out = np.pad(out, (0, t_orig - out.shape[-1]))
        results.append(out)
    return results
