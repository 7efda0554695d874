"""diffse_tpu — TPU-native (JAX/XLA/Pallas/pjit) SNR-Aligned diffusion speech enhancement.

A from-scratch reimplementation of the capabilities of yh-jun/SNR-Aligned_diffSE
(the sgmse-bbed lineage): diffusion / consistency-model speech enhancement on
complex STFT spectrograms with an SNR-estimator CNN driving SNR-adaptive
single-step inference.

Architecture (TPU-first, not a port):
  - transforms/  bit-faithful STFT/iSTFT + spectrogram compression as pure jnp fns
  - ops/         upfirdn2d (XLA dilated-conv + Pallas), fused bias-act, on-device expi
  - models/      NCSN++ / NCSN++-SNR / DCUNet / SNRNet as flax.linen modules
  - sde/         OUVE / BBED / PROPOSED_1 SDEs as pure dataclasses
  - sampling/    predictor-corrector reverse SDE as a single jit-compiled lax.scan
  - train/       functional train steps, EMA, orbax metric-ranked checkpoints
  - parallel/    jax.sharding Mesh / NamedSharding data parallelism over ICI/DCN
  - data/        WAV I/O + dataset pipeline (host crop/remix, on-device STFT)
  - evaluation/  SI-SDR / ESTOI (native), PESQ (gated), eval harnesses

Reference behavior citations use file:line into /root/reference/sgmse-bbed/.
"""

__version__ = "0.1.0"
