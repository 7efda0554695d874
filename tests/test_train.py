"""Training machinery tests: jitted train step, EMA schedule, data-parallel
mesh over 8 virtual devices, checkpoint top-k retention."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.models.snr_model import SNRModel, SNRModelConfig
from diffse_tpu.parallel import make_mesh, shard_batch, replicate
from diffse_tpu.train import (
    CheckpointManager,
    TrainState,
    create_train_state,
    ema_decay_schedule,
    eval_variables,
    make_train_step,
)

TINY_BACKBONE = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                     image_size=16)


def _model_and_state():
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", snr_conditioned="true",
                           model_type="sebridge_v3", fixed_snr=0.17783, sigma_max=1.0)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=16, num_freq_bins=16)
    opt = optax.adam(1e-4)
    state = create_train_state(variables, opt)
    return model, opt, state


def _batch(key, b=4, f=16, t=16):
    k1, k2 = jax.random.split(key)
    x = (jax.random.normal(k1, (b, 1, f, t)) + 1j * jax.random.normal(k1, (b, 1, f, t)))
    y = x + 0.3 * (jax.random.normal(k2, (b, 1, f, t)) + 1j * jax.random.normal(k2, (b, 1, f, t)))
    return x.astype(jnp.complex64), y.astype(jnp.complex64)


def test_ema_schedule_matches_torch_ema():
    """torch_ema with use_num_updates: decay = min(decay, (1+n)/(10+n))."""
    assert float(ema_decay_schedule(0.999, jnp.asarray(1))) == pytest.approx(2 / 11)
    assert float(ema_decay_schedule(0.999, jnp.asarray(10_000))) == pytest.approx(0.999)


def test_train_step_updates_params_and_ema():
    model, opt, state = _model_and_state()
    step = make_train_step(model, opt, ema_decay=0.999, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train_loss"]))

    # params changed somewhere in the tree
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.variables["params"]),
            jax.tree_util.tree_leaves(new_state.variables["params"]),
        )
    )
    assert diff > 0

    # EMA after first step: decay = min(0.999, 2/11) = 2/11, on every leaf
    d = 2 / 11
    for p0, p1, e1 in zip(
        jax.tree_util.tree_leaves(state.variables["params"]),
        jax.tree_util.tree_leaves(new_state.variables["params"]),
        jax.tree_util.tree_leaves(new_state.ema_params),
    ):
        expected = d * np.asarray(p0) + (1 - d) * np.asarray(p1)
        np.testing.assert_allclose(np.asarray(e1), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_loss_decreases():
    model, opt, state = _model_and_state()
    step = make_train_step(model, opt, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))  # same key/noise
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0]


def test_eval_variables_selects_ema():
    model, opt, state = _model_and_state()
    ev = eval_variables(state)
    assert ev["params"] is state.ema_params
    ev_raw = eval_variables(state, no_ema=True)
    assert ev_raw["params"] is state.variables["params"]


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    """The 8-virtual-device mesh train step must produce (numerically) the
    same update as the single-device step — DP is a pure sharding."""
    assert len(jax.devices()) == 8
    model, opt, state = _model_and_state()
    batch = _batch(jax.random.PRNGKey(1), b=8)

    step_single = make_train_step(model, opt, donate=False)
    s1, m1 = step_single(state, batch, jax.random.PRNGKey(2))

    mesh = make_mesh()
    step_dp = make_train_step(model, opt, mesh=mesh, donate=False)
    state_dp = replicate(mesh, state)
    batch_dp = shard_batch(mesh, batch)
    s2, m2 = step_dp(state_dp, batch_dp, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m2["train_loss"]), rtol=1e-4
    )
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    p2 = jax.tree_util.tree_leaves(s2.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6)


def test_snr_model_train_step():
    model = SNRModel(SNRModelConfig())
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=32)
    opt = optax.adam(1e-4)
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt, donate=False)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = (jax.random.normal(k1, (2, 1, 256, 32)) + 1j * jax.random.normal(k2, (2, 1, 256, 32))).astype(jnp.complex64)
    y = x + 0.1 * (jax.random.normal(k2, (2, 1, 256, 32))).astype(jnp.complex64)
    state, metrics = step(state, (x, y), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train_loss"]))

    vm = jax.jit(model.valid_metrics)(state.variables, (x, y, jnp.asarray([1.0, 1.0]), jnp.asarray([0.5, 0.2])))
    assert np.isfinite(float(vm["snr_error"]))


def test_checkpoint_topk_retention(tmp_path):
    model, opt, state = _model_and_state()
    mgr = CheckpointManager(
        str(tmp_path / "ckpts"),
        monitors=[{"monitor": "pesq", "mode": "max", "top_k": 2}],
        save_last=True,
        hparams={"backbone": "ncsnpp"},
    )
    pesqs = [1.0, 3.0, 2.0, 2.5, 0.5]
    for i, p in enumerate(pesqs):
        mgr.save(i, state, {"pesq": p})
    kept = mgr.all_steps()
    # top-2 pesq = steps 1 (3.0), 3 (2.5); last = step 4
    assert set(kept) == {1, 3, 4}
    assert mgr.best_step("pesq") == 1
    assert mgr.latest_step() == 4

    restored = mgr.restore(jax.tree_util.tree_map(np.asarray, state), step=1)
    r0 = jax.tree_util.tree_leaves(restored.variables["params"])[0]
    s0 = jax.tree_util.tree_leaves(state.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(r0), np.asarray(s0))
    assert mgr.load_hparams() == {"backbone": "ncsnpp"}


def test_checkpoint_min_mode(tmp_path):
    """snr_error is monitored with mode=min (train_snr_est.py:74-79)."""
    model, opt, state = _model_and_state()
    mgr = CheckpointManager(
        str(tmp_path / "c2"),
        monitors=[{"monitor": "snr_error", "mode": "min", "top_k": 1}],
    )
    for i, e in enumerate([5.0, 1.0, 3.0]):
        mgr.save(i, state, {"snr_error": e})
    assert set(mgr.all_steps()) == {1, 2}
    assert mgr.best_step("snr_error", mode="min") == 1


def test_checkpoint_recovers_from_uncommitted_step(tmp_path):
    """If the process died after metadata.json was written but before the
    async orbax write committed its directory, a fresh manager must fall back
    to the newest INTACT step instead of failing on the phantom one."""
    import json

    model, opt, state = _model_and_state()
    d = str(tmp_path / "c3")
    mgr = CheckpointManager(d, monitors=[{"monitor": "pesq", "mode": "max", "top_k": 5}])
    host = jax.tree_util.tree_map(np.asarray, state)
    mgr.save(0, host, {"pesq": 1.0})
    mgr.save(1, host, {"pesq": 2.0})
    mgr.close()
    # simulate the crash: metadata names step 2 but its dir never committed
    meta_path = tmp_path / "c3" / "metadata.json"
    meta = json.loads(meta_path.read_text())
    meta["2"] = {"pesq": 9.9}
    meta_path.write_text(json.dumps(meta))

    mgr2 = CheckpointManager(d, monitors=[{"monitor": "pesq", "mode": "max", "top_k": 5}])
    assert mgr2.latest_step() == 1
    assert mgr2.best_step("pesq") == 1  # phantom 9.9 entry dropped
    restored = mgr2.restore(host)  # step=None -> newest intact
    a = jax.tree_util.tree_leaves(host)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr2.close()


def test_profiling_stage_timer():
    from diffse_tpu.train.profiling import StageTimer, rtf

    timer = StageTimer()
    with timer.stage("a", sync=False):
        sum(range(1000))
    with timer.stage("a", sync=False):
        pass
    with timer.stage("b", sync=False):
        pass
    assert timer.counts["a"] == 2 and timer.counts["b"] == 1
    assert "a:" in timer.summary()
    assert rtf(1.0, 2.0) == 0.5


def test_metrics_logger_jsonl(tmp_path):
    import json

    from diffse_tpu.train.logging import MetricsLogger

    logger = MetricsLogger(log_dir=str(tmp_path))
    logger.log({"train_loss": 1.5}, step=3)
    logger.log({"pesq": 2.9, "si_sdr": 17.0}, step=4)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train_loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["pesq"] == 2.9


def test_maybe_mesh_divisibility_guard():
    from diffse_tpu.train.loop import _maybe_mesh

    assert _maybe_mesh(False, 8) is None
    assert _maybe_mesh(True, 4) is None  # 4 % 8 devices != 0
    mesh = _maybe_mesh(True, 16)
    assert mesh is not None and len(mesh.devices.flat) == 8


def test_checkpoint_async_save_and_close(tmp_path):
    """Async saves must be joined by wait_until_finished/close (and close is
    idempotent); a restore right after an async save must see the data."""
    import numpy as np

    model, opt, state = _model_and_state()
    mgr = CheckpointManager(
        str(tmp_path / "ackpts"),
        monitors=[{"monitor": "pesq", "mode": "max", "top_k": 1}],
        async_save=True,
    )
    host = jax.tree_util.tree_map(np.asarray, state)
    mgr.save(0, host, {"pesq": 1.0})
    restored = mgr.restore(host, step=0)  # joins the pending write internally
    a = jax.tree_util.tree_leaves(host)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.save(1, host, {"pesq": 2.0})
    mgr.wait_until_finished()
    mgr.close()
    mgr.close()  # idempotent
    assert set(mgr.all_steps()) == {1} or set(mgr.all_steps()) == {0, 1}


def test_model_parallel_step_matches_single_device():
    """2x4 (data x model) mesh: tensor-parallel sharded kernels must produce
    the same update as the single-device step — sharding is layout, not math
    (GSPMD inserts the collectives; parallel/model_sharding.py rules)."""
    from diffse_tpu.parallel import (
        make_2d_mesh, shard_state, state_shardings,
    )

    assert len(jax.devices()) == 8
    model, opt, state = _model_and_state()
    batch = _batch(jax.random.PRNGKey(1), b=8)

    step_single = make_train_step(model, opt, donate=False)
    s1, m1 = step_single(state, batch, jax.random.PRNGKey(2))

    mesh = make_2d_mesh(2, 4)
    ssh = state_shardings(mesh, state)
    step_mp = make_train_step(model, opt, mesh=mesh, donate=False,
                              state_sharding=ssh)
    state_mp = shard_state(mesh, state)
    batch_mp = shard_batch(mesh, batch)
    s2, m2 = step_mp(state_mp, batch_mp, jax.random.PRNGKey(2))

    # at least one conv kernel must be physically sharded 4-ways on its
    # out-channel dim (not just replicated with a fancy mesh)
    sharded = [
        l for l in jax.tree_util.tree_leaves(state_mp.variables["params"])
        if getattr(l, "ndim", 0) == 4
        and l.sharding.shard_shape(l.shape)[-1] == l.shape[-1] // 4
    ]
    assert sharded, "no kernel actually sharded on the model axis"

    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m2["train_loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.variables["params"]),
        jax.tree_util.tree_leaves(s2.variables["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_accum_step_matches_manual_average():
    """accum_steps=k: one optimizer step from the k-microbatch-averaged grads,
    per-microbatch keys = jax.random.split(step key, k)."""
    model, opt, state = _model_and_state()
    k = 2
    b1 = _batch(jax.random.PRNGKey(1), b=2)
    b2 = _batch(jax.random.PRNGKey(3), b=2)
    super_batch = tuple(jnp.stack([a, c]) for a, c in zip(b1, b2))

    step = make_train_step(model, opt, ema_decay=0.999, donate=False,
                           accum_steps=k)
    new_state, metrics = step(state, super_batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1

    # expected: plain-python accumulation with the same folded keys
    keys = jax.random.split(jax.random.PRNGKey(2), k)
    params = state.variables["params"]
    others = {c: v for c, v in state.variables.items() if c != "params"}
    grads_sum = None
    loss_sum = 0.0
    for i, mb in enumerate([b1, b2]):
        def lo(p):
            return model.loss_fn({**others, "params": p}, mb, keys[i],
                                 train=True)
        (loss, _), g = jax.value_and_grad(lo, has_aux=True)(params)
        loss_sum += float(loss)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g)
    grads = jax.tree_util.tree_map(lambda x: x / k, grads_sum)
    updates, _ = opt.update(grads, state.opt_state, params)
    expected_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(metrics["train_loss"]), loss_sum / k,
                               rtol=1e-5)
    for a, e in zip(
        jax.tree_util.tree_leaves(new_state.variables["params"]),
        jax.tree_util.tree_leaves(expected_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-6)

    # EMA uses the post-update params with the step-1 schedule decay
    d = 2 / 11
    p0 = jax.tree_util.tree_leaves(params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.variables["params"])[0]
    e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    np.testing.assert_allclose(
        np.asarray(e1), d * np.asarray(p0) + (1 - d) * np.asarray(p1),
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_accum_step_data_parallel_matches_single_device():
    """Gradient accumulation composes with the data mesh: batch axis is
    axis 1 of the (k, b, ...) super-batch."""
    from diffse_tpu.parallel import microbatch_sharding

    assert len(jax.devices()) == 8
    model, opt, state = _model_and_state()
    b1 = _batch(jax.random.PRNGKey(1), b=8)
    b2 = _batch(jax.random.PRNGKey(3), b=8)
    super_batch = tuple(jnp.stack([a, c]) for a, c in zip(b1, b2))

    step_single = make_train_step(model, opt, donate=False, accum_steps=2)
    s1, m1 = step_single(state, super_batch, jax.random.PRNGKey(2))

    mesh = make_mesh()
    step_dp = make_train_step(model, opt, mesh=mesh, donate=False,
                              accum_steps=2)
    state_dp = replicate(mesh, state)
    batch_dp = shard_batch(mesh, super_batch,
                           spec=microbatch_sharding(mesh))
    s2, m2 = step_dp(state_dp, batch_dp, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(m2["train_loss"]), rtol=1e-4)
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    p2 = jax.tree_util.tree_leaves(s2.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_chained_step_matches_sequential():
    """chain_steps=k: one dispatched program doing k FULL optimizer updates
    (lax.scan over the TrainState) equals k sequential single-step dispatches
    with the same per-update keys — a pure dispatch-amortization transform."""
    model, opt, state = _model_and_state()
    k = 3
    batches = [_batch(jax.random.PRNGKey(10 + i), b=2) for i in range(k)]
    chained_batch = tuple(
        jnp.stack([b[i] for b in batches]) for i in range(len(batches[0]))
    )

    step_chain = make_train_step(model, opt, ema_decay=0.999, donate=False,
                                 chain_steps=k)
    s_chain, m_chain = step_chain(state, chained_batch, jax.random.PRNGKey(2))
    assert int(s_chain.step) == k

    step_single = make_train_step(model, opt, ema_decay=0.999, donate=False)
    keys = jax.random.split(jax.random.PRNGKey(2), k)
    s_seq = state
    for i in range(k):
        s_seq, m_seq = step_single(s_seq, batches[i], keys[i])
    assert int(s_seq.step) == k

    # "train_loss" is the LAST update's loss
    np.testing.assert_allclose(float(m_chain["train_loss"]),
                               float(m_seq["train_loss"]), rtol=1e-5)
    for label, tree_c, tree_s in [
        ("params", s_chain.variables["params"], s_seq.variables["params"]),
        ("ema", s_chain.ema_params, s_seq.ema_params),
    ]:
        for a, e in zip(jax.tree_util.tree_leaves(tree_c),
                        jax.tree_util.tree_leaves(tree_s)):
            # scan vs unrolled reassociates float ops; near-zero params see
            # ~1e-7 absolute wiggle after an Adam step
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-5, atol=1e-6, err_msg=label)


@pytest.mark.slow
def test_chained_step_composes_with_accum_and_mesh():
    """chain=2 x accum=2 over the 8-device data mesh: batch axes are
    (chain, accum, b, ...) with the data axis sharded at axis 2 — equals the
    same program on a single device."""
    from diffse_tpu.parallel import stacked_batch_sharding

    assert len(jax.devices()) == 8
    model, opt, state = _model_and_state()
    micro = [_batch(jax.random.PRNGKey(20 + i), b=8) for i in range(4)]
    # (chain=2, accum=2, b=8, ...)
    nested = tuple(
        jnp.stack([jnp.stack([micro[0][i], micro[1][i]]),
                   jnp.stack([micro[2][i], micro[3][i]])])
        for i in range(len(micro[0]))
    )

    step_single = make_train_step(model, opt, donate=False,
                                  accum_steps=2, chain_steps=2)
    s1, m1 = step_single(state, nested, jax.random.PRNGKey(2))
    assert int(s1.step) == 2  # two optimizer updates, each 2-microbatch

    mesh = make_mesh()
    step_dp = make_train_step(model, opt, mesh=mesh, donate=False,
                              accum_steps=2, chain_steps=2)
    state_dp = replicate(mesh, state)
    batch_dp = shard_batch(mesh, nested, spec=stacked_batch_sharding(mesh, 2))
    s2, m2 = step_dp(state_dp, batch_dp, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(m2["train_loss"]), rtol=1e-4)
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    p2 = jax.tree_util.tree_leaves(s2.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_stack_groups_drops_ragged_tail():
    from diffse_tpu.train.loop import _stack_groups

    batches = [
        (np.ones((4, 3)), np.zeros((4,))),
        (np.ones((4, 3)) * 2, np.zeros((4,))),
        (np.ones((4, 3)) * 3, np.zeros((4,))),
        (np.ones((2, 3)), np.zeros((2,))),  # short last batch -> ragged group
    ]
    groups = list(_stack_groups(iter(batches), 2))
    assert len(groups) == 1
    assert groups[0][0].shape == (2, 4, 3)
    np.testing.assert_array_equal(groups[0][0][1], np.ones((4, 3)) * 2)


def test_sigterm_checkpoints_and_exits(tmp_path):
    """Preemption safety: SIGTERM mid-epoch saves a checkpoint and returns
    cleanly; a --resume run restores it."""
    import signal as _signal

    from diffse_tpu.train.loop import train_score_model

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", snr_conditioned="false",
        model_type="sebridge_v2", sigma_max=1.0, num_eval_files=0,
        n_fft=30, hop_length=8, num_frames=16,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))

    wav_len = (cfg.num_frames - 1) * cfg.hop_length
    rng = np.random.default_rng(0)

    class _TinyDM:
        class cfg:
            batch_size = 2

        def setup(self, stage):
            pass

        def train_dataloader(self):
            def gen():
                for i in range(10):
                    if i == 2:
                        _signal.raise_signal(_signal.SIGTERM)
                    x = rng.standard_normal((2, wav_len)).astype(np.float32)
                    y = (x + 0.3 * rng.standard_normal((2, wav_len))).astype(
                        np.float32)
                    yield (x, y)
            return gen()

        def val_dataloader(self):
            return []

    ckpt_dir = str(tmp_path / "preempt")
    state = train_score_model(
        model, _TinyDM(), max_epochs=3, ckpt_dir=ckpt_dir, use_mesh=False,
        seed=0,
    )
    # SIGTERM arrived while fetching batch i=2: that step still ran, then exit
    assert int(state.step) == 3
    # the guard restored the process-level handler on exit
    assert _signal.getsignal(_signal.SIGTERM) is not None

    resumed = train_score_model(
        model, _TinyDM(), max_epochs=0, ckpt_dir=ckpt_dir, use_mesh=False,
        seed=0, resume=True,
    )
    assert int(resumed.step) == 3
    p_a = jax.tree_util.tree_leaves(state.variables["params"])[0]
    p_b = jax.tree_util.tree_leaves(resumed.variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))


def test_resume_continues_epoch_numbering(tmp_path):
    """Checkpoint keys must strictly increase across resumes: a resumed run
    starting over at epoch 0 would re-save under old keys and a later
    mid-epoch (empty-metrics) save would be outranked by a stale higher key
    and pruned — restore() would silently return pre-resume state."""
    from diffse_tpu.train.loop import train_score_model

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", snr_conditioned="false",
        model_type="sebridge_v2", sigma_max=1.0, num_eval_files=0,
        n_fft=30, hop_length=8, num_frames=16,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    wav_len = (cfg.num_frames - 1) * cfg.hop_length
    rng = np.random.default_rng(0)

    class _DM:
        class cfg:
            batch_size = 2

        def setup(self, stage):
            pass

        def train_dataloader(self):
            def gen():
                for _ in range(2):
                    x = rng.standard_normal((2, wav_len)).astype(np.float32)
                    yield (x, (x + 0.3 * rng.standard_normal(
                        (2, wav_len))).astype(np.float32))
            return gen()

        def val_dataloader(self):
            return []

    ckpt_dir = str(tmp_path / "epochs")
    s1 = train_score_model(model, _DM(), max_epochs=2, ckpt_dir=ckpt_dir,
                           use_mesh=False, seed=0)
    assert int(s1.step) == 4

    s2 = train_score_model(model, _DM(), max_epochs=4, ckpt_dir=ckpt_dir,
                           use_mesh=False, seed=0, resume=True)
    # resumed run trains epochs 2..3 on top of the restored 4 steps
    assert int(s2.step) == 8

    from diffse_tpu.train import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 3  # keys kept increasing across the resume
    restored = mgr.restore(jax.tree_util.tree_map(np.asarray, s2))
    assert int(restored.step) == 8  # latest checkpoint holds the NEW state


def test_eval_every_n_epochs_gates_validation_and_saves(tmp_path):
    """eval_every_n_epochs=k (the Lightning check_val_every_n_epoch analog)
    must skip validation/checkpointing on off-cadence epochs, always run
    them on the final epoch, and keep every epoch's training steps."""
    from diffse_tpu.train.loop import train_score_model

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", snr_conditioned="false",
        model_type="sebridge_v2", sigma_max=1.0, num_eval_files=0,
        n_fft=30, hop_length=8, num_frames=16,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    wav_len = (cfg.num_frames - 1) * cfg.hop_length
    rng = np.random.default_rng(0)

    class _DM:
        class cfg:
            batch_size = 2

        def setup(self, stage):
            pass

        def train_dataloader(self):
            def gen():
                for _ in range(2):
                    x = rng.standard_normal((2, wav_len)).astype(np.float32)
                    yield (x, (x + 0.3 * rng.standard_normal(
                        (2, wav_len))).astype(np.float32))
            return gen()

        def val_dataloader(self):
            x = rng.standard_normal((2, wav_len)).astype(np.float32)
            return [(x, (x + 0.3 * rng.standard_normal(
                (2, wav_len))).astype(np.float32))]

    from diffse_tpu.train.logging import MetricsLogger

    ckpt_dir = str(tmp_path / "cadence")
    state = train_score_model(model, _DM(), max_epochs=5, ckpt_dir=ckpt_dir,
                              use_mesh=False, seed=0, eval_every_n_epochs=2,
                              logger=MetricsLogger(log_dir=str(tmp_path)))
    assert int(state.step) == 10  # every epoch still trains

    import json as _json

    with open(tmp_path / "metrics.jsonl") as f:
        rows = [_json.loads(l) for l in f]
    validated = sorted({int(r["epoch"]) for r in rows if "valid_loss" in r})
    # validation at epochs 1, 3 ((e+1) % 2 == 0) and always the final epoch
    assert validated == [1, 3, 4]

    from diffse_tpu.train import CheckpointManager

    # the final checkpoint exists and restores the final state (earlier
    # cadence saves may be pruned by top-k retention — that is unchanged)
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 4


@pytest.mark.slow
def test_tensor_parallel_step_full_flagship_tree():
    """Apply the TP sharding rules (parallel/model_sharding.py) to the FULL
    ~65M production NCSN++ param tree on a dp4 x tp2 mesh and take one real
    train step — the divisibility-guarded out-feature rules must hold for
    every kernel shape in the real model, not just the toy tree the driver
    dryrun uses (VERDICT r3: multi-chip validation ran at toy scale only)."""
    from jax.sharding import PartitionSpec as P

    from diffse_tpu.parallel import (
        make_2d_mesh,
        shard_batch,
        shard_state,
        state_shardings,
    )

    assert len(jax.devices()) == 8
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5, num_frames=64,
    )
    # production backbone: nf=128, ch_mult=(1,1,2,2,2,2,2) -> ~65M params
    model = ScoreModel(
        cfg, backbone_kwargs={},
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    assert n_params > 60e6  # really the flagship tree

    opt = optax.adam(1e-4)
    state = create_train_state(variables, opt)
    mesh2 = make_2d_mesh(4, 2)
    ssh = state_shardings(mesh2, state)

    # the rules must actually grip the real tree: every 4-D conv kernel and
    # 2-D dense kernel with even out-features shards on 'model'
    def expected_spec(path, leaf):
        from diffse_tpu.parallel.model_sharding import leaf_partition_spec

        return leaf_partition_spec(path, leaf, 2)

    specs = jax.tree_util.tree_map_with_path(
        expected_spec, state.variables["params"]
    )
    sharded = [
        s for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s != P(), specs,
                                   is_leaf=lambda x: isinstance(x, P))
        ) if s
    ]
    assert len(sharded) > 100, "TP rules sharded almost nothing at 65M"

    step = make_train_step(model, opt, mesh=mesh2, donate=True,
                           state_sharding=ssh)
    state = shard_state(mesh2, state)

    rng = np.random.default_rng(0)
    b = 4
    x = jnp.asarray(
        (rng.standard_normal((b, 1, 256, 64))
         + 1j * rng.standard_normal((b, 1, 256, 64))).astype(np.complex64)
    ) * 0.1
    y = x + 0.03 * jnp.asarray(
        (rng.standard_normal((b, 1, 256, 64))
         + 1j * rng.standard_normal((b, 1, 256, 64))).astype(np.complex64)
    )
    batch = shard_batch(mesh2, (x, y))

    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["train_loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1
    # sharded params really live distributed: a sharded kernel's per-device
    # shard is half its global out-features
    flat, _ = jax.tree_util.tree_flatten_with_path(
        new_state.variables["params"]
    )
    checked = 0
    for path, leaf in flat:
        spec = expected_spec(path, leaf)
        if spec == P(None, None, None, "model"):
            shard_shape = leaf.addressable_shards[0].data.shape
            assert shard_shape[-1] * 2 == leaf.shape[-1], (path, shard_shape)
            checked += 1
    assert checked > 50


def test_empty_epoch_warns_once(capsys):
    """_stack_groups drops ragged tails: an epoch with fewer batches than
    chain_steps trains zero steps — the loop must warn (once) instead of
    silently validating and checkpointing an untrained epoch."""
    from diffse_tpu.train.loop import train_score_model

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", snr_conditioned="false",
        model_type="sebridge_v2", sigma_max=1.0, num_eval_files=0,
        n_fft=30, hop_length=8, num_frames=16,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52,
                                       N=30))
    wav_len = (cfg.num_frames - 1) * cfg.hop_length
    rng = np.random.default_rng(0)

    class _TinyDM:
        class cfg:
            batch_size = 2

        def setup(self, stage):
            pass

        def train_dataloader(self):
            def gen():
                x = rng.standard_normal((2, wav_len)).astype(np.float32)
                y = (x + 0.3 * rng.standard_normal((2, wav_len))).astype(
                    np.float32)
                yield (x, y)  # 1 batch < chain_steps=4 -> zero stacked groups
            return gen()

        def val_dataloader(self):
            return []

    state = train_score_model(model, _TinyDM(), max_epochs=2, use_mesh=False,
                              seed=0, chain_steps=4)
    assert int(state.step) == 0
    out = capsys.readouterr().out
    assert out.count("produced no training steps") == 1


def test_wandb_artifact_and_code_parity(tmp_path, monkeypatch):
    """--wandb parity with the reference's log_model=True + log_code
    (sgmse-bbed/train.py:82-83): init uploads a code snapshot, log mirrors
    metrics, log_artifact uploads the checkpoint dir as a model Artifact."""
    import types
    import sys as _sys

    calls = {"log_code": [], "log": [], "artifacts": [], "finished": 0}

    class _FakeArtifact:
        def __init__(self, name, type):
            self.name, self.type, self.dirs, self.files = name, type, [], []

        def add_dir(self, p):
            self.dirs.append(p)

        def add_file(self, p):
            self.files.append(p)

    class _FakeRun:
        def log_code(self, root):
            calls["log_code"].append(root)

        def log_artifact(self, art):
            calls["artifacts"].append(art)

    fake = types.ModuleType("wandb")
    fake.run = _FakeRun()
    fake.Artifact = _FakeArtifact
    fake.init = lambda **kw: fake.run
    fake.log = lambda m, step=None: calls["log"].append((m, step))
    fake.finish = lambda: calls.__setitem__("finished", calls["finished"] + 1)
    monkeypatch.setitem(_sys.modules, "wandb", fake)

    from diffse_tpu.train.logging import MetricsLogger

    logger = MetricsLogger(log_dir=str(tmp_path), use_wandb=True)
    assert len(calls["log_code"]) == 1
    import os as _os
    assert _os.path.isdir(calls["log_code"][0])  # the repo root
    logger.log({"train_loss": 1.0}, step=3)
    assert calls["log"] == [({"train_loss": 1.0}, 3)]

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    (ckpt_dir / "x.bin").write_bytes(b"\x00")
    logger.log_artifact(str(ckpt_dir), name="score_model")
    assert len(calls["artifacts"]) == 1
    art = calls["artifacts"][0]
    assert art.name == "score_model" and art.type == "model"
    assert art.dirs == [str(ckpt_dir)]
    logger.close()
    assert calls["finished"] == 1

    # without wandb, log_artifact is a silent no-op
    plain = MetricsLogger(log_dir=str(tmp_path))
    plain.log_artifact(str(ckpt_dir))
