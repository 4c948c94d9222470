"""Multi-device SPMD tests on the 8-device virtual CPU mesh — the
TPU-native replacement for the reference's untested torch.distributed
layer (SURVEY §4: no distributed tests existed upstream)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import MeshConfig, ModelConfig, TrainingConfig
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.parallel import (
    create_mesh,
    local_batch_size,
    make_parallel_eval_step,
    make_parallel_scan_train_step,
    make_parallel_train_step,
    shard_batch,
)
from movenet_tpu.train import create_train_state, make_optimizer, \
    make_train_step
from movenet_tpu.train.loop import Batch


def _setup(batch=8, t=512, accum=1, video=False, seq=1,
           mesh_data=-1):
    model_cfg = ModelConfig(
        layer_size=4, stack_size=2, input_channels=32,
        residual_channels=16, skip_channels=16,
        compute_dtype="float32",
        max_audio_frames=t, max_video_frames=max(1, t // 100))
    cfg = TrainingConfig(
        model_config=model_cfg, optimizer="Adam", learning_rate=1e-3,
        scheduler=None, accumulation_steps=accum,
        mesh=MeshConfig(data=mesh_data, seq=seq))
    model = make_wavenet(model_cfg)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(batch, t)).astype(np.int32)
    vid = None
    if video:
        f = t // 100
        vid = rng.standard_normal((batch, f, 16, 16, 1)).astype(np.float32)
    if accum > 1:
        codes = codes.reshape(accum, batch // accum, t)
        if vid is not None:
            vid = vid.reshape(accum, batch // accum, *vid.shape[1:])
    batch_ = Batch(codes=codes, video=vid)
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                               batch_)
    return model, cfg, state, batch_


def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(data=-1, seq=2))
    assert mesh.shape == {"data": 4, "seq": 2}
    mesh = create_mesh(MeshConfig(data=8, seq=1))
    assert mesh.shape == {"data": 8, "seq": 1}
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, seq=2))
    assert local_batch_size(16, create_mesh(MeshConfig(data=8))) == 16
    with pytest.raises(ValueError):
        local_batch_size(15, create_mesh(MeshConfig(data=8)))


def test_mesh_autofit_largest_divisor():
    # batch 6 on 4 available devices must use 3 (largest divisor <= 4),
    # not gcd(6, 4) = 2 which would idle a usable device
    mesh = create_mesh(MeshConfig(data=-1, seq=1),
                       devices=jax.devices()[:4], batch_size=6)
    assert mesh.shape == {"data": 3, "seq": 1}
    # divisible batch uses everything
    mesh = create_mesh(MeshConfig(data=-1, seq=1), batch_size=16)
    assert mesh.shape == {"data": 8, "seq": 1}
    # prime batch larger than the device count -> single-device data axis
    mesh = create_mesh(MeshConfig(data=-1, seq=2), batch_size=7)
    assert mesh.shape == {"data": 1, "seq": 2}


def test_dp_matches_single_device():
    model, cfg, state, batch = _setup(batch=8, t=512)
    # single device
    s1, m1 = jax.jit(make_train_step(model, cfg))(state, batch)

    mesh = create_mesh(MeshConfig(data=8, seq=1))
    with mesh:
        pstep = make_parallel_train_step(model, cfg, mesh, has_video=False)
        sharded = shard_batch(mesh, batch)
        s2, m2 = pstep(state, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s1.params, s2.params)


def test_dp_plus_seq_sharding_matches():
    model, cfg, state, batch = _setup(batch=4, t=512, seq=2, mesh_data=4)
    s1, m1 = jax.jit(make_train_step(model, cfg))(state, batch)

    mesh = create_mesh(MeshConfig(data=4, seq=2))
    with mesh:
        pstep = make_parallel_train_step(model, cfg, mesh,
                                         has_video=False, shard_time=True)
        s2, m2 = pstep(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s1.params, s2.params)


def test_scan_step_matches_sequential():
    """N scanned optimizer steps in one pjit call == N sequential
    parallel steps (same batches, same mesh)."""
    model, cfg, state, _ = _setup(batch=4, t=512, seq=2, mesh_data=4)
    rng = np.random.default_rng(1)
    batches = [Batch(codes=rng.integers(
        0, 32, size=(4, 512)).astype(np.int32)) for _ in range(3)]

    mesh = create_mesh(MeshConfig(data=4, seq=2))
    with mesh:
        pstep = make_parallel_train_step(model, cfg, mesh,
                                         has_video=False)
        s_seq = state
        seq_losses = []
        for b in batches:
            s_seq, m_seq = pstep(s_seq, shard_batch(mesh, b))
            seq_losses.append(float(m_seq["loss"]))

        sstep = make_parallel_scan_train_step(model, cfg, mesh,
                                              has_video=False, n_steps=3)
        stacked = Batch(codes=np.stack([b.codes for b in batches]))
        s_scan, m_scan = sstep(state, shard_batch(mesh, stacked))

    assert int(s_scan.step) == int(s_seq.step) == 3
    # scan metrics are PER-STEP (n_steps,) vectors: the scanned loss
    # curve must equal the sequential per-step curve exactly
    assert np.asarray(m_scan["loss"]).shape == (3,)
    np.testing.assert_allclose(np.asarray(m_scan["loss"]),
                               np.asarray(seq_losses), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s_scan.params, s_seq.params)


def test_scan_step_with_video_bench_wiring():
    """Mirrors bench.py::_train_steps_per_sec exactly: a 1-device
    (data=1, seq=1) mesh, make_parallel_train_step +
    make_parallel_scan_train_step with has_video=True on a labels-None
    batch, and the scanned batches built by broadcast_to OVER the
    already-sharded arrays.  Guards the official-record path — a bench
    wiring bug on the chip would cost the round its BENCH record."""
    model, cfg, state, batch = _setup(batch=2, t=500, video=True,
                                      mesh_data=1)
    mesh = create_mesh(MeshConfig(data=1, seq=1),
                       devices=jax.devices()[:1])
    n_scan = 3
    with mesh:
        step = make_parallel_train_step(model, cfg, mesh,
                                        has_video=True)
        sharded = shard_batch(mesh, batch)
        s_seq = state
        for _ in range(n_scan):
            s_seq, m_seq = step(s_seq, sharded)

        sstep = make_parallel_scan_train_step(model, cfg, mesh,
                                              has_video=True,
                                              n_steps=n_scan)
        batches = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_scan,) + x.shape),
            sharded)
        s_scan, m_scan = sstep(state, batches)
    assert int(s_scan.step) == int(s_seq.step) == n_scan
    np.testing.assert_allclose(
        float(np.asarray(m_scan["loss"])[-1]), float(m_seq["loss"]),
        rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s_scan.params, s_seq.params)


def test_fused_shard_map_matches_xla_on_mesh():
    """The fused Pallas train step (interpret-lowered) shard_map'd over
    a 4-device data mesh matches the unfused XLA step under identical
    pjit shardings: same loss, same grad_norm, same updated params.
    This is the composition experiment 03 ships (--fused_blocks with a
    multi-device mesh) — GSPMD cannot partition Mosaic custom calls, so
    the data-parallel wiring comes from jax.shard_map in train.loop."""
    import dataclasses

    # T % 128 == 0 for the fused kernels
    model, cfg, state, batch = _setup(batch=4, t=256, mesh_data=4)
    fused_cfg = dataclasses.replace(cfg, fused_blocks=True,
                                    fused_interpret=True)

    mesh = create_mesh(MeshConfig(data=4, seq=1),
                       devices=jax.devices()[:4])
    with mesh:
        xla_step = make_parallel_train_step(model, cfg, mesh,
                                            has_video=False)
        s_x, m_x = xla_step(state, shard_batch(mesh, batch))
        fused_step = make_parallel_train_step(model, fused_cfg, mesh,
                                              has_video=False)
        s_f, m_f = fused_step(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_f["grad_norm"]),
                               float(m_x["grad_norm"]), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_f.params, s_x.params)


def test_fused_shard_map_single_device_mesh():
    """The shard_map wrapper must also lower on a 1-device mesh (the
    real-chip case: bench runs the fused step under a 1-device mesh to
    exercise the Mosaic lowering inside shard_map)."""
    import dataclasses

    model, cfg, state, batch = _setup(batch=2, t=256, mesh_data=1)
    fused_cfg = dataclasses.replace(cfg, fused_blocks=True,
                                    fused_interpret=True)
    mesh = create_mesh(MeshConfig(data=1, seq=1),
                       devices=jax.devices()[:1])
    plain = jax.jit(make_train_step(model, fused_cfg))
    s_p, m_p = plain(state, batch)
    with mesh:
        step = make_parallel_train_step(model, fused_cfg, mesh,
                                        has_video=False)
        s_m, m_m = step(state, shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m_m["loss"]), float(m_p["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_m.params, s_p.params)


def test_dp_with_video_and_accumulation():
    model, cfg, state, batch = _setup(batch=8, t=400, accum=2, video=True,
                                      mesh_data=4, seq=1)
    s1, m1 = jax.jit(make_train_step(model, cfg))(state, batch)

    mesh = create_mesh(MeshConfig(data=4, seq=2))
    with mesh:
        pstep = make_parallel_train_step(model, cfg, mesh, has_video=True)
        s2, m2 = pstep(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)

    estep = make_parallel_eval_step(model, cfg, mesh, has_video=True)
    with mesh:
        em = estep(s2, Batch(codes=shard_batch(mesh, Batch(
            codes=batch.codes[0], video=batch.video[0])).codes,
            video=shard_batch(mesh, Batch(
                codes=batch.codes[0], video=batch.video[0])).video))
    assert np.isfinite(float(em["loss"]))


def test_fused_shard_map_with_video_ctx_proj():
    """Fused shard_map over the data mesh WITH video conditioning at a
    tile where the in-kernel upsample-projection backward (ctx_proj)
    is active: per-shard kernels each fold their own projection VJP,
    and the psum'd gradients must still match the XLA step."""
    import dataclasses

    # t=3200: % 128 == 0 for the fused path, stack tile 1600
    # (divisible by 10) -> ctx_proj active
    model, cfg, state, batch = _setup(batch=4, t=3200, video=True,
                                      mesh_data=4)
    fused_cfg = dataclasses.replace(cfg, fused_blocks=True,
                                    fused_interpret=True)
    mesh = create_mesh(MeshConfig(data=4, seq=1),
                       devices=jax.devices()[:4])
    with mesh:
        xla_step = make_parallel_train_step(model, cfg, mesh,
                                            has_video=True)
        s_x, m_x = xla_step(state, shard_batch(mesh, batch))
        fused_step = make_parallel_train_step(model, fused_cfg, mesh,
                                              has_video=True)
        s_f, m_f = fused_step(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_f["grad_norm"]),
                               float(m_x["grad_norm"]), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_f.params, s_x.params)


def test_bench_mesh_train_env_composition():
    """bench._mesh_train_env is THE definition of the deployed
    mesh/step/shard composition every official train leg runs through
    (round-3 VERDICT item 3); exercise all three usage shapes (single
    step, scan-of-N, config override) so a drift in bench wiring fails
    here instead of silently benching a different lowering."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    # video frames at a clean 10x upsample ratio (1280 = 128 * 10)
    model_cfg = ModelConfig(
        layer_size=3, stack_size=1, input_channels=32,
        residual_channels=16, skip_channels=16,
        compute_dtype="float32",
        max_audio_frames=1280, max_video_frames=128)
    cfg = TrainingConfig(
        model_config=model_cfg, optimizer="Adam", learning_rate=1e-3,
        scheduler=None, mesh=MeshConfig(data=1, seq=1))
    model = make_wavenet(model_cfg)
    rng = np.random.default_rng(0)
    batch = Batch(
        codes=rng.integers(0, 32, size=(2, 1280)).astype(np.int32),
        video=rng.standard_normal((2, 128, 16, 16, 1)).astype(
            np.float32))
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                               batch)
    fused_cfg = dataclasses.replace(cfg, fused_blocks=True,
                                    fused_interpret=True)
    mesh, sharded, make_step = bench._mesh_train_env(
        model, fused_cfg, batch)
    assert mesh.shape == {"data": 1, "seq": 1}
    with mesh:
        s1, m1 = make_step()(state, sharded)
        # scan-of-2 over the same sharded batch
        b2 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (2,) + x.shape),
            sharded)
        s2, m2 = make_step(n_scan=2)(state, b2)
        # config override: the unfused XLA leg of the fused-vs-XLA gate
        sx, mx = make_step(c=cfg)(state, sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(mx["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(m2["loss"])[0]),
                               float(m1["loss"]), rtol=1e-5)
