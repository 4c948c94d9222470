"""Whole-stack fused trunk kernel vs the per-block reference chain
(values + all gradients, interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.ops.pallas.stack_kernel import fused_stack


def _reference_stack(x, ctx, b_fg, w_fg, w_out, b_out, dilations,
                     n_batch):
    r = x.shape[-1]
    h = x
    skip_sum = None
    for l, d in enumerate(dilations):
        shifted = jnp.pad(h, ((0, 0), (d, 0), (0, 0)))[:, : h.shape[1], :]
        parts = [h, shifted] + ([ctx] if ctx is not None else [])
        hp = jnp.concatenate(parts, axis=-1)
        bias = b_fg[l * n_batch:(l + 1) * n_batch][:, None, :]
        fg = jnp.einsum("bti,io->bto", hp, w_fg[l],
                        precision=jax.lax.Precision.HIGHEST) + bias
        gated = jnp.tanh(fg[..., :r]) * jax.nn.sigmoid(fg[..., r:])
        out = jnp.einsum("btr,ro->bto", gated, w_out[l],
                         precision=jax.lax.Precision.HIGHEST) \
            + b_out[l][None, None, :]
        skip = out[..., r:]
        skip_sum = skip if skip_sum is None else skip_sum + skip
        h = out[..., :r] + h
    return skip_sum


def _make(dilations, has_ctx, batch=2, t=512, r=16, s=16, seed=0):
    rng = np.random.default_rng(seed)
    nl = len(dilations)
    w_in = (3 if has_ctx else 2) * r
    x = jnp.asarray(rng.standard_normal((batch, t, r)) * 0.3, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((batch, t, r)) * 0.3,
                      jnp.float32) if has_ctx else None
    b_fg = jnp.asarray(rng.standard_normal((nl * batch, 2 * r)) * 0.05,
                       jnp.float32)
    w_fg = jnp.asarray(rng.standard_normal((nl, w_in, 2 * r)) * 0.2,
                       jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((nl, r, r + s)) * 0.2,
                        jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((nl, r + s)) * 0.05,
                        jnp.float32)
    return x, ctx, b_fg, w_fg, w_out, b_out


@pytest.mark.parametrize("dilations", [(1, 2, 4, 1, 2, 4),
                                       (1, 128, 256)])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_stack_forward_matches(dilations, has_ctx):
    args = _make(dilations, has_ctx)
    got = fused_stack(*args, tuple(dilations), True)
    want = _reference_stack(*args, dilations, args[0].shape[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("dilations", [(1, 2, 4, 1, 2, 4),
                                       (1, 128, 256)])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_stack_gradients_match(dilations, has_ctx):
    x, ctx, b_fg, w_fg, w_out, b_out = _make(dilations, has_ctx)
    n_batch = x.shape[0]

    def loss_f(x, ctx, b_fg, w_fg, w_out, b_out):
        s = fused_stack(x, ctx, b_fg, w_fg, w_out, b_out,
                        tuple(dilations), True)
        return jnp.sum(jnp.sin(s))

    def loss_r(x, ctx, b_fg, w_fg, w_out, b_out):
        s = _reference_stack(x, ctx, b_fg, w_fg, w_out, b_out,
                             dilations, n_batch)
        return jnp.sum(jnp.sin(s))

    argnums = (0, 2, 3, 4, 5) if not has_ctx else (0, 1, 2, 3, 4, 5)
    args = (x, ctx, b_fg, w_fg, w_out, b_out)
    gf = jax.grad(loss_f, argnums=argnums)(*args)
    gr = jax.grad(loss_r, argnums=argnums)(*args)
    names = (["x", "b_fg", "w_fg", "w_out", "b_out"] if not has_ctx
             else ["x", "ctx", "b_fg", "w_fg", "w_out", "b_out"])
    for a, b_, name in zip(gf, gr, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4,
            err_msg=f"grad mismatch: {name} ({dilations}, "
                    f"ctx={has_ctx})")


@pytest.mark.parametrize("has_ctx", [False, True])
def test_stack_save_all_mode(has_ctx):
    """Dilations spanning tiles (d >= tile) take the save-all VJP path;
    tails-recompute requires every dilation inside one tile."""
    from movenet_tpu.ops.pallas.stack_kernel import (
        pick_stack_tile, supports_recompute)

    dilations = (1, 256, 512)
    t = 1024
    assert pick_stack_tile(t, dilations) == 512
    assert not supports_recompute(t, dilations)
    x, ctx, b_fg, w_fg, w_out, b_out = _make(dilations, has_ctx, t=t)
    n_batch = x.shape[0]

    got = fused_stack(x, ctx, b_fg, w_fg, w_out, b_out,
                      tuple(dilations), True)
    want = _reference_stack(x, ctx, b_fg, w_fg, w_out, b_out,
                            dilations, n_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss_f(*args):
        return jnp.sum(jnp.sin(fused_stack(*args, tuple(dilations),
                                           True)))

    def loss_r(*args):
        return jnp.sum(jnp.sin(_reference_stack(*args, dilations,
                                                n_batch)))

    argnums = (0, 2, 3, 4, 5) if not has_ctx else (0, 1, 2, 3, 4, 5)
    args = (x, ctx, b_fg, w_fg, w_out, b_out)
    gf = jax.grad(loss_f, argnums=argnums)(*args)
    gr = jax.grad(loss_r, argnums=argnums)(*args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("dilations", [(1, 2, 4, 1, 2, 4),
                                       (1, 128, 256)])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_stack_recompute_strategy_matches_save(dilations, has_ctx):
    """The tails-recompute VJP must agree with save-all: identical
    forward, matching gradients (recompute is bit-identical math on the
    same rounded inputs)."""
    from movenet_tpu.ops.pallas.stack_kernel import supports_recompute

    assert supports_recompute(512, dilations)
    x, ctx, b_fg, w_fg, w_out, b_out = _make(dilations, has_ctx)
    args = (x, ctx, b_fg, w_fg, w_out, b_out)

    def loss(strategy):
        def f(*a):
            return jnp.sum(jnp.sin(fused_stack(
                *a, tuple(dilations), True, strategy)))
        return f

    argnums = (0, 2, 3, 4, 5) if not has_ctx else (0, 1, 2, 3, 4, 5)
    v_save = loss("save")(*args)
    v_rec = loss("recompute")(*args)
    np.testing.assert_allclose(np.asarray(v_rec), np.asarray(v_save),
                               rtol=1e-6)
    g_save = jax.grad(loss("save"), argnums=argnums)(*args)
    g_rec = jax.grad(loss("recompute"), argnums=argnums)(*args)
    for a, b_ in zip(g_rec, g_save):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("dilations", [(1, 2, 4, 1, 2, 4),
                                       (1, 128, 256)])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_stack_replay_strategy_matches_save(dilations, has_ctx):
    """The replay VJP (no hsave: h chain rebuilt from the saved taps)
    must agree with save-all.  The replayed residual update contracts
    only the res columns of w_out, so summation order can differ from
    the forward's full-width matmul by f32 rounding (same tolerance
    class as recompute-vs-save)."""
    x, ctx, b_fg, w_fg, w_out, b_out = _make(dilations, has_ctx)
    args = (x, ctx, b_fg, w_fg, w_out, b_out)

    def loss(strategy):
        def f(*a):
            return jnp.sum(jnp.sin(fused_stack(
                *a, tuple(dilations), True, strategy)))
        return f

    argnums = (0, 2, 3, 4, 5) if not has_ctx else (0, 1, 2, 3, 4, 5)
    v_save = loss("save")(*args)
    v_rep = loss("replay")(*args)
    np.testing.assert_allclose(np.asarray(v_rep), np.asarray(v_save),
                               rtol=1e-6)
    g_save = jax.grad(loss("save"), argnums=argnums)(*args)
    g_rep = jax.grad(loss("replay"), argnums=argnums)(*args)
    for a, b_ in zip(g_rep, g_save):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_stack_bwd_layer_chunked_matches(monkeypatch):
    """The layer-chunked backward grid (disabled by default; see
    _BWD_LAYER_CHUNK_BUDGET) visits the same (tile, layer) sequence as
    the monolithic kernel and must produce identical gradients."""
    import movenet_tpu.ops.pallas.stack_kernel as sk

    dilations = (1, 2, 4, 1, 2, 4)
    x, ctx, b_fg, w_fg, w_out, b_out = _make(dilations, True)
    args = (x, ctx, b_fg, w_fg, w_out, b_out)

    def loss(*a):
        return jnp.sum(jnp.sin(fused_stack(
            *a, tuple(dilations), True, "save")))

    argnums = (0, 1, 2, 3, 4, 5)
    g_mono = jax.grad(loss, argnums=argnums)(*args)
    monkeypatch.setattr(sk, "_BWD_LAYER_CHUNK_BUDGET", 1 << 20)
    g_chunk = jax.grad(loss, argnums=argnums)(*args)
    for a, b_ in zip(g_chunk, g_mono):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-7)


def test_resolve_strategy_rules():
    from movenet_tpu.ops.pallas.stack_kernel import resolve_strategy

    dil = (1, 2, 4) * 3
    # small hsave -> save-all wins on speed
    assert resolve_strategy("auto", (2, 160_000, 64), 9, dil, 2) == "save"
    # huge hsave (> 1 GiB) -> recompute
    assert resolve_strategy("auto", (16, 160_000, 64), 9, dil, 2) == \
        "recompute"
    # explicit requests are honored / validated
    assert resolve_strategy("save", (2, 512, 16), 3, (1, 256, 512), 4) \
        == "save"
    with pytest.raises(ValueError, match="inside one tile"):
        resolve_strategy("recompute", (2, 1024, 16), 3, (1, 256, 512), 4)
    with pytest.raises(ValueError, match="unknown"):
        resolve_strategy("fastest", (2, 512, 16), 3, dil, 4)


def test_pick_stack_tile_env_override(monkeypatch):
    """MOVENET_STACK_TILE prepends a candidate but never bypasses the
    divisibility / dilation constraints (stack_kernel.pick_stack_tile)."""
    from movenet_tpu.ops.pallas.stack_kernel import pick_stack_tile

    dil = (1, 2, 4) * 3
    assert pick_stack_tile(160_000, dil) == 1600  # measured default
    monkeypatch.setenv("MOVENET_STACK_TILE", "2000")
    assert pick_stack_tile(160_000, dil) == 2000
    # invalid override (does not divide T) falls through to the default
    monkeypatch.setenv("MOVENET_STACK_TILE", "3000")
    assert pick_stack_tile(160_000, dil) == 1600
    # override must still satisfy the dilation constraint
    # (320 divides 1600 and is %8, but 512 neither fits inside nor
    # divides evenly across a 320-tile)
    monkeypatch.setenv("MOVENET_STACK_TILE", "320")
    assert pick_stack_tile(1600, (1, 256, 512)) == 1600


def test_pick_stack_tile_ctx_constraint(monkeypatch):
    """With ctx=True the in-kernel projection backward's coarse block
    is (tile/10, C): prefer %80 tiles or Mosaic rejects the block shape
    (observed on-chip at tile=1000 -> 100 rows, 2026-08-19); fall back
    to the unconstrained pick when no %80 tile divides T (the caller
    then keeps the projection out of the kernel)."""
    from movenet_tpu.ops.pallas.stack_kernel import pick_stack_tile

    dil = (1, 2, 4) * 3
    monkeypatch.setenv("MOVENET_STACK_TILE", "1000")
    assert pick_stack_tile(160_000, dil) == 1000          # audio-only ok
    assert pick_stack_tile(160_000, dil, ctx=True) == 1600  # %80 preferred
    monkeypatch.setenv("MOVENET_STACK_TILE", "1600")
    assert pick_stack_tile(160_000, dil, ctx=True) == 1600
    monkeypatch.delenv("MOVENET_STACK_TILE")
    # no %80 tile divides 512: soft fallback keeps small ctx configs
    # working (proj is separately disabled by _ctx_proj_tile_ok)
    assert pick_stack_tile(512, (1, 2, 4, 1, 2, 4), ctx=True) == 512


def test_ctx_proj_tile_ok_requires_mod80(monkeypatch):
    from movenet_tpu.models.fused import _ctx_proj_tile_ok
    from movenet_tpu.models.wavenet import WaveNet

    model = WaveNet(layer_size=3, stack_size=2, input_channels=256,
                    residual_channels=8, skip_channels=8)
    assert _ctx_proj_tile_ok(model, 160_000)      # tile 1600, %80 ok
    monkeypatch.setenv("MOVENET_STACK_TILE", "1000")
    # override forces a non-%80 preference: pick falls back to 1600 for
    # ctx=True so proj stays ON via the fallback tile
    assert _ctx_proj_tile_ok(model, 160_000)
    # T where only non-%80 tiles divide: proj must disable itself
    assert not _ctx_proj_tile_ok(model, 512)
