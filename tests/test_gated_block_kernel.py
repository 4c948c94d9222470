"""Fused gated-block kernel: forward equivalence and full gradient
equivalence against the unfused (einsum) formulation, interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.ops.pallas.gated_block import TILE, fused_gated_block


def _reference_block(h, ctx, b_fg, w_fg, w_out, b_out, d):
    """Unfused XLA formulation of the same packed-weight block."""
    r = h.shape[-1]
    shifted = jnp.pad(h, ((0, 0), (d, 0), (0, 0)))[:, : h.shape[1], :]
    parts = [h, shifted] + ([ctx] if ctx is not None else [])
    hp = jnp.concatenate(parts, axis=-1)
    fg = jnp.einsum("bti,io->bto", hp, w_fg,
                    precision=jax.lax.Precision.HIGHEST) \
        + b_fg[:, None, :]
    gated = jnp.tanh(fg[..., :r]) * jax.nn.sigmoid(fg[..., r:])
    out = jnp.einsum("btr,ro->bto", gated, w_out,
                     precision=jax.lax.Precision.HIGHEST) + b_out[None]
    return out[..., :r] + h, out[..., r:]


def _make(d, has_ctx, batch=2, n_tiles=3, r=16, s=16, seed=0):
    rng = np.random.default_rng(seed)
    t = n_tiles * TILE
    h = jnp.asarray(rng.standard_normal((batch, t, r)) * 0.3,
                    jnp.float32)
    ctx = None
    if has_ctx:
        ctx = jnp.asarray(rng.standard_normal((batch, t, r)) * 0.3,
                          jnp.float32)
    w_in = (3 if has_ctx else 2) * r
    w_fg = jnp.asarray(rng.standard_normal((w_in, 2 * r)) * 0.2,
                       jnp.float32)
    b_fg = jnp.asarray(rng.standard_normal((batch, 2 * r)) * 0.1,
                       jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((r, r + s)) * 0.2,
                        jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((1, r + s)) * 0.1,
                        jnp.float32)
    return h, ctx, b_fg, w_fg, w_out, b_out


@pytest.mark.parametrize("d", [1, 4, TILE, 2 * TILE])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_forward_matches_unfused(d, has_ctx):
    h, ctx, b_fg, w_fg, w_out, b_out = _make(d, has_ctx)
    res, skip = fused_gated_block(h, ctx, b_fg, w_fg, w_out, b_out, d,
                                  True)
    res_w, skip_w = _reference_block(h, ctx, b_fg, w_fg, w_out, b_out, d)
    np.testing.assert_allclose(np.asarray(res), np.asarray(res_w),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(skip_w),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("d", [1, 4, TILE, 2 * TILE])
@pytest.mark.parametrize("has_ctx", [False, True])
def test_gradients_match_unfused(d, has_ctx):
    h, ctx, b_fg, w_fg, w_out, b_out = _make(d, has_ctx, n_tiles=3)

    def loss_fused(h, ctx, b_fg, w_fg, w_out, b_out):
        res, skip = fused_gated_block(h, ctx, b_fg, w_fg, w_out, b_out,
                                      d, True)
        return jnp.sum(jnp.sin(res)) + jnp.sum(skip * skip)

    def loss_ref(h, ctx, b_fg, w_fg, w_out, b_out):
        res, skip = _reference_block(h, ctx, b_fg, w_fg, w_out, b_out, d)
        return jnp.sum(jnp.sin(res)) + jnp.sum(skip * skip)

    args = (h, ctx, b_fg, w_fg, w_out, b_out)
    argnums = (0, 2, 3, 4, 5) if not has_ctx else (0, 1, 2, 3, 4, 5)
    g_fused = jax.grad(loss_fused, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    for gf, gr, name in zip(
            g_fused, g_ref,
            ["h", "ctx", "b_fg", "w_fg", "w_out", "b_out"][:len(g_ref)]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name} (d={d}, ctx={has_ctx})")
