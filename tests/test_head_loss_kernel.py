"""Fused head+loss kernel vs the XLA formulation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.ops.pallas.head_loss import fused_head_loss


def _reference(skip_sum, codes, w1, b1, w2, b2, rf, parity):
    act = jnp.where(skip_sum > 0, skip_sum, 0.01 * skip_sum)
    y = jnp.einsum("bts,sc->btc", act, w1,
                   precision=jax.lax.Precision.HIGHEST) + b1
    ly = jnp.where(y > 0, y, 0.01 * y)
    z = jnp.einsum("btc,cd->btd", ly, w2,
                   precision=jax.lax.Precision.HIGHEST) + b2
    z = z[:, rf - 1:-1, :]
    tgt = codes[:, rf:][..., None]
    if parity:
        p = jax.nn.softmax(z, axis=-1)
        nll = jax.nn.logsumexp(p, -1, keepdims=True) \
            - jnp.take_along_axis(p, tgt, -1)
    else:
        nll = jax.nn.logsumexp(z, -1, keepdims=True) \
            - jnp.take_along_axis(z, tgt, -1)
    match = (z.argmax(-1)[..., None] == tgt).astype(jnp.float32)
    return jnp.sum(nll), jnp.sum(match)


def _make(rng, b=2, t=512, s=16, c=32):
    skip = jnp.asarray(rng.standard_normal((b, t, s)) * 0.5, jnp.float32)
    codes = jnp.asarray(rng.integers(0, c, size=(b, t)), jnp.int32)
    w1 = jnp.asarray(rng.standard_normal((s, c)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    # targets_tb[t] = codes[t+1]; last row junk (masked)
    tgt_tb = jnp.roll(codes, -1, axis=1).T
    return skip, codes, tgt_tb, w1, b1, w2, b2


@pytest.mark.parametrize("parity", [True, False])
def test_fused_head_loss_forward(parity):
    rng = np.random.default_rng(0)
    skip, codes, tgt_tb, w1, b1, w2, b2 = _make(rng)
    rf = 24
    loss, match = fused_head_loss(skip, tgt_tb, w1, b1, w2, b2, rf,
                                  parity, True)
    want_l, want_m = _reference(skip, codes, w1, b1, w2, b2, rf, parity)
    np.testing.assert_allclose(float(loss), float(want_l), rtol=2e-5)
    assert float(match) == float(want_m)


@pytest.mark.parametrize("parity", [True, False])
def test_fused_head_loss_grads(parity):
    rng = np.random.default_rng(1)
    skip, codes, tgt_tb, w1, b1, w2, b2 = _make(rng)
    rf = 24
    n_valid = skip.shape[0] * (skip.shape[1] - rf)

    def loss_f(skip, w1, b1, w2, b2):
        l, _ = fused_head_loss(skip, tgt_tb, w1, b1, w2, b2, rf,
                               parity, True)
        return l / n_valid

    def loss_r(skip, w1, b1, w2, b2):
        l, _ = _reference(skip, codes, w1, b1, w2, b2, rf, parity)
        return l / n_valid

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(skip, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(skip, w1, b1, w2, b2)
    for a, b_, name in zip(gf, gr, ["skip", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch: {name} (parity={parity})")


@pytest.mark.parametrize("parity", [True, False])
def test_fused_head_loss_packed_path(parity, monkeypatch):
    """The two-positions-per-row packed kernels (default OFF —
    measured slower once segment sums are exact; see
    head_loss.PACKED_HEAD) must still match the XLA reference in
    values and all grads."""
    import movenet_tpu.ops.pallas.head_loss as hl

    monkeypatch.setattr(hl, "PACKED_HEAD", True)
    rng = np.random.default_rng(2)
    skip, codes, tgt_tb, w1, b1, w2, b2 = _make(rng, b=2, t=512,
                                                s=64, c=64)
    assert hl._use_packed(512, 64, 64)
    rf = 24
    loss, match = fused_head_loss(skip, tgt_tb, w1, b1, w2, b2, rf,
                                  parity, True)
    want_l, want_m = _reference(skip, codes, w1, b1, w2, b2, rf, parity)
    np.testing.assert_allclose(float(loss), float(want_l), rtol=2e-5)
    assert float(match) == float(want_m)

    n_valid = skip.shape[0] * (skip.shape[1] - rf)

    def loss_f(skip, w1, b1, w2, b2):
        l, _ = fused_head_loss(skip, tgt_tb, w1, b1, w2, b2, rf,
                               parity, True)
        return l / n_valid

    def loss_r(skip, w1, b1, w2, b2):
        l, _ = _reference(skip, codes, w1, b1, w2, b2, rf, parity)
        return l / n_valid

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(skip, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(skip, w1, b1, w2, b2)
    for a, b_, name in zip(gf, gr, ["skip", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-6,
            err_msg=f"packed grad mismatch: {name} (parity={parity})")
