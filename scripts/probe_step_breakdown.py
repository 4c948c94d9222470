"""Component-timing breakdown of the breakdancing train step on TPU.

Times each stage of the fused training pipeline in isolation (all
outputs reduced to scalars inside jit; 32-rep amortized, state-chained
where applicable) to locate the remaining ms between the measured step
time and the roofline.  See BENCH_NOTES.md for the measurement
protocol this follows.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=32):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + full sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    sys.path.insert(0, "/root/repo")
    import bench

    model, cfg, state, batch = bench._breakdancing_setup()
    from movenet_tpu.models.fused import (
        _fused_trunk, _prepare_trunk, fused_train_loss)
    from movenet_tpu.ops.pallas.head_loss import fused_head_loss
    from movenet_tpu.train import make_train_step

    params = state.params
    codes, video = batch.codes, batch.video
    rf = model.receptive_fields

    # 1. full step
    step = jax.jit(make_train_step(model, cfg))
    ms_step = timed(lambda s: step(s, batch)[0], state)
    print(f"full train step:        {ms_step:7.3f} ms")

    # 2. loss fwd+bwd (tree grads, no optimizer)
    def loss_fn(p):
        loss, acc = fused_train_loss(model, p, codes, video, None,
                                     parity=True)
        return loss

    vg = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))

    def vg_scalar(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        gn = sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))
        return l + gn

    ms_loss = timed(jax.jit(vg_scalar), params)
    print(f"loss fwd+bwd:           {ms_loss:7.3f} ms")

    # 3. loss fwd only
    ms_loss_f = timed(jax.jit(loss_fn), params)
    print(f"loss fwd only:          {ms_loss_f:7.3f} ms")

    # 4. trunk fwd only (embed-folded whole-stack kernel)
    def trunk_f(p):
        return jnp.sum(_fused_trunk(model, p, codes, video, None,
                                    False).astype(jnp.float32))

    ms_trunk_f = timed(jax.jit(trunk_f), params)
    print(f"trunk fwd only:         {ms_trunk_f:7.3f} ms")

    # 5. trunk fwd+bwd
    def trunk_vg(p):
        l, g = jax.value_and_grad(trunk_f)(p)
        return l + sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))

    ms_trunk = timed(jax.jit(trunk_vg), params)
    print(f"trunk fwd+bwd:          {ms_trunk:7.3f} ms")

    # 6. head/CE fwd+bwd on a fixed skip_sum
    skip_sum = jax.jit(lambda p: _fused_trunk(
        model, p, codes, video, None, False))(params)
    skip_sum = jax.block_until_ready(skip_sum)
    targets_tb = jnp.roll(codes, -1, axis=1).T

    def head_vg(sk, hp):
        def f(sk, hp):
            loss_sum, match = fused_head_loss(
                sk, targets_tb, hp["head1"]["kernel"],
                hp["head1"]["bias"], hp["head2"]["kernel"],
                hp["head2"]["bias"], rf, True, False)
            return loss_sum
        l, (gsk, ghp) = jax.value_and_grad(f, argnums=(0, 1))(sk, hp)
        return l + jnp.sum(gsk.astype(jnp.float32) ** 2) + \
            sum(jnp.vdot(x, x) for x in jax.tree.leaves(ghp))

    hp = {"head1": params["head1"], "head2": params["head2"]}
    ms_head = timed(jax.jit(head_vg), skip_sum, hp)
    print(f"head/CE fwd+bwd:        {ms_head:7.3f} ms")

    # 7. video encoder fwd+bwd (ctx production)
    from movenet_tpu.models.wavenet import WaveNet

    def enc_vg(p):
        def f(p):
            ctx = model.apply({"params": p}, video,
                              method=WaveNet.encode_video)
            return jnp.sum(ctx.astype(jnp.float32))
        l, g = jax.value_and_grad(f)(p)
        return l + sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))

    ms_enc = timed(jax.jit(enc_vg), params)
    print(f"video encoder fwd+bwd:  {ms_enc:7.3f} ms")

    # 8. weight prepare (stacking/concat) fwd only
    def prep(p):
        h, ctx, stacked, _ = _prepare_trunk(model, p, codes, None,
                                            None, want_h=False)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in stacked)

    ms_prep = timed(jax.jit(prep), params)
    print(f"weight prep fwd (no video): {ms_prep:7.3f} ms")

    print("\nderived:")
    print(f"  optimizer+ravel (step - loss vg):   {ms_step - ms_loss:7.3f} ms")
    print(f"  trunk bwd (vg - fwd):               {ms_trunk - ms_trunk_f:7.3f} ms")
    print(f"  loss-vs-parts gap (loss - trunkvg - head - enc): "
          f"{ms_loss - ms_trunk - ms_head:7.3f} ms (enc counted inside trunk)")


if __name__ == "__main__":
    main()
