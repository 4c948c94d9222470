"""Cross-stack NLL parity: our model vs the actual PyTorch reference.

BASELINE.json's parity contract is "match reference NLL / loss curves".
This test loads IDENTICAL weights into /root/reference's torch WaveNet
and into movenet_tpu's flax WaveNet, feeds both the same mu-law batch,
and compares (a) forward outputs and (b) full Adam training loss
trajectories step-for-step.

Weight mapping (matmul form <-> torch Conv1d(k=2), weight (out,in,k),
left-pad causal so tap k=1 is "current", k=0 is "past"):
    front_cur/front_past    <-> causal_conv.conv.weight[:,:,1]/[:,:,0]
    w_cur[:, :R]/[:, R:]    <-> conv_filter/conv_gate weight k=1
    w_past[:, :R]/[:, R:]   <-> conv_filter/conv_gate weight k=0
    residual_proj, skip_proj, head1, head2 <-> 1x1 convs (transposed)

Skipped when the reference checkout is not present.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "movenet" / "wavenet.py").exists(),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_wavenet_cls():
    # torchtyping is not installed; the reference only uses it for
    # annotations, so a minimal stand-in suffices
    if "torchtyping" not in sys.modules:
        shim = types.ModuleType("torchtyping")

        class TensorType:
            def __class_getitem__(cls, item):
                return cls

        shim.TensorType = TensorType
        sys.modules["torchtyping"] = shim
    sys.path.insert(0, str(REF))
    from movenet.wavenet import WaveNet as RefWaveNet

    return RefWaveNet


def _build_ours(layer, stack, c, r, s):
    import jax
    import jax.numpy as jnp

    from movenet_tpu.models.wavenet import WaveNet

    model = WaveNet(layer_size=layer, stack_size=stack,
                    input_channels=c, residual_channels=r,
                    skip_channels=s, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64), jnp.int32))
    return model, variables


def _port_params_to_torch(ref_model, params):
    import torch

    def t(x):
        return torch.tensor(np.asarray(x, np.float64).astype(np.float32))

    with torch.no_grad():
        cc = ref_model.causal_conv.conv
        cc.weight[:, :, 1] = t(params["front_cur"]).T
        cc.weight[:, :, 0] = t(params["front_past"]).T
        r = params["front_cur"].shape[1]
        from movenet_tpu.models.wavenet import block_param_view
        for i, blk in enumerate(ref_model.residual_conv_stack.conv_layers):
            p = block_param_view(params, i)
            w_cur, w_past = np.asarray(p["w_cur"]), np.asarray(p["w_past"])
            blk.conv_filter.conv.weight[:, :, 1] = t(w_cur[:, :r]).T
            blk.conv_filter.conv.weight[:, :, 0] = t(w_past[:, :r]).T
            blk.conv_gate.conv.weight[:, :, 1] = t(w_cur[:, r:]).T
            blk.conv_gate.conv.weight[:, :, 0] = t(w_past[:, r:]).T
            blk.conv_residual.weight[:, :, 0] = \
                t(p["residual_proj"]["kernel"]).T
            blk.conv_residual.bias[:] = t(p["residual_proj"]["bias"])
            blk.conv_skip.weight[:, :, 0] = t(p["skip_proj"]["kernel"]).T
            blk.conv_skip.bias[:] = t(p["skip_proj"]["bias"])
        ref_model.dense_conv.conv1.weight[:, :, 0] = \
            t(params["head1"]["kernel"]).T
        ref_model.dense_conv.conv1.bias[:] = t(params["head1"]["bias"])
        ref_model.dense_conv.conv2.weight[:, :, 0] = \
            t(params["head2"]["kernel"]).T
        ref_model.dense_conv.conv2.bias[:] = t(params["head2"]["bias"])


def _sine_codes(c, t, batch):
    from movenet_tpu.ops import mu_law_encode
    import jax.numpy as jnp

    wave = jnp.asarray(np.sin(np.arange(0, t / 10.0, 0.1))[:t],
                       jnp.float32)
    q = mu_law_encode(wave, c)
    return np.tile(np.asarray(q)[None], (batch, 1))


def test_forward_outputs_match_reference(ref_wavenet_cls):
    import torch

    layer, stack, c, r, s = 3, 2, 64, 16, 16
    model, variables = _build_ours(layer, stack, c, r, s)

    ref = ref_wavenet_cls(layer_size=layer, stack_size=stack,
                          input_channels=c, residual_channels=r,
                          skip_channels=s)
    ref.eval()
    _port_params_to_torch(ref, variables["params"])

    codes = _sine_codes(c, 400, 2)
    onehot = np.eye(c, dtype=np.float32)[codes]          # (B, T, C)

    # ours: softmax output, remove_last (the reference defaults)
    import jax.numpy as jnp

    ours = np.asarray(model.apply(variables,
                                  jnp.asarray(codes, jnp.int32)))
    with torch.no_grad():
        theirs = ref(torch.tensor(onehot.transpose(0, 2, 1))).numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_training_loss_curves_match_reference(ref_wavenet_cls):
    """50 Adam steps, identical weights/batch: the NLL trajectories of
    the two stacks must coincide (the BASELINE 'match NLL' contract)."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp
    import optax

    from movenet_tpu.config import ModelConfig, TrainingConfig
    from movenet_tpu.train import create_train_state, make_optimizer, \
        make_train_step
    from movenet_tpu.train.loop import Batch

    layer, stack, c, r, s = 3, 2, 64, 16, 16
    lr = 1e-3
    model, variables = _build_ours(layer, stack, c, r, s)

    ref = ref_wavenet_cls(layer_size=layer, stack_size=stack,
                          input_channels=c, residual_channels=r,
                          skip_channels=s)
    _port_params_to_torch(ref, variables["params"])

    codes = _sine_codes(c, 400, 2)
    onehot = torch.tensor(
        np.eye(c, dtype=np.float32)[codes].transpose(0, 2, 1))
    rf = model.receptive_fields
    target_t = torch.tensor(codes[:, rf:], dtype=torch.long)

    # --- torch: the reference's exact training step (trainer.py:112-129)
    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    ref_losses = []
    for _ in range(50):
        opt.zero_grad()
        out = ref(onehot)                       # softmax output
        loss = F.cross_entropy(out, target_t)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # --- ours: the canonical train step in parity mode
    cfg = TrainingConfig(
        model_config=ModelConfig(
            layer_size=layer, stack_size=stack, input_channels=c,
            residual_channels=r, skip_channels=s,
            compute_dtype="float32", parity_softmax_output=True),
        optimizer="Adam", learning_rate=lr, scheduler=None,
        gradient_clipping=0.0)
    state = create_train_state(model, cfg, make_optimizer(cfg),
                               jax.random.PRNGKey(1),
                               Batch(codes=codes))
    state = state.replace(params=variables["params"])
    step = jax.jit(make_train_step(model, cfg))
    our_losses = []
    for _ in range(50):
        state, m = step(state, Batch(codes=jnp.asarray(codes)))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3,
                               atol=2e-4)
    # and the curves actually went somewhere (both trained)
    assert our_losses[-1] < our_losses[0]
