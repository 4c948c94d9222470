"""Standalone generation CLI: checkpoint -> audio.

    python -m movenet_tpu.generate --checkpoint <run_dir> \
        --dataset /path/to/kinetics --n_samples 160000 \
        --temperature 1.0 --out generated/

The reference could only generate inside a training run
(trainer.py:369-384, pytorch_lightning_trainer.py:36-50); this is the
missing inference surface: load params from an orbax run directory
(plus its config.json snapshot), take prompts from validation clips (or
silence), and synthesize waveforms with the fastest applicable sampler:

  * batch 1, no video  -> Pallas VMEM kernel
  * otherwise          -> lax.scan cached sampler
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def load_checkpoint_model(checkpoint_dir: Path, batch_size: int = 1):
    """Restore (model, config, variables) from an orbax run directory.

    The init template must mirror the TRAINING configuration — a
    checkpoint from a video-conditioned run carries video_encoder params
    even if the caller generates unconditioned — so the template batch
    is built from the run's config.json snapshot.
    """
    import jax

    from movenet_tpu.config import TrainingConfig
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.train import (
        create_train_state, make_optimizer, restore_checkpoint)
    from movenet_tpu.train.loop import Batch

    checkpoint_dir = Path(checkpoint_dir)
    config = TrainingConfig.load(checkpoint_dir / "config.json")
    mc = config.model_config
    model = make_wavenet(mc)
    rf = model.receptive_fields
    tmpl_video = None
    if config.use_video:
        tmpl_video = np.zeros(
            (batch_size, mc.max_video_frames, 64, 64, 1), np.float32)
    tmpl_labels = None
    if mc.global_classes and mc.global_classes > 0:
        tmpl_labels = np.zeros((batch_size,), np.int32)
    tmpl_t = mc.max_audio_frames if tmpl_video is not None else rf + 1
    state = create_train_state(
        model, config, make_optimizer(config, steps_per_epoch=1),
        jax.random.PRNGKey(0),
        Batch(codes=np.zeros((batch_size, tmpl_t), np.int32),
              video=tmpl_video, labels=tmpl_labels))
    state = restore_checkpoint(checkpoint_dir, state)
    logger.info("restored step-%d params from %s", int(state.step),
                checkpoint_dir)
    return model, config, {"params": state.params}, int(state.step)


def generate_from_checkpoint(
    checkpoint_dir: Path,
    dataset_fp: str = None,
    n_samples: int = None,
    temperature: float = 1.0,
    batch_size: int = 1,
    use_video: bool = None,
    out_dir: Path = Path("generated"),
    seed: int = 0,
    parity_sampling: bool = True,
    fast: bool = True,
    speculative: bool = False,
    spec_order: int = 3,
    spec_depth: int = 1,
):
    import jax
    import jax.numpy as jnp

    from movenet_tpu.models.sampler import fast_generate
    from movenet_tpu.ops.pallas.ar_sampler import pallas_generate
    from movenet_tpu.utils.samples import export_samples

    checkpoint_dir = Path(checkpoint_dir)
    model, config, variables, step = load_checkpoint_model(
        checkpoint_dir, batch_size)
    mc = config.model_config
    if use_video is None:
        use_video = config.use_video
    rf = model.receptive_fields
    n = int(n_samples or config.generate_n_samples or mc.max_audio_frames)
    if n <= rf:
        raise ValueError(f"n_samples ({n}) must exceed the receptive "
                         f"field ({rf})")

    # prompts: validation clips when a dataset is given, else silence
    video = None
    labels = None
    if dataset_fp:
        from movenet_tpu.data.pipeline import get_dataloader

        loader = get_dataloader(
            dataset_fp, input_channels=mc.input_channels,
            batch_size=batch_size, train=False, use_video=use_video,
            shuffle=False, num_workers=2,
            max_audio_frames=mc.max_audio_frames,
            max_video_frames=mc.max_video_frames)
        batch = next(iter(loader.epoch(0)))
        prompt = jnp.asarray(batch.codes[:, :rf])
        if use_video and batch.video is not None:
            video = jnp.asarray(batch.video)
        if model.global_classes and batch.labels is not None:
            labels = jnp.asarray(batch.labels)
    else:
        from movenet_tpu.ops import mu_law_encode

        silent_code = int(np.asarray(
            mu_law_encode(jnp.zeros(1), mc.input_channels)[0]))
        prompt = jnp.full((batch_size, rf), silent_code, jnp.int32)

    t0 = time.perf_counter()
    # the Pallas kernel needs a real TPU (no CPU lowering outside
    # interpret mode); everywhere else the scan sampler is the fast path
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and prompt.shape[0] in (1, 2, 4, 8):
        # fast=True: short-critical-path weight products (default; see
        # ops/pallas/ar_sampler.stack_fast_weights) — ~1.3x throughput,
        # fp-reassociated (not bit-identical to the exact kernel).
        # speculative=True: B=1 greedy EXACT decoding with the
        # 2-steps-per-chain wavefront kernel (bit-identical output;
        # trained-model speedup scales with prompt predictability)
        spec_ok = (speculative and prompt.shape[0] == 1
                   and video is None)
        codes = pallas_generate(model, variables, prompt, n,
                                temperature=temperature, seed=seed,
                                video=video, labels=labels,
                                parity_sampling=parity_sampling,
                                fast=fast, speculative=spec_ok,
                                spec_order=spec_order,
                                spec_depth=spec_depth,
                                return_stats=spec_ok)
        if spec_ok:
            codes, hits = codes
            h, g = float(hits), n - rf
            # g - h is the iteration count at any spec_depth (each
            # iteration yields one real sample plus h committed
            # speculative ones overall), so g/(g-h) is the
            # steps-per-iteration multiplier — a percentage-style "hit
            # rate" is only well-defined at depth 1
            logger.info(
                "speculative decode: %d/%d samples from committed "
                "guesses (%.2fx steps/iteration)", int(h), g,
                g / max(1.0, g - h))
    else:
        codes = fast_generate(model, variables, prompt, n,
                              temperature=temperature,
                              rng=jax.random.PRNGKey(seed), video=video,
                              labels=labels,
                              parity_sampling=parity_sampling)
    codes = np.asarray(codes)
    dt = time.perf_counter() - t0
    n_new = (n - rf) * codes.shape[0]
    logger.info("sample generation took %.2f seconds "
                "(%.0f samples/sec incl compile)", dt, n_new / dt)

    model_rate = max(1, int(16_000 * mc.max_audio_frames / 160_000))
    written = export_samples(out_dir, step, "generate",
                             {"generated": codes, "prompt": codes[:, :rf]},
                             mc.input_channels, model_rate=model_rate)
    return written


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s: %(levelname)s: %(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", type=Path, required=True,
                    help="run directory containing checkpoints/ and "
                         "config.json")
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--n_samples", type=int, default=None)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--use_video", type=lambda x: bool(int(x)),
                    default=None)
    ap.add_argument("--parity_sampling", type=lambda x: bool(int(x)),
                    default=True)
    ap.add_argument("--fast_sampler", type=lambda x: bool(int(x)),
                    default=True,
                    help="short-critical-path kernel (1: default); "
                         "0 = bit-exact kernel")
    ap.add_argument("--speculative", type=lambda x: bool(int(x)),
                    default=False,
                    help="B=1 greedy only: speculative-wavefront EXACT "
                         "kernel (bit-identical output, hit-rate-"
                         "dependent speedup on trained models)")
    ap.add_argument("--spec_order", type=int, default=3,
                    choices=(2, 3),
                    help="speculative guesser order: 3 = learned "
                         "(C,C) pair table with 2-gram fallback "
                         "(default), 2 = learned successor column")
    ap.add_argument("--spec_depth", type=int, default=1,
                    choices=(1, 2),
                    help="speculative chains per iteration beyond the "
                         "real one (2 commits up to 3 samples/iter on "
                         "double hits; default 1)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=Path("generated"))
    args = ap.parse_args(argv)
    written = generate_from_checkpoint(
        args.checkpoint, args.dataset, args.n_samples, args.temperature,
        args.batch_size, args.use_video, args.out, args.seed,
        args.parity_sampling, fast=args.fast_sampler,
        speculative=args.speculative, spec_order=args.spec_order,
        spec_depth=args.spec_depth)
    for kind, paths in written.items():
        for p in paths:
            print(p)


if __name__ == "__main__":
    main()
