"""Training CLI.

    python -m movenet_tpu.train.cli --dataset /path/to/kinetics ...

Flag surface mirrors the reference's (movenet/config.py:149-240 — the
entry README names `python movenet/pytorch_lightning_trainer.py`), plus
TPU-native flags (--mesh_data/--mesh_seq, --compute_dtype, --remat).
"""

from __future__ import annotations

import logging

from movenet_tpu.config import arg_parser, config_from_args


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s: %(levelname)s: %(name)s: %(message)s")
    parser = arg_parser()
    args = parser.parse_args(argv)
    if not args.dataset:
        parser.error("--dataset is required")
    config = config_from_args(args)

    from movenet_tpu.train.trainer import train_model

    return train_model(args.dataset, config)


if __name__ == "__main__":
    main()
