"""Train a PoseSplatter model.

Usage: python scripts/train.py <config.json> [--load] [--ablation]
       [--epochs N] [--max_batches N] [--batch_size B]

CLI parity with the reference trainer
(``/root/reference/scripts/training/train_script.py:240-247``), plus
``--batch_size`` for multi-frame (and multi-device data-parallel) steps.
"""

import argparse
import sys

sys.path.insert(0, ".")

from pose_splatter_tpu.config import Config
from pose_splatter_tpu.train.trainer import train_from_config


def main():
    parser = argparse.ArgumentParser(description="Train script for the model")
    parser.add_argument("config", type=str, help="Path to the config JSON file")
    parser.add_argument("--load", action="store_true",
                        help="Load a pre-trained model")
    parser.add_argument("--ablation", action="store_true",
                        help="Train the ablation model")
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    args = parser.parse_args()

    config = Config(args.config)
    print(f"Config file: {args.config}")
    print(f"Load flag: {args.load}")
    print(f"Ablation flag: {args.ablation}")
    print(f"Epochs: {args.epochs}")

    train_from_config(
        config,
        epochs=args.epochs,
        load=args.load,
        ablation=args.ablation,
        max_batches=args.max_batches,
        batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
