#!/usr/bin/env python3
"""Serial training entry point (reference main.py equivalent).

Usage: python main.py configs/uncertainty.yml da-vinci [flags]
"""

from uncertainty_model_tpu.cli.main import build_parser, main

if __name__ == "__main__":
    main(build_parser().parse_args())
