#!/usr/bin/env python3
"""Data-parallel training entry point (reference parallel_main.py equivalent).

Single host: identical to main.py (the batch is always sharded over all
local devices).  Multi-host: launch once per host with --coordinator-address,
--num-processes and --process-id.
"""

from uncertainty_model_tpu.cli.parallel_main import build_parallel_parser, main

if __name__ == "__main__":
    main(build_parallel_parser().parse_args())
