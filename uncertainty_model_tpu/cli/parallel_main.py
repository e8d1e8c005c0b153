"""Multi-host / multi-chip training CLI (reference parallel_main.py).

The reference spawns one NCCL process per GPU on a single node
(parallel_main.py:265-279) and rejects multi-node outright (:267-268).
The TPU-native replacement:

* Single host, many chips: the plain CLI already shards the batch over all
  local devices — nothing extra to do.
* Multi-host (a pod slice or multi-slice): launch this same script once per
  host; ``jax.distributed.initialize`` performs the rendezvous (the env://
  analogue of parallel_main.py:86-87), every host loads its shard of the
  data (the DistributedSampler analogue) and the jitted step runs one global
  program over the full mesh — gradients and BN stats reduce over ICI/DCN
  automatically.

Extra flags over the serial CLI::

    --coordinator-address host:port   rendezvous (like MASTER_ADDR/PORT)
    --num-processes N                 world size in hosts
    --process-id I                    this host's rank
    --init-seed S                     model init seed (same on all hosts)
"""

from __future__ import annotations

import argparse

from .main import build_parser, main as serial_main


def build_parallel_parser() -> argparse.ArgumentParser:
    parser = build_parser()
    parser.add_argument("--coordinator-address", default=None, type=str,
                        help="host:port of process 0 (multi-host only).")
    parser.add_argument("--num-processes", default=1, type=int)
    parser.add_argument("--process-id", default=0, type=int)
    parser.add_argument("--init-seed", default=0, type=int)
    parser.add_argument("--debug-distributed", action="store_true",
                        help="verbose rendezvous/compile/collective "
                             "diagnostics — the reference's "
                             "TORCH_DISTRIBUTED_DEBUG=DETAIL analogue "
                             "(parallel_main.py:80-81,275-277).")
    return parser


def main(args: argparse.Namespace) -> None:
    if getattr(args, "debug_distributed", False):
        import logging

        import jax

        logging.basicConfig(level=logging.INFO)
        for mod in ("jax._src.distributed", "jax._src.clusters",
                    "jax._src.compiler"):
            logging.getLogger(mod).setLevel(logging.DEBUG)
        # log every XLA compile with shapes/shardings — the most useful
        # signal when a multi-host program wedges or recompiles per step
        jax.config.update("jax_log_compiles", True)

    if args.num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    if args.process_id == 0:
        _print_live_processes()

    args.seed = args.init_seed
    serial_main(args)

    if args.num_processes > 1:
        # all hosts leave together: rank 0's saving tail (checkpoints,
        # comparison grids, results.json) can outlast the coordination
        # service's shutdown-barrier timeout if the other ranks exit first
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("end_of_run")


def _print_live_processes() -> None:
    """Rank-0 live python process listing (reference parallel_main.py:96-104)."""
    try:
        from datetime import datetime

        import psutil
    except ImportError:
        return

    print("Live Python Processes:")
    for p in psutil.process_iter():
        try:
            if "python" not in p.name():
                continue
            created = datetime.fromtimestamp(p.create_time()) \
                .strftime("%d-%m-%Y %H:%M:%S")
            print(f"\t- {p.name()} ({p.pid}) created {created}.")
        except (psutil.NoSuchProcess, psutil.AccessDenied):
            continue


if __name__ == "__main__":
    main(build_parallel_parser().parse_args())
