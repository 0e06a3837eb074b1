"""Training CLI. Mirrors the reference `train.py:382-421` flag surface."""

import sys
from argparse import ArgumentParser

from gsjax.config import (ModelParams, OptimizationParams, PipelineParams,
                          dump_cfg_args)


def main():
    parser = ArgumentParser(description="gsjax training")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7000, 30000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[15000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_iter", type=int, default=0,
                        help="jax.profiler-trace 5 steps starting here "
                             "(writes <model_path>/profile)")
    parser.add_argument("--pair_capacity_init", type=int, default=0,
                        help="pre-size the pair buffer (pow2-rounded) so "
                             "densification growth doesn't trigger "
                             "mid-training recompiles; 0 = grow on demand")
    parser.add_argument("--n_devices", type=int, default=1,
                        help="shard tiles over this many devices "
                             "(1 = single-device step, <=0 = all devices)")
    parser.add_argument("--dist_coordinator", type=str, default="",
                        help="host0 addr:port for multi-host jax.distributed")
    parser.add_argument("--dist_num_processes", type=int, default=1)
    parser.add_argument("--dist_process_id", type=int, default=0)
    parser.add_argument("--dist_auto", action="store_true", default=False,
                        help="jax.distributed.initialize() with TPU-env "
                             "auto-detection (Cloud TPU VMs)")
    args = parser.parse_args(sys.argv[1:])
    args.save_iterations.append(args.iterations)
    args.test_iterations.append(args.iterations)

    lpe, ope, ppe = lp.extract(args), op.extract(args), pp.extract(args)
    print("Optimizing " + lpe.model_path)
    dump_cfg_args(lpe.model_path, args)

    import random

    import numpy as np
    random.seed(args.seed)
    np.random.seed(args.seed)

    from gsjax.train.loop import run_training
    run_training(lpe, ope, ppe, args)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
