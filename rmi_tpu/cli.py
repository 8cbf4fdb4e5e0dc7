"""Command-line driver mirroring the reference CLI (src/main.rs:36-102).

    python -m rmi_tpu <input> [namespace] [models] [branching_factor]
        [--no-code] [--no-errors] [--bounded LINE] [--max-size BYTES]
        [--optimize FILE] [--param-grid FILE] [--data-path DIR]
        [--threads N] [--zero-build-time] [--disable-parallel-training]
        [--dump-ll-model-data IDX] [--dump-ll-errors] [--stats-file F]

Every reference flag is accepted; --stats-file / --dump-ll-errors /
--dump-ll-model-data are declared-but-unimplemented upstream
(src/main.rs:55-66 with no consumer) and are ACTUALLY implemented here.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

log = logging.getLogger("rmi_tpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rmi_tpu", description="Learns recursive model indexes on TPU")
    p.add_argument("input", help="Path to input file containing data")
    p.add_argument("namespace", nargs="?",
                   help="Namespace to use in generated code")
    p.add_argument("models", nargs="?",
                   help="Comma-separated model layers, e.g. linear,linear")
    p.add_argument("branching_factor", nargs="?", type=int,
                   help="Branching factor between model levels")
    p.add_argument("--no-code", action="store_true",
                   help="Skip code generation")
    p.add_argument("--dump-ll-model-data", metavar="model_index", type=int,
                   help="dump the data used to train the last-level model "
                        "at index")
    p.add_argument("--dump-ll-errors", action="store_true",
                   help="dump per-leaf errors to ll_errors.json")
    p.add_argument("--stats-file", "-s", metavar="file",
                   help="dump statistics about the learned model")
    p.add_argument("--param-grid", metavar="file",
                   help="train RMIs specified in the JSON file")
    p.add_argument("--data-path", "-d", metavar="dir", default="rmi_data",
                   help="export parameters to this directory")
    p.add_argument("--no-errors", action="store_true",
                   help="do not save last-level errors; changes the "
                        "lookup signature")
    p.add_argument("--threads", "-t", type=int, default=4,
                   help="host thread count (kept for CLI parity; device "
                        "builds are single-stream)")
    p.add_argument("--bounded", metavar="line_size", type=int,
                   help="error-bounded RMI via cachefix for the line size")
    p.add_argument("--max-size", metavar="BYTES", type=int,
                   help="optimizer-driven size-bounded RMI")
    p.add_argument("--disable-parallel-training", action="store_true",
                   help="train --param-grid configs one at a time "
                        "instead of dispatching the whole grid across "
                        "the device pool (main.rs:241-248)")
    p.add_argument("--zero-build-time", action="store_true",
                   help="zero the build-time field in artifacts")
    p.add_argument("--optimize", metavar="file",
                   help="search Pareto-efficient configs; write JSON")
    return p


def _result_json(trained, num_rows, namespace):
    from rmi_tpu.serialize import rmi_size
    # src/main.rs:207-221
    return {
        "layers": trained.models,
        "branching factor": trained.branching_factor,
        "average error": trained.model_avg_error,
        "average error %": trained.model_max_error / num_rows * 100.0,
        "average l2 error": trained.model_avg_l2_error,
        "average log2 error": trained.model_avg_log2_error,
        "max error": trained.model_max_error,
        "max error %": trained.model_max_error / num_rows * 100.0,
        "max log2 error": trained.model_max_log2_error,
        "size binary search": rmi_size(trained),
        "namespace": namespace,
    }


def main(argv=None) -> int:
    logging.basicConfig(
        # RMI_LOG is a Python logging level name (DEBUG/INFO/...);
        # accept "1" as a convenience alias for DEBUG.
        level={"1": "DEBUG", "0": "WARNING"}.get(
            os.environ.get("RMI_LOG", "INFO"),
            os.environ.get("RMI_LOG", "INFO")).upper(),
        format="%(levelname)s %(name)s: %(message)s")
    args = build_parser().parse_args(argv)

    from rmi_tpu import (load_data, train, train_bounded, train_for_size,
                         output_rmi, find_pareto_efficient_configs)
    from rmi_tpu.optimizer import display_table
    from rmi_tpu.serialize import rmi_size

    if args.namespace and args.param_grid:
        log.error("Can only specify one of namespace or param-grid")
        return 1

    log.info("Reading %s...", args.input)
    data = load_data(args.input)
    num_rows = data.n

    if args.optimize:
        done = [0]

        def progress(stat):
            done[0] += 1
            log.info("measured %-24s B=%-8d avg_log2=%.4f  (%d done)",
                     stat.models, stat.branching_factor,
                     stat.average_log2_error, done[0])

        results = find_pareto_efficient_configs(data, 10,
                                                progress=progress)
        print(display_table(results))
        prefix = args.namespace or os.path.basename(args.input)
        specs = [r.to_grid_spec(f"{prefix}_{i}")
                 for i, r in enumerate(results)]
        with open(args.optimize, "w") as f:
            json.dump({"configs": specs}, f)
        return 0

    os.makedirs(args.data_path, exist_ok=True)

    if args.param_grid:
        with open(args.param_grid) as f:
            grid = json.load(f)["configs"]
        to_test = [(c["layers"], int(c["branching factor"]),
                    c.get("namespace")) for c in grid]
        log.info("# RMIs to train: %d", len(to_test))
        if args.disable_parallel_training:
            # forced-sequential path (src/main.rs:241-248's seq branch):
            # one fully synchronized build at a time
            trained_all = []
            for i, (models, bf, ns) in enumerate(to_test):
                log.info("[%d/%d] training %s %d", i + 1, len(to_test),
                         models, bf)
                trained_all.append(train(data, models, bf))
        else:
            # par_iter analogue (main.rs:241-248): dispatch every build
            # round-robin over the device pool, sync the host once
            from rmi_tpu.parallel.sweep import parallel_train_grid
            done = [0]

            def _progress(res):
                done[0] += 1
                log.info("[%d/%d] trained %s %d", done[0], len(to_test),
                         res.models, res.branching_factor)

            trained_all = parallel_train_grid(
                data, [(m, bf) for m, bf, _ in to_test],
                progress=_progress)
        results = []
        for trained, (models, bf, ns) in zip(trained_all, to_test):
            if args.zero_build_time:
                trained.build_time = 0
            results.append(_result_json(trained, num_rows, ns))
            if ns is not None:
                output_rmi(ns, trained, data_dir=args.data_path,
                           include_errors=True,
                           emit_cpp=not args.no_code)
        with open(f"{args.param_grid}_results", "w") as f:
            json.dump({"results": results}, f)
        return 0

    if not args.namespace:
        log.error("Must specify either a namespace or a parameter grid.")
        return 1

    if args.max_size is not None:
        log.info("Constructing RMI with size less than %d", args.max_size)
        trained = train_for_size(data, args.max_size)
    else:
        if not args.models or args.branching_factor is None:
            log.error("namespace mode needs models and branching factor")
            return 1
        if args.bounded is not None:
            trained = train_bounded(data, args.models,
                                    args.branching_factor, args.bounded)
        else:
            trained = train(data, args.models, args.branching_factor)

    log.info("Model build time: %d ms", trained.build_time // 1_000_000)
    log.info("Average model error: %s (%s%%)", trained.model_avg_error,
             trained.model_avg_error / num_rows * 100.0)
    log.info("Average model L2 error: %s", trained.model_avg_l2_error)
    log.info("Average model log2 error: %s", trained.model_avg_log2_error)
    log.info("Max model log2 error: %s", trained.model_max_log2_error)
    log.info("Max model error on model %d: %d (%s%%)",
             trained.model_max_error_idx, trained.model_max_error,
             trained.model_max_error / num_rows * 100.0)

    if args.stats_file:
        with open(args.stats_file, "w") as f:
            json.dump(_result_json(trained, num_rows, args.namespace), f,
                      indent=1)

    if args.dump_ll_errors and trained.leaf_errors is not None:
        with open("ll_errors.json", "w") as f:
            json.dump({"errors":
                       np.asarray(trained.leaf_errors).tolist()}, f)

    if args.dump_ll_model_data is not None:
        # dump the (key, position) pairs routed to one leaf model
        from rmi_tpu.train.two_layer import predict_top_assignment
        from rmi_tpu.models import get_model
        from rmi_tpu import keys as keymod
        mtop = get_model(trained.top_type)
        xraw = keymod.as_float(data.keys)
        xn = (xraw - trained.norm_offset) * trained.norm_scale
        top_p = trained.device_top_params or trained.top_params
        t = predict_top_assignment(mtop, top_p, data.keys, xn, xraw,
                                   trained.branching_factor - 1)
        mask = np.asarray(t) == args.dump_ll_model_data
        ks = np.asarray(data.keys)[mask]
        ys = np.asarray(data.positions)[mask]
        with open(f"ll_model_data_{args.dump_ll_model_data}.json", "w") as f:
            json.dump({"keys": ks.tolist(), "positions": ys.tolist()}, f)

    if args.zero_build_time:
        trained.build_time = 0

    if not args.no_code:
        output_rmi(args.namespace, trained, data_dir=args.data_path,
                   include_errors=not args.no_errors)
    else:
        log.debug("Skipping code generation due to CLI flag")
    return 0


if __name__ == "__main__":
    sys.exit(main())
