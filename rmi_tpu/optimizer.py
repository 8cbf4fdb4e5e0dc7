"""Pareto-front auto-tuner: the --optimize sweep (optimizer.rs:15-249).

Two-phase grid search over (top model, leaf model, branching factor):
phase 1 probes every model pair at a coarse set of branching factors;
phase 2 expands the full branching range for model pairs on the phase-1
Pareto front.  Dominance is on (size, avg_log2_error) with the
reference's exact tie rules (optimizer.rs:173-187); ``narrow_front``
keeps ``desired_size`` representatives by repeatedly dropping the less
accurate of the two closest-in-size configs (optimizer.rs:74-108).

Profiles come from RMI_OPTIMIZER_PROFILE in {fast, memory, disk}
(optimizer.rs:15-57).

Parallelism + compile strategy: the reference fans configs across
rayon threads (optimizer.rs:224).  Here the grid is measured by ONE
compiled B-generic program per (model pair, bucket) that sweeps every
branching factor on-device (grid_measure_rmis /
two_layer._metrics_grid_core), pairs fan out round-robin over the
device pool, and the host blocks once on a batched metrics fetch.
RMI_OPT_BUCKETED=0 falls back to one build per (pair, branching
factor).
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import List, Optional, Sequence, Tuple

from rmi_tpu.serialize import rmi_size


def _profile() -> Optional[str]:
    p = os.environ.get("RMI_OPTIMIZER_PROFILE")
    if p is not None and p not in ("fast", "memory", "disk"):
        raise ValueError(f"Invalid optimizer profile {p}")
    return p


def top_only_layers() -> List[str]:
    return {
        None: ["radix", "radix18", "radix22", "robust_linear"],
        "fast": ["robust_linear"],
        "memory": ["radix", "radix18", "radix22", "robust_linear"],
        "disk": ["radix", "radix18", "radix22", "robust_linear",
                 "normal", "lognormal", "loglinear"],
    }[_profile()]


def anywhere_layers() -> List[str]:
    return {
        None: ["linear", "cubic", "linear_spline"],
        "fast": ["linear", "cubic"],
        "memory": ["linear", "cubic", "linear_spline"],
        "disk": ["linear", "cubic", "linear_spline"],
    }[_profile()]


def branching_factors() -> List[int]:
    rng = {
        None: range(6, 25, 1),
        "fast": range(6, 25, 2),
        "memory": range(6, 25, 1),
        "disk": range(6, 28, 1),
    }[_profile()]
    return [2 ** i for i in rng]


@dataclasses.dataclass(frozen=True)
class RMIStatistics:
    """One measured configuration (optimizer.rs:153-160)."""
    models: str
    branching_factor: int
    average_log2_error: float
    max_log2_error: float
    size: int

    def dominated_by(self, other: "RMIStatistics") -> bool:
        # optimizer.rs:173-187
        if self.size < other.size:
            return False
        if self.average_log2_error < other.average_log2_error:
            return False
        if (self.size == other.size
                and self.average_log2_error <= other.average_log2_error):
            return False
        log2_diff = abs(self.average_log2_error - other.average_log2_error)
        if self.size <= other.size and log2_diff < sys.float_info.epsilon:
            return False
        return True

    def to_grid_spec(self, namespace: str) -> dict:
        # optimizer.rs:208-217
        return {
            "layers": self.models,
            "branching factor": self.branching_factor,
            "namespace": namespace,
            "size": self.size,
            "average log2 error": self.average_log2_error,
            "binary": True,
        }


def pareto_front(results: Sequence[RMIStatistics]) -> List[RMIStatistics]:
    return [r for r in results
            if not any(r.dominated_by(v) for v in results)]


def narrow_front(results: Sequence[RMIStatistics],
                 desired_size: int) -> List[RMIStatistics]:
    assert desired_size >= 2
    if len(results) <= desired_size:
        return list(results)
    tmp = sorted(results, key=lambda r: r.size)
    best = tmp.pop(0)
    while len(tmp) > desired_size - 1:
        gaps = [(i, i + 1, tmp[i + 1].size / tmp[i].size)
                for i in range(len(tmp) - 1)]
        i1, i2, _ = min(gaps, key=lambda g: g[2])
        if tmp[i1].average_log2_error > tmp[i2].average_log2_error:
            tmp.pop(i1)
        else:
            tmp.pop(i2)
    tmp.insert(0, best)
    return tmp


def first_phase_configs() -> List[Tuple[str, int]]:
    # optimizer.rs:110-125: every 5th branching factor
    out = []
    tops = top_only_layers() + anywhere_layers()
    for top in tops:
        for bottom in anywhere_layers():
            for bf in branching_factors()[::5]:
                out.append((f"{top},{bottom}", bf))
    return out


def second_phase_configs(first_phase: Sequence[RMIStatistics]
                         ) -> List[Tuple[str, int]]:
    qualifying = sorted({r.models for r in pareto_front(first_phase)})
    out = []
    for models in qualifying:
        for bf in branching_factors():
            if any(r.models == models and r.branching_factor == bf
                   for r in first_phase):
                continue
            out.append((models, bf))
    return out


def measure_rmis(data, configs: Sequence[Tuple[str, int]],
                 progress=None) -> List[RMIStatistics]:
    """Train + measure each configuration.  With more than one device
    available, configurations fan out across the device pool (the
    rayon-par_iter analogue, optimizer.rs:220-231)."""
    import jax

    if jax.device_count() > 1 and len(configs) > 1:
        from rmi_tpu.parallel.sweep import parallel_measure_rmis
        return parallel_measure_rmis(data, configs, progress=progress)

    from rmi_tpu.train.api import _fetch_host, train_async

    # dispatch-all-then-fetch even on one device: the device pipeline
    # runs build k while the host dispatches (or compiles) k+1, and the
    # (metrics, ovf) pairs come back in ONE transfer instead of
    # 2/config round trips (~30ms each over tunneled devices).
    pending = [train_async(data, models, bf) for models, bf in configs]
    fetched = _fetch_host([p.fetchable() for p in pending])

    out = []
    for p, h, (models, bf) in zip(pending, fetched, configs):
        res = p.result(prefetched=h)
        out.append(RMIStatistics(
            models=models, branching_factor=bf,
            average_log2_error=res.model_avg_log2_error,
            max_log2_error=res.model_max_log2_error,
            size=rmi_size(res)))
        if progress is not None:
            progress(out[-1])
    return out


# ---------------------------------------------------------------------------
# B-bucketed (compile-once) sweep
# ---------------------------------------------------------------------------

# Model families whose fits read the branching factor only through the
# pre-scaled targets / shapes, so ONE compiled program serves every
# branching factor (two_layer._metrics_grid_core).  bradix (chi^2 bin
# count) and histogram (bin count) consume B statically and are not in
# the optimizer grid anyway (optimizer.rs:16-57).
_B_GENERIC_TOPS = frozenset({
    "linear", "robust_linear", "loglinear", "linear_spline", "cubic",
    "normal", "lognormal", "radix", "radix8", "radix18", "radix22",
    "radix26", "radix28"})
_B_GENERIC_LEAVES = frozenset({
    "linear", "robust_linear", "loglinear", "linear_spline", "cubic",
    "normal", "lognormal"})

# Pad-bucket tiers: each grid program pads its [bucket]-sized arrays
# to the smallest tier covering its branching factors.  Two tiers keep
# the compile count at ~2 programs per (pair, phase) while confining
# the 2^24-scale spans/fits to the 2-3 largest grid points — the
# one-bucket-for-everything layout ran EVERY phase-2 point at 2^24
# scale and crashed the tunneled TPU worker mid-phase-2 at 25M keys.
# Tiers below 2^21 would not pay for their extra compiles: the n-scale
# key passes dominate the per-point cost once B << n.  Factors above
# the last tier (disk profile reaches 2^27) get their own next-pow2
# bucket.
_GRID_BUCKET_TIERS = (1 << 21, 1 << 24)


def bucket_for(bs: Sequence[int]) -> int:
    """The static pad bucket for a set of branching factors: the
    smallest tier >= max(bs), or the next power of two above the last
    tier."""
    m = max(int(b) for b in bs)
    for tier in _GRID_BUCKET_TIERS:
        if m <= tier:
            return tier
    return 1 << (m - 1).bit_length()


def _bucket_groups(bfs: Sequence[int]) -> List[Tuple[int, List[int]]]:
    groups: dict = {}
    for b in bfs:
        groups.setdefault(bucket_for([b]), []).append(b)
    return sorted(groups.items())


def grid_measurable(models: str) -> bool:
    top, leaf = models.split(",")
    return top in _B_GENERIC_TOPS and leaf in _B_GENERIC_LEAVES


# HBM capacity model for one grid program (the disk profile's giant
# branching factors, optimizer.rs:44-57 reach 2^27).  Measured on the
# 16GB chip at n=200M (probes/probe_disk_capacity.py): bucket 2^24
# passes, 2^25 crashes the TPU worker, 2^26/2^27 fail outright — and
# the per-build Pallas path fails the same tiers at the remote-compile
# step, so per-build is NOT a viable degradation.  A grid program's
# working set is ~60B/key of n-scale f64 temporaries (keys, FixDups,
# xraw/xn, scaled targets, per-key err/leaf ids) plus ~80B/leaf of
# bucket-scale arrays (spans, params, LB fills, final errors + fit
# temporaries); the 13GiB budget sits between the measured pass
# (13.34e9 B modeled) and crash (14.68e9 B) points.  Over-budget
# points degrade to a
# host-RAM CPU-backend build (rmi_tpu.host_measure) — the reference
# itself is a host-RAM program (mmap streaming, two_layer.rs:20-99),
# so this degradation keeps its semantics, just not its placement.
_GRID_N_BYTES = 60
_GRID_B_BYTES = 80


def _grid_hbm_budget() -> int:
    gb = float(os.environ.get("RMI_GRID_HBM_GB", "13"))
    return int(gb * (1 << 30))


def grid_bucket_fits(n: int, bucket: int) -> bool:
    """Whether one B-generic grid program at pad bucket ``bucket`` fits
    the chip at ``n`` keys.  On CPU backends the guard is off (host
    builds page from ordinary RAM) unless RMI_GRID_HBM_GB is set
    explicitly (which is how tests exercise the routing)."""
    if os.environ.get("RMI_GRID_HBM_GB") is None:
        import jax
        if jax.devices()[0].platform == "cpu":
            return True
    return (_GRID_N_BYTES * n + _GRID_B_BYTES * bucket
            <= _grid_hbm_budget())


def grid_safe(models: str, n: int) -> bool:
    """Device-safety filter on top of grid_measurable; pairs that fail
    it are measured per-build instead (optimizer.rs semantics are
    unaffected — only the measurement strategy changes).

    History: cubic-LEAF B-generic points at chunked-sweep scale
    (n > 2^25) reproducibly crashed the tunneled TPU worker in round
    4.  Root cause was the per-chunk ``jax.ops.segment_sum``
    scatter-add in the chunked L1 fallback-comparison sweep
    (models/cubic.py); it was replaced with clipped blocked range
    sums, and probes/probe_grid_cubic_fault.py now runs the exact
    faulting shape class clean (48M keys, cubic leaves, b up to 2^21)
    — so the cubic exclusion is retired.  The probe is the
    re-qualification gate if the fault ever returns under a toolchain
    update."""
    return grid_measurable(models)


def _compile_threads(njobs: int) -> int:
    """Concurrent-compile pool size for the grid sweep.

    XLA compilation releases the GIL (on tunneled TPUs it is a remote
    RPC), so compiling the independent grid programs from a thread pool
    overlaps what is otherwise a serial ~minutes-per-program cold
    start.  On CPU backends compilation is local and this host class is
    single-core — threads would only add contention.  Override with
    RMI_OPT_COMPILE_THREADS (0 disables).
    """
    import jax
    env = os.environ.get("RMI_OPT_COMPILE_THREADS")
    if env is not None:
        n = int(env)
        return max(1, n)
    if jax.devices()[0].platform == "cpu":
        return 1
    return min(8, max(1, njobs))


def grid_measure_rmis(data, pairs: Sequence[str], bfs: Sequence[int],
                      devices=None) -> dict:
    """Measure every (pair, branching factor) grid point with ONE
    compiled program per (pair, bucket) — the B-bucketed sweep that
    makes --optimize / --max-size practical on TPU.

    Pairs fan out round-robin over the device pool (replicated keys,
    rayon-par_iter in substance, optimizer.rs:220-231); every grid is
    dispatched before the single batched host fetch.  Returns
    {(models, bf): RMIStatistics}.
    """
    import jax

    from rmi_tpu.data import RMIDataset
    from rmi_tpu.serialize import predicted_rmi_size
    from rmi_tpu.train import two_layer
    from rmi_tpu.train.api import _fetch_host, _norm_cached

    if devices is None:
        devices = jax.devices()
    norm = _norm_cached(data)
    if len(devices) > 1:
        replicas = [RMIDataset(keys=jax.device_put(data.keys, d),
                               key_type=data.key_type)
                    for d in devices]
    else:
        replicas = [data]
    # one FixDups array per replica, shared by every grid program on
    # that device (pending dispatches pin their argument buffers)
    yfixes = [two_layer._fixdups_jit(r.keys) for r in replicas]

    groups = _bucket_groups(bfs)
    nthreads = _compile_threads(len(pairs) * len(groups))
    if nthreads > 1:
        # AOT path: lower every grid program on this thread (cheap),
        # compile them CONCURRENTLY (each .compile() is a GIL-releasing
        # XLA call — a remote RPC on tunneled TPUs), then dispatch the
        # compiled executables.  The persistent compilation cache makes
        # repeat sweeps skip this entirely.
        import concurrent.futures as cf
        prepped = []
        for i, models in enumerate(pairs):
            top_t, leaf_t = models.split(",")
            ds = replicas[i % len(replicas)]
            for bucket, bs in groups:
                lowered, args_list = two_layer.metrics_grid_prepare(
                    ds.keys, ds.key_type, top_t, leaf_t, bs, bucket,
                    norm=norm, yfix=yfixes[i % len(replicas)])
                prepped.append((models, bs, lowered, args_list))
        with cf.ThreadPoolExecutor(max_workers=nthreads) as ex:
            compiled = list(ex.map(lambda p: p[2].compile(), prepped))
        pending = []
        for (models, bs, _, args_list), comp in zip(prepped, compiled):
            # one dispatch per grid point (the compiled executable is
            # shared; per-point temps free before the next point runs)
            mds = [comp(*a) for a in args_list]
            md = {k: [m[k] for m in mds] for k in mds[0]}
            pending.append((models, bs, md))
    else:
        pending = []
        for i, models in enumerate(pairs):
            top_t, leaf_t = models.split(",")
            ds = replicas[i % len(replicas)]
            for bucket, bs in groups:
                md = two_layer.metrics_grid_async(
                    ds.keys, ds.key_type, top_t, leaf_t, bs, bucket,
                    norm=norm, yfix=yfixes[i % len(replicas)])
                pending.append((models, bs, md))

    fetched = _fetch_host([md for _, _, md in pending])

    out = {}
    for (models, bs, _), mh in zip(pending, fetched):
        for i, bf in enumerate(bs):
            out[(models, bf)] = RMIStatistics(
                models=models, branching_factor=bf,
                average_log2_error=float(mh["model_avg_log2_error"][i]),
                max_log2_error=float(mh["model_max_log2_error"][i]),
                size=predicted_rmi_size(models, bf))
    return out


def _ordered_unique(xs):
    out = []
    for x in xs:
        if x not in out:
            out.append(x)
    return out


def _find_pareto_bucketed(data, restrict, progress, reuse_phase1):
    """Two-phase sweep over grid-measured statistics.  Identical
    selection logic to the per-build path (phase-1 probes decide the
    qualifying pairs; the final pool is phase-2 points only, unless
    reuse_phase1) — only the measurement strategy differs: phase 1 is
    one grid program per pair at the (small) probe bucket, phase 2 one
    per qualifying pair at the full-range bucket."""
    n = data.n

    def measure_phase(cfg):
        """Grid-safe pairs through the B-bucketed grid; giant branching
        factors over the HBM capacity model through the host-RAM CPU
        build (rmi_tpu.host_measure); the rest per-build (train_async —
        the df64 Pallas path at scale)."""
        grid_cfg, host_cfg, pb_cfg = [], [], []
        for c in cfg:
            if not grid_bucket_fits(n, bucket_for([c[1]])):
                host_cfg.append(c)
            elif grid_safe(c[0], n):
                grid_cfg.append(c)
            else:
                pb_cfg.append(c)
        stats = {}
        host_pending = None
        if host_cfg:
            import logging
            logging.getLogger("rmi_tpu").info(
                "capacity guard: %d grid point(s) exceed the %.1fGB "
                "HBM budget at n=%d; measuring in host RAM (%s)",
                len(host_cfg), _grid_hbm_budget() / (1 << 30), n,
                ", ".join(f"{m}@{b}" for m, b in host_cfg))
            from rmi_tpu.host_measure import launch_measure_host
            host_pending = launch_measure_host(data, host_cfg)
        if grid_cfg:
            stats.update(grid_measure_rmis(
                data, _ordered_unique(m for m, _ in grid_cfg),
                _ordered_unique(b for _, b in grid_cfg)))
        if pb_cfg:
            for st in measure_rmis(data, pb_cfg):
                stats[(st.models, st.branching_factor)] = st
        if host_pending is not None:
            from rmi_tpu.serialize import predicted_rmi_size
            for row in host_pending.wait():
                key = (row["models"], row["branching_factor"])
                stats[key] = RMIStatistics(
                    models=key[0], branching_factor=key[1],
                    average_log2_error=row["avg_log2"],
                    max_log2_error=row["max_log2"],
                    size=predicted_rmi_size(key[0], key[1]))
        return [stats[c] for c in cfg]

    cfg1 = first_phase_configs()
    phase1 = measure_phase(cfg1)
    if progress is not None:
        for st in phase1:
            progress(st)
    cfg2 = second_phase_configs(phase1)
    phase2 = []
    if cfg2:
        # every qualifying pair skips the same phase-1 probes, so the
        # remaining branching factors are uniform across pairs
        phase2 = measure_phase(cfg2)
    if progress is not None:
        for st in phase2:
            progress(st)
    pool = list(phase2)
    if reuse_phase1:
        qualifying = {r.models for r in pareto_front(phase1)}
        pool.extend(r for r in phase1 if r.models in qualifying)
    front = narrow_front(pareto_front(pool), restrict)
    front.sort(key=lambda r: r.average_log2_error)
    return front


def find_pareto_efficient_configs(data, restrict: int = 10,
                                  progress=None,
                                  reuse_phase1: bool = False
                                  ) -> List[RMIStatistics]:
    """The full two-phase sweep (optimizer.rs:233-249).

    ``reuse_phase1=False`` reproduces the reference exactly: the final
    front is built from phase-2 measurements only, so phase-1 points of
    qualifying model pairs (skipped by second_phase_configs,
    optimizer.rs:141-143) never reach the output.  ``reuse_phase1=True``
    is a strict improvement: phase-1 measurements of qualifying model
    pairs join the final front pool — same training cost, never a worse
    front.

    Measurement runs on the B-bucketed grid path (grid_measure_rmis)
    when every grid pair supports it — one compile per (pair, bucket)
    instead of one per (pair, branching factor).  RMI_OPT_BUCKETED=0
    forces the per-build path.
    """
    if (os.environ.get("RMI_OPT_BUCKETED", "1") != "0"
            and all(grid_measurable(m)
                    for m, _ in first_phase_configs())):
        return _find_pareto_bucketed(data, restrict, progress,
                                     reuse_phase1)
    phase1 = measure_rmis(data, first_phase_configs(), progress)
    phase2 = measure_rmis(data, second_phase_configs(phase1), progress)
    pool = list(phase2)
    if reuse_phase1:
        qualifying = {r.models for r in pareto_front(phase1)}
        pool.extend(r for r in phase1 if r.models in qualifying)
    front = narrow_front(pareto_front(pool), restrict)
    front.sort(key=lambda r: r.average_log2_error)
    return front


def display_table(items: Sequence[RMIStatistics]) -> str:
    """The optimizer's result table (optimizer.rs:193-206)."""
    lines = [f"{'Models':<28} {'Branch':>10} {'AvgLg2':>12} "
             f"{'MaxLg2':>12} {'Size (b)':>14}"]
    for it in items:
        lines.append(
            f"{it.models:<28} {it.branching_factor:>10} "
            f"{it.average_log2_error:>12.5f} {it.max_log2_error:>12.5f} "
            f"{it.size:>14}")
    return "\n".join(lines)
