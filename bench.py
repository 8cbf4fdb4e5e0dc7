"""Headline benchmark: build a 200M-key RMI on TPU and serve batched
lookups.

Mirrors the driver-set targets (BASELINE.md): build books_200M_uint64
10x faster than the Rust reference (14.29s, README.md:52) and sustain
>= 100M batched lookups/sec on a v5e-8 (=> 12.5M/s/chip) at the
reference's recommended config cubic,linear 262144 (README.md:86).

SOSD files cannot be downloaded in this environment, so a books-like
dataset (exponential gaps -> ~uniform u64 CDF) is synthesized ON
DEVICE; every key is verified against the |guess - lower_bound| <= err
contract on a sample, and exact lower-bound search is timed end to end
(model eval + error-bounded last-mile binary search).

Prints ONE JSON line:
  {"metric": ..., "value": lookups/s/chip, "unit": ..., "vs_baseline":
   value / 12.5e6, ...extras}

Env knobs: RMI_BENCH_N (default 200_000_000), RMI_BENCH_BRANCH
(262144), RMI_BENCH_CONFIG (cubic,linear), RMI_BENCH_QUERIES (2^22),
RMI_BENCH_ITERS (20).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_books_like(n: int, seed: int = 42):
    """Sorted u64 keys with exponential gaps, generated on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        gaps = -jnp.log(u).astype(jnp.float64)
        csum = jnp.cumsum(gaps)
        scale = (2.0 ** 62) / csum[-1]
        return (csum * scale).astype(jnp.uint64)

    keys = gen(jax.random.PRNGKey(seed))
    keys.block_until_ready()
    return keys


def _measure_search_once(res, queries, iters, search_fn=None):
    """One chained-batch measurement; returns seconds PER ITERATION.

    block_until_ready is unreliable over the tunneled device, so each
    batch derives from the previous result (perturb xor — a few
    elementwise ops, ~us against ~100ms batches) and one scalar
    transfer at the end fences the chain."""
    import jax
    import jax.numpy as jnp
    if search_fn is None:
        from rmi_tpu.lookup import search as search_fn

    dt_q = queries.dtype
    perturb = jax.jit(
        lambda q, i: q ^ (i & 1023).astype(dt_q) if dt_q != jnp.float64
        else q + (i & 3).astype(jnp.float64))
    idx = search_fn(res, queries)
    _ = int(jnp.max(idx))               # warm up compile + sync
    q = queries
    t0 = time.time()
    for i in range(iters):
        idx = search_fn(res, q)
        q = perturb(queries, idx)
    _ = int(jnp.max(idx))               # forces the whole chain
    return (time.time() - t0) / iters


# A timed phase is treated as STALLED when it exceeds this multiple of
# the best observed time for the same phase.  The round-5 diagnosis
# (RESULTS.md) showed the tunneled device occasionally inserts
# 200-500s server-side pauses with zero client CPU; a single such
# pause inside a timed window silently corrupts a one-shot number
# (BENCH_r04's 56.5 M/s vs the stable 85 M/s), so every headline
# phase is now measured as independent trials with outlier re-runs.
_STALL_FACTOR = 3.0


def measure_search_robust(res, queries, iters, search_fn=None,
                          trials=3, max_extra=2):
    """Best-of-N chained measurements with stall detection.

    Runs ``trials`` independent chains; any trial slower than
    _STALL_FACTOR x the best is flagged as a stall and re-run (up to
    ``max_extra`` additional trials total).  Returns a dict with the
    best and median throughput plus the raw per-trial times so the
    artifact records what happened instead of absorbing it."""
    import statistics

    times = [_measure_search_once(res, queries, iters, search_fn)
             for _ in range(trials)]
    stalled = 0
    extra = 0
    while extra < max_extra:
        best = min(times)
        slow = [t for t in times if t > _STALL_FACTOR * best]
        if not slow:
            break
        stalled += len(slow)
        # drop the stalled trials and replace with a fresh one
        times = [t for t in times if t <= _STALL_FACTOR * best]
        times.append(_measure_search_once(res, queries, iters,
                                          search_fn))
        extra += 1
    best = min(times)
    med = statistics.median(times)
    nq = queries.shape[0]
    return {
        "best": nq / best,
        "median": nq / med,
        "trial_iter_ms": [round(t * 1e3, 3) for t in times],
        "stall_detected": stalled > 0,
        "stalled_trials": stalled,
    }


def measure_search(res, queries, iters, search_fn=None):
    """Back-compat single-number throughput: best of 2 trials (the
    family/latency tables use this; the headline uses the robust
    variant directly)."""
    r = measure_search_robust(res, queries, iters, search_fn,
                              trials=2, max_extra=1)
    return r["best"]


def measure_perturb_overhead(queries, iters):
    """Cost of the perturb xor chain ALONE (same chaining, no search):
    bounds the timing bias the dependent op adds inside
    measure_search's loop.  Logged once per bench run."""
    import jax
    import jax.numpy as jnp

    dt_q = queries.dtype
    perturb = jax.jit(
        lambda q, i: q ^ (i & 1023).astype(dt_q) if dt_q != jnp.float64
        else q + (i & 3).astype(jnp.float64))
    q = perturb(queries, queries[:1].astype(queries.dtype))
    _ = int(jnp.max(q))
    t0 = time.time()
    for i in range(iters):
        q = perturb(q, q[:1])
    _ = int(jnp.max(q))
    return (time.time() - t0) / iters


def bench_families(keys, n2, nq, iters):
    """Per-family build+serve table: every top family (scalar, radix,
    table, histogram) and leaf family (float, table), plus f64 keys —
    the serving-breadth audit behind RESULTS.md."""
    import jax
    import jax.numpy as jnp
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.lookup import search, lookup
    from rmi_tpu import lookup_fast
    from rmi_tpu.train.api import train

    import gc
    import numpy as np

    keys2 = keys[:n2]
    ds2 = RMIDataset(keys=keys2, key_type=KeyType.U64)

    # uniform IN-RANGE queries (the realistic lookup shape; nothing
    # clamps to the hot last rows, and f64 queries cover the key span)
    qkey = jax.random.PRNGKey(11)
    q_u = jax.random.randint(qkey, (nq,), 0, int(keys2[-1]),
                             dtype=jnp.int64).astype(jnp.uint64)

    # Alternate key domains are materialized LAZILY per config and
    # freed right after: at n=200M the u64 keys + one build's working
    # set already fill most of HBM — keeping f64/u32 copies alive for
    # the whole table OOMs every row (round-4 driver run).
    def make_f64():
        # f64 keys/queries are synthesized ON HOST: TPU's emulated-f64
        # multiply yields values that differ from their own host
        # round-trip for ~1/4000 elements (non-canonical two-limb
        # encodings) — file-loaded keys are host bytes, so host
        # synthesis is the representative regime.
        kf = jnp.asarray(np.asarray(keys2).astype(np.float64)
                         * (1.0 / 512.0))
        qf = jnp.asarray(np.asarray(q_u).astype(np.float64)
                         * (1.0 / 512.0))
        return RMIDataset(keys=kf, key_type=KeyType.F64), qf

    def make_u32():
        # books u32 (BASELINE.md: linear,linear 100): the u64 keys'
        # top 32 bits — same CDF shape, duplicate-bearing at 200M
        k32 = (keys2 >> jnp.uint64(32)).astype(jnp.uint32)
        return (RMIDataset(keys=k32, key_type=KeyType.U32),
                (q_u >> jnp.uint64(32)).astype(jnp.uint32))

    configs = [
        ("cubic,linear", 262144, None),
        ("linear,linear u32", 100, make_u32),
        ("linear,linear", 4096, None),
        ("linear_spline,linear", 65536, None),
        ("robust_linear,cubic", 65536, None),
        ("radix,linear", 1024, None),
        ("bradix,linear", 1024, None),
        ("radix18,linear", 65536, None),
        ("radix22,cubic", 65536, None),
        ("histogram,linear", 4096, None),
        ("loglinear,linear", 16384, None),
        ("normal,linear", 4096, None),
        ("lognormal,linear", 4096, None),
        ("cubic,loglinear", 65536, None),
        ("cubic,normal", 65536, None),
        ("cubic,radix8", 4096, None),
        ("cubic,linear f64", 262144, make_f64),
    ]
    # RMI_BENCH_FAMILIES_ONLY: ';'-separated substrings selecting a
    # subset of the configs (labels contain commas)
    only = os.environ.get("RMI_BENCH_FAMILIES_ONLY")
    if only:
        pats = [p.strip() for p in only.split(";") if p.strip()]
        configs = [c for c in configs
                   if any(p in c[0].replace(" ", "_") + f"_{c[1]}"
                          for p in pats)]
    table = {}
    for name, ebr, make_ds in configs:
        espec = name.split(" ")[0]
        label = name.replace(" ", "_") + f"_{ebr}"
        r0 = ds_ = q_ = None
        try:
            ds_, q_ = make_ds() if make_ds is not None else (ds2, q_u)
            train(ds_, espec, ebr)
            t0 = time.time()
            r0 = train(ds_, espec, ebr)
            ewarm = time.time() - t0
            rate = measure_search(r0, q_, iters)
            # spot-verify exactness on a query sample
            samp = q_[:65536]
            got = np.asarray(search(r0, samp))
            want = np.asarray(
                jnp.searchsorted(ds_.keys, samp, side="left"))
            plan = lookup_fast.get_plan(r0)
            table[label] = {
                "serve_mps": round(rate / 1e6, 2),
                "plan": plan.kind,
                "build_s": round(ewarm, 3),
                "max_err": int(r0.model_max_error),
                "exact_mismatches": int((got != want).sum()),
                "eval_mode": r0.eval_mode,
            }
        except Exception as e:  # noqa: BLE001 — record and continue
            e.__traceback__ = None
            table[label] = {"error": f"{type(e).__name__}: {str(e)[:90]}"}
        log(f"family {label}: {table[label]}")
        # free this row's index, serving plan, and any alternate key
        # domain before the next 200M-scale build
        del r0, ds_, q_
        gc.collect()
    return table


def bench_latency(res, keys, iters):
    """Per-batch latency/throughput at 1K..4M queries (the reference's
    serving shape is a ~100ns scalar call, codegen.rs:612-718; this
    records where batch dispatch amortizes on the tunneled chip).

    floor_ms is the same chained-iteration measurement with a trivial
    one-op kernel in place of the search: on the tunneled device it IS
    the per-dispatch cost, so batch_ms - floor_ms isolates the model's
    own device time at each batch size."""
    import jax
    import jax.numpy as jnp

    qkey = jax.random.PRNGKey(13)
    table = {}
    for nq in (1 << 10, 1 << 14, 1 << 18, 1 << 20, 1 << 22):
        q = jax.random.randint(qkey, (nq,), 0, int(keys[-1]),
                               dtype=jnp.int64).astype(jnp.uint64)
        rate = measure_search(res, q, iters)
        floor_ms = measure_perturb_overhead(q, iters) * 1e3
        table[str(nq)] = {
            "batch_ms": round(nq / rate * 1e3, 3),
            "mps": round(rate / 1e6, 2),
            "floor_ms": round(floor_ms, 3),
        }
        log(f"latency {nq}: {table[str(nq)]}")
    return table


def run(n, t_start):
    import jax
    import jax.numpy as jnp
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train.api import train
    from rmi_tpu.lookup import search, lookup
    from rmi_tpu.serialize import rmi_size

    branch = int(os.environ.get("RMI_BENCH_BRANCH", 262144))
    spec = os.environ.get("RMI_BENCH_CONFIG", "cubic,linear")
    nq = int(os.environ.get("RMI_BENCH_QUERIES", 1 << 22))
    iters = int(os.environ.get("RMI_BENCH_ITERS", 20))

    dev = jax.devices()[0]
    log(f"device: {dev}, n={n}, config={spec} {branch}")

    t0 = time.time()
    keys = gen_books_like(n)
    log(f"keygen: {time.time()-t0:.2f}s")
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)

    # cold build (includes jit compilation).  The tunneled device
    # occasionally stalls 200-500s server-side on a first sync
    # (RESULTS.md round-5 diagnosis; it corrupted BENCH_r04's cold
    # number: 448.9s vs the stable ~6-15s).  If the first cold build
    # exceeds the stall threshold, clear the executable caches and
    # recompile once; report both attempts and the flag.
    cold_stall_s = float(os.environ.get("RMI_BENCH_COLD_STALL_S", 120))
    t0 = time.time()
    res = train(ds, spec, branch)
    cold_first = time.time() - t0
    log(f"cold build: {cold_first:.2f}s")
    cold = cold_first
    cold_stall = cold_first > cold_stall_s
    cold_retry = None
    if cold_stall:
        log(f"cold build exceeded {cold_stall_s:.0f}s — suspected "
            f"tunnel stall; clearing caches and recompiling once")
        import gc
        res = None
        gc.collect()
        jax.clear_caches()
        t0 = time.time()
        res = train(ds, spec, branch)
        cold_retry = time.time() - t0
        log(f"cold retry: {cold_retry:.2f}s")
        cold = min(cold_first, cold_retry)

    # warm build — the production regime (compile cache amortized);
    # comparable to the reference's per-build cost.  Best of 3 (each
    # ~0.7s) so one stalled sync can't define the headline.
    warm_times = []
    for _ in range(3):
        t0 = time.time()
        res = train(ds, spec, branch)
        warm_times.append(time.time() - t0)
    warm = min(warm_times)
    warm_stall = any(t > 3.0 * warm for t in warm_times)
    log(f"warm builds: {['%.3f' % t for t in warm_times]} -> "
        f"{warm:.3f}s  max_err={res.model_max_error} "
        f"avg_log2={res.model_avg_log2_error:.4f} "
        f"size={rmi_size(res)}")

    # correctness sample: bound contract on every 97th key
    sample = ds.keys[:: max(1, n // 1_000_000)]
    g, e = lookup(res, sample)
    true_lb = jnp.searchsorted(ds.keys, sample, side="left")
    viol = int(jnp.sum(jnp.abs(g - true_lb.astype(jnp.int64))
                       > e))
    log(f"bound violations in sample: {viol}")

    # lookup throughput: uniform random queries, exact lower-bound
    # search (top eval + leaf eval + hierarchical row-resolve).
    # Timing note: block_until_ready is unreliable over the tunneled
    # device, so iterations are CHAINED (each batch derived from the
    # previous result) and a value is materialized at the end — the
    # measured span provably covers all device work.
    # uniform queries over the KEY RANGE: every lookup does real work
    # (out-of-range queries would just clamp to the hot last rows)
    qkey = jax.random.PRNGKey(7)
    queries = jax.random.randint(
        qkey, (nq,), 0, int(keys[-1]), dtype=jnp.int64
    ).astype(jnp.uint64)

    # multi-chip serving: shard the query batch over the device mesh
    # (tables replicated, zero hot-path collectives — parallel/serve.py).
    # Auto-on when >1 device is visible; RMI_BENCH_SHARD=0/1 overrides.
    ndev = jax.device_count()
    shard_flag = os.environ.get("RMI_BENCH_SHARD", "auto")
    use_shard = (ndev > 1) if shard_flag == "auto" else shard_flag == "1"
    serve_res = res
    search_fn = None
    if use_shard:
        # per-device copies + host-split batches: every chip runs the
        # FULL single-chip fast path (incl. the chip-local sorted
        # pipeline); no SPMD collectives anywhere (parallel/serve.py)
        from rmi_tpu.parallel.serve import (replicate_rmi_per_device,
                                            search_sharded)
        rmis = replicate_rmi_per_device(res)
        search_fn = lambda r, q: search_sharded(rmis, q)  # noqa: E731
        log(f"serving sharded over {ndev} devices (per-device copies)")

    serve = measure_search_robust(serve_res, queries, iters,
                                  search_fn=search_fn)
    total_rate = serve["best"]
    rate = total_rate / (ndev if use_shard else 1)
    batch_ms = queries.shape[0] / total_rate * 1e3
    ovh_ms = measure_perturb_overhead(queries, iters) * 1e3
    log(f"perturb-chain overhead: {ovh_ms:.3f} ms/iter "
        f"({100.0 * ovh_ms / batch_ms:.2f}% of the timed batch)")
    log(f"search: {batch_ms:.2f} ms / {queries.shape[0]} queries -> "
        f"{total_rate/1e6:.1f}M/s total, {rate/1e6:.1f}M/s/chip "
        f"({ndev if use_shard else 1} chip(s)); trials "
        f"{serve['trial_iter_ms']} ms/iter, stall_detected="
        f"{serve['stall_detected']}")

    ref_build_s = 14.288421237          # README.md:52
    out = {
        "metric": f"books{n//1_000_000}M_{spec.replace(',', '_')}_"
                  f"{branch}_lookups",
        "value": rate,
        "unit": "lookups_per_sec_per_chip",
        # baseline target: 100M/s on v5e-8 => 12.5M/s per chip
        "vs_baseline": rate / 12.5e6,
        "serve_median_per_chip": serve["median"] / (ndev if use_shard
                                                    else 1),
        "serve_trial_iter_ms": serve["trial_iter_ms"],
        "serve_stall_detected": serve["stall_detected"],
        "build_time_s": warm,
        "build_warm_times_s": [round(t, 3) for t in warm_times],
        "build_warm_stall_detected": warm_stall,
        "build_cold_s": cold,
        "build_cold_first_s": round(cold_first, 2),
        "build_cold_retry_s": (round(cold_retry, 2)
                               if cold_retry is not None else None),
        "build_cold_stall_detected": cold_stall,
        "build_speedup_vs_reference": ref_build_s / warm,
        "build_eval_mode": res.eval_mode,
        "model_max_error": int(res.model_max_error),
        "model_avg_log2_error": float(res.model_avg_log2_error),
        "rmi_size_bytes": int(rmi_size(res)),
        "bound_violations_sampled": viol,
        "n_keys": n,
        "serve_devices": ndev if use_shard else 1,
        "lookups_per_sec_total": total_rate,
        "total_wall_s": time.time() - t_start,
    }

    # secondary configs (BASELINE.md exercise list) at a smaller n —
    # enabled with RMI_BENCH_EXTRAS=1 (adds several compiles)
    if os.environ.get("RMI_BENCH_EXTRAS") == "1":
        extras = {}
        n2 = min(n, 25_000_000)
        keys2 = keys[:n2]
        ds2 = RMIDataset(keys=keys2, key_type=KeyType.U64)
        for espec, ebr in (("linear,linear", 4096),
                           ("radix,linear", 1024),
                           ("robust_linear,linear", 262144)):
            try:
                r0 = train(ds2, espec, ebr)
                t0 = time.time()
                r0 = train(ds2, espec, ebr)
                ewarm = time.time() - t0
                extras[f"{espec}_{ebr}"] = {
                    "build_s": round(ewarm, 3),
                    "max_err": int(r0.model_max_error),
                    "avg_log2": round(float(r0.model_avg_log2_error), 4),
                }
            except Exception as e:  # noqa: BLE001
                extras[f"{espec}_{ebr}"] = {"error": str(e)[:80]}
        out["extras"] = extras

    # batch-size latency curve (RESULTS.md serving-latency table)
    if os.environ.get("RMI_BENCH_LATENCY") == "1":
        out["latency"] = bench_latency(res, keys, iters)

    # per-family build+serve audit (serving-breadth table in RESULTS.md)
    if os.environ.get("RMI_BENCH_FAMILIES") == "1":
        fam_n = int(os.environ.get("RMI_BENCH_FAMILIES_N", 25_000_000))
        # the headline index + its packed serving plan are several GB at
        # 200M; release them (and any sharded copies) so each family
        # build gets the full HBM headroom
        import gc
        res = serve_res = None
        search_fn = None          # drops the closure over per-dev copies
        if use_shard:
            rmis = None
        gc.collect()
        # 4M batches: at 200M keys the sorted-pipeline density gate
        # sits near 2.3M queries/batch, so 2M batches would record the
        # gather-path floor instead of engine numbers comparable with
        # the headline
        out["families"] = bench_families(keys, min(n, fam_n),
                                         min(nq, 1 << 22), iters)

    print(json.dumps(out), flush=True)


def main():
    t_start = time.time()
    import jax

    # honor an explicit CPU request (the container sitecustomize
    # force-selects the tunneled TPU otherwise) — used by ci.sh
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    prof_dir = os.environ.get("RMI_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)

    # The tunneled compiler occasionally rejects the largest problem
    # sizes (payload limits / compiler OOM); fall back by halving so the
    # driver always records a result.
    n = int(os.environ.get("RMI_BENCH_N", 200_000_000))
    while True:
        try:
            run(n, t_start)
            break
        except Exception as e:  # noqa: BLE001 — report, shrink, retry
            log(f"bench failed at n={n}: {type(e).__name__}: "
                f"{str(e)[:200]}")
            if n <= 25_000_000:
                raise
            n //= 2
            # drop traceback frames so the failed attempt's device
            # arrays actually free before the retry allocates
            import gc
            import sys as _sys
            _sys.last_traceback = None
            e.__traceback__ = None
            del e
            gc.collect()
            jax.clear_caches()
            gc.collect()
    if prof_dir:
        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
