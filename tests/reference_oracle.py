"""Pure-Python oracle reimplementing the reference's sequential
algorithms (from /root/reference's Rust, re-expressed independently) so
the vectorized TPU pipeline can be checked for exact behavioral parity
on small inputs.  This mirrors the role of the reference's inline unit
tests (e.g. linear.rs:122-149) and the every-key bound checks in
tests/*/main.cpp.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple


def slr(pairs) -> Tuple[float, float]:
    """Welford SLR with the reference's special cases (linear.rs:12-59)."""
    mean_x = mean_y = c = m2 = 0.0
    n = 0
    for x, y in pairs:
        n += 1
        dx = x - mean_x
        mean_x += dx / n
        mean_y += (y - mean_y) / n
        c += dx * (y - mean_y)
        m2 += dx * (x - mean_x)
    if n == 0:
        return (0.0, 0.0)
    if n == 1:
        return (mean_y, 0.0)
    cov = c / (n - 1)
    var = m2 / (n - 1)
    if var == 0.0:
        return (mean_y, 0.0)
    beta = cov / var
    return (mean_y - beta * mean_x, beta)


def exp1(v: float) -> float:
    x = 1.0 + v / 64.0
    for _ in range(6):
        x *= x
    return x


def phi(v: float) -> float:
    return 1.0 / (1.0 + exp1(-1.65451 * v))


def fixdups(pairs):
    """FixDupsIter (models/mod.rs:143-185)."""
    out = []
    last = None
    for k, y in pairs:
        if last is not None and k == last[0]:
            out.append((k, last[1]))
        else:
            out.append((k, y))
            last = (k, y)
    return out


def scale_pairs(pairs, sf: float):
    if abs(sf - 1.0) <= 2.220446049250313e-16:
        return list(pairs)
    return [(k, int(y * sf)) for (k, y) in pairs]


def linear_fit(pairs):
    return slr((float(x), float(y)) for x, y in pairs)


def loglinear_fit(pairs):
    t = [(float(x), math.log(y)) for x, y in pairs
         if y > 0 and math.isfinite(math.log(y))]
    return slr(t)


def robust_linear_fit(pairs):
    pairs = list(pairs)
    n = len(pairs)
    if n == 0:
        return (0.0, 0.0)
    bnd = max(1, int(n * 0.0001))
    if 2 * bnd + 1 >= n:
        # the reference would assert here; rmi_tpu falls back untrimmed
        return slr((float(x), float(y)) for x, y in pairs)
    trimmed = pairs[bnd:n - bnd]
    return slr((float(x), float(y)) for x, y in trimmed)


def linear_spline_fit(pairs):
    pairs = list(pairs)
    if not pairs:
        return (0.0, 0.0)
    if len(pairs) == 1:
        return (float(pairs[0][1]), 0.0)
    (x0, y0), (x1, y1) = pairs[0], pairs[-1]
    if x0 == x1:
        return (float(y0), 0.0)
    slope = (y0 - y1) / (float(x0) - float(x1))
    return (y0 - slope * float(x0), slope)


def cubic_fit(pairs, endpoint_pairs=None):
    """cubic_spline.rs:18-136.  ``endpoint_pairs`` overrides the
    first/last (x, y) for the raw-offset top-container case."""
    pairs = list(pairs)
    ep = endpoint_pairs if endpoint_pairs is not None else pairs
    if not pairs:
        return (0.0, 0.0, 1.0, 0.0)
    if len(pairs) == 1:
        return (0.0, 0.0, 0.0, float(ep[0][1]))
    if all(p[0] == pairs[0][0] for p in pairs):
        return (0.0, 0.0, 0.0, float(ep[0][1]))
    xmin, ymin = float(ep[0][0]), float(ep[0][1])
    xmax, ymax = float(ep[-1][0]), float(ep[-1][1])

    nxt = next((p for p in pairs
                if (float(p[0]) - xmin) / (xmax - xmin) > 0.0))
    sxn = (float(nxt[0]) - xmin) / (xmax - xmin)
    syn = (float(nxt[1]) - ymin) / (ymax - ymin)
    m1 = syn / sxn

    prv = next((p for p in reversed(pairs)
                if (float(p[0]) - xmin) / (xmax - xmin) < 1.0))
    sxp = (float(prv[0]) - xmin) / (xmax - xmin)
    syp = (float(prv[1]) - ymin) / (ymax - ymin)
    m2 = (1.0 - syp) / (1.0 - sxp)

    if m1 * m1 + m2 * m2 > 9.0:
        tau = 3.0 / math.sqrt(m1 * m1 + m2 * m2)
        m1, m2 = m1 * tau, m2 * tau

    span3 = (xmax - xmin) ** 3
    a = (m1 + m2 - 2.0) / span3
    b = -(xmax * (2 * m1 + m2 - 3) + xmin * (m1 + 2 * m2 - 3)) / span3
    c = (m1 * xmax ** 2 + m2 * xmin ** 2
         + xmax * xmin * (2 * m1 + 2 * m2 - 6)) / span3
    d = -xmin * (m1 * xmax ** 2 + xmax * xmin * (m2 - 3) + xmin ** 2) / span3
    ys = ymax - ymin
    a, b, c, d = a * ys, b * ys, c * ys, d * ys + ymin

    def cub(x):
        return ((a * x + b) * x + c) * x + d

    al, be = linear_spline_fit([ep[0], ep[-1]])
    our_err = sum(abs(cub(float(x)) - y) for x, y in pairs)
    lin_err = sum(abs(be * float(x) + al - y) for x, y in pairs)
    if lin_err < our_err:
        return (0.0, 0.0, be, al)
    return (a, b, c, d)


def normal_fit(pairs):
    pairs = list(pairs)
    n = len(pairs)
    scale = -math.inf
    mean = 0.0
    for x, y in pairs:
        mean += float(x) / n
        scale = max(scale, float(y))
    stdev = sum((float(x) - mean) ** 2 for x, _ in pairs)
    stdev = math.sqrt(stdev / n) if n else math.nan
    if n == 0:
        return (0.0, math.nan, -math.inf)
    return (mean, stdev, scale)


def lognormal_fit(pairs):
    pairs = list(pairs)
    n = len(pairs)
    if n == 0:
        return (0.0, math.nan, -math.inf)

    def lnx(x):
        if x <= 0:
            return 0.0
        v = math.log(x)
        return v if math.isfinite(v) else 0.0

    scale = -math.inf
    mean = 0.0
    for x, y in pairs:
        mean += lnx(float(x)) / n
        scale = max(scale, float(y))
    stdev = math.sqrt(sum((lnx(float(x)) - mean) ** 2 for x, _ in pairs) / n)
    return (mean, stdev, scale)


def predict_to_int(f: float) -> int:
    if math.isnan(f):
        return 0
    if math.isinf(f):
        return 0 if f < 0 else (1 << 64) - 1  # Rust `as u64` saturates
    return int(max(0.0, math.floor(f)))


def num_bits(largest: int) -> int:
    nbits = 0
    while (1 << (nbits + 1)) - 1 <= largest:
        nbits += 1
    return max(nbits, 1)


def common_prefix_size(keys) -> int:
    any_ones = 0
    no_ones = (1 << 64) - 1
    for k in keys:
        any_ones |= int(k)
        no_ones &= int(k)
    any_zeros = ~no_ones & ((1 << 64) - 1)
    constant = any_zeros ^ any_ones
    inv = ~constant & ((1 << 64) - 1)
    # leading zeros of inv
    lz = 64 - inv.bit_length()
    return lz


_M64 = (1 << 64) - 1


def radix_table_fit(pairs, bits: int):
    """RadixTable::new (radix.rs:90-120): fill-forward hint table over
    the container, trailing slots filled with the table size, slot 0
    left at 0 when the first bucket is 0 (the last_radix==0 'continue'
    quirk)."""
    ks = [int(k) for k, _ in pairs]
    prefix = common_prefix_size(ks)
    size = 1 << bits
    table = [0] * size
    nb = 0 if prefix + bits > 64 else 64 - (prefix + bits)
    last = 0
    for k, y in pairs:
        cur = (((int(k) << prefix) & _M64) >> prefix) >> nb
        if cur == last:
            continue
        table[cur] = int(y) & 0xFFFFFFFF
        for i in range(last + 1, cur):
            table[i] = int(y) & 0xFFFFFFFF
        last = cur
    for i in range(last + 1, size):
        table[i] = size
    return (prefix, bits, table)


def radix_table_predict(params, x) -> int:
    prefix, bits, table = params
    nb = 0 if prefix + bits > 64 else 64 - (prefix + bits)
    return table[(((int(x) << prefix) & _M64) >> prefix) >> nb]


def bradix_predict(params, x) -> int:
    """BalancedRadixModel::predict_to_int (balanced_radix.rs:103-114)."""
    prefix, tb, clamp, high = params
    res = ((int(x) << prefix) & _M64) >> (64 - tb)
    if high:
        return min(res, clamp)
    return 0 if res < clamp else res - clamp


def bradix_fit(scaled_pairs):
    """bradix (balanced_radix.rs:39-85): chi^2 over {bits, bits+1} x
    {clamp-high, shift-low}, strict-< first-wins; u64 arithmetic wraps
    (release Rust).  The chi^2 count index is clipped to max_output-1
    where the reference would index out of bounds (same documented
    divergence as the device fit, models/radix.py)."""
    max_output = max(y for _x, y in scaled_pairs)
    bits = num_bits(max_output)
    prefix = common_prefix_size([int(k) for k, _ in scaled_pairs])
    nbin = max(max_output, 1)
    expected = len(scaled_pairs) / nbin
    best_score = math.inf
    best = None
    for tb in range(bits, min(bits + 2, 64)):
        bits_max = ((1 << (tb + 1)) - 1) & _M64
        for high in (True, False):
            clamp = ((max_output - 1) if high
                     else (max_output - bits_max)) & _M64
            cand = (prefix, tb, clamp, high)
            counts = [0] * nbin
            for k, _y in scaled_pairs:
                counts[min(bradix_predict(cand, k), nbin - 1)] += 1
            score = sum((c - expected) ** 2 / expected for c in counts)
            if score < best_score:
                best_score = score
                best = cand
    return best


# -------------------------------------------------------------------------
# cachefix greedy spline (cache_fix.rs:45-150)
# -------------------------------------------------------------------------

def oracle_cache_fix(keys: List[int], line_size: int):
    """Sequential transcription of cache_fix(): greedy spline over the
    deduplicated keys such that every covered point's predicted cache
    line equals its true line; a pre-knot at key-1 precedes each key
    whose predecessor differs (cache_fix.rs:117-136)."""
    assert len(keys) > line_size

    # DedupIter (models/mod.rs:187-231): first offset per unique key
    uniq = []
    for i, k in enumerate(keys):
        if not uniq or uniq[-1][0] != k:
            uniq.append((int(k), i))

    spline = []
    cur = None          # (from_x, from_y, to_x, to_y)
    curr_pts = []

    def predict(s, x):
        # f64::mul_add lerp (cache_fix.rs:36-42): ONE rounding — a
        # double-rounded lerp diverges from the reference's knot stream
        from fractions import Fraction
        v0, v1 = float(s[1]), float(s[3])
        t = float(x - s[0]) / float(s[2] - s[0])
        return int(float(Fraction(1.0 - t) * Fraction(v0)
                         + Fraction(t * v1)))

    def add_point(pt):
        nonlocal cur
        if cur is None:
            cur = (pt[0], pt[1], pt[0], pt[1])
            return pt
        proposed = (cur[0], cur[1], pt[0], pt[1])
        curr_pts.append((cur[2], cur[3]))
        ok = all(predict(proposed, px) // line_size == py // line_size
                 for px, py in curr_pts)
        if ok:
            cur = proposed
            return None
        prev_pt = (cur[2], cur[3])
        cur = (prev_pt[0], prev_pt[1], pt[0], pt[1])
        curr_pts.clear()
        curr_pts.append(pt)
        return prev_pt

    last_key = 0
    for key, offset in uniq:
        km1 = max(key - 1, 0)
        if km1 != last_key:
            p = add_point((km1, offset))
            if p is not None:
                spline.append(p)
        p = add_point((key, offset))
        if p is not None:
            spline.append(p)
        last_key = key
    if cur is not None:
        spline.append((cur[2], cur[3]))
    return spline


# -------------------------------------------------------------------------
# full two-layer oracle (two_layer.rs:101-306, without the rayon split)
# -------------------------------------------------------------------------

FIT = {
    "linear": lambda p: linear_fit(p),
    "robust_linear": lambda p: robust_linear_fit(p),
    "linear_spline": lambda p: linear_spline_fit(p),
    "loglinear": lambda p: loglinear_fit(p),
    "normal": lambda p: normal_fit(p),
    "lognormal": lambda p: lognormal_fit(p),
    "cubic": lambda p: cubic_fit(p),
}


def predict_model(kind: str, params, x: float) -> float:
    if kind in ("linear", "robust_linear", "linear_spline"):
        a, b = params
        return b * x + a
    if kind == "loglinear":
        a, b = params
        return exp1(b * x + a)
    if kind == "cubic":
        a, b, c, d = params
        return ((a * x + b) * x + c) * x + d
    if kind == "normal":
        m, s, sc = params
        return phi((x - m) / s) * sc
    if kind == "lognormal":
        return predict_lognormal(params, x)
    raise ValueError(kind)


def predict_lognormal(params, x: float) -> float:
    m, s, sc = params
    if x > 0 and math.isfinite(math.log(x)):
        l = max(math.log(x), 0.0)
    else:
        l = 0.0
    return phi((l - m) / s) * sc


def oracle_two_layer(keys: List[int], top: str, leaf: str, B: int,
                     key_is_float=False):
    """Sequential re-derivation of the whole training pipeline.
    Returns (leaf_params, final_errors, metrics)."""
    n = len(keys)
    pairs = fixdups([(k, i) for i, k in enumerate(keys)])
    sf = B / n
    scaled = scale_pairs(pairs, sf)

    # --- top fit
    if top == "cubic":
        ep = scale_pairs([(keys[0], 0), (keys[-1], n - 1)], sf)
        top_params = cubic_fit(scaled, endpoint_pairs=ep)
        top_pred = lambda x: predict_to_int(
            predict_model("cubic", top_params, float(x)))
    elif top == "linear_spline":
        ep = scale_pairs([(keys[0], 0), (keys[-1], n - 1)], sf)
        top_params = linear_spline_fit(ep)
        top_pred = lambda x: predict_to_int(
            predict_model("linear_spline", top_params, float(x)))
    elif top in ("linear", "robust_linear", "loglinear", "normal",
                 "lognormal"):
        top_params = FIT[top](scaled)
        if top == "lognormal":
            top_pred = lambda x: predict_to_int(
                predict_lognormal(top_params, float(x)))
        else:
            top_pred = lambda x: predict_to_int(
                predict_model(top, top_params, float(x)))
    elif top == "radix":
        largest = max(y for _x, y in scaled)
        bits = num_bits(largest)
        prefix = common_prefix_size(keys)
        top_pred = lambda x: ((int(x) << prefix) & ((1 << 64) - 1)) >> (
            64 - bits)
        top_params = (prefix, bits)
    elif top == "bradix":
        top_params = bradix_fit(scaled)
        top_pred = lambda x: bradix_predict(top_params, x)
    elif top.startswith("radix"):          # radixN hint table as top
        tbits = int(top[len("radix"):])
        top_params = radix_table_fit(scaled, tbits)
        top_pred = lambda x: radix_table_predict(top_params, x)
    elif top == "histogram":
        num_bins = scaled[-1][1] if abs(sf - 1.0) > 2.3e-16 else n - 1
        num_bins = int((n - 1) * sf) if abs(sf - 1.0) > 2.3e-16 else n - 1
        items_per_bin = n // num_bins
        pivots = [keys[i * items_per_bin] for i in range(num_bins)]

        def top_pred(x):
            import bisect
            return bisect.bisect_right(pivots, int(x)) - 1
        top_params = pivots
    else:
        raise NotImplementedError(top)

    # --- leaf assignment with overlap (two_layer.rs:20-99)
    targets = [min(B - 1, top_pred(k)) for k, _ in pairs]
    leaf_data: List[List[Tuple]] = [[] for _ in range(B)]
    last_target = 0
    cur: List[Tuple] = []
    for i, (k, y) in enumerate(pairs):
        tgt = targets[i]
        if tgt > last_target:
            last_item = cur[-1] if cur else None
            cur.append((k, y))
            leaf_data[last_target] = cur
            cur = []
            if last_item is not None:
                cur.append(last_item)
        cur.append((k, y))
        last_target = tgt
    leaf_data[last_target] = cur

    radix_leaf_bits = (int(leaf[len("radix"):])
                       if leaf.startswith("radix") and leaf != "radix"
                       else None)
    if radix_leaf_bits is not None:
        # RadixTable::new per leaf container (radix.rs:90-120 with
        # restriction None, radix.rs:167-169)
        leaf_params = [radix_table_fit(leaf_data[j], radix_leaf_bits)
                       for j in range(B)]
    else:
        leaf_fit = FIT[leaf]
        leaf_params = [leaf_fit(leaf_data[j]) for j in range(B)]

    # --- lower bound corrections (lower_bound_correction.rs)
    first_key: List[Optional[Tuple[int, int]]] = [None] * B
    last_key: List[Optional[Tuple[int, int]]] = [None] * B
    max_run = [0] * B
    last_target = 0
    run_len = 0
    run_key = keys[0]
    for (k, y), tgt in zip(pairs, targets):
        if tgt == last_target and k == run_key:
            run_len += 1
        else:
            max_run[last_target] = max(max_run[last_target], run_len)
            run_len = 1
            run_key = k
            last_target = tgt
        if first_key[tgt] is None:
            first_key[tgt] = (y, k)
        last_key[tgt] = (y, k)

    # key-type max value (models/mod.rs:81,93,105): f64::MAX for float
    # keys, else the integer type max inferred from the key range
    if key_is_float:
        import sys as _sys
        MAXK = _sys.float_info.max
    elif max(keys) < (1 << 32):
        MAXK = (1 << 32) - 1
    else:
        MAXK = (1 << 64) - 1
    nxt = [(n, MAXK)] * B
    nn: Optional[Tuple[int, int]] = None
    for j in range(B - 1, -1, -1):
        nxt[j] = nn if nn is not None else (n, MAXK)
        if first_key[j] is not None:
            nn = first_key[j]
    prv = [(0, 0)] * B
    pp: Optional[Tuple[int, int]] = None
    for j in range(B):
        prv[j] = pp if pp is not None else (0, 0)
        if last_key[j] is not None:
            pp = last_key[j]

    # --- empty leaf patch (two_layer.rs:182-202)
    patchable = leaf in ("linear", "robust_linear", "linear_spline", "cubic")
    for j in range(B - 1):
        if first_key[j] is None and patchable:
            cst = float(nxt[j][0])
            if leaf == "cubic":
                leaf_params[j] = (0.0, 0.0, 0.0, cst)
            else:
                leaf_params[j] = (cst, 0.0)

    def leaf_predict(j, x):
        """``x`` is the RAW key: int-input models (radix tables) keep
        the exact integer (ModelInput::as_int), float models cast
        (as_float — lossy above 2^53, matching `*x as f64`)."""
        if radix_leaf_bits is not None:
            return radix_table_predict(leaf_params[j], int(x))
        x = float(x)
        if leaf == "lognormal":
            return predict_to_int(predict_lognormal(leaf_params[j], x))
        return predict_to_int(predict_model(leaf, leaf_params[j], x))

    def err_between(a, b):
        return abs(min(a, n) - min(b, n))

    # --- error sweep
    counts = [0] * B
    maxerr = [0] * B
    for (k, y), tgt in zip(pairs, targets):
        p = leaf_predict(tgt, k)
        counts[tgt] += 1
        maxerr[tgt] = max(maxerr[tgt], err_between(p, y))

    # --- probes
    final = [0] * B
    for j in range(B):
        ni, nk = nxt[j]
        up = err_between(leaf_predict(j, max(nk - 1, 0)
                                      if not key_is_float
                                      else nk - 2.22e-16),
                         ni + 1)
        pk = prv[j][1]
        pidx = nxt[j - 1][0] if j > 0 else nxt[0][0]
        # reference: prev_idx = j-1 if j>0 else 0; first = next[prev_idx]
        pidx = nxt[j - 1 if j > 0 else 0][0]
        lo = err_between(
            leaf_predict(j, pk + 1 if not key_is_float
                         else pk + 2.22e-16),
            pidx)
        final[j] = max(maxerr[j], up, lo) + max_run[j]

    # --- metrics
    max_err = max(final)
    max_idx = max(range(B), key=lambda j: (final[j], j))
    avg = sum(c * e for c, e in zip(counts, final)) / n
    avg_l2 = sum((c * e) ** 2 / n for c, e in zip(counts, final))
    avg_log2 = sum(c * math.log2(2 * e + 2)
                   for c, e in zip(counts, final)) / n
    max_log2 = math.log2(max_err) if max_err > 0 else -math.inf

    metrics = dict(model_max_error=max_err, model_max_error_idx=max_idx,
                   model_avg_error=avg, model_avg_l2_error=avg_l2,
                   model_avg_log2_error=avg_log2,
                   model_max_log2_error=max_log2,
                   _targets=targets)
    return leaf_params, final, metrics
