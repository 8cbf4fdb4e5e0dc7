"""Bit-manipulation root models: radix, balanced radix, radix hint
tables (radix.rs, balanced_radix.rs).

All operate on the u64 view of the key (models/mod.rs:428-433) and are
top-layer models.  Shared machinery:

  * ``num_bits(largest)`` — the reference's loop (utils.rs:13-21)
    ``while (1 << (nbits+1)) - 1 <= largest`` expressed as a vector
    count of satisfied thresholds;
  * ``common_prefix_size`` — OR/AND sweeps + count-leading-zeros
    (utils.rs:23-36) as two bitwise reductions and ``lax.clz``;
  * monotone bucket functions, which make every histogram/hint-table
    construction a ``searchsorted`` instead of a scatter: the bucket of
    a key is non-decreasing over the sorted array, so "first key in
    bucket >= b" is a binary search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rmi_tpu.keys import as_int
from rmi_tpu.models.base import ModelDef, Restriction, register
from rmi_tpu.utils import segments as seg


def num_bits_device(largest_u64):
    """Largest nbits with (1<<(nbits+1))-1 <= largest (utils.rs:13-21).

    The loop count equals #{j >= 0 : 2^(j+1)-1 <= largest}.  The
    reference asserts nbits >= 1 (fails on largest==0); we clamp to 1.
    """
    j = jnp.arange(63, dtype=jnp.uint64)
    thresholds = (jnp.uint64(1) << (j + 1)) - jnp.uint64(1)
    nbits = jnp.sum(thresholds <= largest_u64).astype(jnp.uint64)
    return jnp.maximum(nbits, jnp.uint64(1))


def common_prefix_size_device(keys_u64):
    """Number of leading bit positions constant across all keys
    (utils.rs:23-36)."""
    any_ones = jax.lax.reduce(keys_u64, jnp.uint64(0),
                              jax.lax.bitwise_or, (0,))
    no_ones = jax.lax.reduce(keys_u64, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                             jax.lax.bitwise_and, (0,))
    any_zeros = ~no_ones
    constant_bits = any_zeros ^ any_ones  # 1 where the bit never varies
    return jax.lax.clz(~constant_bits).astype(jnp.uint64)


def _shl(x, amount):
    """x << amount with Rust-release semantics guarded: amount >= 64
    yields 0 instead of UB."""
    a = jnp.minimum(amount, jnp.uint64(63))
    return jnp.where(amount >= jnp.uint64(64), jnp.uint64(0), x << a)


def _shr(x, amount):
    a = jnp.minimum(amount, jnp.uint64(63))
    return jnp.where(amount >= jnp.uint64(64), jnp.uint64(0), x >> a)


# ---------------------------------------------------------------------------
# radix (radix.rs:13-81)
# ---------------------------------------------------------------------------

def _radix_fit_top(keys_f, ys_f, ep_ys_f, n, keys=None, **_):
    ki = as_int(keys)
    # largest FixDups-scaled target: targets are non-decreasing => last.
    largest = ys_f[n - 1].astype(jnp.uint64)
    bits = num_bits_device(largest)
    prefix = common_prefix_size_device(ki)
    return {"w_int": jnp.stack([prefix, bits])}


def _radix_predict(params, leaf_idx, keys, key_type=None):
    w = params["w_int"]
    prefix, bits = w[0], w[1]
    ki = as_int(keys)
    res = _shr(_shl(ki, prefix), jnp.uint64(64) - bits)
    return jnp.where(bits == 0, jnp.uint64(0), res)


register(ModelDef(
    name="radix", ppm=2, restriction=Restriction.MUST_BE_TOP,
    needs_bounds_check=False, output_int=True, leaf_capable=False,
    fit_top=_radix_fit_top, fit_leaves=None,
    predict=_radix_predict, constant_params=None,
    bytes_per_model=16, function_name="radix"))


# ---------------------------------------------------------------------------
# bradix — balanced radix (balanced_radix.rs:20-170)
# ---------------------------------------------------------------------------

def _bradix_bucket(ki, prefix, bits, clamp, high):
    res = _shr(_shl(ki, prefix), jnp.uint64(64) - bits)
    hi = jnp.minimum(res, clamp)
    lo = jnp.where(res < clamp, jnp.uint64(0), res - clamp)
    return jnp.where(high, hi, lo)


def _bradix_fit_top(keys_f, ys_f, ep_ys_f, n, keys=None, B=None, **_):
    """Try {bits, bits+1} x {clamp-high, shift-low}, pick min chi^2 vs a
    uniform bucket distribution (balanced_radix.rs:39-85).

    Buckets are monotone in the key, so each candidate's occupancy
    histogram comes from a searchsorted over its bucket array rather
    than a bincount scatter.
    """
    ki = as_int(keys)
    largest = ys_f[n - 1].astype(jnp.uint64)  # max scaled target
    max_output = largest
    bits = num_bits_device(largest)
    prefix = common_prefix_size_device(ki)

    # chi2 over max_output bins needs a static bin count; max_output =
    # max scaled target < B, so B bounds it.
    nbins = int(B)

    def chi2(bucket_u64):
        # counts_j = #keys with bucket == j for j < max_output; the
        # reference indexes a Vec of length max_output and would abort
        # beyond it — we clip instead (documented divergence for
        # pathological low-variant overflow).
        b = jnp.minimum(bucket_u64,
                        jnp.maximum(max_output, jnp.uint64(1)) - 1)
        # b is monotone over the sorted keys -> blocked sorted_starts
        # instead of searchsorted's dependent-gather loop
        bounds = seg.sorted_starts(b, nbins + 1)
        counts = (bounds[1:] - bounds[:nbins]).astype(jnp.float64)
        live = jnp.arange(nbins, dtype=jnp.uint64) < max_output
        e = jnp.float64(n) / jnp.maximum(jnp.float64(max_output), 1.0)
        return jnp.sum(jnp.where(live, (counts - e) ** 2 / e, 0.0))

    scores = []
    cands = []
    one = jnp.uint64(1)
    for db in (0, 1):   # test_bits in bits..min(bits+2, 64)
        tb = jnp.minimum(bits + jnp.uint64(db), jnp.uint64(63))
        valid = (bits + jnp.uint64(db)) < jnp.uint64(64)
        bits_max = (_shl(one, tb + one)) - one
        clamp_high = max_output - one          # u64 wrap if max_output==0
        clamp_low = max_output - bits_max      # u64 wraps like release Rust
        for high, clamp in ((True, clamp_high), (False, clamp_low)):
            bucket = _bradix_bucket(ki, prefix, tb, clamp,
                                    jnp.asarray(high))
            score = jnp.where(valid, chi2(bucket), jnp.inf)
            scores.append(score)
            cands.append(jnp.stack([prefix, tb, clamp,
                                    jnp.uint64(1 if high else 0)]))

    scores = jnp.stack(scores)
    cands = jnp.stack(cands)
    best = jnp.argmin(scores)  # first-wins, matching the strict < scan
    w = cands[best]
    return {"w_int": w[:3], "high": w[3]}


def _bradix_predict(params, leaf_idx, keys, key_type=None):
    w = params["w_int"]
    return _bradix_bucket(as_int(keys), w[0], w[1], w[2],
                          params["high"] != 0)


register(ModelDef(
    name="bradix", ppm=3, restriction=Restriction.MUST_BE_TOP,
    needs_bounds_check=False, output_int=True, leaf_capable=False,
    fit_top=_bradix_fit_top, fit_leaves=None,
    predict=_bradix_predict, constant_params=None,
    bytes_per_model=24, function_name="bradix"))


# ---------------------------------------------------------------------------
# radix hint tables: radix8/18/22/26/28 (radix.rs:83-170)
# ---------------------------------------------------------------------------

def _table_bucket(ki, prefix, table_bits):
    # ((x << prefix) >> prefix) >> (prefix+bits > 64 ? 0 : 64-prefix-bits)
    shift = jnp.where(prefix + table_bits > jnp.uint64(64), jnp.uint64(0),
                      jnp.uint64(64) - (prefix + table_bits))
    return _shr(_shr(_shl(ki, prefix), prefix), shift)


def _make_radix_table_fit(bits: int):
    def fit(keys_f, ys_f, ep_ys_f, n, keys=None, **_):
        ki = as_int(keys)
        prefix = common_prefix_size_device(ki)
        tb = jnp.uint64(bits)
        bucket = _table_bucket(ki, prefix, tb)
        size = 1 << bits
        # table[b] = scaled target of the first key with bucket >= b;
        # buckets past the last key's get the table SIZE (the
        # reference's fill value is hint_table.len(), radix.rs:111-113).
        # buckets are monotone over sorted keys and slots are arange:
        # blocked sorted_starts, not searchsorted (~5s -> ms at 2^22)
        first = seg.sorted_starts(bucket, size)
        slots = jnp.arange(size, dtype=jnp.uint64)
        vals = ys_f[jnp.clip(first, 0, n - 1)].astype(jnp.uint32)
        table = jnp.where(slots > bucket[n - 1], jnp.uint32(size), vals)
        # bucket 0 keeps its initial 0: the construction loop's
        # last_radix starts at 0, so the first key never writes slot 0
        # (radix.rs:94-108).  Identical at the top (first y == 0);
        # load-bearing for leaf tables where y values are global.
        table = table.at[0].set(jnp.uint32(0))
        return {"w_int": jnp.stack([prefix, tb]), "table": table}
    return fit


_RT_LEAF_CAP = 1 << 26   # max total table entries across leaves (256MB)


def _make_radix_table_fit_leaves(bits: int):
    def fit_leaves(xf, yf, spans, keys_f, xf_raw=None, keys_raw=None,
                   pallas_span=None):
        """Per-leaf hint tables (RadixTable::new per leaf container,
        radix.rs:90-120, placeable anywhere per radix.rs:167-169).

        Vectorized construction: within a leaf's augmented container
        all keys share the per-leaf common prefix (= clz(first XOR
        last) on sorted data), so "first key with bucket >= b" is a
        global searchsorted of the VALUE threshold
        top_bits | (b << shift) clipped into the leaf's span.

        NOTE: the reference cannot correctly SERIALIZE this layer (its
        generated code bakes one shared prefix into the emitted
        radix_table function, radix.rs:146-160, while prefixes are
        per-leaf); our artifact stores the per-leaf prefix alongside
        each table — a documented, strictly-correcting divergence.
        """
        if keys_raw is None:
            raise ValueError("radix-table leaves need raw integer keys")
        ki = as_int(keys_raw)
        n = spans.n
        B = spans.B
        size = 1 << bits
        if B * size > _RT_LEAF_CAP:
            raise ValueError(
                f"radix{bits} leaf layer needs {B} x {4 * size} bytes of "
                f"hint tables; reduce the branching factor or table bits")

        first, last = seg.aug_first_last(spans)
        kf = ki[first]
        kl = ki[last]
        empty = ~spans.nonempty
        xor = kf ^ kl
        prefix = jnp.where(
            xor == jnp.uint64(0), jnp.uint64(64),
            jax.lax.clz(xor).astype(jnp.uint64))
        # empty container: OR/AND sweep over nothing -> prefix 0
        # (utils.rs:23-36 identities)
        prefix = jnp.where(empty, jnp.uint64(0), prefix)

        tb = jnp.uint64(bits)
        shift = jnp.where(prefix + tb > jnp.uint64(64), jnp.uint64(0),
                          jnp.uint64(64) - prefix - tb)
        low_first = _shr(_shl(kf, prefix), prefix)
        top_bits = kf - low_first                        # leaf-constant
        bucket_last = _shr(_shr(_shl(kl, prefix), prefix), shift)

        slots = jnp.arange(size, dtype=jnp.uint64)
        thresholds = (top_bits[:, None]
                      + (slots[None, :] << shift[:, None]))  # [B, size]
        # thresholds are NOT globally sorted (leaf windows overlap), so
        # this is hier_count's ladder, not sorted_starts
        ss = seg.hier_count(ki, thresholds.reshape(-1),
                            strict=True).reshape(B, size)
        idx = jnp.clip(ss, spans.aug_starts[:, None],
                       jnp.maximum(spans.aug_ends[:, None] - 1, 0))
        yfix_u32 = yf.astype(jnp.uint32)                 # y as u32
        vals = yfix_u32[jnp.clip(idx, 0, n - 1)]
        trailing = slots[None, :] > bucket_last[:, None]
        table = jnp.where(trailing, jnp.uint32(size), vals)
        table = table.at[:, 0].set(jnp.uint32(0))        # slot-0 quirk
        # empty leaves: table[0] = 0, rest = size (radix.rs:111-113
        # with an empty construction loop)
        table = jnp.where(
            empty[:, None] & (slots[None, :] > 0), jnp.uint32(size),
            table)
        return {"tables": table, "prefixes": prefix, "shifts": shift}
    return fit_leaves


def _radix_table_predict(params, leaf_idx, keys, key_type=None):
    ki = as_int(keys)
    if "tables" in params:
        # leaf layer: per-leaf prefix/shift + flattened table gather
        from rmi_tpu.utils.segments import iso_take
        tables = params["tables"]
        B, size = tables.shape
        if leaf_idx is None:
            prefix = params["prefixes"][0]
            shift = params["shifts"][0]
            base = jnp.uint64(0)
        else:
            prefix = iso_take(params["prefixes"], leaf_idx)
            shift = iso_take(params["shifts"], leaf_idx)
            base = leaf_idx.astype(jnp.uint64) * jnp.uint64(size)
        bucket = _shr(_shr(_shl(ki, prefix), prefix), shift)
        flat = tables.reshape(-1)
        return jnp.take(flat, (base + bucket).astype(jnp.int64)
                        ).astype(jnp.uint64)
    w = params["w_int"]
    bucket = _table_bucket(ki, w[0], w[1])
    return params["table"][bucket].astype(jnp.uint64)


for _bits in (8, 18, 22, 26, 28):
    register(ModelDef(
        name=f"radix{_bits}", ppm=1, restriction=Restriction.NONE,
        needs_bounds_check=False, output_int=True, leaf_capable=True,
        fit_top=_make_radix_table_fit(_bits),
        fit_leaves=_make_radix_table_fit_leaves(_bits),
        predict=_radix_table_predict, constant_params=None,
        bytes_per_model=4 * (1 << _bits), function_name="radix_table"))
