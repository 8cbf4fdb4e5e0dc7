"""Debug: locate + characterize sorted-serve kernel mismatches."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import gen_books_like  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import lookup_fast as lf  # noqa: E402
from rmi_tpu.train.api import train  # noqa: E402
from rmi_tpu.ops import sorted_serve_kernel as ssk  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)
    plan = lf.get_plan(r)

    q = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(7), (nq,), 0, 2**62,
        dtype=jnp.int64).astype(jnp.uint64))
    out = lf.fast_search_sorted(r, q)
    want = jnp.searchsorted(ds.keys, q, side="left")
    bad = np.nonzero(np.asarray(out != want))[0]
    print(f"mismatches: {len(bad)}")
    qn = np.asarray(q)
    outn = np.asarray(out)
    wantn = np.asarray(want)
    kn = np.asarray(ds.keys)
    midx, base_sf, maxes = lf._sorted_stats(
        q, r.device_top_params, plan.rows_u32,
        jnp.float64(r.norm_offset), jnp.float64(r.norm_scale),
        r.keys[0], r.keys[-1], top_type=r.top_type,
        B=r.branching_factor, S=plan.S, key_type=r.key_type)
    midxn = np.asarray(midx)
    m_leaf, m_sub, m_blk = (int(v) for v in np.asarray(maxes))
    print(f"m_leaf={m_leaf} m_sub={m_sub} m_blk={m_blk}")
    rows = np.asarray(plan.rows_u32)
    for i in bad[:12]:
        blk = i // ssk.KQ
        sub = i // ssk.SUBQ
        lane = i % ssk.SUBQ
        leaf = midxn[i]
        base = rows[leaf, 0]
        print(f"i={i} blk={blk} sub(in blk)={sub % ssk.NSUB} lane={lane} "
              f"leaf={leaf} base_row={base} got={outn[i]} want={wantn[i]} "
              f"diff={int(outn[i]) - int(wantn[i])}")
        print(f"   q={qn[i]} key[want]={kn[wantn[i]] if wantn[i] < n else None} "
              f"key[want-1]={kn[wantn[i]-1] if wantn[i] > 0 else None}")
        # what the gather path says
        g1 = int(lf.fast_search(r, q[int(i):int(i) + 1])[0])
        print(f"   gather path says {g1}")


if __name__ == "__main__":
    main()
