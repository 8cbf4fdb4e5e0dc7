"""Bisect the 200M cubic,loglinear TPU worker crash: run the build
stage-by-stage (RMI_PALLAS=0 + staged) to see whether the fault lives
in the Pallas df64 sweep monolith or in the chunked loglinear fit.

Usage: python probes/probe_loglin200m.py {staged|pallas}
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "staged"
if mode == "staged":
    os.environ["RMI_PALLAS"] = "0"
    os.environ["RMI_BUILD_STAGED"] = "1"
    os.environ["RMI_PROFILE_BUILD"] = "1"

import jax
import jax.numpy as jnp
from bench import gen_books_like
from rmi_tpu.data import RMIDataset
from rmi_tpu.train.api import train

t0 = time.time()
keys = gen_books_like(200_000_000)
from rmi_tpu.keys import KeyType
ds = RMIDataset(keys=keys, key_type=KeyType.U64)
print(f"keygen {time.time()-t0:.1f}s", flush=True)
r = train(ds, "cubic,loglinear", 65536)
print(f"train done {time.time()-t0:.1f}s eval={r.eval_mode} "
      f"max_err={r.model_max_error} avg_log2={r.model_avg_log2_error:.4f}",
      flush=True)
