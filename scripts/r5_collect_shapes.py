"""Collect every NTT-family call (fn, shape, shift/rate args) made by the
fib(100) prove + recursive wrap chain, running on CPU (the reference-green
backend). Output: tpu_logs/r5_ntt_shapes.json — replayed on the TPU by
scripts/r5_ntt_parity.py to hunt the path that breaks the outer proof.
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_tpu.ops import ntt  # noqa: E402

CALLS = []
_SEEN = set()


def _wrap(name, orig):
    def wrapped(x, *a, **k):
        rec = {"fn": name, "shape": list(x.shape)}
        args = list(a) + [k[key] for key in sorted(k)]
        rec["args"] = [int(v) if v is not None else None for v in args]
        key = json.dumps(rec, sort_keys=True)
        if key not in _SEEN:
            _SEEN.add(key)
            CALLS.append(rec)
            print("NTT", rec, flush=True)
        return orig(x, *a, **k)
    return wrapped


for _name in ["fft", "ifft", "coset_fft", "coset_ifft", "lde_fft",
              "coset_lde"]:
    setattr(ntt, _name, _wrap(_name, getattr(ntt, _name)))

import time  # noqa: E402

from tests.golden_common import build_fib100, build_fib100_wrap  # noqa: E402

t0 = time.time()
data, proof = build_fib100()
data.verify(proof)
print(f"fib green on CPU in {time.time()-t0:.0f}s; "
      f"degree_bits={data.common.degree_bits}", flush=True)
n_fib = len(CALLS)
for c in CALLS:
    c["phase"] = "fib"

t0 = time.time()
outer, op = build_fib100_wrap(data, proof)
outer.verify(op)
print(f"wrap green on CPU in {time.time()-t0:.0f}s; "
      f"outer degree_bits={outer.common.degree_bits}", flush=True)
for c in CALLS[n_fib:]:
    c["phase"] = "wrap"

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tpu_logs", "r5_ntt_shapes.json")
with open(out, "w") as f:
    json.dump(CALLS, f, indent=1)
print("wrote", out, len(CALLS), "unique calls", flush=True)
