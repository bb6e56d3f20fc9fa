"""Per-stage attribution of the MXU NTT on chip (VERDICT r5 item 5: name
the top time sinks behind the 3-8% roofline fractions, measured not
guessed). Times truncated variants of ntt_mxu._core — after stage 1, 2, 3,
and the final transpose — at the headline shape [135, 2^18] -> 2^21 LDE;
successive differences attribute wall time to each level's banded matmul +
twiddle multiply, and to the closing transpose/reshape.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir("tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.default_backend() == "tpu"

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import ntt_mxu

LG_IN, RATE, BATCH = 18, 3, 135
LG_N = LG_IN + RATE


def truncated_core(x: GF, upto_stage: int, do_transpose: bool) -> GF:
    """ntt_mxu._core with only the first `upto_stage` levels (twiddles
    included), optionally ending with the output transpose."""
    digits, stages, bias_total = ntt_mxu._plan(LG_N, LG_IN, 1, 1, 1, False)
    L = len(digits)
    batch = x.shape[:-1]
    nb = len(batch)
    shape_digits = [stages[0]["K"]] + [1 << d for d in digits[1:]]
    x = x.reshape(*batch, *shape_digits)
    for st in range(min(upto_stage, L)):
        info = stages[st]
        K, R = info["K"], info["R"]
        pre = x.shape
        F = int(np.prod(pre[:nb], dtype=np.int64)) if nb else 1
        G = int(np.prod(pre[nb + 1:], dtype=np.int64)) if len(pre) > nb + 1 \
            else 1
        g3 = ntt_mxu._stage_matmul(x.reshape(F, K, G), info["band"],
                                   bias_total)
        g = g3.reshape(*pre[:nb], *pre[nb + 1:], R)
        for t, (tlo, thi) in info["factors"]:
            tab = GF(jnp.asarray(tlo), jnp.asarray(thi))
            bshape = [1] * g.ndim
            bshape[nb + (t - st - 1)] = tab.shape[1]
            bshape[-1] = tab.shape[0]
            tab = tab.transpose(1, 0).reshape(bshape)
            g = g * tab.broadcast_to(g.shape)
        x = g
    if do_transpose and upto_stage >= L:
        perm = tuple(range(nb)) + tuple(range(nb + L - 1, nb - 1, -1))
        x = x.transpose(*perm)
        x = x.reshape(*batch, 1 << LG_N)
    return x


def timed(fn, x, iters=5):
    from bench import _sync, _floor_s

    jfn = jax.jit(fn)
    out = jfn(GF(x.lo ^ np.uint32(99), x.hi))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = jfn(GF(x.lo ^ np.uint32(i + 1), x.hi))
    _sync(out)
    return max(time.perf_counter() - t0 - _floor_s(), 1e-9) / iters


def main():
    rng = np.random.default_rng(0)
    x = GF.from_u64(rng.integers(0, ref.ORDER, size=(BATCH, 1 << LG_IN),
                                 dtype=np.uint64))
    digits, _, _ = ntt_mxu._plan(LG_N, LG_IN, 1, 1, 1, False)
    L = len(digits)
    print(f"shape [{BATCH}, 2^{LG_IN}] -> 2^{LG_N}, digits {digits}",
          flush=True)
    marks = []
    for k in range(1, L + 1):
        dt = timed(lambda a, kk=k: truncated_core(a, kk, False), x)
        marks.append((f"stages<= {k}", dt))
        print(f"  through stage {k}: {dt*1e3:8.2f} ms", flush=True)
    dt_full = timed(lambda a: truncated_core(a, L, True), x)
    marks.append(("full(+transpose)", dt_full))
    print(f"  full + transpose:  {dt_full*1e3:8.2f} ms", flush=True)
    prev = 0.0
    print("attribution:", flush=True)
    for name, dt in marks:
        print(f"  {name:>18}: +{(dt - prev)*1e3:8.2f} ms", flush=True)
        prev = dt
    n_out = BATCH << LG_N
    print(f"rate {n_out/dt_full/1e9:.2f} G el/s "
          f"({n_out*32/dt_full/1e9:.0f} GB/s HBM-lower-bound)", flush=True)


if __name__ == "__main__":
    main()
