"""A/B the new Pallas smear kernel inside the real streaming batch program.

Uses the cached inputs from exp_batch_stages2 (same state, same packs).
Variant 'xla smear' forces the fallback by raising the kernel's VMEM
gate; 'pallas smear' is the new default route.

Run: python scripts/exp_smear_ab.py > /tmp/exp_smear.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")

from exp_batch_stages2 import cached_inputs, DRAIN  # noqa: E402
from slam_toolbox_tpu.mapper import streaming as st  # noqa: E402
from slam_toolbox_tpu.kernels import match_pallas as mp  # noqa: E402


def main():
    pipe, state, packs, odoms = cached_inputs()
    sa = dict(pipe._score_args)
    ba = dict(pipe._batch_args)
    bs = dict(pipe._batch_static)
    state_dev = {k: jnp.asarray(v) for k, v in state.items()}
    packs_dev = jnp.asarray(packs)
    odoms_dev = jnp.asarray(odoms)

    def run(tag, reps=4):
        def fresh(s, p, o, nv, score_args, **kw):
            return st._stream_batch_impl(s, p, o, nv,
                                         score_args=score_args, **kw)

        fn = jax.jit(
            fresh,
            static_argnames=("grid_size", "half_kernel", "acc_r", "parity",
                             "na_coarse", "na_fine"),
        )

        def call(s):
            return fn(s, packs_dev, odoms_dev, jnp.int32(DRAIN),
                      score_args=sa, **ba, **bs)

        t0 = time.perf_counter()
        out = call(state_dev)
        out["results"].block_until_ready()
        t_compile = time.perf_counter() - t0
        res0 = np.asarray(out["results"])
        ts = []
        cur = state_dev
        for _ in range(reps):
            t0 = time.perf_counter()
            out = call(cur)
            out["results"].block_until_ready()
            ts.append(time.perf_counter() - t0)
            cur = out
        print(f"{tag:20s} best {1e3*min(ts):8.1f} ms "
              f"({1e3*min(ts)/DRAIN:6.3f} ms/scan) compile "
              f"{t_compile:.1f}s  all {[round(1e3*x,1) for x in ts]}",
              flush=True)
        return res0

    r_new = run("pallas smear")
    orig = mp.smear_vmem_bytes
    mp.smear_vmem_bytes = lambda G, acc_r=32: 1 << 40  # force XLA fallback
    r_old = run("xla smear")
    mp.smear_vmem_bytes = orig
    same = np.array_equal(r_new, r_old)
    print("results identical:", same, flush=True)
    if not same:
        diff = np.abs(r_new - r_old)
        print("max abs diff:", diff.max(), "at", np.unravel_index(
            diff.argmax(), diff.shape), flush=True)


if __name__ == "__main__":
    sys.exit(main())
