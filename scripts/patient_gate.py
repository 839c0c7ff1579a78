"""Patient relay gate: ONE fresh-shape compile with a long in-process budget.

scripts/tpu_probe.py's 120 s compile timeout is right for detecting a wedge
but wrong for WAITING one out: killing its compile mid-flight every retry is
itself the wedge trigger (CLAUDE.md). This gate submits a single trivial but
cache-busting jit and simply waits — a recovering relay that takes 3-15 min
per compile passes here and would flap the strict probe forever.

Exit 0 when the compile+execute round-trips; nonzero on any error. Pair with
an OUTER `timeout 1800` so a truly dead relay still bounds the wait, and
accept that one outer timeout may leave the relay no worse than it was.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    d = jax.devices()
    print(f"devices ok in {time.time()-t0:.1f}s: {d[0].platform}", flush=True)
    # fresh shape each run so the compile cache can't mask a wedge
    n = 128 + (int(time.time()) % 7) * 8
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                    dtype=jnp.bfloat16)
    t0 = time.time()
    y = jax.jit(lambda a: (a @ a).sum())(x)
    v = jax.device_get(y)
    # repr, not a float format: the relay's device_get can hand back ml_dtypes
    # scalars whose __format__ rejects 'f'
    print(f"compile+run ok in {time.time()-t0:.1f}s (n={n}, v={v!r})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
