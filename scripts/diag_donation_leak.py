"""Does dtype-changing donation LEAK on the axon PJRT plugin?

12 iterations of: alloc 2 GB bf16 -> donate into a jit whose output has a
different dtype (no aliasing possible) -> fetch a scalar. If donation
frees, steady state is ~2 GB and all 12 pass. If donated-unaliasable
buffers leak, iterations start failing around #7 (16.5 GB / 2 GB).
Control: same loop with explicit client-side del (proven to reclaim by
diag_6b_probe initdel).

Run on the real chip: python scripts/diag_donation_leak.py [donate|del]
"""

import functools
import gc
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "donate"
    n = int(2e9 / 2)  # 2 GB bf16

    @functools.partial(jax.jit, donate_argnums=(0,) if mode == "donate" else ())
    def consume(x):
        # different dtype + different shape: aliasing impossible
        return x[::1000003].astype(jnp.float32).sum()

    make = jax.jit(lambda s: jnp.full((n,), s, jnp.bfloat16))
    print(f"devices: {jax.devices()} mode={mode}", flush=True)
    for i in range(12):
        try:
            x = make(np.float32(i + 1))
            r = consume(x)
            val = float(r)  # honest sync (block_until_ready lies here)
            if mode == "del":
                del x
                gc.collect()
            print(f"iter {i}: ok ({val:.1f})", flush=True)
        except Exception as e:
            print(f"iter {i}: FAILED {e!r}"[:200], flush=True)
            return 1
    print("NO LEAK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
