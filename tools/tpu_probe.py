"""TPU health probe: exit 0 iff a trivial device op completes quickly.

The axon terminal compiles remotely and SERIALIZES requests: a giant
program sent for compile (or a stale claim from a SIGKILLed client)
blocks every other client's InitRequest — observed live on 2026-08-20
when the 6x-unrolled Allen-Cahn GN refined program wedged the worker
for >45 min and three successive campaign legs burned their timeouts
against a dead device. Campaign chains call this between legs and wait
instead of launching into a wedge.

Usage: timeout 60 python tools/tpu_probe.py  (rc 0 = healthy)
"""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    ok = float(x[0, 0]) == 8.0
    print(f"tpu probe: {'ok' if ok else 'BAD VALUE'} "
          f"({jax.devices()[0].platform})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
