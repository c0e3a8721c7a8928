"""Exit 0 iff the remote TPU service currently accepts BOTH a ~130 MB
device_put and a fresh (cache-defeating) jit compile. Used by
runs/tpu_chain.sh to wait out compile-service outages instead of
burning job retries."""

import sys
import time

import numpy as np

t0 = time.time()
try:
    import jax
    import jax.numpy as jnp

    c = float(np.random.default_rng().integers(1, 10**9))
    x = jnp.asarray(np.ones((32 * (1 << 20),), np.float32))  # 128 MB put
    y = jax.jit(lambda v: v * c + c)(x)
    np.asarray(y.reshape(-1)[0])
    print(f"probe OK in {time.time() - t0:.1f}s")
except Exception as e:  # noqa: BLE001
    print(f"probe FAIL after {time.time() - t0:.1f}s: "
          f"{str(e).splitlines()[0][:100]}")
    sys.exit(1)
