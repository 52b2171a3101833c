#!/usr/bin/env python
"""Training-step throughput for config #1 (device-only: synthetic batch
resident on device; measures the jitted fwd+bwd+update program)."""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.train import OptimizerConfig, create_train_state, make_train_step

    B = 256
    model = CTCRecognizer(num_classes=37)  # loss_impl auto -> pallas on TPU
    tx = OptimizerConfig(name="sgd", lr=0.01, schedule="constant").make()

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 100, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(1, 37, (B, 16)), jnp.int32),
        "label_length": jnp.asarray(np.full((B,), 12), jnp.int32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step_fn = make_train_step(model, tx, donate=False)

    # chain steps inside one program for tunnel-safe timing
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(state, batch, iters):
        def body(s, _):
            s, m = step_fn(s, batch)  # nested jit inlines into the scan
            return s, m["loss"]

        s, losses = jax.lax.scan(body, state, None, length=iters)
        return s, losses[-1]

    def timed(iters):
        t0 = time.perf_counter()
        s, l = loop(state, batch, iters)
        float(l)
        return time.perf_counter() - t0

    K1, K2 = 2, 10
    timed(K1)
    timed(K2)
    t1 = min(timed(K1) for _ in range(2))
    t2 = min(timed(K2) for _ in range(2))
    per_step = (t2 - t1) / (K2 - K1)
    print(
        json.dumps(
            {
                "metric": "ctc_train_step",
                "batch": B,
                "ms_per_step": round(per_step * 1e3, 2),
                "images_per_sec": round(B / per_step, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
