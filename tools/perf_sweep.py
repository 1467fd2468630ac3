#!/usr/bin/env python
"""Sweep batch size x scan-unroll for the bench loop (ad-hoc perf tool)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA executable cache: second-process compiles deserialize
# instead of recompiling (rware_tpu/compile_cache; RWARE_TPU_NO_CACHE=1 opts out)
from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax, jax.numpy as jnp

def main():
    import rware_tpu
    from rware_tpu.parallel import batched_reset
    env = rware_tpu.make('rware-tiny-2ag-v2')
    step_fn = env._step_fn
    reset_fn = env._reset_fn
    T = 256
    for B in [4096, 16384, 65536]:
        for unroll in [1, 8]:
            def one_env(state, key):
                def body(carry, k):
                    res = step_fn(carry, env.sample_actions(k))
                    rk, ck = jax.random.split(res.state.key)
                    fresh = reset_fn(rk).replace(key=ck)
                    nxt = jax.tree.map(lambda a, b: jnp.where(res.done, a, b), fresh, res.state)
                    return nxt, None
                final, _ = jax.lax.scan(body, state, jax.random.split(key, T), unroll=unroll)
                return final
            run = jax.jit(jax.vmap(one_env))
            states, _ = batched_reset(env, jax.random.key(0), B)
            keys = jax.random.split(jax.random.key(1), B)
            out = run(states, keys); jax.block_until_ready(out)
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(states, keys); jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            print(f"B={B:6d} unroll={unroll:2d}  {best*1e3:8.1f} ms  {B*T/best/1e6:8.2f} M env-steps/s", flush=True)

if __name__ == '__main__':
    main()
