"""Differential-test bridge between the reference env and the JAX engine.

The reference scatters state over mutable Python objects; the JAX engine keeps
one pytree.  Entity correspondence is positional: reference ``self.agents[i]``
/ ``self.shelfs[i]`` map to index ``i`` device-side (both sides create shelves
in row-major rack order at reset — rware/warehouse.py:771-778 and
layout.shelf_slots — so the identity holds from reset onward).

RNG streams differ by construction (gymnasium PCG64 vs JAX counter-based
keys), so trajectory parity is checked by (a) injecting the reference's reset
state into the JAX engine and (b) re-syncing the request queue from the
reference after every step — queue resampling is the ONLY RNG consumer inside
``step`` (rware/warehouse.py:915-917), so syncing it removes all stream
divergence while still exercising every deterministic code path.
"""
import contextlib

import numpy as np
import jax.numpy as jnp

from rware_tpu.core.state import WarehouseState


@contextlib.contextmanager
def pinned_reference_tiebreak(ref_env):
    """Pin the reference's equal-chain tie-break to lowest-agent-index.

    The reference resolves equal-length-chain contention by whatever order
    ``nx.dag_longest_path`` sees predecessor edges in — which traces back to
    Python SET iteration order inside ``weakly_connected_components`` /
    ``subgraph().copy()``: a hash-table artifact of the cell tuples, not a
    behavioural rule (SURVEY.md §2 #8, verified here by instrumentation).
    The JAX engine uses the deterministic rule "deepest chain wins, ties to
    the lowest agent index".  This context manager monkeypatches the
    reference's longest-path call with a DP implementing that exact rule, so
    lockstep comparisons are bit-exact; outside ties the DP returns the same
    longest path networkx would.

    How much behaviour does the pin decide?  Measured with
    tools/tie_stats.py (random actions, 16k env-steps/config): equal-depth
    contention occurs on ~0.02% of env-steps for tiny-2ag, ~0.04-0.1% for
    the 4-8 agent registered configs, ~1% at 12 agents — everywhere else
    the two implementations agree without any pinning.
    """
    import networkx as nx

    env = ref_env.unwrapped if hasattr(ref_env, "unwrapped") else ref_env
    orig = nx.algorithms.dag_longest_path

    def lowest_index_longest_path(comp, *args, **kwargs):
        agent_at = {(a.x, a.y): i for i, a in enumerate(env.agents)}
        dist = {}
        for v in nx.topological_sort(comp):
            best = None
            for u in comp.pred[v]:
                cand = (dist[u][0] + 1, -agent_at.get(tuple(u), 10**9))
                if best is None or cand > best[:2]:
                    best = cand + (u,)
            dist[v] = (best[0], best[2]) if best else (0, None)
        v = max(dist, key=lambda n: dist[n][0])
        path = [v]
        while dist[v][1] is not None:
            v = dist[v][1]
            path.append(v)
        return list(reversed(path))

    nx.algorithms.dag_longest_path = lowest_index_longest_path
    try:
        yield
    finally:
        nx.algorithms.dag_longest_path = orig


def state_from_ref(ref_env, config, key) -> WarehouseState:
    """Build a WarehouseState mirroring a (reset) reference env."""
    env = ref_env.unwrapped if hasattr(ref_env, "unwrapped") else ref_env
    n = len(env.agents)
    msg_bits = env.msg_bits
    shelf_index = {id(s): i for i, s in enumerate(env.shelfs)}
    return WarehouseState(
        agent_x=jnp.asarray([a.x for a in env.agents], dtype=jnp.int32),
        agent_y=jnp.asarray([a.y for a in env.agents], dtype=jnp.int32),
        agent_dir=jnp.asarray([a.dir.value for a in env.agents], dtype=jnp.int32),
        agent_carrying=jnp.asarray(
            [
                shelf_index[id(a.carrying_shelf)] if a.carrying_shelf else -1
                for a in env.agents
            ],
            dtype=jnp.int32,
        ),
        agent_has_delivered=jnp.asarray(
            [bool(a.has_delivered) for a in env.agents], dtype=bool
        ),
        agent_message=jnp.asarray(
            np.stack([np.asarray(a.message, dtype=np.float32) for a in env.agents])
            if msg_bits
            else np.zeros((n, 0), dtype=np.float32)
        ),
        shelf_x=jnp.asarray([s.x for s in env.shelfs], dtype=jnp.int32),
        shelf_y=jnp.asarray([s.y for s in env.shelfs], dtype=jnp.int32),
        request_queue=jnp.asarray(
            [shelf_index[id(s)] for s in env.request_queue], dtype=jnp.int32
        ),
        cur_steps=jnp.asarray(env._cur_steps, dtype=jnp.int32),
        cur_inactive_steps=jnp.asarray(env._cur_inactive_steps, dtype=jnp.int32),
        key=key,
    )


def sync_queue_from_ref(state: WarehouseState, ref_env) -> WarehouseState:
    """Overwrite the JAX queue with the reference's (post-RNG-resample)."""
    env = ref_env.unwrapped if hasattr(ref_env, "unwrapped") else ref_env
    shelf_index = {id(s): i for i, s in enumerate(env.shelfs)}
    queue = jnp.asarray(
        [shelf_index[id(s)] for s in env.request_queue], dtype=jnp.int32
    )
    return state.replace(request_queue=queue)


def compare_to_ref(state: WarehouseState, ref_env, check_queue_slots=False):
    """Return a list of human-readable mismatches between the two states."""
    env = ref_env.unwrapped if hasattr(ref_env, "unwrapped") else ref_env
    errs = []
    shelf_index = {id(s): i for i, s in enumerate(env.shelfs)}
    for i, a in enumerate(env.agents):
        if int(state.agent_x[i]) != a.x or int(state.agent_y[i]) != a.y:
            errs.append(
                f"agent {i}: pos ({int(state.agent_x[i])},{int(state.agent_y[i])})"
                f" != ref ({a.x},{a.y})"
            )
        if int(state.agent_dir[i]) != a.dir.value:
            errs.append(f"agent {i}: dir {int(state.agent_dir[i])} != {a.dir.value}")
        ref_carry = shelf_index[id(a.carrying_shelf)] if a.carrying_shelf else -1
        if int(state.agent_carrying[i]) != ref_carry:
            errs.append(
                f"agent {i}: carrying {int(state.agent_carrying[i])} != {ref_carry}"
            )
        if bool(state.agent_has_delivered[i]) != bool(a.has_delivered):
            errs.append(f"agent {i}: has_delivered mismatch")
    for j, s in enumerate(env.shelfs):
        if int(state.shelf_x[j]) != s.x or int(state.shelf_y[j]) != s.y:
            errs.append(
                f"shelf {j}: pos ({int(state.shelf_x[j])},{int(state.shelf_y[j])})"
                f" != ref ({s.x},{s.y})"
            )
    if check_queue_slots:
        ref_q = [shelf_index[id(s)] for s in env.request_queue]
        ours = [int(v) for v in state.request_queue]
        if ours != ref_q:
            errs.append(f"queue {ours} != ref {ref_q}")
    return errs
