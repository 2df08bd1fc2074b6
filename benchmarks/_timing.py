"""Shared timing helper implementing the repo's hardened TPU protocol.

Under a non-empty remote pipeline (a second TPU process, or several
un-drained async dispatches), `block_until_ready` returns immediately and
timings become silent garbage (observed "22-196 TB/s"; CLAUDE.md).  The
protocol: start every timed region from a DRAINED queue and end it with a
VALUE READBACK -- a device-to-host transfer cannot complete before every
prior dispatch on the device has retired.

Usage:
    readback(f(x))          # drain the queue before t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    readback(out)           # readback barrier ends the region
    dt = time.perf_counter() - t0
"""
import jax
import jax.numpy as jnp


def readback(x) -> float:
    """Transfer ONE scalar of `x` (any pytree of arrays) to the host.

    The scalar is sliced on-device first: transferring the whole leaf
    would put a potentially-multi-MB device-to-host copy inside the timed
    region (the slice op itself depends on the leaf's producer, so the
    barrier semantics are preserved)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])
