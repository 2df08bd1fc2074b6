"""Opt-in one-shot autotune of the rank-vs-sort aggregation crossover.

The aggregate='auto' rules in `embedding._resolve_aggregate` are measured
on v5e; other TPU generations fall back to the (always-correct) sort path
unless this module has cached rules for them.  `autotune_rank_rules()`
measures the rank-kernel-vs-sort-path fwd+bwd margin at full lanes for a
ladder of bucket widths on the CURRENT chip, derives the crossover caps and
lane-waste thresholds with the same ~10% safety the v5e hand-tuning used,
and caches them keyed by `device_kind` so the measurement runs once per
machine.

Usage:
    python -m fsw_gnn_tpu.cli autotune          # measure + cache
or  from fsw_gnn_tpu.utils.autotune import autotune_rank_rules
    autotune_rank_rules()

Cache: FSW_AUTOTUNE_CACHE (default ~/.cache/fsw_gnn_tpu/autotune.json).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

SAFETY = 1.1          # a config must win by >10% at full lanes to qualify
PROBE_BUCKETS = (32, 64, 128, 256)
PROBE_ENTRIES = 1 << 17
# Known bias (round-4 first HW run): the single-compile timing includes
# the per-call dispatch RTT amortized over only `steps` scan iterations,
# which compresses every sort/rank ratio (both pay the same absolute
# overhead; the faster impl pays more RELATIVE overhead) -- margins are
# systematically CONSERVATIVE vs the dedicated differenced benchmarks
# (cart B=32: 2.43x here vs 9.5x there).  steps=25 caps the bias at
# ~1 ms/step; embedding._rank_rules therefore prefers the hand-measured
# table on known generations and uses this cache only for unknown kinds,
# where a conservative crossover is the right failure mode.


def cache_path() -> str:
    return os.environ.get(
        'FSW_AUTOTUNE_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'fsw_gnn_tpu',
                     'autotune.json'))


def cached_rules(kind: str) -> Optional[dict]:
    """Rules cached for this device kind, or None."""
    path = cache_path()
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            all_rules = json.load(f)
    except (OSError, ValueError):
        return None
    return all_rules.get(kind)


def _write_cache(kind: str, rules: dict) -> None:
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    all_rules = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                all_rules = json.load(f)
        except (OSError, ValueError):
            all_rules = {}
    all_rules[kind] = rules
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(all_rules, f, indent=1)
    os.replace(tmp, path)


def derive_rules(margins: Dict[str, Dict[int, float]]) -> dict:
    """Crossover rules from measured full-lane margins (t_sort / t_rank).

    `margins` maps mode ('dw' | 'nodw' | 'cart') -> {bucket: margin}.
    Caps: the largest probed bucket that still wins by >SAFETY.  Waste
    thresholds: margin / SAFETY (the kernel's cost is flat below a
    128-lane tile, so it tolerates S_pad/S up to its full-lane margin;
    the v5e hand-tuned table is exactly this formula on its measured
    margins).
    """
    def cap(mode):
        """Largest probed bucket winning by >SAFETY; the LAST probed
        bucket needs a decisive >=1.25 win (no data beyond it -- v5e's
        B=256 no-dw row was 1.10x fwd+bwd but the fwd alone already lost,
        so the hand rule kept the previous bucket)."""
        bs = sorted(margins.get(mode, {}))
        c = 0
        for b in bs:
            need = 1.25 if b == bs[-1] else SAFETY
            if margins[mode][b] >= need:
                c = b
        return c

    def waste(mode, b):
        """Lane-waste tolerance from the full-lane margin; 0.0 (nothing
        qualifies) when the mode does not win at all -- the cartesian
        kernel has no bucket cap of its own, so a losing margin must
        close its waste gate entirely."""
        m = margins.get(mode, {}).get(b)
        if not m or m < SAFETY:
            return 0.0
        return round(m / SAFETY, 2)

    cap_dw, cap_nodw = cap('dw'), cap('nodw')
    return dict(
        cap_dw=cap_dw,
        cap_nodw=cap_nodw,
        waste_cart=waste('cart', min(margins.get('cart') or {32: None})),
        # nodw tolerance from the WORST winning bucket (conservative)
        waste_nodw=round(max(1.0, min(
            [m for b, m in margins.get('nodw', {}).items()
             if b <= cap_nodw] or [1.0]) / SAFETY), 2),
        waste_dw_narrow=waste('dw', 32),
        waste_dw_wide=waste('dw', 64),
    )


def _is_compile_error(e: Exception) -> bool:
    """True for DETERMINISTIC compile/lowering failures (the config loses
    by definition: Mosaic rejection, VMEM/register OOM, the remote
    tunnel's ~100-200MB payload cap -> HTTP 413).  Transient transport
    errors (connection reset/timeout/unavailable, a busy device) must NOT
    be recorded as margin 0.0 -- that verdict is cached per device kind
    and would permanently withhold a winning kernel."""
    msg = f'{type(e).__name__}: {e}'.lower()
    transient = ('unavailable', 'deadline', 'timed out', 'timeout',
                 'connection reset', 'connection refused', 'broken pipe',
                 'aborted', 'already in use', 'busy')
    if any(k in msg for k in transient):
        return False
    compile_class = ('resource_exhausted', 'out of memory', 'oom', 'vmem',
                     'mosaic', 'lower', 'unsupported', 'unimplemented',
                     'invalid_argument', '413', 'payload')
    return any(k in msg for k in compile_class)


def _measure_margins(buckets=PROBE_BUCKETS, entries=PROBE_ENTRIES,
                     s=128, f_cart=8, steps=25, calls=2):
    """Measure t_sort / t_rank fwd+bwd at full lanes on the current device.

    One jit per (mode, bucket, impl); steps looped in-scan with a chained
    carry and a one-scalar readback (the CLAUDE.md timing protocol)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..embedding import FSWConfig, bucket_quadrature

    rng = np.random.default_rng(0)
    margins = {'dw': {}, 'nodw': {}, 'cart': {}}
    transient_failures = []

    def time_fn(loss, args):
        grad = jax.grad(loss)

        @jax.jit
        def run():
            def body(P, _):
                g = grad(P, *args[1:])
                return P + 1e-12 * g, None
            P, _ = jax.lax.scan(body, args[0], None, length=steps)
            return jnp.ravel(P)[0]

        float(run())                    # compile + drain
        best = float('inf')
        for _ in range(calls):
            t0 = time.perf_counter()
            float(run())                # readback barrier
            best = min(best, time.perf_counter() - t0)
        return best / steps

    for B in buckets:
        R = max(8, entries // B)
        P = jnp.asarray(rng.standard_normal((R, B, s)), jnp.float32)
        w = np.abs(rng.standard_normal((R, B))).astype(np.float32)
        w *= rng.random((R, B)) < 0.8
        wsum = np.maximum(w.sum(1), 1.0)
        wn = jnp.asarray(w / wsum[:, None])
        pad = jnp.asarray(np.maximum(1.0 - w.sum(1), 0.0) / wsum)

        for mode in ('dw', 'nodw', 'cart'):
            if mode == 'cart':
                if B > 64:
                    continue            # cartesian cap search tops out low
                freqs = jnp.asarray(np.abs(
                    rng.standard_normal((s, f_cart))) + 0.1, jnp.float32)
                cfg = FSWConfig(d_in=4, n_slices=s, n_freqs=f_cart,
                                enable_bias=False)
            else:
                freqs = jnp.asarray(np.abs(
                    rng.standard_normal(s)) + 0.1, jnp.float32)
                cfg = FSWConfig(d_in=4, d_out=s + 1, enable_bias=False)
            wg = mode == 'dw'
            ts = {}
            for impl in ('rank', 'sort'):
                def loss(P, wn=wn, pad=pad, freqs=freqs, cfg=cfg,
                         impl=impl, wg=wg):
                    out = bucket_quadrature(P, wn, pad, freqs, cfg, impl,
                                            weights_grad=wg)
                    return jnp.sum(jnp.sin(out))
                if impl == 'rank':
                    # a config the kernel cannot COMPILE (e.g. the B=256
                    # with_dw backward's unrolled mask loop spills ~170 MB
                    # of registers -- round-4 VMEM OOM on v5e) loses by
                    # definition: margin 0.0.  A TRANSIENT failure
                    # (tunnel hiccup, busy device) is retried once and
                    # then SKIPPED -- never cached as a loss.
                    for attempt in (0, 1):
                        try:
                            ts[impl] = time_fn(loss, (P,))
                            break
                        except Exception as e:  # noqa: BLE001
                            if _is_compile_error(e):
                                print(json.dumps({
                                    'autotune': f'{mode} B={B}',
                                    'rank_compile_failed':
                                        type(e).__name__}), flush=True)
                                ts[impl] = None
                                break
                            if attempt == 1:
                                print(json.dumps({
                                    'autotune': f'{mode} B={B}',
                                    'transient_failure':
                                        type(e).__name__}), flush=True)
                                ts[impl] = 'transient'
                else:
                    ts[impl] = time_fn(loss, (P,))
            if ts['rank'] == 'transient':
                transient_failures.append(f'{mode} B={B}')
                continue                        # no verdict for this cell
            margins[mode][B] = (0.0 if ts['rank'] is None
                                else ts['sort'] / ts['rank'])
            print(json.dumps({'autotune': f'{mode} B={B}',
                              'margin': round(margins[mode][B], 3)}),
                  flush=True)
    return margins, transient_failures


def autotune_rank_rules(write_cache: bool = True,
                        measure_fn=_measure_margins) -> dict:
    """Measure the crossover on the current chip and (optionally) cache it.

    Returns the derived rules dict (embedding._rank_rules format).  When
    any probe cell failed TRANSIENTLY (after one retry), the rules are
    still derived from the cells that did measure, but the cache is NOT
    written -- an incomplete verdict must not become this machine's
    permanent crossover table."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    out = measure_fn()
    margins, transient = out if isinstance(out, tuple) else (out, [])
    rules = derive_rules(margins)
    rules['source'] = 'autotune'
    rules['margins'] = {m: {str(b): round(v, 3) for b, v in d.items()}
                        for m, d in margins.items()}
    if transient:
        rules['transient_failures'] = list(transient)
    if write_cache and not transient:
        _write_cache(kind, rules)
    return rules
