"""Device-generation guards for the aggregate='auto' rules + the opt-in
autotune (VERDICT r2 weak #4): v5e-tuned caps must not silently apply on
unknown hardware; an autotune cache entry or the FSW_ASSUME_V5E_RULES
escape hatch re-enables the kernel."""
import json

import numpy as np
import pytest

from fsw_gnn_tpu import FSWConfig
from fsw_gnn_tpu import embedding as E
from fsw_gnn_tpu.utils import autotune as AT


V5E_MARGINS = {  # hardware measurements (BENCH.md; cart re-measured r4
    # post-trig-campaign: sort 105.6 / rank-nodw 11.1 ms at S=128 B=32)
    'dw': {32: 1.59, 64: 1.13, 128: 0.73},
    'nodw': {32: 2.6, 64: 2.3, 128: 2.3, 256: 1.10},
    'cart': {32: 9.51},
}


def test_derive_rules_reproduces_v5e_table():
    """The derivation formula applied to the v5e measured margins must
    reproduce the hand-tuned v5e rules table (same caps, thresholds within
    ~0.1)."""
    rules = AT.derive_rules(V5E_MARGINS)
    v5e = E._RANK_RULES_BY_KIND['tpu v5 lite']
    assert rules['cap_dw'] == v5e['cap_dw'] == 64
    assert rules['cap_nodw'] == v5e['cap_nodw'] == 128
    # nodw: min winning margin 2.3 (B<=128) / 1.1 = 2.09 vs hand 2.2
    assert abs(rules['waste_nodw'] - v5e['waste_nodw']) < 0.15
    assert abs(rules['waste_dw_narrow'] - v5e['waste_dw_narrow']) < 0.1
    assert abs(rules['waste_dw_wide'] - v5e['waste_dw_wide']) < 0.1
    assert abs(rules['waste_cart'] - v5e['waste_cart']) < 0.1


def test_unknown_kind_falls_back_to_sort(monkeypatch, tmp_path):
    monkeypatch.setenv('FSW_AUTOTUNE_CACHE', str(tmp_path / 'at.json'))
    monkeypatch.delenv('FSW_ASSUME_V5E_RULES', raising=False)
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(E, '_device_kind', lambda: 'tpu v9 hyperlite')
    plain = FSWConfig(d_in=4, d_out=127, enable_bias=False)
    assert E._resolve_aggregate('auto', plain, 32) == 'sort'
    # escape hatch: assume the v5e rules
    monkeypatch.setenv('FSW_ASSUME_V5E_RULES', '1')
    assert E._resolve_aggregate('auto', plain, 32) == 'rank'


def test_autotune_cache_roundtrip_enables_kernel(monkeypatch, tmp_path):
    monkeypatch.setenv('FSW_AUTOTUNE_CACHE', str(tmp_path / 'at.json'))
    monkeypatch.delenv('FSW_ASSUME_V5E_RULES', raising=False)
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(E, '_device_kind', lambda: 'tpu v9 hyperlite')
    plain = FSWConfig(d_in=4, d_out=127, enable_bias=False)
    assert E._resolve_aggregate('auto', plain, 32) == 'sort'

    AT._write_cache('tpu v9 hyperlite', AT.derive_rules(V5E_MARGINS))
    assert E._resolve_aggregate('auto', plain, 32) == 'rank'
    assert E._resolve_aggregate('auto', plain, 256) == 'sort'
    # the cache file is plain JSON keyed by device kind
    with open(tmp_path / 'at.json') as f:
        assert 'tpu v9 hyperlite' in json.load(f)


def test_autotune_end_to_end_with_fake_measurement(monkeypatch, tmp_path):
    """autotune_rank_rules with an injected measurement: derives, caches,
    and _resolve_aggregate picks the cached rules up."""
    monkeypatch.setenv('FSW_AUTOTUNE_CACHE', str(tmp_path / 'at.json'))
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'tpu')

    class FakeDev:
        device_kind = 'TPU vX test'
    monkeypatch.setattr(AT, '_measure_margins',
                        lambda: {'dw': {32: 2.0, 64: 0.9},
                                 'nodw': {32: 3.0, 64: 2.5, 128: 0.8},
                                 'cart': {32: 0.8}})
    import jax
    monkeypatch.setattr(jax, 'devices', lambda: [FakeDev()])
    rules = AT.autotune_rank_rules(measure_fn=AT._measure_margins)
    assert rules['cap_dw'] == 32 and rules['cap_nodw'] == 64
    assert rules['source'] == 'autotune'

    monkeypatch.setattr(E, '_device_kind', lambda: 'tpu vx test')
    plain = FSWConfig(d_in=4, d_out=127, enable_bias=False)
    assert E._resolve_aggregate('auto', plain, 32) == 'rank'
    assert E._resolve_aggregate('auto', plain, 64) == 'sort'  # dw cap 32
    assert E._resolve_aggregate('auto', plain, 64,
                                weights_grad=False) == 'rank'
    # cartesian never won on this fake chip
    cart = FSWConfig(d_in=4, n_slices=128, n_freqs=8, enable_bias=False)
    assert E._resolve_aggregate('auto', cart, 32,
                                weights_grad=False) == 'sort'


def test_measure_margins_runs_on_cpu_tiny():
    """The real measurement harness executes end to end (tiny shapes, CPU
    interpret kernels) and returns finite positive margins."""
    margins, transient = AT._measure_margins(buckets=(8,), entries=64, s=8,
                                             f_cart=2, steps=2, calls=1)
    assert transient == []
    for mode in ('dw', 'nodw', 'cart'):
        (b, m), = margins[mode].items()
        assert b == 8 and np.isfinite(m) and m > 0


def test_transient_failure_skips_cache(monkeypatch, tmp_path):
    """A transient (non-compile) probe failure must not be cached as a
    margin-0 verdict: rules are returned but the cache file stays absent."""
    monkeypatch.setenv('FSW_AUTOTUNE_CACHE', str(tmp_path / 'at.json'))

    class FakeDev:
        device_kind = 'TPU vY test'
    import jax
    monkeypatch.setattr(jax, 'devices', lambda: [FakeDev()])
    rules = AT.autotune_rank_rules(
        measure_fn=lambda: ({'dw': {32: 2.0}, 'nodw': {32: 3.0},
                             'cart': {}}, ['cart B=32']))
    assert rules['transient_failures'] == ['cart B=32']
    assert rules['cap_dw'] == 32            # measured cells still derive
    assert not (tmp_path / 'at.json').exists()


def test_is_compile_error_classification():
    assert AT._is_compile_error(RuntimeError(
        'RESOURCE_EXHAUSTED: Ran out of memory in VMEM'))
    assert AT._is_compile_error(RuntimeError(
        'Mosaic failed to lower module'))
    assert AT._is_compile_error(RuntimeError('HTTP 413 payload too large'))
    assert not AT._is_compile_error(RuntimeError(
        'UNAVAILABLE: connection reset by peer'))
    assert not AT._is_compile_error(TimeoutError('request timed out'))
    # a timeout mentioning memory in passing is still transient
    assert not AT._is_compile_error(RuntimeError(
        'DEADLINE_EXCEEDED while allocating vmem'))


def test_hw_cache_agrees_with_hand_table():
    """Replay of the committed round-5 HW autotune run (v5e,
    benchmarks/artifacts/autotune_tpu_v5_lite.json, steps=25): the
    unknown-generation path's derivation must agree with the
    hand-measured rules table ONE-SIDEDLY on every measured cell -- the
    protocol is documented systematically conservative (dispatch bias),
    so autotuned WINS must be hand-table wins and decisive hand wins
    must be recovered.  On-chip validation: scripts/validate_autotune.py
    printed {"validation": "ok"} for this artifact."""
    import json
    import os
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts',
        'autotune_tpu_v5_lite.json')
    with open(art) as f:
        rules = json.load(f)['rules']
    margins = {m: {int(b): v for b, v in d.items()}
               for m, d in rules['margins'].items()}
    derived = AT.derive_rules(margins)
    # the committed artifact IS derive_rules(margins) (full replay)
    for k, v in derived.items():
        assert rules[k] == v, (k, rules[k], v)
    hand = E._RANK_RULES_BY_KIND['tpu v5 lite']
    # one-sided: no autotuned win beyond a hand cap
    assert derived['cap_dw'] <= hand['cap_dw']
    assert derived['cap_nodw'] <= hand['cap_nodw']
    assert derived['waste_cart'] <= hand['waste_cart']
    for mode, cap_key in [('dw', 'cap_dw'), ('nodw', 'cap_nodw')]:
        for b, margin in margins[mode].items():
            if margin >= AT.SAFETY:
                assert b <= hand[cap_key], (mode, b, margin)
    # decisive hand wins recovered
    assert margins['dw'][32] >= AT.SAFETY
    assert margins['nodw'][32] >= AT.SAFETY
    assert margins['nodw'][64] >= AT.SAFETY
    assert all(m >= AT.SAFETY for m in margins['cart'].values())
    # the documented conservative-bias case: dw B=64 is a real _hand_
    # win measured just under SAFETY here (0.984) -- it must NOT appear
    # as a derived win, and the hand table must keep precedence on
    # known kinds (embedding._rank_rules ordering)
    assert margins['dw'][64] < AT.SAFETY
    assert derived['cap_dw'] == 32 and hand['cap_dw'] == 64


def test_cartesian_with_dw_cap_is_48(monkeypatch):
    """The cartesian with_dw 'auto' cap cites the round-5 compile-frontier
    measurement: B=48 compiles (172 s) and wins; B=64's Mosaic payload
    exceeds the remote tunnel's hard limit (HTTP 413)."""
    monkeypatch.setattr(E.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(E, '_device_kind', lambda: 'tpu v5 lite')
    cart = FSWConfig(d_in=4, n_slices=128, n_freqs=8, enable_bias=False)
    assert E._resolve_aggregate('auto', cart, 48) == 'rank'
    assert E._resolve_aggregate('auto', cart, 64) == 'sort'
    assert E._resolve_aggregate('auto', cart, 64,
                                weights_grad=False) == 'rank'
