"""Autotune self-validation on real hardware (round-5 VERDICT item 5).

Runs the full `autotune_rank_rules()` measurement (steps=25, the
documented dispatch-bias cap) on the CURRENT chip and compares the
derived rules against the hand-measured table for this device kind
(embedding._RANK_RULES_BY_KIND) cell by cell.  The autotune protocol is
known to be systematically CONSERVATIVE (utils/autotune.py bias note), so
the contract asserted here is one-sided:

  * no false positives: every cell the autotune calls a rank-kernel WIN
    must be a win in the hand table;
  * the decisive wins are recovered: cells where the hand table's margin
    is far from the crossover (dw B<=32, nodw B<=64) must be called.

The measured margins are written to benchmarks/artifacts/autotune_<kind>.json
as committed evidence; tests/test_autotune.py::test_hw_cache_agrees_with_
hand_table replays derive_rules on that committed artifact.

Run on TPU:  python scripts/validate_autotune.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    from fsw_gnn_tpu.embedding import _RANK_RULES_BY_KIND
    from fsw_gnn_tpu.utils.autotune import SAFETY, autotune_rank_rules
    from fsw_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    kind = jax.devices()[0].device_kind.lower()
    hand = None
    for known, rules in _RANK_RULES_BY_KIND.items():
        if known in kind:
            hand = dict(rules)
    print(json.dumps({'device_kind': kind, 'hand_rules': hand}), flush=True)

    rules = autotune_rank_rules(write_cache=True)
    print(json.dumps({'derived': {k: v for k, v in rules.items()
                                  if k != 'margins'}}), flush=True)
    print(json.dumps({'margins': rules['margins']}), flush=True)

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts')
    os.makedirs(art, exist_ok=True)
    path = os.path.join(art, f'autotune_{kind.replace(" ", "_")}.json')
    with open(path, 'w') as f:
        json.dump({'device_kind': kind, 'rules': rules}, f, indent=1)
    print(json.dumps({'artifact': path}), flush=True)

    if hand is None:
        print(json.dumps({'validation': 'skipped (no hand table for this '
                                        'kind)'}), flush=True)
        return 0

    failures = []
    m = rules['margins']
    # one-sided cell check: autotuned wins must be hand-table wins
    for mode, cap_key in [('dw', 'cap_dw'), ('nodw', 'cap_nodw')]:
        for b_str, margin in m.get(mode, {}).items():
            b = int(b_str)
            if margin >= SAFETY and b > hand[cap_key]:
                failures.append(f'{mode} B={b}: autotune win {margin} but '
                                f'hand cap {hand[cap_key]}')
    for b_str, margin in m.get('cart', {}).items():
        if margin >= SAFETY and hand['waste_cart'] <= 1.0:
            failures.append(f'cart B={b_str}: autotune win {margin} but '
                            f'hand waste_cart gate closed')
    # decisive hand wins must be recovered (far from the crossover)
    for mode, bs in [('dw', (32,)), ('nodw', (32, 64))]:
        for b in bs:
            margin = m.get(mode, {}).get(str(b), 0.0)
            if margin < SAFETY:
                failures.append(f'{mode} B={b}: decisive hand win not '
                                f'recovered (margin {margin})')
    verdict = {'validation': 'ok' if not failures else 'FAILED',
               'failures': failures}
    print(json.dumps(verdict), flush=True)
    return 0 if not failures else 1


if __name__ == '__main__':
    sys.exit(main())
