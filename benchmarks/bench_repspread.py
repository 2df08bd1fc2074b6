"""Pin the headline bench's rep-to-rep spread (round-5 VERDICT item 3).

Round 4 observed a 68.06M median with a 72.4M best rep (~6%) in one run
and 0.9% spread in another; nothing explained what a fast rep does
differently.  Candidate causes and the arms that separate them:

  A back2back   12 differenced reps, no gaps (the headline protocol,
                more reps): baseline distribution.
  B spaced      12 reps with 2 s sleeps: if medians shift or tighten,
                thermal/DVFS clock state matters.
  C long        same differenced protocol with 3x the in-scan steps:
                per-step time has 3x less dispatch/readback share, so
                if the spread shrinks ~3x the variance lives in the
                tunnel RTT tails, not the chip clock.
  raw t_n/t_1   per-rep raw wall times of the N-step and 1-step calls:
                RTT noise makes them jitter INDEPENDENTLY (the
                difference inherits both), clock drift makes them move
                TOGETHER.

All arms time the EXACT headline program (bench.build).  One process,
one TPU user, drained-queue + one-scalar-readback protocol throughout.

Run on TPU:  python benchmarks/bench_repspread.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

REPS = int(os.environ.get('FSW_SPREAD_REPS', 12))
CALLS = int(os.environ.get('FSW_SPREAD_CALLS', 3))
LONG_MULT = int(os.environ.get('FSW_SPREAD_LONGMULT', 3))


def main():
    b = bench.build()
    run_n, run_1 = b['run_n'], b['run_1']
    params, opt_state = b['params'], b['opt_state']
    E_real, spc = b['E_real'], b['steps_per_call']
    run_long = b['make_run'](spc * LONG_MULT)

    def timed(run, calls):
        p, s = params, opt_state
        t0 = time.perf_counter()
        for _ in range(calls):
            p, s, probe = run(p, s)
        float(probe)
        return time.perf_counter() - t0

    for run in (run_n, run_1, run_long):
        float(run(params, opt_state)[2])        # compile + drain

    def arm(name, run_hi, hi_steps, sleep_s=0.0):
        tn, t1, eps = [], [], []
        steps = (hi_steps - 1) * CALLS
        for _ in range(REPS):
            if sleep_s:
                time.sleep(sleep_s)
            a = timed(run_hi, CALLS)
            c = timed(run_1, CALLS)
            tn.append(a)
            t1.append(c)
            eps.append(E_real * steps / max(a - c, 1e-9))
        eps_s = sorted(eps)
        med = float(np.median(eps_s))
        out = {
            'arm': name, 'reps': REPS,
            'median_Meps': round(med / 1e6, 2),
            'spread_pct': round(100 * (eps_s[-1] - eps_s[0]) / med, 2),
            'p10_Meps': round(eps_s[len(eps_s) // 10] / 1e6, 2),
            'max_Meps': round(eps_s[-1] / 1e6, 2),
            'raw_tn_ms': [round(x * 1e3, 2) for x in tn],
            'raw_t1_ms': [round(x * 1e3, 2) for x in t1],
        }
        if REPS >= 4:
            # clock drift moves t_n and t_1 together; RTT noise does not
            out['corr_tn_t1'] = round(float(np.corrcoef(tn, t1)[0, 1]), 3)
        print(json.dumps(out), flush=True)
        return out

    a = arm('A_back2back', run_n, spc)
    bm = arm('B_spaced_2s', run_n, spc, sleep_s=2.0)
    c = arm('C_long_scan', run_long, spc * LONG_MULT)
    print(json.dumps({
        'verdict_hints': {
            'rtt_noise_dominates':
                bool(c['spread_pct'] < 0.5 * a['spread_pct']),
            'thermal_spacing_effect':
                bool(abs(bm['median_Meps'] - a['median_Meps'])
                     > 0.02 * a['median_Meps']),
        }}, indent=1), flush=True)


if __name__ == '__main__':
    main()
