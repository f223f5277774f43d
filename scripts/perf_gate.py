"""Performance-regression gate (VERDICT r3 item 4).

Nothing previously compared one round's bench numbers against the
last — a 20% kernel regression would ship silently.  This gate has two
modes:

``--chip [BENCH_LOG]``
    Parse a fresh ``python bench.py`` stderr log (or run one when no
    file is given) and compare every recognized metric against the
    most recent ``BENCH_r*.json`` tail in the repo.  Exits nonzero
    when any metric falls below its floor fraction of the prior round.
    Floors encode the MEASURED run-to-run variance of this tunneled
    platform (CLAUDE.md): most rates band within ~±15%, the fused
    kernel has swung 92-110M between healthy runs (floor 0.70).
    TT f32 historically ranged 60-190M because bench.py measured it
    mid-process; round 5 moved it to an isolated subprocess (the
    kernel is stable 163-180M standalone, docs/performance.md), so
    its floor tightened 0.35 -> 0.70.

``--cpu``
    The CI-runnable accuracy gate: rates are hardware-bound, but the
    ACCURACY invariants behind every headline row are not.  Rebuilds
    the benchmark models on the CPU backend and fails if any tier's
    deviation regresses past its ceiling (dd tiers, grouped chain,
    compression, TT build eval count).  Wired into test.yml.

Standalone:  python scripts/perf_gate.py --cpu
             python scripts/perf_gate.py --chip /tmp/bench.log
"""

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# metric -> (regex over the bench stderr tail, floor fraction of prior)
_METRICS = {
    "f32_qps": (r"^f32 batched: .*-> ([\d,]+) queries/s", 0.75),
    "fused_qps": (r"^pallas fused f32: .*-> ([\d,]+) queries/s", 0.70),
    "greeks_sets": (r"^f32 price\+5 Greeks batched: .*-> ([\d,]+) "
                    r"full Greek-sets/s", 0.70),
    "tt_f32_qps": (r"^TT f32 batched: .*-> ([\d,]+) queries/s", 0.70),
    "book_evals": (r"^8-model book batched \(f32\): .*-> ([\d,]+) "
                   r"model-evals/s", 0.70),
    "dd_qps": (r"^digit-GEMM \(dd\) batched: .*-> ([\d,]+) queries/s",
               0.80),
    "dd_fast_qps": (r"^digit-GEMM dd\(fast.*-> ([\d,]+) queries/s",
                    0.80),
    "compression_qps": (r"^exact-compression serving .*-> ([\d,]+) "
                        r"queries/s", 0.75),
    "tt_dd_boxes": (r"^TT dd bucket masses .*-> ([\d.]+)M boxes/s",
                    0.75),
    "dd_cond": (r"^dense dd conditional expectations .*-> "
                r"([\d.]+)M scenarios/s", 0.75),
    "tt_dd_qps": (r"^TT digit-GEMM \(dd\) batched: .*-> ([\d,]+) "
                  r"queries/s", 0.75),
    "slider_sets": (r"^slider near-f64 Greek report .*-> ([\d,]+) "
                    r"full sets/s", 0.70),
    "f64_qps": (r"^f64 batched: .*-> ([\d,]+) queries/s", 0.60),
}


def parse_metrics(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        for name, (rx, _) in _METRICS.items():
            m = re.match(rx, line.strip())
            if m:
                out[name] = float(m.group(1).replace(",", ""))
    return out


def latest_round_metrics(repo_root: str):
    files = sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json")))
    if not files:
        return None, None
    with open(files[-1]) as f:
        payload = json.load(f)
    return parse_metrics(payload.get("tail", "")), files[-1]


def gate_chip(log_path=None) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior, src = latest_round_metrics(repo)
    if not prior:
        print("no BENCH_r*.json history; nothing to gate against")
        return 0
    if log_path:
        with open(log_path) as f:
            text = f.read()
    else:
        proc = subprocess.run([sys.executable,
                               os.path.join(repo, "bench.py")],
                              capture_output=True, text=True)
        text = proc.stderr
        if proc.returncode != 0:
            print(f"bench.py failed rc={proc.returncode}:\n"
                  f"{text[-2000:]}")
            return 2
    current = parse_metrics(text)
    failures = []
    for name, (_, floor) in _METRICS.items():
        if name not in prior:
            continue
        if name not in current:
            failures.append(f"{name}: missing from current bench "
                            f"(prior {prior[name]:,.0f})")
            continue
        ratio = current[name] / prior[name]
        status = "OK" if ratio >= floor else "REGRESSION"
        print(f"{name}: {current[name]:,.0f} vs {prior[name]:,.0f} "
              f"({ratio:.2f}x, floor {floor}) {status}")
        if ratio < floor:
            failures.append(
                f"{name}: {current[name]:,.0f} < {floor} * "
                f"{prior[name]:,.0f} (prior round, {src})")
    if failures:
        print("\nPERF GATE FAILED:")
        for f_ in failures:
            print("  " + f_)
        return 1
    print(f"\nperf gate OK vs {src}")
    return 0


def gate_cpu() -> int:
    """Accuracy invariants behind the headline rows, CPU-checkable."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from scipy.stats import norm

    from pychebyshev_tpu import ChebyshevApproximation

    def bs_price(points, _data=None):
        p = np.asarray(points, dtype=np.float64)
        s, k, t, sg, r = (p[:, i] for i in range(5))
        sq = np.sqrt(t)
        d1 = (np.log(s / k) + (r + 0.5 * sg ** 2) * t) / (sg * sq)
        d2 = d1 - sg * sq
        return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)

    dom = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
           [0.01, 0.05]]
    cheb = ChebyshevApproximation(bs_price, 5, dom, n_nodes=[11] * 5,
                                  vectorized=True)
    cheb.build(verbose=False)
    rng = np.random.default_rng(7)
    lo = np.array([b[0] for b in dom])
    hi = np.array([b[1] for b in dom])
    pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, (8192, 5))
    ref = np.asarray(cheb.eval_batch(pts, derivative_order=[0] * 5))
    scale = np.abs(ref).max()

    checks = []

    def check(name, value, ceiling):
        ok = value <= ceiling
        checks.append((name, value, ceiling, ok))
        print(f"{name}: {value:.2e} (ceiling {ceiling:.0e}) "
              f"{'OK' if ok else 'REGRESSION'}")

    # Dense dd tier (headline: 1.6e-11).
    dd = np.asarray(cheb.eval_batch_dd(pts))
    check("dense_dd_dev", np.abs(dd - ref).max() / scale, 1e-10)

    # Exact-compression + grouped chain (headline: <=1e-12 serving).
    tt = cheb.to_tt(tolerance=1e-13)
    gdev = np.abs(tt.eval_batch_dd(pts, groups="auto") - ref).max() \
        / scale
    check("compression_grouped_dev", gdev, 1e-12)
    pdev = np.abs(tt.eval_batch_dd(pts, groups=None) - ref).max() \
        / scale
    check("compression_perdim_dev", pdev, 1e-12)

    # f32 tier (headline: 2.6e-5 dev from f64).
    f32 = np.asarray(cheb.eval_batch_f32(pts)) \
        if hasattr(cheb, "eval_batch_f32") else None
    if f32 is not None:
        check("f32_dev", np.abs(f32 - ref).max() / scale, 2e-4)

    # dd scenario calculus (round 5): bucket masses + conditional
    # expectations at the digit-GEMM tier on dense and TT.
    brng = np.random.default_rng(11)
    blo = brng.uniform(lo, hi, (512, 5))
    bhi = brng.uniform(blo, hi[None, :], (512, 5))
    bxs = np.stack([blo, bhi], axis=-1)
    ib_ref = cheb.integrate_batch(bxs)
    ib_scale = max(np.abs(ib_ref).max(), 1e-300)
    tt_ib = tt.integrate_batch(bxs, dtype="dd")
    check("tt_dd_integrate_dev",
          np.abs(tt_ib - tt.integrate_batch(bxs)).max() / ib_scale,
          1e-10)
    sub = bxs[:, [0, 2], :]
    ppts = brng.uniform(lo[[1, 3, 4]], hi[[1, 3, 4]], (512, 3))
    p_ref = cheb.partial_integrate_batch([0, 2], sub, ppts)
    p_dd = cheb.partial_integrate_batch([0, 2], sub, ppts, dtype="dd")
    p_scale = max(np.abs(p_ref).max(), 1e-300)
    check("dense_dd_partial_dev",
          np.abs(p_dd - p_ref).max() / p_scale, 1e-10)
    tp_ref = tt.partial_integrate_batch([0, 2], sub, ppts)
    tp_dd = tt.partial_integrate_batch([0, 2], sub, ppts, dtype="dd")
    check("tt_dd_partial_dev",
          np.abs(tp_dd - tp_ref).max() / p_scale, 1e-10)

    if any(not ok for _, _, _, ok in checks):
        print("\nPERF GATE (CPU accuracy invariants) FAILED")
        return 1
    print("\nperf gate (CPU accuracy invariants) OK")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--cpu":
        sys.exit(gate_cpu())
    if args and args[0] == "--chip":
        sys.exit(gate_chip(args[1] if len(args) > 1 else None))
    print(__doc__)
    sys.exit(2)


if __name__ == "__main__":
    main()
