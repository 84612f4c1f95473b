#!/usr/bin/env python
"""Headline-drift gate (VERDICT r4 task #1, structural part).

Three rounds in a row a hot-path commit landed minutes before the snapshot
and silently regressed the headline ATE (r2: adaptive-keyframe default flip,
r3: Pallas gather rework, r4: the PnP LU swap — 1.181 -> 1.753 m for +1.9%
fps). This gate makes that failure mode impossible to ship silently: it runs
the EXACT headline measurement (`bench.py`'s 597-frame device-resident
rollout) and exits non-zero if the measured ATE differs from the documented
headline (`tools/headline_expected.json`) by more than `tol_pct`.

Usage:
    python tools/check_headline.py              # run + gate (any backend)
    python tools/check_headline.py --update     # re-baseline after an
                                                # INTENTIONAL accuracy change
                                                # (update EVAL.md in the same
                                                # commit)

Run this before EVERY commit that touches vo_tpu/ops, vo_tpu/models,
vo_tpu/geom, or vo_tpu/utils/config.py. It is deliberately cheap: one
compile (~40 s cold, seconds warm via the compilation cache) + ~8 s of
rollout on the v5e chip.

ATE is bit-stable for a fixed backend/commit (single fixed PRNGKey, no
wall-clock dependence in the traced program), so the 5% default tolerance
only absorbs cross-backend (CPU vs TPU) numerics, not run-to-run noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "headline_expected.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="re-baseline the expected ATE")
    ap.add_argument("--tol-pct", type=float, default=None, help="override tolerance (%)")
    args = ap.parse_args()

    import bench

    synth = bench.bench_synthetic_full()
    ate = synth["ate_rmse_m"]

    if args.update or not os.path.exists(EXPECTED_PATH):
        rec = {"ate_rmse_m": ate, "tol_pct": 5.0, "frames": synth["frames"]}
        with open(EXPECTED_PATH, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
        print(f"baselined: ATE {ate} m -> {EXPECTED_PATH}")
        return 0

    with open(EXPECTED_PATH) as f:
        exp = json.load(f)
    tol = args.tol_pct if args.tol_pct is not None else exp.get("tol_pct", 5.0)
    drift_pct = abs(ate - exp["ate_rmse_m"]) / exp["ate_rmse_m"] * 100.0
    status = "OK" if drift_pct <= tol else "FAIL"
    print(
        f"{status}: measured ATE {ate} m vs expected {exp['ate_rmse_m']} m "
        f"({drift_pct:.1f}% drift, tol {tol}%)  "
        f"[rpe_trans {synth['rpe_trans_m']} m, {synth['frames']} frames]"
    )
    if status == "FAIL":
        print(
            "Headline regressed. Either fix the regression, or — if the "
            "accuracy change is intentional and measured — rerun with "
            "--update AND update EVAL.md/README in the same commit.",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
