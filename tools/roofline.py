#!/usr/bin/env python
"""Per-kernel speed-of-light (roofline) report for the VO hot path.

SURVEY.md §5 ("frames/s + per-kernel speed-of-light reporting") and the
north star ("BA and matching kernels at speed-of-light per chip") require
knowing how far each kernel sits from the hardware bound, not just its
milliseconds. For every hot kernel this tool:

  1. counts bytes moved (HBM traffic: inputs read + outputs written, plus
     known intermediate round-trips) and floating-point ops from the
     deployment shapes — an explicit static model, formulas inline;
  2. measures device time (jitted, min over repeats, block_until_ready);
  3. compares against the TPU v5e (v5 lite) peaks and reports the achieved
     fraction of the roofline bound  t_bound = max(bytes/BW, flops/peak).

v5e peaks (public figures, jax-ml.github.io/scaling-book): HBM 819 GB/s,
MXU 197 TFLOP/s bf16. Our geometry kernels run f32 (accuracy: SURVEY §7
"hard parts"), for which the MXU peak is ~1/4 of bf16 — both bounds are
printed; the SoL fraction uses the f32 peak for matmul-heavy kernels.
Bandwidth-bound kernels (stencils, patch gathers) are insensitive to that
choice: their bound is HBM traffic.

Usage: python tools/roofline.py [--platform tpu|cpu] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9  # v5e HBM bandwidth, bytes/s
PEAK_BF16 = 197e12  # v5e MXU, FLOP/s
PEAK_F32 = PEAK_BF16 / 4  # f32 matmul via MXU passes (approx)

H, W = 480, 640  # deployment frame (EVAL.md sequence)
CAP = 1024  # feature-table capacity
LK_RADIUS, LK_LEVELS, LK_ITERS = 8, 3, 10
DESC_D = 19 * 19  # descriptor length (patch radius 9)
PNP_HYP, PNP_GN = 256, 10
BA_W = 6


def measure(fn, *args, reps=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.models.ba import ba_refine
    from vo_tpu.ops.descriptors import match_descriptors
    from vo_tpu.ops.harris import detect_keypoints
    from vo_tpu.ops.image import build_pyramid
    from vo_tpu.ops.klt import pyramidal_lk
    from vo_tpu.ops.pnp import pnp_ransac
    from vo_tpu.parallel.dist_ba import demo_window

    rng = np.random.default_rng(2023)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    K = jnp.asarray([[415.0, 0, W / 2], [0, 415.0, H / 2], [0, 0, 1]],
                    jnp.float32)
    rows = []

    def add(name, t, bytes_, flops, peak=PEAK_F32):
        t_bw = bytes_ / HBM_GBPS
        t_mxu = flops / peak
        bound = max(t_bw, t_mxu)
        rows.append(dict(
            kernel=name, us=round(t * 1e6, 1),
            mbytes=round(bytes_ / 1e6, 2), mflops=round(flops / 1e6, 1),
            bw_bound_us=round(t_bw * 1e6, 1),
            mxu_bound_us=round(t_mxu * 1e6, 1),
            bound=("hbm" if t_bw >= t_mxu else "mxu"),
            sol_pct=round(100 * bound / t, 1),
        ))

    # ---- 1. Detection: response + NMS + top-K (fused Pallas on TPU) -------
    det = jax.jit(lambda im: detect_keypoints(im, CAP))
    t = measure(det, img)
    px = H * W
    # Fused strip kernel: one f32 image read + response write + NMS-mask
    # read/write + top-K gather (~1 more pass); call it 4 image passes.
    det_bytes = 4 * px * 4
    # Per pixel: Sobel x/y (2x9 MACs), 3 box-sum channels (separable 2x7
    # adds each), response (det/trace ~10) ~= 100 flop/px.
    det_flops = 100 * px
    add("detect(shi_tomasi+nms+topk)", t, det_bytes, det_flops)

    # ---- 2. Pyramidal LK, CAP points, 3 levels, 10 iters ------------------
    pyr1 = tuple(build_pyramid(img, LK_LEVELS))
    pyr2 = tuple(build_pyramid(img2, LK_LEVELS))
    xy = jnp.stack([
        jnp.asarray(rng.uniform(20, W - 20, CAP), jnp.float32),
        jnp.asarray(rng.uniform(20, H - 20, CAP), jnp.float32),
    ], axis=-1)
    lk = jax.jit(lambda a, b, p: pyramidal_lk(a, b, p, radius=LK_RADIUS,
                                              max_iters=LK_ITERS))
    t = measure(lk, pyr1, pyr2, xy)
    win = (2 * LK_RADIUS + 1) ** 2
    # Per level: template patch gather (K*win) + per ITER a warped patch
    # gather (K*win) — each resample reads a (2r+2)^2 source tile.
    src = (2 * LK_RADIUS + 2) ** 2
    lk_bytes = LK_LEVELS * CAP * (src + LK_ITERS * src) * 4
    # Per iter/point: bilinear resample (win*8), gradients (win*4),
    # G and b accumulation (win*10) ~= 22*win + solve ~ 20.
    lk_flops = LK_LEVELS * CAP * LK_ITERS * (22 * win + 20)
    add(f"pyramidal_lk({CAP}pts,{LK_LEVELS}lvl,{LK_ITERS}it)", t,
        lk_bytes, lk_flops)

    # ---- 3. Descriptor matcher: (CAP, D) x (CAP, D) MXU matmul ------------
    d1 = jnp.asarray(rng.normal(0, 1, (CAP, DESC_D)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(0, 1, (CAP, DESC_D)).astype(np.float32))
    mat = jax.jit(lambda a, b: match_descriptors(a, b))
    t = measure(mat, d1, d2)
    m_bytes = (2 * CAP * DESC_D + CAP * CAP) * 4  # read both, write dist
    m_flops = 2 * CAP * CAP * DESC_D + 6 * CAP * CAP  # matmul + top2/mutual
    add(f"match_descriptors({CAP}x{DESC_D})", t, m_bytes, m_flops)

    # ---- 4. PnP-RANSAC: 256 hypotheses + 10 GN iters over CAP obs ---------
    X = jnp.asarray(
        np.stack([rng.uniform(-8, 8, CAP), rng.uniform(-4, 4, CAP),
                  rng.uniform(8, 40, CAP)], -1).astype(np.float32))
    uvh = (np.asarray(K) @ np.asarray(X).T).T
    uv = jnp.asarray((uvh[:, :2] / uvh[:, 2:]).astype(np.float32))
    pnp = jax.jit(lambda k, x, u: pnp_ransac(
        k, x, u, K, num_hypotheses=PNP_HYP, refine_iters=PNP_GN))
    t = measure(pnp, jax.random.PRNGKey(0), X, uv)
    # Hypotheses: quartic solve ~500 flop each; scoring: HYP x CAP
    # projections (~25 flop) ; GN: 10 iters x CAP x (J 2x6 ~60 flop + JtJ 72).
    pnp_flops = PNP_HYP * 500 + PNP_HYP * CAP * 25 + PNP_GN * CAP * 160
    pnp_bytes = (CAP * 5 * 4) * (PNP_HYP // 64)  # X/uv re-read per hyp tile
    add(f"pnp_ransac({PNP_HYP}hyp+{PNP_GN}gn)", t, pnp_bytes, pnp_flops)

    # ---- 5. One windowed-BA GN iteration (W=6, L=CAP) ---------------------
    winba = demo_window(CAP, BA_W, np.asarray(K))
    ba = jax.jit(lambda w: ba_refine(w, K, iters=1))
    t = measure(ba, winba)
    LW = CAP * BA_W
    # residual+jacobians: ~150 flop/obs; U/V/Wc einsums: obs x (72+18+108);
    # Schur: L x W^2 x 6x6x3 matmuls ~ L*W*W*324; solve 36^3/3.
    ba_flops = LW * (150 + 200) + CAP * BA_W * BA_W * 324 + 36**3
    # window arrays read + written once (~2x), Jc/Jx intermediates spill.
    ba_bytes = 2 * (LW * (2 + 12 + 6 + 1) * 4 + CAP * 3 * 4)
    add(f"ba_gn_iter(W={BA_W},L={CAP})", t, ba_bytes, ba_flops)

    dev = str(jax.devices()[0])
    print(f"# roofline on {dev} (HBM {HBM_GBPS/1e9:.0f} GB/s, "
          f"MXU {PEAK_F32/1e12:.1f} TFLOP/s f32 / {PEAK_BF16/1e12:.0f} bf16)")
    hdr = ("kernel", "us", "MB", "MFLOP", "bw_us", "mxu_us", "bound", "SoL%")
    print(f"{hdr[0]:<38}{hdr[1]:>9}{hdr[2]:>8}{hdr[3]:>9}"
          f"{hdr[4]:>8}{hdr[5]:>9}{hdr[6]:>7}{hdr[7]:>7}")
    for r in rows:
        print(f"{r['kernel']:<38}{r['us']:>9}{r['mbytes']:>8}"
              f"{r['mflops']:>9}{r['bw_bound_us']:>8}{r['mxu_bound_us']:>9}"
              f"{r['bound']:>7}{r['sol_pct']:>7}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"device": dev, "rows": rows}, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
