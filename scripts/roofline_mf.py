"""Memory-traffic / VPU roofline for the DIS-MF train step (VERDICT item 5).

Analytic byte + op counts for the dominant tensors of the MF step at the
benchmark config (bs=4, tl=4, bf16, 512x432, core 256x216, C=32,
4 fusion blocks), compared against v5e per-chip peaks.  The point is to
show WHERE the measured step time sits relative to the HBM-bandwidth and
VPU bounds — i.e. whether "2.4% MFU is fine, the step is warp/VPU-bound"
is arithmetic or hand-waving.

v5e per-chip peaks (public spec): 197 TFLOP/s bf16 (MXU),
819 GB/s HBM; VPU is an (8,128)x4-ALU vector unit — ~3.9 Top/s f32.

Run: python scripts/roofline_mf.py  (pure host arithmetic, no TPU)
"""
import sys

GB = 1e9

# ---- config (bench_mf defaults) -------------------------------------
TL, BS = 4, 4
H, W = 512, 432
CH, CW = H // 2, W // 2           # core resolution
C = 32
BLOCKS = 4
PAIRS = TL * (TL - 1)             # 12
BF16 = 2
F32 = 4
D = 16                            # warp max_shift


def t(shape, b=BF16):
    n = 1
    for s in shape:
        n *= s
    return n * b


def main():
    rows = []

    def add(name, byts, note=""):
        rows.append((name, byts, note))

    # ---- flow-warp kernels (Pallas) ----------------------------------
    # forward, per fusion block: warp TL*N source planes along PAIRS*N
    # pair flows at core res, and again at half res.
    src_core = t((TL * BS, CH, CW, C))
    out_core = t((PAIRS * BS, CH, CW, C))
    flow_core = t((PAIRS * BS, CH, CW, 2), F32)
    src_half = t((TL * BS, CH // 2, CW // 2, C))
    out_half = t((PAIRS * BS, CH // 2, CW // 2, C))
    flow_half = t((PAIRS * BS, CH // 2, CW // 2, 2), F32)
    # each source plane is re-read once per pair that uses it (3x), plus
    # the tap window overlap (~(8+2D)/8 rows per 8-row band at worst);
    # band-sparsity keeps the realistic factor near 3x pair reuse.
    warp_fwd_block = 3 * src_core + out_core + flow_core \
        + 3 * src_half + out_half + flow_half
    # backward: read upstream grads (pair-major), accumulate into source
    # grads; with the pair-indexed kernel the pair-major grad is read once
    # and each source grad written once (plus read-modify-write revisits).
    warp_bwd_block = out_core + 2 * src_core + out_half + 2 * src_half \
        + flow_core + flow_half
    add("warp fwd (4 blocks)", BLOCKS * warp_fwd_block)
    add("warp bwd (4 blocks)", BLOCKS * warp_bwd_block)
    # geometry warp (xyz+revflow, 5ch f32) + loss warps (photometric xwarp
    # at 1 scale full res 2ch; geometric 6 pairs x 2 dirs x ~3 samples of
    # 1ch at full res, fwd+bwd)
    add("geometry/loss warps",
        2 * (t((PAIRS * BS, CH, CW, 5), F32) * 2
             + t((TL * BS, H, W, 2), F32) * 2
             + 12 * 3 * t((BS, H, W, 1), F32) * 2))

    # ---- warp VPU op estimate ----------------------------------------
    # the v2/pairs fwd kernel evaluates, per output element and per ACTIVE
    # (dy-group, dx-chunk), 64 static taps x ~5 vector ops (2 compares +
    # select for wx, mul by wy, fused mul-add into the accumulator); the
    # band-sparse ranges keep ~2x2 (group, chunk) pairs active for typical
    # training flows that straddle an 8-tap boundary.
    elems_fwd = BLOCKS * (PAIRS * BS * CH * CW * C
                          + PAIRS * BS * (CH // 2) * (CW // 2) * C)
    active_chunks = 4
    vpu_ops = elems_fwd * active_chunks * 64 * 5 * 3   # fwd + ~2x bwd
    # ---- conv stack (MXU) ---------------------------------------------
    # static-FLOP count from bench.py: 5.75 TF/step total
    mxu_flops = 5.75e12

    # ---- XLA fusion tensors (elementwise/GN/resize/selection) ---------
    # per block: warped_feat pair-major stack consumed by pointconv patches
    # (k2=9 taps -> 9x read as patches) + 2D branch merge, fwd+bwd.
    patches_core = 9 * out_core
    add("pointconv patch reads (4 blocks, fwd+bwd)",
        BLOCKS * 2 * (patches_core + 9 * out_half))
    # one-hot selection contraction: (N,h,w,9,36)x(36,C): read one-hot
    # (9x36 f32 per px) + patches; dominated by patch bytes above.
    add("2D branch convs/GN (4 blocks, fwd+bwd)",
        BLOCKS * 2 * 6 * out_core)
    # encoder/decoder full-res activations, fwd+bwd
    add("encoder+decoder acts (fwd+bwd)",
        2 * (10 * t((TL * BS, CH, CW, C)) + 8 * t((TL * BS, H, W, 16))))
    # losses at full res (census 9x9 patch reads on 2ch, smoothness sobel,
    # geometric projections) fwd+bwd
    add("losses (fwd+bwd)", 2 * 30 * t((TL * BS, H, W, 1), F32))
    # optimizer: params ~1.1M f32 x (read p,m,v + write p,m,v) + grads
    add("adam update", 7 * 1.1e6 * F32)

    total = sum(b for _, b, _ in rows)
    hbm_bw = 819e9
    vpu_peak = 3.9e12
    mxu_peak = 197e12

    print(f"{'component':48s} {'bytes':>10s}")
    for name, b, note in rows:
        print(f"{name:48s} {b / GB:8.2f} GB  {note}")
    print(f"{'TOTAL':48s} {total / GB:8.2f} GB")
    print()
    print(f"HBM bound       : {total / hbm_bw * 1e3:8.1f} ms "
          f"({total / GB:.1f} GB @ 819 GB/s)")
    print(f"warp VPU bound  : {vpu_ops / vpu_peak * 1e3:8.1f} ms "
          f"({vpu_ops / 1e9:.0f} Gop @ 3.9 Top/s)")
    print(f"MXU bound       : {mxu_flops / mxu_peak * 1e3:8.1f} ms "
          f"(5.75 TF @ 197 TF/s)")
    measured = float(sys.argv[1]) if len(sys.argv) > 1 else 1.24
    print(f"measured step   : {measured * 1e3:8.1f} ms")
    bound = max(total / hbm_bw, vpu_ops / vpu_peak, mxu_flops / mxu_peak)
    print(f"roofline max    : {bound * 1e3:8.1f} ms "
          f"-> step runs at {bound / measured * 100:.0f}% of the "
          f"binding roofline")


if __name__ == "__main__":
    main()
