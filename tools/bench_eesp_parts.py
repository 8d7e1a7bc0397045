"""Microbench the EESP unit's parts at zoo geometry (slope-timed).

ESPNetv2 decomposition (tools/bench_espnetv2_decomp.py, b64 2048x1024
bf16) puts 64% of total time in level1+level2 — i.e. in the EESP unit
itself (82 ms/unit at 1/4-res 128ch, 46 ms/unit at 1/8-res 256ch).
Candidates inside the unit [R: model/ESPNet_v2/Model.py EESP]:
  - grouped 1x1 reduce/expand (groups=4 -> 32..64-ch per-group matmuls
    on a 128-lane MXU),
  - k=4 depthwise DILATED 3x3 branches at d=32..64 ch (lane-padded),
  - the misaligned 4-piece concat + BN/PReLU.
For each grouped 1x1 the block-diagonal DENSE equivalent is measured
too (same params, zeros off the diagonal — exact same math).

Run: python -m tools.bench_eesp_parts [B H W C]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu.ops import convolution as C


def slope(f, *xs, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                acc, x0 = carry
                x0 = x0 * (1.0 + 1e-12 * i)
                return acc + jnp.sum(f(x0, *xs[1:]).astype(jnp.float32)), x0
            return lax.fori_loop(0, iters, body, (jnp.float32(0), xs[0]))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(*xs))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(*xs))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def block_diag_1x1(w, groups):
    """(1,1,Cg,O) grouped kernel -> (1,1,C,O) dense block-diagonal."""
    cg, o = w.shape[2], w.shape[3]
    og = o // groups
    full = jnp.zeros((1, 1, cg * groups, o), w.dtype)
    for g in range(groups):
        full = full.at[:, :, g * cg:(g + 1) * cg, g * og:(g + 1) * og].set(
            w[:, :, :, g * og:(g + 1) * og])
    return full


def main():
    B, H, W, Cch = (int(v) for v in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (64, 256, 512, 128)
    k, groups = 4, 4
    d = Cch // k
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cch), jnp.bfloat16)
    y32 = jax.random.normal(key, (B, H, W, d), jnp.bfloat16)

    wr = jax.random.normal(key, (1, 1, Cch // groups, d), jnp.bfloat16) * 0.1
    we = jax.random.normal(key, (1, 1, Cch // groups, Cch), jnp.bfloat16) * .1
    wb = [jax.random.normal(key, (3, 3, 1, d), jnp.bfloat16) * 0.1
          for _ in range(k)]
    wrd = block_diag_1x1(wr, groups)
    wed = block_diag_1x1(we, groups)

    def reduce_g(x, wr):
        return C.conv2d(x, wr, groups=groups)

    def reduce_d(x, wrd):
        return C.conv2d(x, wrd)

    def expand_g(x, we):
        return C.conv2d(x, we, groups=groups)

    def expand_d(x, wed):
        return C.conv2d(x, wed)

    def one_branch(y, w, dil):
        return C.conv2d(y, w, padding=dil, dilation=dil, groups=d)

    def branches_hff_concat(y, *ws):
        outs = [C.conv2d(y, w, padding=2 ** i, dilation=2 ** i, groups=d)
                for i, w in enumerate(ws)]
        fused, acc = [outs[0]], None
        for i in range(1, k):
            acc = outs[i] if i == 1 else acc + outs[i]
            fused.append(acc)
        return jnp.concatenate(fused, axis=-1)

    def full_eesp(x, wr, we, *ws):
        y = C.conv2d(x, wr, groups=groups)
        z = branches_hff_concat(y, *ws)
        z = C.conv2d(z, we, groups=groups)
        return z + x

    rows = [
        ("reduce grouped  128->32 g4", slope(reduce_g, x, wr)),
        ("reduce dense-bd 128->32   ", slope(reduce_d, x, wrd)),
        ("expand grouped 128->128 g4", slope(expand_g, x, we)),
        ("expand dense-bd 128->128  ", slope(expand_d, x, wed)),
        ("one dw dilated 3x3 d=1    ", slope(lambda y, w: one_branch(y, w, 1),
                                             y32, wb[0])),
        ("one dw dilated 3x3 d=8    ", slope(lambda y, w: one_branch(y, w, 8),
                                             y32, wb[3])),
        ("4 branches + HFF + concat ", slope(branches_hff_concat, y32, *wb)),
        ("FULL EESP (grouped)       ", slope(full_eesp, x, wr, we, *wb)),
    ]
    for name, t in rows:
        print(f"{name}  {t:8.2f} ms")


def bench_fold_variants(B=64, H=256, W=512, Cch=128):
    """Folded branch-section variants (run: python -m tools.bench_eesp_parts
    fold [B H W C]). The ESN_TPU_FOLD_DW=1 shift-FMA path measured SLOWER
    than unfolded XLA depthwise (espnetv2 68.5->37.9); these test whether
    MXU-dense banded folded kernels (ops.folding.folded_conv2d on a
    densified diagonal kernel) change that verdict."""
    from esn_tpu.ops import folding
    k = 4
    d = Cch // k
    key = jax.random.PRNGKey(0)
    y32 = jax.random.normal(key, (B, H, W, d), jnp.bfloat16)
    wb = [jax.random.normal(key, (3, 3, 1, d), jnp.bfloat16) * 0.1
          for _ in range(k)]
    f = folding.fold_factor(d, W)
    print(f"fold factor f={f} d={d}")

    def hff_concat_folded(outs, f):
        fused, acc = [outs[0]], None
        for i in range(1, k):
            acc = outs[i] if i == 1 else acc + outs[i]
            fused.append(acc)
        bsz, h, q = outs[0].shape[:3]
        z = jnp.concatenate([o.reshape(bsz, h, q, f, d) for o in fused],
                            axis=-1)
        return z.reshape(bsz, h, q, f * k * d)

    def unfolded(y, *ws):
        outs = [C.conv2d(y, w, padding=2 ** i, dilation=2 ** i, groups=d)
                for i, w in enumerate(ws)]
        fused, acc = [outs[0]], None
        for i in range(1, k):
            acc = outs[i] if i == 1 else acc + outs[i]
            fused.append(acc)
        return jnp.concatenate(fused, axis=-1)

    def shift_fma(y, *ws):
        yf = folding.fold_w(y, f)
        outs = [folding.folded_depthwise_conv(
            yf, w[:, :, 0], f, dilation=(2 ** i,) * 2,
            padding=(2 ** i,) * 2) for i, w in enumerate(ws)]
        return folding.unfold_w(hff_concat_folded(outs, f), f)

    def dense_banded(y, *ws):
        yf = folding.fold_w(y, f)
        outs = []
        for i, w in enumerate(ws):
            wd = jnp.zeros((3, 3, d, d), w.dtype)
            wd = wd.at[:, :, jnp.arange(d), jnp.arange(d)].set(w[:, :, 0])
            outs.append(folding.folded_conv2d(
                yf, wd, f, dilation=(2 ** i,) * 2, padding=(2 ** i,) * 2))
        return folding.unfold_w(hff_concat_folded(outs, f), f)

    def hybrid(y, *ws):
        yf = folding.fold_w(y, f)
        outs = []
        for i, w in enumerate(ws):
            dil = 2 ** i
            if dil % f == 0:  # pure slot shifts -> cheap VPU path
                outs.append(folding.folded_depthwise_conv(
                    yf, w[:, :, 0], f, dilation=(dil,) * 2,
                    padding=(dil,) * 2))
            else:
                wd = jnp.zeros((3, 3, d, d), w.dtype)
                wd = wd.at[:, :, jnp.arange(d), jnp.arange(d)].set(w[:, :, 0])
                outs.append(folding.folded_conv2d(
                    yf, wd, f, dilation=(dil,) * 2, padding=(dil,) * 2))
        return folding.unfold_w(hff_concat_folded(outs, f), f)

    ref = jax.jit(unfolded)(y32, *wb)
    for name, fn in [("unfolded (current)", unfolded),
                     ("shift-FMA folded  ", shift_fma),
                     ("dense-banded fold ", dense_banded),
                     ("hybrid fold       ", hybrid)]:
        got = jax.jit(fn)(y32, *wb)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t = slope(fn, y32, *wb)
        print(f"{name}  {t:8.2f} ms   maxerr {err:.4f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fold":
        args = [int(v) for v in sys.argv[2:6]]
        bench_fold_variants(*args)
    else:
        main()
