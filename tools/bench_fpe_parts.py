"""Bisect one FPE block at the stage2 geometry (slope-timed).

bench_fpenet_decomp: stage2 = 2 FPE blocks @ 1/4 res cost 91 ms/block
(b64 2048x1024 bf16) — the model's largest sink together with stage3.
Geometry: in 32 ch, expand t=4 -> mid 128, scales 4 -> depthwise groups
of g=32 with dilations 1,2,4,8, project 128 -> 32, SE(16), residual.
Every 32-ch tensor at this resolution is 4x lane-padded in HBM
(bf16[64,256,512,32] stores as 2 GB), so each extra pass over a 32-ch
tensor costs dense-128 money.

Run: python -m tools.bench_fpe_parts [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def slope(f, args, lo=8, hi=24):
    def mk(iters):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc, aa = carry
                aa = tuple(x * (1.0 + 1e-12 * i) for x in aa)
                return acc + jnp.sum(f(*aa).astype(jnp.float32)), aa
            return lax.fori_loop(0, iters, body, (jnp.float32(0), a))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(*args))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(*args))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def conv(x, w, *, stride=1, d=1, groups=1):
    kh = w.shape[0]
    pad = d * (kh - 1) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad)] * 2,
        rhs_dilation=(d, d), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, W = 256, 512            # 1/4 res of 1024x2048
    cin, mid, g = 32, 128, 32
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, cin), jnp.bfloat16)
    y128 = jax.random.normal(k, (B, H, W, mid), jnp.bfloat16)
    y32 = jax.random.normal(k, (B, H, W, g), jnp.bfloat16)
    we = jax.random.normal(k, (1, 1, cin, mid), jnp.float32) * 0.1
    wd = jax.random.normal(k, (3, 3, 1, g), jnp.float32) * 0.1
    wd128 = jax.random.normal(k, (3, 3, 1, mid), jnp.float32) * 0.1
    wp = jax.random.normal(k, (1, 1, mid, cin), jnp.float32) * 0.1

    print(f"b{B} {H}x{W}  in{cin} mid{mid} g{g}")
    t = slope(lambda a: conv(a, we), (x,))
    print(f"expand 1x1 32->128        {t:7.2f} ms")
    t = slope(lambda a: conv(a, wp), (y128,))
    print(f"project 1x1 128->32       {t:7.2f} ms")
    for d in (1, 2, 4, 8):
        t = slope(lambda a, dd=d: conv(a, wd, d=dd, groups=g), (y32,))
        print(f"dw 3x3 d={d} g=32 (sliced) {t:7.2f} ms")
    for d in (1, 8):
        t = slope(lambda a, dd=d: conv(a, wd128, d=dd, groups=mid), (y128,))
        print(f"dw 3x3 d={d} g=128 (full)  {t:7.2f} ms")
    # dense-diag: depthwise as dense 32->32 conv (MXU, no grouped lowering)
    import numpy as np
    wdd = np.zeros((3, 3, g, g), np.float32)
    for c in range(g):
        wdd[:, :, c, c] = np.asarray(jax.random.normal(k, (3, 3))) * 0.1
    wdd = jnp.asarray(wdd)
    for d in (1, 8):
        t = slope(lambda a, dd=d: conv(a, wdd, d=dd), (y32,))
        print(f"dw as dense-diag 32->32 d={d} {t:7.2f} ms")
    # slice+concat cost: 128 -> 4x32 -> 128
    def slice_concat(a):
        parts = [a[..., i * g:(i + 1) * g] + jnp.bfloat16(1.0)
                 for i in range(4)]
        return jnp.concatenate(parts, axis=-1)
    t = slope(slice_concat, (y128,))
    print(f"slice->(+1)->concat 4x32   {t:7.2f} ms")
    # the full HFF chain, sliced (as the model runs it today)
    def hff_sliced(a):
        outs, prev = [], None
        for i, d in enumerate((1, 2, 4, 8)):
            inp = a[..., i * g:(i + 1) * g]
            if prev is not None:
                inp = inp + prev
            prev = conv(inp, wd, d=d, groups=g)
            outs.append(prev)
        return jnp.concatenate(outs, axis=-1)
    t = slope(hff_sliced, (y128,))
    print(f"HFF chain sliced (today)   {t:7.2f} ms")
    # HFF chain on the FULL 128-ch tensor: 4 depthwise convs over all 128
    # channels with a block-banded accumulation via dense masks is NOT the
    # same math; instead keep per-group but as dense-diag 32->32 convs
    def hff_densediag(a):
        outs, prev = [], None
        for i, d in enumerate((1, 2, 4, 8)):
            inp = a[..., i * g:(i + 1) * g]
            if prev is not None:
                inp = inp + prev
            prev = conv(inp, wdd, d=d)
            outs.append(prev)
        return jnp.concatenate(outs, axis=-1)
    t = slope(hff_densediag, (y128,))
    print(f"HFF chain dense-diag       {t:7.2f} ms")


def folded_variants():
    """Folded-domain (f=4) variants at the same stage2 geometry."""
    from esn_tpu.ops import folding
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, Q, f, g = 256, 128, 4, 32          # W=512 folded by 4
    mid = 128
    k = jax.random.PRNGKey(0)
    xf = jax.random.normal(k, (B, H, Q, f * g), jnp.bfloat16)   # one group
    xmid = jax.random.normal(k, (B, H, Q, f * mid), jnp.bfloat16)
    x32f = jax.random.normal(k, (B, H, Q, f * 32), jnp.bfloat16)
    wdw = jax.random.normal(k, (3, 3, g), jnp.float32) * 0.1
    import numpy as np
    wdd = np.zeros((3, 3, g, g), np.float32)
    for c in range(g):
        wdd[:, :, c, c] = np.asarray(jax.random.normal(k, (3, 3))) * 0.1
    wdd = jnp.asarray(wdd)
    we = jax.random.normal(k, (1, 1, 32, mid), jnp.float32) * 0.1
    wp = jax.random.normal(k, (1, 1, mid, 32), jnp.float32) * 0.1

    print(f"--- folded domain f={f}, per-group tensors (B,{H},{Q},{f*g}) ---")
    for d in (1, 2, 4, 8):
        t = slope(lambda a, dd=d: folding.folded_depthwise_conv(
            a, wdw, f, dilation=(dd, dd), padding=(dd, dd)), (xf,))
        u = "slot-uniform" if d % f == 0 else "mixed-slot"
        print(f"folded dw shift-FMA d={d} ({u:12s}) {t:7.2f} ms")
    for d in (1, 2, 4, 8):
        t = slope(lambda a, dd=d: folding.folded_conv2d(
            a, wdd, f, dilation=(dd, dd), padding=(dd, dd)), (xf,))
        print(f"folded dw dense-banded MXU d={d}     {t:7.2f} ms")
    t = slope(lambda a: folding.folded_conv2d(a, we, f), (x32f,))
    print(f"folded expand 1x1 32->128 (blockdiag) {t:7.2f} ms")
    t = slope(lambda a: folding.folded_conv2d(a, wp, f), (xmid,))
    print(f"folded project 1x1 128->32            {t:7.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "folded":
        folded_variants()
    else:
        main()
