"""Host input-pipeline throughput (VERDICT r2 item 4).

Measures what the HOST can feed, to compare against what the DEVICE
consumes (benchmarks/zoo_*.json): decoded img/s for the native C++
loader (``native/esn_native.cc``: libpng/libjpeg + cv2-matching resize +
threaded ring prefetch) vs the cv2 fallback, at the two production
geometries (Cityscapes 2048x1024 full-res, 512x1024 eval/crop-source),
PNG and JPEG, plus the pre-packed ``.npy`` mitigation path (raw uint8
arrays, no decode).

Reference counterpart: torch DataLoader(num_workers=N) forked cv2 decode
[R: dataset/cityscapes.py __getitem__]. The reference never measures it
either; this closes that gap for the rebuild.

Usage:  python -m tools.bench_loader [--n 12] [--epochs 3] [--out FILE]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_image(rng, h, w):
    """Cityscapes-like compressibility: smooth structure + mild texture.
    Pure noise would overstate decode cost ~3x vs street scenes."""
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    base = (yy * 0.5 + xx * 0.5)
    img = np.stack([(base + p * 30) % 256 for p in range(3)], -1)
    img += rng.randint(-12, 12, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def build_fixture(root, n, h, w, ext):
    import cv2
    paths = []
    rng = np.random.RandomState(0)
    for i in range(n):
        ip = os.path.join(root, f"img_{i}.{ext}")
        lp = os.path.join(root, f"lab_{i}.png")
        cv2.imwrite(ip, synth_image(rng, h, w))
        cv2.imwrite(lp, rng.randint(0, 19, (h, w)).astype(np.uint8))
        paths.append((ip, lp))
    return paths


def bench_native(paths, h, w, epochs, threads=None):
    from esn_tpu.data import native
    if not native.available():
        return None
    pipe = native.NativePipeline(paths, (h, w), threads=threads)
    for _ in pipe.epoch():  # warm (page cache, thread spin-up)
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for _ in pipe.epoch():
            n += 1
    dt = time.perf_counter() - t0
    pipe.close() if hasattr(pipe, "close") else None
    return n / dt


def bench_cv2(paths, h, w, epochs):
    import cv2
    for ip, lp in paths:  # warm page cache
        cv2.imread(ip), cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for ip, lp in paths:
            img = cv2.imread(ip)
            lab = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h),
                                 interpolation=cv2.INTER_LINEAR)
                lab = cv2.resize(lab, (w, h),
                                 interpolation=cv2.INTER_NEAREST)
            n += 1
    return n / (time.perf_counter() - t0)


def bench_npy(root, paths, h, w, epochs):
    """Pre-packed mitigation: one uint8 .npy per record, np.load + copy."""
    packed = []
    for i, (ip, lp) in enumerate(paths):
        import cv2
        a = cv2.imread(ip)
        b = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
        p = os.path.join(root, f"packed_{i}.npy")
        np.save(p, np.concatenate([a.reshape(-1), b.reshape(-1)]))
        packed.append(p)
    for p in packed:
        np.load(p)  # warm
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for p in packed:
            flat = np.load(p)
            img = flat[:h * w * 3].reshape(h, w, 3)
            lab = flat[h * w * 3:].reshape(h, w)
            n += 1
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {"host_cores": os.cpu_count(),
               "note": ("img/s of decoded (image+label) records; "
                        "native threads = min(8, cores)")}
    for h, w in ((1024, 2048), (512, 1024)):
        for ext in ("png", "jpg"):
            with tempfile.TemporaryDirectory() as root:
                paths = build_fixture(root, args.n, h, w, ext)
                key = f"{w}x{h}_{ext}"
                nat = bench_native(paths, h, w, args.epochs)
                cv = bench_cv2(paths, h, w, args.epochs)
                # per-path MB/s so entries stay comparable across hosts
                # (ADVICE r3: a single column silently switched meaning
                # depending on native-loader availability)
                entry = {"native_img_s": round(nat, 2) if nat else None,
                         "cv2_img_s": round(cv, 2),
                         "native_decoded_MB_s": round(
                             nat * (h * w * 4) / 1e6, 1) if nat else None,
                         "cv2_decoded_MB_s": round(
                             cv * (h * w * 4) / 1e6, 1)}
                if ext == "png":
                    entry["npy_packed_img_s"] = round(
                        bench_npy(root, paths, h, w, args.epochs), 2)
                results[key] = entry
                print(key, json.dumps(entry))
                if (h, w, ext) == (1024, 2048, "png"):
                    # measured thread-scaling curve (VERDICT r3 item 7:
                    # the "scales with decode threads" claim must be a
                    # measurement, not an extrapolation — even 1 core
                    # shows the read+decode overlap slice)
                    curve = {}
                    for t in (1, 2, 4, 8):
                        r = bench_native(paths, h, w, args.epochs,
                                         threads=t)
                        if r is None:
                            break
                        curve[str(t)] = round(r, 2)
                    results[f"{key}_native_threads_curve"] = curve
                    print(f"{key} thread curve", json.dumps(curve))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
