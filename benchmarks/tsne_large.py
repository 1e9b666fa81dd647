"""Large-n t-SNE benchmark: the knn mode on the real TPU chip.

The reference's t-SNE is a thin wrapper over the CPU ``bhtsne`` crate
(``src/dimred/tsne/mod.rs``, WIP) — Barnes-Hut approximation, single
thread. The TPU knn mode computes the SAME sparse input affinities
(k = 3 * perplexity) but the repulsion term exactly in [block, n] tiles;
its denominator here is sklearn's Barnes-Hut TSNE (the standard,
multi-threaded-capable CPU implementation of the identical algorithm
family) at the same shape, recorded by ``--with-cpu``.

Writes benchmarks/results_tsne_tpu.json.

Usage: python benchmarks/tsne_large.py [--with-cpu] [--big]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "results_tsne_tpu.json")


def make_blobs(n, d=50, nc=10, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, d)) * 10.0
    labels = rng.integers(0, nc, n)
    x = (centers[labels] + rng.standard_normal((n, d))).astype(np.float32)
    return x, labels


def silhouette(y, labels):
    from sklearn.metrics import silhouette_score

    return float(
        silhouette_score(y, labels, sample_size=5000, random_state=0)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-cpu", action="store_true",
                    help="also run the sklearn Barnes-Hut CPU baseline")
    ap.add_argument("--big", action="store_true",
                    help="run the n=100k row instead of the default 50k row")
    args = ap.parse_args()

    import jax

    from single_algebra_tpu.models import tsne
    from single_algebra_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    backend = jax.default_backend()
    dev = str(jax.devices()[0].device_kind)

    rows = []
    if os.path.exists(OUT):
        rows = json.load(open(OUT))["rows"]

    # epochs must exceed exaggeration_epochs (250): a run that never
    # leaves the early-exaggeration phase records an unconverged layout
    shapes = [(100_000, 500)] if args.big else [(50_000, 500)]

    for n, epochs in shapes:
        x, labels = make_blobs(n)
        cfg = tsne.TSNEConfig(perplexity=30.0, epochs=epochs, mode="knn")
        t0 = time.time()
        y = np.asarray(tsne.run(x, cfg))
        cold = time.time() - t0
        t0 = time.time()
        y = np.asarray(tsne.run(x, cfg))
        warm = time.time() - t0
        # per-run setup (exact kNN graph + calibration + host
        # symmetrization) measured via a 1-epoch run, so epoch_ms is the
        # true optimizer slope, not setup amortized over the epoch count
        t0 = time.time()
        np.asarray(tsne.run(x, dataclasses.replace(cfg, epochs=1)))
        setup = time.time() - t0
        row = {
            "mode": "knn",
            "backend": backend,
            "device": dev,
            "n": n,
            "input_dim": 50,
            "perplexity": 30.0,
            "epochs": epochs,
            "cold_s": round(cold, 1),
            "warm_s": round(warm, 1),
            "setup_s": round(setup, 1),
            "epoch_ms": round(max(warm - setup, 0.0) / epochs * 1000, 1),
            "silhouette": round(silhouette(y, labels), 3),
        }
        if args.with_cpu:
            from sklearn.manifold import TSNE as SkTSNE

            t0 = time.time()
            y_cpu = SkTSNE(
                n_components=2, perplexity=30.0, max_iter=epochs,
                method="barnes_hut", init="random", random_state=0,
            ).fit_transform(x)
            row["cpu_bh_s"] = round(time.time() - t0, 1)
            row["cpu_bh_silhouette"] = round(silhouette(y_cpu, labels), 3)
            row["vs_cpu_bh"] = round(row["cpu_bh_s"] / warm, 1)
        rows = [
            r for r in rows
            if not (r["n"] == n and r["epochs"] == epochs)
        ] + [row]
        print(json.dumps(row))

    json.dump({"rows": sorted(rows, key=lambda r: r["n"])},
              open(OUT, "w"), indent=1)


if __name__ == "__main__":
    main()
