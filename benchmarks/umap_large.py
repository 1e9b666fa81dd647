"""Large-n UMAP benchmark on the real TPU chip.

Complements ``tsne_large.py``: the same blob data, the full UMAP pipeline
(exact MXU kNN -> smooth-kNN calibration -> fuzzy union -> chunk-dispatched
negative-sampling layout). Writes benchmarks/results_umap_tpu.json.

Usage: python benchmarks/umap_large.py [--big]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "results_umap_tpu.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="run the n=100k row instead of the default 50k row")
    args = ap.parse_args()

    import jax

    from tsne_large import make_blobs, silhouette
    from single_algebra_tpu.models import UMAP, UMAPConfig
    from single_algebra_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    n = 100_000 if args.big else 50_000
    epochs = 200
    x, labels = make_blobs(n)

    def run():
        um = UMAP(UMAPConfig(n_neighbors=15, n_epochs=epochs))
        return np.asarray(um.fit_transform(x))

    t0 = time.time()
    y = run()
    cold = time.time() - t0
    t0 = time.time()
    y = run()
    warm = time.time() - t0

    row = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "n": n,
        "input_dim": 50,
        "n_neighbors": 15,
        "epochs": epochs,
        "cold_s": round(cold, 1),
        "warm_s": round(warm, 1),
        "silhouette": round(silhouette(y, labels), 3),
    }
    rows = []
    if os.path.exists(OUT):
        rows = json.load(open(OUT))["rows"]
    rows = [r for r in rows if r["n"] != n] + [row]
    json.dump({"rows": sorted(rows, key=lambda r: r["n"])},
              open(OUT, "w"), indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
