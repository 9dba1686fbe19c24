"""Train the tagger on a synthesized second dataset (NCBI-Disease-like
or LaptopReview-like) — the dataset-agnostic path the reference drives
with `autoner_train.sh:7-24` (same pipeline, different corpus/dict
paths). The real NCBI/Laptop corpora are not shipped and there is no
network, so the corpora are synthesized deterministically from public
surface inventories (see autoner_ray/synth.py).

Usage:
    python scripts/train_tagger_synth.py --dataset ncbi   [--epochs 20]
    python scripts/train_tagger_synth.py --dataset laptop [--self-train 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["ncbi", "laptop"], default="ncbi")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--self-train", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="optional artifact path (.npz via Tagger bytes)")
    args = ap.parse_args()

    from autoner_ray.synth import laptop_like, ncbi_like, train_eval_distant

    ds = ncbi_like() if args.dataset == "ncbi" else laptop_like()
    print(f"dataset={args.dataset} type={ds.type_name} "
          f"train={len(ds.train_sents)} eval={len(ds.eval_sents)} "
          f"core={len(ds.core_surfaces)} heldout={len(ds.heldout_surfaces)}")
    t0 = time.time()
    neural, dict_f1, tagger = train_eval_distant(
        ds, epochs=args.epochs, self_train_rounds=args.self_train
    )
    print(f"trained in {time.time() - t0:.1f}s")
    print(f"dictionary match: {dict_f1}")
    print(f"neural tagger:    {neural}")
    if args.out:
        with open(args.out, "wb") as f:
            f.write(tagger.to_bytes())
        print(f"artifact -> {args.out}")


if __name__ == "__main__":
    main()
