"""CLI twin of the reference's ``autoner_test.sh`` (model inference).

Reference contract (`autoner_test.sh:11-13` → `test_partial_ner.py`):
raw text + trained checkpoint → decoded-mention TSV
(``st  ed  surface  type_id  type`` per span, blank line per sentence,
`test_partial_ner.py:99-109`). Here the checkpoint is a numpy tagger
artifact (weights + vocab maps in one npz, S11 shape) and inference runs
on the TaggerScorer actor pool::

    python scripts/autoner_test.py RAW_TEXT MODEL_NPZ OUT_TSV \\
        [--threshold 0.0] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_text")
    ap.add_argument("model_npz")
    ap.add_argument("out_tsv")
    ap.add_argument("--threshold", type=float, default=0.0)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    try:
        import pyarrow as pa
        import ray.data as rd

        ctx = rd.DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.print_on_execution_start = False

        from autoner_ray.stages.tagger_stage import (
            mentions_to_tsv,
            neural_mentions,
        )
        from autoner_ray.state.tagger import Tagger

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_reference import sentences_from_lines

        lines = open(args.raw_text).read().splitlines()
        sents = [
            [t for t in s if t != "\n"]
            for s in sentences_from_lines(lines)
        ]
        with open(args.model_npz, "rb") as f:
            blob = f.read()
        tl_map = Tagger.from_bytes(blob).tl_map

        table = pa.table(
            {
                "url": pa.array([""] * len(sents), pa.string()),
                "doc_id": pa.array(range(len(sents)), pa.int64()),
                "sent_id": pa.array([0] * len(sents), pa.int32()),
                "tokens": pa.array(sents, pa.list_(pa.string())),
            }
        )
        ds = neural_mentions(
            rd.from_arrow(table), blob,
            concurrency=max(2, args.cpus - 1),
            threshold=args.threshold,
        )
        df = ds.to_pandas().sort_values(["doc_id", "l", "r"])
        rows = [
            (did, l, r, surface, ty)
            for did, l, r, surface, ty in zip(
                df["doc_id"], df["l"], df["r"], df["surface"], df["types"]
            )
        ]
        with open(args.out_tsv, "w") as f:
            f.write(mentions_to_tsv(rows, tl_map))
        print(f"wrote {args.out_tsv}: {len(rows)} mentions over "
              f"{len(sents)} sentences")
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
