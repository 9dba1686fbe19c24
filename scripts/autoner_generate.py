"""CLI twin of the reference's ``bin/generate`` (distant supervision).

Same positional contract as `src/generate.cpp:11-21`::

    python scripts/autoner_generate.py RAW_TEXT DICT_CORE DICT_FULL OUT_CK \\
        [--stopwords PATH] [--cpus N]

RAW_TEXT is the reference's one-token-per-line format (blank line =
sentence boundary). Output is byte-identical to the reference binary
(verified on the full BC5CDR corpus — tests/test_golden_reference.py and
scripts/bench_reference.py), produced by the Ray actor-pool pipeline.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_text")
    ap.add_argument("dict_core")
    ap.add_argument("dict_full")
    ap.add_argument("out_ck")
    ap.add_argument("--stopwords", default="/root/reference/data/stopwords.txt")
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

        from autoner_ray.stages.dict_match import DictMatcher

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_reference import sentences_from_lines

        lines = open(args.raw_text).read().splitlines()
        sents = sentences_from_lines(lines)
        core = open(args.dict_core).read().splitlines()
        full = open(args.dict_full).read().splitlines()
        stop = open(args.stopwords).read().splitlines()

        table = pa.table(
            {
                "url": pa.array([""] * len(sents), pa.string()),
                "doc_id": pa.array(range(len(sents)), pa.int64()),
                "sent_id": pa.array([0] * len(sents), pa.int32()),
                "tokens": pa.array(sents, pa.list_(pa.string())),
            }
        )
        conc = max(2, args.cpus - 1)
        step = max(1, table.num_rows // (conc * 2) + 1)
        ds = rd.from_arrow(
            [table.slice(i, step) for i in range(0, table.num_rows, step)]
        ).map_batches(
            DictMatcher,
            fn_constructor_kwargs={"core_lines": core, "full_lines": full,
                                   "stopword_lines": stop,
                                   "output": "annotations"},
            batch_format="pyarrow", batch_size=512,
            concurrency=conc, num_cpus=1,
        )
        result = ds.select_columns(["doc_id", "ck"]).to_pandas()
        result = result.sort_values("doc_id")
        with open(args.out_ck, "w") as f:
            f.write("".join(result["ck"]))
            f.write("\n")  # generate.cpp:38 trailing newline
        print(f"wrote {args.out_ck}: {len(result)} sentences")
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
