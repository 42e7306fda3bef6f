"""Batch driver for `ray job submit`: the production entry point.

    ray job submit --working-dir . -- \
        python scripts/run_kg_job.py \
            --input-dir /data/sfX --output-dir /data/kg_out \
            --dict-dir /data/dicts --partitions 64 --concurrency 64

Reads documents, runs the fused KG pipeline partition by partition, and
writes edges/nodes/dead-letter parquet with per-partition lineage
records; rerunning the same command resumes from the last complete
partition (see kazu_ray.pipelines.kg.run_partitioned).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True, help="dir with documents.parquet")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dict-dir", default="/tmp/kazu_ray_dicts",
                   help="compiled dictionary dir (compiled here if missing)")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for local runs; on a cluster let Ray connect")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    from kazu_ray.context import tune_context

    tune_context()

    from kazu_ray.ontology.compile import CompiledDicts, compile_dictionaries

    syn = os.path.join(args.dict_dir, "synonyms.parquet")
    if os.path.exists(syn):
        dicts = CompiledDicts(
            syn,
            os.path.join(args.dict_dir, "metadata.parquet"),
            os.path.join(args.dict_dir, "curations.parquet"),
            os.path.join(args.dict_dir, "xrefs.parquet"),
        )
    else:
        dicts = compile_dictionaries(args.dict_dir)

    from kazu_ray.pipelines.kg import run_partitioned

    results = run_partitioned(
        args.input_dir,
        args.output_dir,
        dicts,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        ner_concurrency=args.concurrency,
    )
    print(json.dumps({"partitions": results}, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
