#!/usr/bin/env python
"""Index-build entry point for `ray job submit` (north-rule launcher).

Usage:
    ray job submit --working-dir . -- python scripts/build_job.py \
        --pages-dir /data/pages --index-dir /data/index \
        [--docs-per-shard 4096] [--force]

Idempotent/resumable: re-submitting the same job skips completed stages and
completed segment shards (manifest + per-shard _SUCCESS markers). On a real
cluster the same script runs unchanged — ray.init() with no address inside
a job connects to the cluster the job was submitted to.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True,
                    help="parquet dir with (url, warc_ts, html, text, lang)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--docs-per-shard", type=int, default=4096)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; omit inside a cluster job")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init()
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index

    def pages_factory(columns):
        return rd.read_parquet(args.pages_dir, columns=columns)

    man = build_index(pages_factory, args.index_dir,
                      docs_per_shard=args.docs_per_shard, force=args.force)
    print(json.dumps(man["stats"], indent=1, sort_keys=True))
    ray.shutdown()


if __name__ == "__main__":
    main()
