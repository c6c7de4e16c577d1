"""Flagship pipeline as a `ray job submit` entrypoint.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py --input <transcripts_uri> --out <sink_uri>

The job runner owns the cluster; `ray.init()` here connects to it (guarded
so the script also runs standalone in local mode, where the dashboard/job
server is unavailable — as in this sandbox). The job is resumable: rerunning
with the same --out skips shards committed in the sink's manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="/root/testdata/sf0.01",
                   help="transcripts parquet dir / raw logs / sf fixture name")
    p.add_argument("--out", required=True, help="routed sink directory")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--no-enrich", action="store_true")
    p.add_argument("--salt", type=int, default=None,
                   help="hot-key salt for the (severity, tool) repartition")
    p.add_argument("--exchange", choices=("compact", "hash"),
                   default="compact")
    p.add_argument("--shard-by", choices=("index", "file"), default="index",
                   dest="shard_by")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pgweasel_ray.pipelines import router

    t0 = time.monotonic()
    manifest = router.route(args.input, out_dir=args.out,
                            num_shards=args.shards,
                            enrich=not args.no_enrich, salt=args.salt,
                            exchange=args.exchange, shard_by=args.shard_by)
    wall = time.monotonic() - t0
    print(json.dumps({
        "rows": manifest.total_rows(),
        "shards": len(manifest.entries),
        "wall_s": round(wall, 2),
        "rows_per_sec": round(manifest.total_rows() / max(wall, 1e-9), 1),
        "out": args.out,
    }))
    ray.shutdown()
    return 0


def _on_cluster() -> bool:
    import os

    return os.environ.get("RAY_ADDRESS", "local") not in ("", "local")


if __name__ == "__main__":
    sys.exit(main())
