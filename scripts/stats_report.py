"""Per-operator Ray Data stats for the headline pipelines — the measure-
don't-guess loop. Runs each pipeline once (warm) and prints ds.stats(), so
wall-time attribution per operator (read / parse / enrich / shuffle / sort /
write) is inspectable instead of inferred.

Usage: python scripts/stats_report.py [sf_dir] [pipeline ...]
Pipelines: flagship errors_by_severity sessions dedup_minhash (default all).
"""

from __future__ import annotations

import sys


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from pgweasel_ray.pipelines import core, dataprep

    def show(name, ds_fn):
        if only and name not in only:
            return
        ds = ds_fn()
        if hasattr(ds, "materialize"):
            mat = ds.materialize()
            print(f"\n===== {name} =====\n{mat.stats()}")
        else:
            print(f"\n===== {name} ===== (pandas result; no Ray stats)")

    show("errors_by_severity", lambda: core.errors_by_severity(sf_dir))
    show("errors_top_messages", lambda: core.errors_top_messages(sf_dir))
    show("sessions", lambda: core.sessions(sf_dir))
    show("dedup_minhash", lambda: dataprep.dedup_minhash_ds(sf_dir))

    if not only or "flagship" in only:
        # the routed sink has no terminal Dataset to ask for stats; time its
        # stages via the router's manifest instead
        import shutil
        import time

        from pgweasel_ray.pipelines import router

        out = "/tmp/pgweasel_ray_stats_route"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.monotonic()
        m = router.route(sf_dir, out_dir=out, num_shards=1)
        print(f"\n===== flagship route ===== wall={time.monotonic()-t0:.2f}s "
              f"rows={m.total_rows()}")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    raise SystemExit(main(sf, sys.argv[2:] or None))
