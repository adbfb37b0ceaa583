"""CLI — the reference's local entry path (SURVEY.md §3.2:
``node fetcher/index.js`` with SOURCE/BUCKET/DRYRUN env; README.md:36-48).

    python -m openaq_lcs_fetch_spark --config sources.json \
        [--source NAME] --out OUT_DIR [--dry-run] [--cpus N]

``--config`` is a JSON file holding one source config or a list of
them; ``--source`` filters by provider name (≙ SOURCE env). Prints one
JSON log line per source run.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="openaq_lcs_fetch_spark")
    ap.add_argument(
        "--config",
        required=True,
        help="JSON source config file (object or list) or a directory of them",
    )
    ap.add_argument(
        "--source", help="run only this source/provider (SOURCE env equivalent)"
    )
    ap.add_argument("--out", required=True, help="output root (BUCKET/STACK equivalent)")
    ap.add_argument("--data-root", help="expands {data_root} in config meta paths")
    ap.add_argument("--dry-run", action="store_true", help="skip sinks (DRYRUN)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import os

    from .config import source_label

    if os.path.isdir(args.config):
        from .scheduler import load_source_configs

        configs = load_source_configs(args.config)  # validates each one
    else:
        with open(args.config) as f:
            configs = json.load(f)
        if isinstance(configs, dict):
            configs = [configs]
    if args.source:
        configs = [
            c
            for c in configs
            if args.source in (c.get("provider"), source_label(c))
        ]
        if not configs:
            print(f"error: no source named {args.source!r} in config", file=sys.stderr)
            return 2
        if not any(c.get("active", True) for c in configs):
            print(f"error: source {args.source!r} is inactive", file=sys.stderr)
            return 2
    configs = [c for c in configs if c.get("active", True)]

    from .engine import Engine
    from .session import get_spark

    engine = Engine(get_spark("openaq-lcs-fetch-spark-cli", cpus=args.cpus))
    engine.spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for cfg in configs:
        try:
            log = engine.run_source(
                cfg, args.out, dry_run=args.dry_run, data_root=args.data_root
            )
            print(json.dumps(log, default=str))
        except Exception as e:
            print(json.dumps({"source": source_label(cfg), "status": "fetcher/error",
                              "message": str(e)[:300]}), file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
