"""Command-line scenario replay: ``python -m lets_talk_cdc_change_feed_playground_spark.cli
<scenario.json> [...]`` — the reference playground's load-and-play loop,
headless, printing the comparator summary as one JSON document."""

from __future__ import annotations

import argparse
import json
import sys

from lets_talk_cdc_change_feed_playground_spark import runner


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="lets_talk_cdc_change_feed_playground_spark.cli",
        description="Replay a scenario fixture through the three CDC capture "
        "engines and print per-lane verdicts, metrics and the final state.",
    )
    ap.add_argument("scenario", nargs="+", help="scenario JSON fixture path(s)")
    ap.add_argument("--fetch-ms", type=int, default=runner.DEFAULT_FETCH_MS)
    ap.add_argument("--poll-ms", type=int, default=runner.DEFAULT_POLL_MS)
    ap.add_argument("--extract-ms", type=int, default=runner.DEFAULT_EXTRACT_MS)
    ap.add_argument("--overhead-ms", type=int, default=runner.DEFAULT_OVERHEAD_MS)
    ap.add_argument(
        "--hide-soft-deletes",
        action="store_true",
        help="polling lane drops soft-deleted rows entirely (reference default)",
    )
    ap.add_argument("--master", default="local[4]")
    args = ap.parse_args(argv)

    from lets_talk_cdc_change_feed_playground_spark import get_spark

    spark = get_spark("scenario-replay", master=args.master, shuffle_partitions=4)
    out = []
    for path in args.scenario:
        out.append(
            runner.replay_scenario(
                spark,
                path,
                fetch_ms=args.fetch_ms,
                poll_ms=args.poll_ms,
                extract_ms=args.extract_ms,
                overhead_ms=args.overhead_ms,
                include_soft_deletes=not args.hide_soft_deletes,
            )
        )
    json.dump(out[0] if len(out) == 1 else out, sys.stdout, indent=2, sort_keys=True)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
