"""spark-submit entry point (north rule: ships via --py-files).

    python -m silkworm_spark.package            # build dist/silkworm_spark.zip
    spark-submit --py-files dist/silkworm_spark.zip \
        crawl.py --seeds seeds.txt --checkpoint /data/crawl1 ...

or run the built-in demo crawl directly:

    spark-submit --py-files dist/silkworm_spark.zip \
        $(python -c 'import silkworm_spark.__main__ as m; print(m.__file__)') \
        --pages 10000 --seeds 500 --rounds 5 --checkpoint /tmp/crawl
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="silkworm-spark demo crawl (offline synthetic web)")
    ap.add_argument("--pages", type=int, default=10_000)
    ap.add_argument("--hosts", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=500)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget", type=int, default=100_000)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from silkworm_spark.plans.engine import CrawlConfig, CrawlEngine
    from silkworm_spark.session import get_spark
    from silkworm_spark.sources.webgen import (
        build_robots,
        build_seeds,
        build_web_df,
        robots_df,
        seeds_df,
    )

    spark = get_spark(app_name="silkworm-crawl")
    web = build_web_df(spark, args.pages, args.hosts)
    engine = CrawlEngine(
        spark, args.checkpoint,
        CrawlConfig(max_rounds=args.rounds, round_budget=args.budget),
        web=web,
    )
    if not args.resume:
        engine.initialize(
            seeds_df(spark, build_seeds(args.seeds, args.pages, args.hosts)),
            robots_df(spark, build_robots(args.hosts)),
        )
    stats = engine.run()
    print(
        f"rounds={stats.rounds} requests={stats.requests_sent} "
        f"items={stats.items_scraped} errors={stats.errors} "
        f"retries={stats.retries} robots_denied={stats.robots_denied} "
        f"req/s={stats.requests_per_second:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
