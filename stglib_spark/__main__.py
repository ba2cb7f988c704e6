"""``runots``-equivalent CLI: the reference's single entry point
(``runots <instrument> <step> gatts.txt config.yaml``,
stglib/core/cmd.py:80-214 + core/runcmd.py:527-613) re-expressed over the
three-zone Parquet pipeline.

    python -m stglib_spark <instrument> <step> [gatts] [config.yaml]
        [--input PATH] [--atmpres PATH] [--output-dir DIR] [--cpus N]

Steps (reference registry names; any ``*2cdf`` spelling maps to ingest):
    csv2cdf / dat2cdf / mat2cdf / hdr2cdf / raw2cdf / rsk2cdf / ...  ingest
    cdf2nc                                                           clean
    nc2waves                                                         waves (+PUV when ``puv: true``)
    nc2diwasp                                                        diwasp
    nc2xy                                                            sonar xy images
    exportnc                                                         final netCDF product
    dedup                                                            corpus dedup zones
    mediadedup                                                       image/video phash dedup zones
    corpus                                                           corpus curation zones
    corpusall                                                        dedup + curation chain
    all                                                              ingest+clean[+waves]

Instrument = an ingest adapter name (``stglib_spark.sources.ADAPTERS``);
``--list`` prints them. The merged gatts+YAML dict is the same IR the
reference builds (runcmd.py:8-27) and drives every stage.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m stglib_spark",
        description="Three-stage oceanographic pipeline (ingest/clean/analyze) on PySpark.",
    )
    p.add_argument("instrument", nargs="?", help="ingest adapter name (see --list)")
    p.add_argument(
        "step",
        nargs="?",
        help="*2cdf | cdf2nc | nc2waves | nc2diwasp | nc2xy | exportnc | exportspec | dedup | mediadedup | corpus | corpusall | all",
    )
    p.add_argument("gatts", nargs="?", help="global attributes file (key; value lines)")
    p.add_argument("config", nargs="?", help="YAML instrument config")
    p.add_argument("--input", dest="input_path", help="vendor input file/dir (else config input_path)")
    p.add_argument("--atmpres", dest="atmpres_path", help="met pressure parquet for atmos correction")
    p.add_argument("--output-dir", dest="output_dir", help="zone output directory")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    p.add_argument("--list", action="store_true", help="list ingest adapters and exit")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from stglib_spark.sources import ADAPTERS

    if args.list:
        from stglib_spark.sources import INSTRUMENT_ALIASES

        print("\n".join(sorted(ADAPTERS)))
        print("# reference instrument aliases:")
        for alias, target in sorted(INSTRUMENT_ALIASES.items()):
            print(f"{alias} -> {target}")
        return 0
    if not args.instrument or not args.step:
        build_parser().print_usage()
        return 2

    from stglib_spark import pipeline
    from stglib_spark.config import load_config
    from stglib_spark.session import get_spark

    config = load_config(args.gatts, args.config)
    # reference pre-flight gate (utils.py:1572-1577), non-strict here:
    # warn instead of raise so partial configs still run
    from stglib_spark.config import check_globalatts

    missing = check_globalatts(config)
    if missing:
        import warnings

        warnings.warn(
            f"global attributes missing {missing} — the reference "
            "requires these (most likely in the gatts file)",
            UserWarning,
            stacklevel=1,
        )
    config.setdefault("instrument", args.instrument)
    for key in ("input_path", "atmpres_path", "output_dir"):
        if getattr(args, key):
            config[key] = getattr(args, key)

    step = args.step.lower()
    from pyspark.sql import SparkSession

    reused = SparkSession.getActiveSession() is not None
    spark = get_spark(f"runots-{args.instrument}-{step}", cpus=args.cpus)
    try:
        if step.endswith("2cdf"):
            path = pipeline.run_ingest(spark, config)
        elif step == "cdf2nc":
            path = pipeline.run_clean(spark, config)
        elif step == "nc2waves":
            path = pipeline.run_waves(spark, config)
        elif step == "nc2diwasp":
            path = pipeline.run_diwasp(spark, config)
        elif step == "nc2xy":
            path = pipeline.run_xy(spark, config)
        elif step in ("exportspec", "export_spec"):
            # DIWASP text-file products (writespec contract)
            path = pipeline.export_diwasp_spec(spark, config)
        elif step in ("exportnc", "export_nc"):
            path = pipeline.run_export_nc(
                spark, config, zone=config.get("export_zone", "clean")
            )
        elif step == "dedup":
            # corpus dedup stage (north-star): documents parquet →
            # shingles/candidates/verified-pairs zones, one shingle pass
            config.setdefault("documents_path", config.get("input_path"))
            path = pipeline.run_dedup(spark, config)
        elif step in ("mediadedup", "media_dedup"):
            # media dedup stage: (id, content) parquet → phash/pairs/
            # clusters zones; payloads decode exactly once
            config.setdefault("media_path", config.get("input_path"))
            path = pipeline.run_media_dedup(spark, config)
        elif step == "corpus":
            # corpus curation stage (north-star): documents parquet →
            # quality/census/mix/packs zones, metrics derived once
            config.setdefault("documents_path", config.get("input_path"))
            path = pipeline.run_corpus(spark, config)
        elif step == "corpusall":
            # full corpus chain: dedup → one-doc-per-cluster → curation
            config.setdefault("documents_path", config.get("input_path"))
            path = pipeline.run_corpus_all(spark, config)
        elif step == "all":
            path = pipeline.run_all(spark, config)
        else:
            print(f"unknown step {args.step!r}", file=sys.stderr)
            return 2
        print(f"Finished writing data: {path}")
        return 0
    finally:
        if not reused:  # in-process callers (tests) keep their session
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
