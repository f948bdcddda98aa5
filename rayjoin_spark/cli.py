"""spark-submit CLI mirroring the reference binaries.

query_exec / polyover_exec flag surface (reference src/flags.cc:3-33,
src/query.cc, src/overlay.cc) re-expressed:

    spark-submit --py-files rayjoin_spark.zip -m rayjoin_spark.cli \\
        query   --poly1 a_dir --poly2 b_dir --query lsi --grid-size 2048
    ...         query   --poly1 a_dir --poly2 b_dir --query pip
    ...         overlay --poly1 a_dir --poly2 b_dir --output out.cdb
    ...         convert --cdb in.cdb --out dir/
    ...         convert --poly-csv polys.csv --head-eq-tail --out dir/
    ...         ingest-warc --warc crawl/ --out pages/

--poly1/--poly2 accept either a CDB text file or a directory holding
chains.parquet + points.parquet (the converted cache). --mode is accepted
for flag parity but only the grid backend exists (the RT/LBVH backends
are GPU index structures the cell join replaces). --sample applies
topology-preserving map sampling. --checkpoint-dir enables resumable
phase checkpoints with lineage/metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_layer(spark, path, sample_rate=None):
    from rayjoin_spark.sources.cdb import read_cdb
    from rayjoin_spark.sources.sampling import sample_map

    if path.endswith(".cdb") or path.endswith(".txt"):
        chains, points = read_cdb(spark, path)
    else:
        chains = spark.read.parquet(f"{path}/chains.parquet")
        points = spark.read.parquet(f"{path}/points.parquet")
    if sample_rate:
        chains, points = sample_map(chains, points, sample_rate)
    return chains, points


def main(argv=None):
    from rayjoin_spark.operators.lsi import lsi_join
    from rayjoin_spark.operators.overlay import overlay, write_cdb
    from rayjoin_spark.operators.pip import pip_locate
    from rayjoin_spark.plans.layers import build_edges
    from rayjoin_spark.plans.scaling import GridSpec, compute_scaling
    from rayjoin_spark.session import get_spark
    from rayjoin_spark.sources.cdb import cdb_to_parquet

    p = argparse.ArgumentParser(prog="rayjoin_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="lsi / pip query (query_exec analog)")
    q.add_argument("--poly1", required=True)
    q.add_argument("--poly2", required=True)
    q.add_argument("--query", choices=["lsi", "pip"], required=True)
    q.add_argument("--grid-size", type=int, default=2048)  # src/flags.cc:6
    q.add_argument("--mode", default="grid", choices=["grid"], help="flag parity")
    q.add_argument("--sample", type=float, default=None)
    q.add_argument("--warmup", type=int, default=0)
    q.add_argument("--repeat", type=int, default=1)
    q.add_argument("--output", default=None, help="write result parquet here")
    q.add_argument(
        "--check", action="store_true",
        help="verify the result against a second (coarser) grid run — the "
             "Spark analog of the reference's backend cross-check "
             "(src/flags.cc:9, src/run_overlay.cu:33-141)",
    )
    q.add_argument(
        "--histo", action="store_true",
        help="print the per-cell workload histogram (reference -histo, "
             "src/flags.cc:31, src/grid/uniform_grid.h:444-494)",
    )

    o = sub.add_parser("overlay", help="polygon overlay (polyover_exec analog)")
    o.add_argument("--poly1", required=True)
    o.add_argument("--poly2", required=True)
    o.add_argument("--grid-size", type=int, default=2048)
    o.add_argument("--sample", type=float, default=None)
    o.add_argument("--output", default=None, help="CDB text output path")
    o.add_argument("--checkpoint-dir", default=None)
    o.add_argument(
        "--check", action="store_true",
        help="re-run the overlay on a coarser grid and require identical "
             "output (reference run_overlay.cu:33-141 check mode)",
    )

    c = sub.add_parser(
        "convert", help="CDB text / polygon CSV -> parquet cache"
    )
    src_grp = c.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--cdb")
    src_grp.add_argument(
        "--poly-csv",
        help="polygon-per-line CSV (reference src/map/polygon_parser.h "
             "ParsePolygons format: header count, then '<id> <x>,<y> ...')",
    )
    c.add_argument(
        "--head-eq-tail", action="store_true",
        help="close open rings by re-appending the first vertex "
             "(reference ParsePolygons head_eq_tail)",
    )
    c.add_argument("--out", required=True)

    iw = sub.add_parser(
        "ingest-warc",
        help="WARC archives -> pages parquet (url, ts_epoch, html, ...)",
    )
    iw.add_argument("--warc", required=True, help="file/dir/glob of .warc[.gz]")
    iw.add_argument("--out", required=True, help="output parquet directory")

    g = sub.add_parser(
        "gen", help="synthetic workload generator (reference -gen_n/-gen_t, "
                    "src/flags.cc:20-23, src/run_query.cu:101-167)"
    )
    g.add_argument("--kind", choices=["lsi", "pip"], required=True)
    g.add_argument("--gen-n", type=int, required=True, help="number of queries")
    g.add_argument("--gen-t", type=float, default=1.0, help="max segment length")
    g.add_argument("--bbox", default="0,100,0,100", help="min_x,max_x,min_y,max_y")
    g.add_argument("--out", required=True, help="output parquet directory")

    args = p.parse_args(argv)
    spark = get_spark("rayjoin_cli")

    if args.cmd == "convert":
        if args.poly_csv:
            from rayjoin_spark.sources.polygon_csv import (
                polygons_to_chains,
                read_polygon_csv,
            )

            chains, points = polygons_to_chains(
                read_polygon_csv(spark, args.poly_csv, args.head_eq_tail)
            )
            chains.write.mode("overwrite").parquet(f"{args.out}/chains.parquet")
            points.write.mode("overwrite").parquet(f"{args.out}/points.parquet")
            src = args.poly_csv
        else:
            cdb_to_parquet(spark, args.cdb, args.out)
            src = args.cdb
        print(json.dumps({"converted": src, "out": args.out}))
        return 0

    if args.cmd == "ingest-warc":
        from rayjoin_spark.sources.warc import read_warc

        pages = read_warc(spark, args.warc)
        pages.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"ingested": args.warc, "out": args.out, "rows": n}))
        return 0

    if args.cmd == "gen":
        from rayjoin_spark.sources.datagen import uniform_points, uniform_segments

        mnx, mxx, mny, mxy = (float(v) for v in args.bbox.split(","))
        if args.kind == "lsi":
            gch, gpt = uniform_segments(spark, args.gen_n, mnx, mxx, mny, mxy, args.gen_t)
            gch.write.mode("overwrite").parquet(f"{args.out}/chains.parquet")
            gpt.write.mode("overwrite").parquet(f"{args.out}/points.parquet")
        else:
            pts = uniform_points(spark, args.gen_n, mnx, mxx, mny, mxy)
            pts.write.mode("overwrite").parquet(f"{args.out}/points.parquet")
        print(json.dumps({"generated": args.kind, "n": args.gen_n, "out": args.out}))
        return 0

    ca, pa = _load_layer(spark, args.poly1, args.sample)
    cb, pb = _load_layer(spark, args.poly2, args.sample)
    scaling = compute_scaling(pa, pb)
    grid = GridSpec(args.grid_size)

    if args.cmd == "query":
        if args.repeat < 1:
            raise SystemExit("--repeat must be >= 1")
        ea = build_edges(ca, pa, scaling).persist()
        eb = build_edges(cb, pb, scaling).persist()
        ea.count(), eb.count()
        pip_index = None
        if args.query == "pip":
            # reference protocol: build the grid once, time the queries
            # (its logs report "Build Index" apart from repeats)
            from rayjoin_spark.operators.pip import PipIndex

            pip_index = PipIndex(ea, grid)
        times = []
        result = None
        for i in range(args.warmup + args.repeat):
            t0 = time.time()
            it_caches: list = []
            if args.query == "lsi":
                result = lsi_join(ea, eb, grid)
            else:
                # query side = map 1's own vertices, like RunPIPQuery's
                # default (reference src/run_query.cu:331-347)
                qpts = pb.selectExpr("chain_id * 1048576 + seq as point_id", "x", "y")
                result = pip_locate(
                    qpts, ea, scaling, grid, index=pip_index, caches=it_caches
                )
            n = result.count()
            if i >= args.warmup:
                times.append(time.time() - t0)
            # release this iteration's internal persists (stepped/
            # accepted): they are plan-canonicalized, so WITHOUT the
            # release every later repeat is answered from the
            # CacheManager and the reported throughput measures a cache
            # scan, not a locate (bench.py defeats the same trap with
            # per-repeat point seeds)
            for c in it_caches:
                c.unpersist()
        avg = sum(times) / len(times)
        print(json.dumps({"query": args.query, "rows": n, "avg_sec": round(avg, 3),
                          "throughput_per_sec": round(n / avg) if avg else None}))
        if args.histo:
            from rayjoin_spark.plans.cells import (
                cell_workload,
                explode_edges_to_cells,
                workload_histogram,
            )

            hist = workload_histogram(
                cell_workload(
                    explode_edges_to_cells(ea, grid), explode_edges_to_cells(eb, grid)
                )
            )
            for r in hist.collect():
                print(json.dumps({"bucket": r["bucket"], "n_cells": r["n_cells"],
                                  "total_workload": r["total_workload"]}))
        if args.check:
            # second, independent physical configuration (coarser grid) —
            # grid size is physical, not semantic, so results must agree
            from rayjoin_spark.operators.checkmode import check_lsi, check_pip

            grid2 = GridSpec(max(args.grid_size // 2, 1))
            if args.query == "lsi":
                stats = check_lsi(result, lsi_join(ea, eb, grid2))
                ok = stats["missing"] == 0 and stats["extra"] == 0
            else:
                stats = check_pip(
                    result, pip_locate(qpts, ea, scaling, grid2), ea
                )
                ok = stats["errors"] == 0
            print(json.dumps({"check": stats, "check_ok": ok}))
            if not ok:
                return 1
        if args.output:
            result.write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "overlay":
        if args.checkpoint_dir:
            from rayjoin_spark.plans.checkpoint import checkpointed_overlay

            oc, op = checkpointed_overlay(
                spark, ca, pa, cb, pb, scaling, grid, args.checkpoint_dir
            )
        else:
            oc, op = overlay(ca, pa, cb, pb, scaling, grid)
        n = oc.count()
        print(json.dumps({"overlay_chains": n}))
        if args.check:
            oc2, _ = overlay(ca, pa, cb, pb, scaling, GridSpec(max(grid.grid_size // 2, 1)))
            missing = oc2.exceptAll(oc).count()
            extra = oc.exceptAll(oc2).count()
            ok = missing == 0 and extra == 0
            print(json.dumps({"check": {"missing": missing, "extra": extra},
                              "check_ok": ok}))
            if not ok:
                return 1
        if args.output:
            write_cdb(oc, op, args.output)
        return 0


if __name__ == "__main__":
    sys.exit(main())
