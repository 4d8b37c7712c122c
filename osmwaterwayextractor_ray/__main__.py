"""CLI — end-to-end run, mirroring the reference's ``main`` surface
(osm_waterway_extractor.py:3168-3306):

    python -m osmwaterwayextractor_ray test               # fixture network
    python -m osmwaterwayextractor_ray ways.parquet -c config.yaml -o out/

Input 'test' runs the reference's own 4-way synthetic network
(create_test_waterways, ref :3141-3165); a parquet path is read via
sources.readers (engine-native or reference-shaped schema). Outputs go to
<out>/: parquet + csv + geojson + jsongz (+ mobile, qa, manifest per
config), matching the reference's server_formats list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="osmwaterwayextractor_ray")
    ap.add_argument("input", help="'test', a waterways parquet path, or an .osm.pbf file")
    ap.add_argument("-c", "--config", default=None, help="YAML config path")
    ap.add_argument("-o", "--output", default="./out", help="output directory")
    ap.add_argument("--snap-tolerance", type=float, default=None)
    ap.add_argument("--min-fragment-length", type=float, default=None)
    ap.add_argument("--no-simplify", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osmwaterwayextractor_ray.config import Config
    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.stages import sinks

    config = Config.from_yaml(args.config) if args.config else Config()
    if args.snap_tolerance is not None:
        config.snap_tolerance_m = args.snap_tolerance
    if args.min_fragment_length is not None:
        config.min_fragment_length_m = args.min_fragment_length
    if args.no_simplify:
        config.enable_geometry_simplification = False

    t0 = time.time()
    if args.input == "test":
        from osmwaterwayextractor_ray.sources.waterways import fixture_waterways_ds

        ways = fixture_waterways_ds()
    else:
        if args.input.endswith(".pbf"):
            # the reference's native input (WaterwayHandler, ref :1368-1418)
            from osmwaterwayextractor_ray.sources.pbf import waterways_from_pbf

            ways = waterways_from_pbf(args.input, config)
        else:
            from osmwaterwayextractor_ray.sources.readers import read_waterways

            ways = read_waterways(args.input, config)

    result = build_graph(ways, config, with_qa=True)
    os.makedirs(args.output, exist_ok=True)
    outputs: dict = {}
    nodes = result.nodes.materialize()
    edges = result.edges.materialize()
    # format selection mirrors OutputManager.save_outputs (ref :2747-2782):
    # server_formats picks the sinks; mobile/id-mapping are opt-in booleans
    fmts = config.server_formats
    if "parquet" in fmts:
        outputs["parquet"] = sinks.save_parquet(nodes, edges, os.path.join(args.output, "parquet"))
    if "csv" in fmts:
        outputs["csv"] = sinks.save_csv(nodes, edges, os.path.join(args.output, "csv"))
    if "geojson" in fmts:
        outputs["geojson"] = sinks.save_geojson(edges, os.path.join(args.output, "edges.geojson"))
    if "jsongz" in fmts:
        outputs["jsongz"] = sinks.save_jsongz(nodes, edges, os.path.join(args.output, "graph"))
    if config.generate_mobile_csv:
        outputs["mobile"] = sinks.save_mobile_csv(nodes, edges, os.path.join(args.output, "graph"))
    if config.generate_id_mapping:
        outputs["id_mapping"] = sinks.save_id_mapping(
            nodes, edges, os.path.join(args.output, "id_mapping.json")
        )
    sinks.save_qa(result.qa, os.path.join(args.output, "qa_summary.json"))
    manifest = sinks.generate_manifest(args.input, config, result.qa, outputs)
    with open(os.path.join(args.output, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)

    print(
        f"Graph built: {result.qa.get('final_nodes')} nodes, "
        f"{result.qa.get('final_edges')} edges in {time.time() - t0:.2f}s -> {args.output}"
    )
    if owns_ray:  # don't tear down a session owned by the caller (tests)
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
