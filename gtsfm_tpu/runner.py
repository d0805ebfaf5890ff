"""CLI entry point.

Parity: /root/reference/gtsfm/runner.py (GtsfmRunner: args :47-167, config
composition :169-256, scene_optimizer.run :461) and the ./run wrapper.
Usage:
    python -m gtsfm_tpu.runner --config_name unified \
        --loader olsson --dataset_dirpath <dir> --max_resolution 760 \
        [mvo.ba.max_iterations=50 ...]
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="gtsfm_tpu reconstruction runner")
    p.add_argument("--config_name", default="unified", help="named config or YAML path")
    p.add_argument("--loader", default="olsson", choices=["olsson", "colmap"])
    p.add_argument("--dataset_dirpath", required=True)
    p.add_argument("--images_dir", default=None, help="colmap loader images dir")
    p.add_argument("--colmap_files_dirpath", default=None)
    p.add_argument("--max_resolution", type=int, default=760)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--output_root", default="results")
    p.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
    return p


def build_loader(args):
    if args.loader == "olsson":
        from gtsfm_tpu.loader.olsson import OlssonLoader

        return OlssonLoader(
            args.dataset_dirpath, max_resolution=args.max_resolution, max_frames=args.max_frames
        )
    from gtsfm_tpu.loader.colmap import ColmapLoader

    import os

    colmap_dir = args.colmap_files_dirpath or args.dataset_dirpath
    images_dir = args.images_dir or os.path.join(args.dataset_dirpath, "images")
    return ColmapLoader(
        colmap_dir, images_dir, max_resolution=args.max_resolution, max_frames=args.max_frames
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from gtsfm_tpu.configs.config import build_scene_optimizer, load_config

    cfg = load_config(args.config_name, args.overrides)
    cfg.setdefault("scene_optimizer", {})["output_root"] = args.output_root
    so = build_scene_optimizer(cfg)
    loader = build_loader(args)
    t0 = time.time()
    data, groups = so.run(loader)
    print(f"reconstruction finished in {time.time() - t0:.1f}s")
    print(
        f"cameras: {data.number_images()}  tracks: {data.number_tracks()}  "
        f"measurements: {data.number_measurements()}"
    )
    for g in groups:
        d = g.to_dict()[g.name]
        for k, v in d.items():
            if isinstance(v, (int, float)):
                print(f"  {g.name}/{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
