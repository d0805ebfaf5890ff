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
    p.add_argument(
        "--loader", default="olsson",
        choices=["olsson", "colmap", "astrovision", "tanks_and_temples", "mobilebrick", "onedsfm"],
    )
    p.add_argument("--dataset_dirpath", required=True)
    p.add_argument("--images_dir", default=None, help="colmap loader images dir")
    p.add_argument("--colmap_files_dirpath", default=None)
    p.add_argument("--max_resolution", type=int, default=760)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--output_root", default="results")
    p.add_argument("--run_mvs", action="store_true", help="dense plane-sweep MVS")
    p.add_argument("--run_gs", action="store_true", help="gaussian splatting")
    p.add_argument("--hierarchical", action="store_true", help="partitioned reconstruction")
    p.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
    return p


def build_loader(args):
    import os

    kw = dict(max_resolution=args.max_resolution, max_frames=args.max_frames)
    if args.loader == "olsson":
        from gtsfm_tpu.loader.olsson import OlssonLoader

        return OlssonLoader(args.dataset_dirpath, **kw)
    if args.loader == "astrovision":
        from gtsfm_tpu.loader.datasets import AstrovisionLoader

        return AstrovisionLoader(args.dataset_dirpath, **kw)
    if args.loader == "tanks_and_temples":
        from gtsfm_tpu.loader.datasets import TanksAndTemplesLoader

        base = args.dataset_dirpath
        name = os.path.basename(base.rstrip("/"))
        return TanksAndTemplesLoader(
            img_dir=args.images_dir or os.path.join(base, name),
            poses_fpath=os.path.join(base, f"{name}_COLMAP_SfM.log"),
            **kw,
        )
    if args.loader == "mobilebrick":
        from gtsfm_tpu.loader.datasets import MobilebrickLoader

        return MobilebrickLoader(args.dataset_dirpath, **kw)
    if args.loader == "onedsfm":
        from gtsfm_tpu.loader.datasets import OneDSFMLoader

        return OneDSFMLoader(args.dataset_dirpath, **kw)
    from gtsfm_tpu.loader.colmap import ColmapLoader

    colmap_dir = args.colmap_files_dirpath or args.dataset_dirpath
    images_dir = args.images_dir or os.path.join(args.dataset_dirpath, "images")
    return ColmapLoader(colmap_dir, images_dir, **kw)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from gtsfm_tpu.configs.config import build_scene_optimizer, load_config
    from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = load_config(args.config_name, args.overrides)
    so_cfg = cfg.setdefault("scene_optimizer", {})
    so_cfg["output_root"] = args.output_root
    if args.run_mvs:
        so_cfg["run_mvs"] = True
    if args.run_gs:
        so_cfg["run_gs"] = True
    if args.hierarchical:
        so_cfg["hierarchical"] = True
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
