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
    p.add_argument("--bal", default=None, metavar="PROBLEM",
                   help="BA-only mode: optimize a BAL (Bundle Adjustment in "
                        "the Large) problem file and report costs (skips the "
                        "reconstruction pipeline; GtsfmData.read_bal parity)")
    p.add_argument("--compare_to", default=None, metavar="COLMAP_DIR",
                   help="after the run, compare the exported reconstruction "
                        "against this COLMAP-format reference "
                        "(compare_colmap_outputs.py parity)")
    p.add_argument(
        "--loader", default="olsson",
        choices=[
            "olsson", "colmap", "astrovision", "tanks_and_temples",
            "mobilebrick", "onedsfm", "hilti", "argoverse", "yfcc",
        ],
    )
    p.add_argument("--dataset_dirpath", default=None,
                   help="dataset root (required except in --bal mode)")
    p.add_argument("--images_dir", default=None, help="colmap loader images dir")
    p.add_argument("--colmap_files_dirpath", default=None)
    p.add_argument("--argoverse_log_id", default=None, help="argoverse vehicle log id")
    p.add_argument("--max_resolution", type=int, default=760)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--output_root", default="results")
    p.add_argument("--run_mvs", action="store_true", help="dense plane-sweep MVS")
    p.add_argument("--run_gs", action="store_true", help="gaussian splatting")
    p.add_argument("--mvs_backend", default="plane_sweep",
                   choices=["plane_sweep", "patchmatchnet"])
    p.add_argument("--mvs_weights_path", default=None,
                   help="converted PatchmatchNet checkpoint (fetch_and_verify_weights.py)")
    p.add_argument("--gs_video_frames", type=int, default=0,
                   help="render an interpolated camera-path PNG sequence of the splats")
    p.add_argument("--hierarchical", action="store_true", help="partitioned reconstruction")
    p.add_argument(
        "--cluster_optimizer", default=None,
        choices=["mvo", "vggt", "fastvggt", "anysplat"],
        help="per-cluster reconstruction engine (configs/vggt.yaml parity)",
    )
    p.add_argument("--use_cache", action="store_true",
                   help="content-addressed disk caching of detect/two-view stages")
    p.add_argument("--cache_root", default=None)
    p.add_argument("--load_chunk_size", type=int, default=None,
                   help="stream load+detect in chunks of N images (bounds host memory)")
    # multi-host bring-up over DCN: the TPU analog of the reference's
    # SSHCluster bootstrap (runner.py:337-345); all hosts run the same
    # command with their process index
    p.add_argument("--distributed_coordinator", default=None,
                   help="host:port of process 0 (enables jax.distributed)")
    p.add_argument("--distributed_num_processes", type=int, default=None)
    p.add_argument("--distributed_process_id", type=int, default=None)
    p.add_argument("--prewarm", action="store_true",
                   help="AOT-compile the standard jit shape set before the "
                        "pipeline (populates the persistent compile cache)")
    p.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
    return p


def maybe_init_distributed(args) -> bool:
    """Initialize jax.distributed for multi-host (DCN) runs when coordinator
    args are given. Must run before any jax backend use. Returns True when
    the distributed runtime was initialized.

    Parity: the reference's multi-node SSH cluster bring-up
    (/root/reference/gtsfm/runner.py:337-345) — here each host joins one
    jax.distributed job and the global device mesh extends over DCN.
    """
    if args.distributed_coordinator is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=args.distributed_coordinator,
        num_processes=args.distributed_num_processes,
        process_id=args.distributed_process_id,
    )
    return True


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
    if args.loader == "hilti":
        from gtsfm_tpu.loader.hilti import HiltiLoader

        return HiltiLoader(args.dataset_dirpath, **kw)
    if args.loader == "argoverse":
        from gtsfm_tpu.loader.datasets import ArgoverseLoader

        log_id = args.argoverse_log_id
        if log_id is None:
            logs = sorted(
                d for d in os.listdir(args.dataset_dirpath)
                if os.path.isdir(os.path.join(args.dataset_dirpath, d))
            )
            if not logs:
                raise ValueError("no argoverse logs under dataset_dirpath")
            log_id = logs[0]
        return ArgoverseLoader(
            args.dataset_dirpath, log_id=log_id,
            max_num_imgs=args.max_frames or 20,
            max_resolution=args.max_resolution,
        )
    if args.loader == "yfcc":
        from gtsfm_tpu.loader.datasets import YfccImbLoader

        return YfccImbLoader(args.dataset_dirpath, max_resolution=args.max_resolution)
    from gtsfm_tpu.loader.colmap import ColmapLoader

    colmap_dir = args.colmap_files_dirpath or args.dataset_dirpath
    images_dir = args.images_dir or os.path.join(args.dataset_dirpath, "images")
    return ColmapLoader(colmap_dir, images_dir, **kw)


def run_bal(path: str, output_root: str) -> int:
    """BA-only tool mode: read a BAL problem, run the production bundle
    adjuster, print cost reduction and reprojection stats, export COLMAP.
    The skydio-501 merge-BA regime without a front-end."""
    import numpy as np

    from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
    from gtsfm_tpu.io import colmap as colmap_io
    from gtsfm_tpu.io.bal import read_bal

    data = read_bal(path)
    print(f"BAL problem: {data.number_images()} cameras, "
          f"{data.number_tracks()} points, {data.number_measurements()} measurements")
    fixed = np.zeros(data.max_cameras, bool)
    fixed[0] = True
    ba = BundleAdjustment(BAOptions())
    t0 = time.time()
    out, metrics = ba.run(data, fixed_cam=fixed)
    print(f"BA: cost {metrics['initial_cost']:.4g} -> {metrics['final_cost']:.4g} "
          f"in {metrics['iterations']} iterations ({time.time() - t0:.1f}s)")
    if output_root:
        import os

        colmap_io.write_scene(out, os.path.join(output_root, "bal_output"))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    maybe_init_distributed(args)
    from gtsfm_tpu.configs.config import build_scene_optimizer, load_config
    from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.bal:
        return run_bal(args.bal, args.output_root)
    if not args.dataset_dirpath:
        build_parser().error("--dataset_dirpath is required (except with --bal)")
    if args.prewarm:
        from gtsfm_tpu.utils.prewarm import prewarm_standard_shapes

        prewarm_standard_shapes()

    cfg = load_config(args.config_name, args.overrides)
    so_cfg = cfg.setdefault("scene_optimizer", {})
    so_cfg["output_root"] = args.output_root
    if args.run_mvs:
        so_cfg["run_mvs"] = True
    if args.run_gs:
        so_cfg["run_gs"] = True
    if args.gs_video_frames:
        so_cfg["gs_video_frames"] = args.gs_video_frames
    if args.mvs_backend != "plane_sweep":
        so_cfg["mvs_backend"] = args.mvs_backend
        so_cfg["mvs_weights_path"] = args.mvs_weights_path
    if args.hierarchical:
        so_cfg["hierarchical"] = True
    if args.cluster_optimizer:
        so_cfg["cluster_optimizer"] = args.cluster_optimizer
    if args.use_cache:
        so_cfg["use_cache"] = True
    if args.cache_root:
        so_cfg["cache_root"] = args.cache_root
    if args.load_chunk_size is not None:
        so_cfg["load_chunk_size"] = args.load_chunk_size
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
    if args.compare_to:
        import os

        from gtsfm_tpu.evaluation.compare import compare_colmap_dirs

        est_dir = os.path.join(args.output_root, "results", "ba_output")
        cmp_dir = os.path.join(args.output_root, "results", "comparison")
        if os.path.exists(os.path.join(est_dir, "cameras.txt")):
            cg = compare_colmap_dirs(est_dir, args.compare_to, output_dir=cmp_dir)
            for m in cg.metrics:
                if m.dist is None:
                    print(f"  comparison/{m.name}: {m.scalar}")
        else:
            print("  comparison skipped: no exported reconstruction")
    return 0


if __name__ == "__main__":
    sys.exit(main())
