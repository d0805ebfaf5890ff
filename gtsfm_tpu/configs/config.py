"""Lightweight config system: YAML -> nested options objects.

Parity: the reference's Hydra/OmegaConf config tree (gtsfm/configs/*.yaml
composed in runner.py:169-256). Without Hydra in the image, this maps YAML
dicts onto the framework's NamedTuple option types by name, with dotted
CLI overrides (``key.subkey=value``).
"""

from __future__ import annotations

import os
from typing import Any

import yaml

from gtsfm_tpu.averaging.rotation.averaging import RotationAveragingOptions
from gtsfm_tpu.averaging.translation.averaging import TranslationAveragingOptions
from gtsfm_tpu.bundle.ba import BAOptions
from gtsfm_tpu.bundle.triangulation import TriangulationMode
from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
from gtsfm_tpu.frontend.two_view import TwoViewOptions
from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
from gtsfm_tpu.retriever.retrievers import (
    ExhaustiveRetriever,
    JointSimilaritySequentialRetriever,
    RetrieverOptions,
    SequentialRetriever,
    SimilarityRetriever,
)
from gtsfm_tpu.scene.mvo import MVOOptions
from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions
from gtsfm_tpu.view_graph.cycle_consistency import ViewGraphOptions

CONFIG_DIR = os.path.dirname(__file__)

_RETRIEVERS = {
    "sequential": SequentialRetriever,
    "exhaustive": ExhaustiveRetriever,
    "similarity": SimilarityRetriever,
    "joint": JointSimilaritySequentialRetriever,
}


def _build(nt_type, d: dict):
    """Instantiate a NamedTuple option type from a dict, recursing into
    nested option fields."""
    nested = {
        "ransac": RansacOptions,
        "view_graph": ViewGraphOptions,
        "rotation": RotationAveragingOptions,
        "translation": TranslationAveragingOptions,
        "ba": BAOptions,
        "detector": DoGSiftOptions,
        "two_view": TwoViewOptions,
        "mvo": MVOOptions,
    }
    kwargs = {}
    for k, v in (d or {}).items():
        if k in nested and isinstance(v, dict):
            kwargs[k] = _build(nested[k], v)
        elif k == "triangulation_mode" and isinstance(v, str):
            kwargs[k] = TriangulationMode[v]
        elif k == "reproj_thresholds" and isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return nt_type(**kwargs)


def apply_overrides(cfg: dict, overrides: list) -> dict:
    """Apply dotted key=value overrides (``mvo.ba.max_iterations=50``)."""
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return cfg


def load_config(name_or_path: str = "unified", overrides: list = None) -> dict:
    """Load a named config (gtsfm_tpu/configs/<name>.yaml) or a path."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, f"{name_or_path}.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    return apply_overrides(cfg, overrides)


def build_scene_optimizer(cfg: dict) -> SceneOptimizer:
    """Compose the full object tree from a config dict.

    Top-level sections: ``scene_optimizer`` (options), ``retriever``,
    ``detector``, ``matcher``, ``global_descriptor`` — the last three are
    name-dispatched through frontend/registry.py, the analog of the
    reference's Hydra component swaps (runner.py:202-311). A detector dict
    may also live at ``scene_optimizer.detector`` (legacy DoGSift-only form).
    """
    from gtsfm_tpu.frontend.registry import (
        build_correspondence,
        build_detector,
        build_global_descriptor,
        build_matcher,
    )

    so_cfg = dict(cfg.get("scene_optimizer") or {})
    det_cfg = cfg.get("detector")
    if det_cfg is None:
        # legacy location: scene_optimizer.detector without a name is DoGSift
        det_cfg = dict(so_cfg.get("detector") or {})
        det_cfg.setdefault("name", "dog_sift")
    if det_cfg.get("name", "dog_sift") != "dog_sift":
        # non-DoGSift detectors don't parse as DoGSiftOptions
        so_cfg.pop("detector", None)
    so_opts = _build(SceneOptimizerOptions, so_cfg)

    retr_cfg = dict(cfg.get("retriever") or {})
    retr_name = retr_cfg.pop("name", "sequential")
    retr_cls = _RETRIEVERS[retr_name]
    if retr_cls is ExhaustiveRetriever:
        retriever = retr_cls()
    else:
        retriever = retr_cls(_build(RetrieverOptions, retr_cfg))

    detector = build_detector(det_cfg)
    matcher = build_matcher(cfg.get("matcher"))
    global_descriptor = (
        build_global_descriptor(cfg["global_descriptor"])
        if cfg.get("global_descriptor") else None
    )
    correspondence = build_correspondence(cfg.get("correspondence"))
    return SceneOptimizer(
        so_opts,
        retriever=retriever,
        detector=detector,
        matcher=matcher,
        global_descriptor=global_descriptor,
        correspondence=correspondence,
    )
